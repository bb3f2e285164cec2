package graft.sync

/** Singer-style metric emission (the reference's INFO METRIC lines:
  * record_count counters and job_duration timers — singer.metrics usage in
  * tap-redshift/src/sync.py:178 and messages.py:335).
  */
object Metrics {

  import Messages.js

  private def tagsJson(tags: Seq[(String, String)]): String =
    tags.map { case (k, v) => s"${js(k)}: ${js(v)}" }.mkString("{", ", ", "}")

  def counterMessage(metric: String, value: Long, tags: Seq[(String, String)]): String =
    s"""{"type": "counter", "metric": ${js(metric)}, "value": $value, "tags": ${tagsJson(tags)}}"""

  def timerMessage(metric: String, seconds: Double, tags: Seq[(String, String)]): String =
    s"""{"type": "timer", "metric": ${js(metric)}, "value": $seconds, "tags": ${tagsJson(tags)}}"""

  /** Wall-clock job timer (metrics.job_timer analog). */
  final class JobTimer(metric: String, tags: Seq[(String, String)]) {
    private val t0 = System.nanoTime()
    def finish(status: String = "succeeded"): String =
      timerMessage(metric, (System.nanoTime() - t0) / 1e9, tags :+ ("status" -> status))
  }

  /** Sync progress percentage (StreamProps.get_sync_progress analog). */
  def progressPct(completed: Long, total: Long): Double =
    if (total <= 0) 0.0 else math.round(completed.toDouble / total * 10000.0) / 100.0
}
