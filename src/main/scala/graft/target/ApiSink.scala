package graft.target

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.LongAccumulator
import java.util.concurrent.ConcurrentLinkedQueue
import scala.collection.mutable.ArrayBuffer

/** Batched, rate-limited, retrying REST sink — the Spark-native version of
  * target-pendo's async request loop (target-pendo/src/__init__.py:301-368:
  * semaphore(10) concurrency, 1800 calls/5min rate limit, exponential
  * backoff ≤5 tries with 4xx give-up, failed-record extraction for retry).
  *
  * Execution model: `df.foreachPartition` — each executor slot streams its
  * partition into ≤maxRecords/≤maxBytes batches and POSTs them, so
  * concurrency scales with the cluster instead of one driver event loop.
  * The rate limit is enforced per-task via a token interval derived from
  * the global budget / expected parallelism (at 1000 executors you set
  * `callsPerPeriod` to the API's global budget and the per-task limiter
  * divides it). HTTP itself sits behind [[HttpPoster]] (this container has
  * zero egress; tests inject a stub — the plumbing is the product).
  */
object ApiSink {

  /** Pendo-style endpoint construction (target-pendo/src/endpoints.py):
    * /api/v1/metadata/{kind}/{group}/value. */
  final case class Endpoint(base: String, kind: String, group: String = "custom") {
    require(Set("account", "visitor").contains(kind), s"unknown kind: $kind")
    require(Set("agent", "custom").contains(group), s"unknown group: $group")
    def url: String = s"$base/api/v1/metadata/$kind/$group/value"
  }

  /** Minimal response surface the sink needs (request.py parses the same
    * fields from the bulk-update response). */
  final case class PostResult(status: Int, updated: Long, failed: Long, failedIds: Seq[String])

  /** Pluggable HTTP layer. Implementations must be serializable (shipped to
    * executors). */
  trait HttpPoster extends Serializable {
    def post(url: String, jsonBatch: Seq[String]): PostResult
  }

  final case class SinkConfig(
      endpoint: Endpoint,
      maxRecords: Int = 500,
      maxBytes: Long = 5000000L,
      maxAttempts: Int = 5,
      callsPerPeriod: Int = 1800,
      periodMillis: Long = 300000L,
      /** expected number of concurrent sink tasks (divides the rate budget) */
      parallelism: Int = 10)

  final case class SinkMetrics(
      records: LongAccumulator,
      batches: LongAccumulator,
      updated: LongAccumulator,
      failed: LongAccumulator,
      retries: LongAccumulator)

  def metrics(df: DataFrame): SinkMetrics = {
    val sc = df.sparkSession.sparkContext
    SinkMetrics(
      sc.longAccumulator("sink.records"), sc.longAccumulator("sink.batches"),
      sc.longAccumulator("sink.updated"), sc.longAccumulator("sink.failed"),
      sc.longAccumulator("sink.retries"))
  }

  /** Retryable status check: 4xx (except 408) gives up immediately
    * (__init__.py:284-285 exception_is_4xx giveup), everything else retries
    * with exponential backoff. */
  private def retryable(status: Int): Boolean =
    status == 408 || status < 400 || status >= 500

  /** POST one batch with backoff; returns ids of records the API rejected
    * (handle_failures, __init__.py:272-281). */
  private[target] def postWithRetry(
      poster: HttpPoster, url: String, batch: Seq[String], cfg: SinkConfig,
      m: SinkMetrics, sleep: Long => Unit): Seq[String] = {
    var attempt = 0
    while (true) {
      val res =
        try poster.post(url, batch)
        catch { case e: Exception => PostResult(599, 0, batch.size, Seq.empty) }
      attempt += 1
      if (res.status / 100 == 2) {
        m.updated.add(res.updated); m.failed.add(res.failed)
        return res.failedIds
      }
      if (attempt >= cfg.maxAttempts || !retryable(res.status))
        return batch.indices.map(_.toString) // whole batch failed
      m.retries.add(1)
      sleep(math.min(1000L << (attempt - 1), 30000L)) // expo backoff, capped
    }
    Seq.empty
  }

  /** Drive the sink over a DataFrame with a `payload` string column.
    * Returns the metrics accumulators (inspect after the action). */
  def push(df: DataFrame, poster: HttpPoster, cfg: SinkConfig): SinkMetrics = {
    val m = metrics(df)
    val url = cfg.endpoint.url
    // per-task share of the global rate budget
    val minIntervalMs: Long =
      math.max(1L, cfg.periodMillis * cfg.parallelism / math.max(1, cfg.callsPerPeriod))
    df.select("payload").foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val batch = new ArrayBuffer[String]()
      var batchBytes = 0L
      var lastCall = 0L
      def throttleAndPost(): Unit = if (batch.nonEmpty) {
        val wait = lastCall + minIntervalMs - System.currentTimeMillis()
        if (wait > 0) Thread.sleep(wait)
        lastCall = System.currentTimeMillis()
        m.batches.add(1)
        m.records.add(batch.size)
        postWithRetry(poster, url, batch.toSeq, cfg, m, Thread.sleep)
        batch.clear(); batchBytes = 0L
      }
      rows.foreach { r =>
        val payload = r.getString(0)
        batch += payload
        batchBytes += payload.getBytes("UTF-8").length
        if (batch.size >= cfg.maxRecords || batchBytes >= cfg.maxBytes) throttleAndPost()
      }
      throttleAndPost()
    }
    m
  }

  /** In-JVM stub poster for tests (local mode shares the JVM, so the queue
    * is visible to the driver). Optionally fails ids matching a predicate
    * and can serve transient 5xx before succeeding. */
  class RecordingPoster(
      rejectId: String => Boolean = _ => false,
      transientFailures: Int = 0) extends HttpPoster {
    override def post(url: String, jsonBatch: Seq[String]): PostResult = {
      val n = RecordingPoster.calls.size()
      RecordingPoster.calls.add(url -> jsonBatch)
      if (n < transientFailures) return PostResult(503, 0, 0, Seq.empty)
      val failed = jsonBatch.filter(rejectId)
      PostResult(200, jsonBatch.size - failed.size, failed.size, failed)
    }
  }
  object RecordingPoster {
    val calls = new ConcurrentLinkedQueue[(String, Seq[String])]()
    def reset(): Unit = calls.clear()
  }
}
