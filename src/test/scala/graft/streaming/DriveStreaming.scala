package graft.streaming

/** Manual drive of the streaming surface through the public API — run with
  * `sbt "Test/runMain graft.streaming.DriveStreaming"`. Feeds a memory
  * stream, runs the watermarked sessionizer + windowed counts, prints what
  * the stream emitted (used by /verify; not a test).
  */
object DriveStreaming {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("drive-streaming", cores = 4)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

    val input = MemoryStream[Events.Event]
    val q = Events.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("drive_sessions").outputMode("append").start()
    input.addData(
      Events.Event(1, ts(0), 7L, "view", 1.0),
      Events.Event(2, ts(12), 7L, "click", 1.0),
      Events.Event(3, ts(90), 7L, "view", 1.0))
    q.processAllAvailable()
    input.addData(Events.Event(4, ts(900), 8L, "view", 1.0)) // advance watermark
    q.processAllAvailable()
    println("=== emitted sessions ===")
    spark.table("drive_sessions").orderBy("session_start").show(truncate = false)

    val win = MemoryStream[Events.Event]
    val q2 = Events.windowedCounts(win.toDF())
      .writeStream.format("memory").queryName("drive_windows").outputMode("complete").start()
    win.addData((1 to 50).map(i => Events.Event(i.toLong, ts(i.toLong), i % 3L, s"t${i % 2}", 1.0)): _*)
    q2.processAllAvailable()
    println("=== windowed counts ===")
    spark.table("drive_windows").orderBy("window_start", "event_type").show(truncate = false)
    val dup = MemoryStream[Events.Event]
    val q3 = Events.dedupStream(dup.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("drive_dedup").outputMode("append").start()
    dup.addData(Events.Event(1, ts(0), 1L, "view", 1.0), Events.Event(1, ts(0), 1L, "view", 1.0))
    q3.processAllAvailable()
    dup.addData(Events.Event(1, ts(1), 1L, "view", 2.0), Events.Event(2, ts(2), 1L, "view", 3.0))
    q3.processAllAvailable()
    println("=== deduped stream (expect event_ids 1,2 once each) ===")
    spark.table("drive_dedup").orderBy("event_id").show(truncate = false)
    q.stop(); q2.stop(); q3.stop(); spark.stop()
  }
}
