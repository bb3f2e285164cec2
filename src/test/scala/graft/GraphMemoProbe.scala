package graft

/** Paired measurement for the co-purchase edge MEMO (round-10 item 4):
  * the graph family (C43 census, C40 PageRank, C47 components) each
  * consume the Σ basket² edge frame — before the memo every face
  * rebuilt it. `mode=off` replays the unmemoized behavior by setting
  * the IndexCache capacity to 0 (insert → immediate evict → every call
  * rebuilds); `mode=on` uses the session memo. Run each mode in a
  * FRESH JVM, both orders, per the ambient-noise discipline:
  * `sbt "Test/runMain graft.GraphMemoProbe on|off [dir]"`. */
object GraphMemoProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("on")
    val dir = if (args.length > 1) args(1) else "/tmp/graft-sf100x"
    val spark = graft.engine.GraftSession.getOrCreate("graph-memo-probe")
    if (mode == "off") queries.LlmOps.annIndexCache.setCapacity(0)
    def t(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-24s $s%8.2fs")
      s
    }
    var total = 0.0
    total += t("triangle_count") {
      queries.Warehouse.qTriangleCount(spark, dir).collect(): Unit }
    total += t("pagerank") {
      queries.Warehouse.qPageRank(spark, dir).count(): Unit }
    total += t("graph_components") {
      queries.Warehouse.qGraphComponents(spark, dir).count(): Unit }
    println(f"${"TOTAL[" + mode + "]"}%-24s $total%8.2fs")
    spark.stop()
  }
}
