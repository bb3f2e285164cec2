package graft.tools

/** Ad-hoc 50x timings for the latest registered ops (Test-only main). */
object NewOpsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("newops", cores = 32)
    val dir = "/tmp/graft-sf50x"
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    time("q_sketch_jaccard") { graft.queries.LlmOps.qSketchJaccard(spark, dir) }
    time("q_sample_per_group") { graft.queries.LlmOps.qSamplePerGroup(spark, dir) }
    time("q_quantize") { graft.queries.LlmOps.qQuantize(spark, dir) }
    spark.stop()
  }
}
