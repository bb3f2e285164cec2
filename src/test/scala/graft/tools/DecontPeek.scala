package graft.tools

/** Ad-hoc plan probe for the decontamination query (Test-only main). */
object DecontPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("peek", cores = 8)
    val df = graft.queries.LlmOps.qDecontaminate(spark, "/root/testdata/sf0.1")
    df.explain(true)
    val t0 = System.nanoTime()
    println("rows=" + df.count() + " in " + (System.nanoTime() - t0) / 1e9 + "s")
    spark.stop()
  }
}
