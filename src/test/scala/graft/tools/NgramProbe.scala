package graft.tools

/** Ad-hoc 50x timing for the all-pairs n-gram Jaccard query (Test main). */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("ngram-probe", cores = 32)
    val t0 = System.nanoTime()
    val n = graft.queries.LlmOps.qNgramJaccard(spark, "/tmp/graft-sf50x").count()
    println(f"q_ngram_jaccard ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    spark.stop()
  }
}
