package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage isolation for the D28 survivorship face at amplified scale:
  * which of (pair generation+filter | components | quality join-back)
  * carries the memory cost. Run: Test/runMain graft.DedupBestProbe 100 */
object DedupBestProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.getOrElse("100")
    val dir = s"/tmp/graft-sf${mult}x"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val stage = args.drop(1).headOption.getOrElse("all")

    import graft.queries.LlmOps
    val m = LlmOps.getClass.getDeclaredMethod(
      "survivorshipCorpus", classOf[SparkSession], classOf[String])
    m.setAccessible(true)
    def corpus = m.invoke(LlmOps, spark, dir)
      .asInstanceOf[org.apache.spark.sql.DataFrame]

    val docs = corpus
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"), col("source"),
        graft.dedup.Dedup.hashedNgrams(col("__toks"), 2).as("grams"))
    if (stage == "all" || stage == "pairs") {
      val pairs = graft.dedup.Buckets.gridSelfJoinPayload(
          docs, Seq("source"), "doc_id", Seq("grams"), chunkSize = 4096)
        .filter(graft.functions.longSetJaccardSorted(col("grams_a"), col("grams_b")) >= 700L)
        .select(col("id_a"), col("id_b"))
      val n = time("pairs_count")(pairs.count())
      println(s"filtered pairs = $n")
      if (stage == "all") {
        val comp = time("components") {
          val c = graft.dedup.Dedup.connectedComponents(pairs)
          c.count()
        }
        println(s"component rows = $comp")
      }
    }
    if (stage == "full") {
      val n = time("full_face")(LlmOps.qDedupBest(spark, dir).count())
      println(s"rows = $n")
    }
    spark.stop()
  }
}
