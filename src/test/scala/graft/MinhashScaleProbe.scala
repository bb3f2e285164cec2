package graft

import org.apache.spark.sql.functions._

/** Full-corpus stage split of q_dedup_minhash on an amplified dir:
  * `sbt "Test/runMain graft.MinhashScaleProbe /tmp/graft-sf100x"`.
  * Separates shingle+signature scan, band explode, candidate pair
  * generation, and the Jaccard verify join so a superlinear wall-time
  * is attributable to one stage. */
object MinhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("minhash-probe")
    val dir = args.headOption.getOrElse("/tmp/graft-sf100x")

    def time(name: String)(thunk: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = thunk
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  n=$n")
    }

    val docs = graft.sources.Tables.table(spark, dir, "documents")
    val shingled = docs
      .select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"),
        graft.dedup.Dedup.hashedNgrams(col("__toks"), 3).as("shingles"))
    val sigs = shingled.select(col("doc_id"), col("shingles"),
      graft.functions.minhashSignature(col("shingles"), 64).as("sig"))
    val banded = graft.dedup.MinHashLsh.bands(
      sigs.select(col("doc_id"), col("sig")), "sig", "doc_id", 4)

    time("shingle+sig scan") { sigs.count() }
    time("banded explode") { banded.count() }
    val pairs = graft.dedup.MinHashLsh.candidatePairs(banded, "doc_id")
    time("candidate pairs") { pairs.count() }
    val byId = shingled
    time("verify join+jaccard") {
      pairs
        .join(byId.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), "id_a")
        .join(byId.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          graft.functions.longSetJaccardSorted(col("sh_a"), col("sh_b")).as("j"))
        .filter(col("j") >= 500L)
        .count()
    }
    spark.stop()
  }
}
