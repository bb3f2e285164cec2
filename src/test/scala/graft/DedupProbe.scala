package graft

import org.apache.spark.sql.functions._

/** Stage-level timing probe for the dedup pipelines on the amplified
  * corpus: `sbt "Test/runMain graft.DedupProbe [dir]"`. Separates candidate
  * generation from verification so plan regressions are attributable. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("dedup-probe")
    val dir = args.headOption.getOrElse("/tmp/graft-sf50x")

    def time(name: String)(thunk: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = thunk
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  n=$n")
    }

    val docs = graft.sources.Tables.table(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
    val shingled = docs.select(col("doc_id"),
      transform(graft.dedup.Dedup.wordNgrams(col("text"), 1), s => xxhash64(s)).as("shingles"))
    val sigs = shingled.select(col("doc_id"), col("shingles"),
      graft.functions.minhashSignature(col("shingles"), 64).as("sig"))
    val banded = graft.dedup.MinHashLsh.bands(
      sigs.select(col("doc_id"), col("sig")), "sig", "doc_id", 4)

    time("banded (sig+explode)") { banded.count() }
    time("candidatePairs (window)") {
      graft.dedup.MinHashLsh.candidatePairs(banded, "doc_id").count()
    }
    // round-1 shape: groupBy sizes + semi-joins + canonical groupBy
    time("candidatePairs (semijoin)") {
      val idCol = "doc_id"
      val maxBucketSize = 10000
      val sizes = banded.groupBy(col("band_idx"), col("band_hash"))
        .agg(count(lit(1)).as("__n"))
      val smallKeys = sizes.filter(col("__n") <= maxBucketSize)
        .select(col("band_idx"), col("band_hash"))
      val bigKeys = sizes.filter(col("__n") > maxBucketSize)
        .select(col("band_idx"), col("band_hash"))
      val small = banded.join(smallKeys, Seq("band_idx", "band_hash"), "left_semi")
      val l = small.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
      val r = small.select(col("band_idx").as("bi"), col("band_hash").as("bh"), col(idCol).as("id_b"))
      val cliquePairs = l.join(r,
        l("band_idx") === r("bi") && l("band_hash") === r("bh") && l("id_a") < r("id_b"))
        .select(col("id_a"), col("id_b"))
      val big = banded.join(bigKeys, Seq("band_idx", "band_hash"), "left_semi")
      val canonical = big.groupBy(col("band_idx"), col("band_hash"))
        .agg(min(col(idCol)).as("id_a"))
      val starPairs = big.join(canonical, Seq("band_idx", "band_hash"))
        .filter(col(idCol) =!= col("id_a"))
        .select(col("id_a"), col(idCol).as("id_b"))
      cliquePairs.unionAll(starPairs).distinct().count()
    }
    time("pairs no-distinct (window)") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("band_idx"), col("band_hash"))
      val sized = banded.select(col("band_idx"), col("band_hash"), col("doc_id"),
        count(lit(1)).over(w).as("__n"), min(col("doc_id")).over(w).as("__min_id"))
      val small = sized.filter(col("__n") <= 10000)
      val l = small.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_a"))
      val r = small.select(col("band_idx").as("bi"), col("band_hash").as("bh"),
        col("doc_id").as("id_b"))
      l.join(r, l("band_idx") === r("bi") && l("band_hash") === r("bh") &&
        col("id_a") < col("id_b")).count()
    }
    time("minhash full (verify)") {
      graft.queries.LlmOps.qDedupMinhash(spark, dir).count()
    }
    val simDocs = graft.sources.Tables.table(spark, dir, "documents")
    time("simhash signatures") {
      graft.dedup.SimHash.signatures(simDocs, "text", "doc_id").count()
    }
    time("simhash pairs") {
      graft.dedup.SimHash.nearDupPairs(simDocs, "text", "doc_id").count()
    }
    spark.stop()
  }
}
