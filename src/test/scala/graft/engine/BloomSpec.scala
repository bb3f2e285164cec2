package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  test("bloom prefilter is a superset of the exact match set; semi-join is exact") {
    import spark.implicits._
    val dim = (1 to 1000 by 3).map(_.toLong).toDF("k")
    val fact = (1 to 2000).map(_.toLong).toDF("fk")
    val bytes = BloomSemiJoin.buildBloom(dim, "k", expectedItems = 1000L, fpp = 0.03)
    val pre = BloomSemiJoin.prefilter(fact, "fk", bytes)
      .collect().map(_.getLong(0)).toSet
    val exact = fact.join(dim, $"fk" === $"k", "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(pre))                // no false negatives, ever
    assert(pre.size <= exact.size + 100)       // fpp keeps the slack small
    val semi = BloomSemiJoin.semiJoin(fact, "fk", dim, "k", 1000L, 0.03)
      .collect().map(_.getLong(0)).toSet
    assert(semi == exact)                      // residual join removes the fps
  }

  test("semiJoin works when both sides name the key identically") {
    import spark.implicits._
    val dim = (1 to 100 by 2).map(_.toLong).toDF("user_id")
    val fact = (1 to 200).map(_.toLong).toDF("user_id")
    val semi = BloomSemiJoin.semiJoin(fact, "user_id", dim, "user_id", 100L, 0.01)
      .collect().map(_.getLong(0)).toSet
    assert(semi == (1 to 100 by 2).map(_.toLong).toSet)
  }

  test("string keys probe the same way stat.bloomFilter built them") {
    import spark.implicits._
    val dim = (1 to 500).map(i => s"uuid-$i").toDF("k")
    val bytes = BloomSemiJoin.buildBloom(dim, "k", 500L, 0.01)
    val fact = ((1 to 500).map(i => s"uuid-$i") ++ (501 to 600).map(i => s"other-$i"))
      .toDF("fk")
    val kept = BloomSemiJoin.prefilter(fact, "fk", bytes)
      .collect().map(_.getString(0)).toSet
    assert((1 to 500).map(i => s"uuid-$i").toSet.subsetOf(kept))
  }

  test("incremental sync bloom path (no broadcast) matches the broadcast semi-join") {
    import graft.catalog.Streams
    val dir = sfDir
    val spark0 = spark
    import spark0.implicits._
    val active = graft.sources.Tables.table(spark, dir, "customer")
      .filter($"c_acctbal" > 1000.0).select($"c_custkey")
    def run(broadcastKeys: Boolean, bloom: Option[(Long, Double)]) =
      graft.sync.Sync.incrementalSlice(spark, dir, Streams.visitors,
        bookmark = Some("1998-01-01"), activeKeys = active,
        joinColumn = "o_custkey", limit = 1000,
        broadcastKeys = broadcastKeys, bloomPrefilter = bloom)
        .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    val default = run(broadcastKeys = true, bloom = None)
    val scale = run(broadcastKeys = false, bloom = Some((10000L, 0.03)))
    assert(default == scale) // same rows, same order — semantics transparent
  }

  test("the probe evaluates inside lambda functions (gram-level gate)") {
    import spark.implicits._
    val holdout = Seq((100L, "leaked benchmark answer key here")).toDF("doc_id", "text")
    val bytes = graft.curation.Curation.holdoutGramBloom(
      holdout, "text", n = 3, expectedGrams = 100L)
    val docs = Seq(
      (1L, "contains the leaked benchmark answer verbatim"),
      (2L, "entirely unrelated clean training document"))
      .toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("toks"))
    val kept = docs
      .filter(graft.curation.Curation.contaminationGate($"toks", bytes, n = 3))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L)) // doc 1 shares "leaked benchmark answer"
  }

  test("identical filter bytes broadcast once (content-dedup), distinct bytes don't") {
    import spark.implicits._
    val dim = (1 to 100).map(_.toLong).toDF("k")
    val bytes = BloomSemiJoin.buildBloom(dim, "k", 100L, 0.03)
    val bc1 = graft.functions.expressions.BloomFilters.broadcastFor(bytes)
    // a per-micro-batch reconstruction hands over a DIFFERENT array with
    // the same content — must reuse the same broadcast
    val bc2 = graft.functions.expressions.BloomFilters.broadcastFor(bytes.clone())
    assert(bc1.id == bc2.id)
    val other = BloomSemiJoin.buildBloom(dim, "k", 100L, 0.01)
    val bc3 = graft.functions.expressions.BloomFilters.broadcastFor(other)
    assert(bc3.id != bc1.id)
    // and the probe still works through the deduped handle
    val fact = (1 to 200).map(_.toLong).toDF("fk")
    val pre = fact.filter(graft.functions.bloomMightContain($"fk", bytes))
      .collect().map(_.getLong(0)).toSet
    assert((1 to 100).map(_.toLong).toSet.subsetOf(pre))
  }

  test("bloom fpr audit (A22): zero false negatives, observed fpp within 2x configured") {
    val row = graft.queries.Etl.qBloomFpr(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_false_negatives") == 0L,
      "a Bloom filter NEVER drops an inserted key — this is the hard contract")
    assert(row.getAs[Long]("n_probes") > 0)
    val neg = row.getAs[Long]("n_negative_probes")
    assert(neg > 0, "the audit needs truly-inactive probe traffic")
    val observed = row.getAs[Long]("observed_fpp_ppm")
    val configured = row.getAs[Long]("configured_fpp_ppm")
    // sized-to-set, the observed rate must land AT the configured fpp:
    // nonzero (an oversized filter reading 0 proves nothing) and within
    // 2x (binomial noise at this probe count; a broken hash reads far out)
    assert(row.getAs[Long]("n_false_positives") > 0,
      "sized-to-set audit must observe a nonzero false-positive rate")
    assert(observed <= 2 * configured,
      s"observed fpp $observed ppm vs configured $configured ppm")
    // arithmetic lane: ppm recomputes from the counts
    val fp = row.getAs[Long]("n_false_positives")
    assert(observed == (BigInt(fp) * 1000000 / neg).toLong)
  }
}
