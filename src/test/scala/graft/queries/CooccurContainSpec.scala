package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Containment (D10) and PMI co-occurrence (F17) semantics. */
class CooccurContainSpec extends SparkSpec {
  import spark.implicits._

  test("containment catches a verbatim excerpt that Jaccard misses") {
    // doc 2 is a 6-token excerpt of the 40-token doc 1: containment of the
    // pair is 1.0 while Jaccard stays small
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (10 to 15).map(i => s"w$i").mkString(" ")
    val docs = Seq((10L, "s1", long), (15L, "s1", excerpt), (20L, "s2", long))
      .toDF("doc_id", "source", "text")
      .select($"doc_id", $"source",
        graft.dedup.Dedup.hashedNgrams(split($"text", " "), 2).as("grams"))
    val pairs = graft.dedup.Buckets.gridSelfJoin(
      docs.select($"source", $"doc_id"), Seq("source"), "doc_id", chunkSize = 4096)
      .join(docs.select($"doc_id".as("id_a"), $"grams".as("g_a")), "id_a")
      .join(docs.select($"doc_id".as("id_b"), $"grams".as("g_b")), "id_b")
      .select($"id_a", $"id_b",
        (lit(1000) * size(array_intersect($"g_a", $"g_b")) /
          least(size(array_distinct($"g_a")), size(array_distinct($"g_b"))))
          .cast("long").as("containment_x1000"),
        graft.functions.longSetJaccardSorted($"g_a", $"g_b").as("jaccard_x1000"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val (containment, jaccard) = pairs((10L, 15L))
    assert(containment == 1000L, "full excerpt => containment 1.0")
    assert(jaccard < 200L, "Jaccard dilutes the excerpt signal")
    assert(!pairs.contains((10L, 20L)), "cross-source pairs stay out of the block")
  }

  test("blocked containment: planted excerpt caught via rare grams; complete where all grams are rare") {
    // planted corpus: doc 15 is a verbatim excerpt of doc 10 (shares
    // RARE grams -> blocking must catch it); doc 30/35 share only a
    // corpus-frequent boilerplate phrase (df > maxDf) and genuinely
    // low containment — blocking correctly never pays their verify
    val boiler = "click here to subscribe now"
    val long10 = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (10L, "s1", long10),
      (15L, "s1", (10 to 15).map(i => s"w$i").mkString(" ")),
      (30L, "s1", boiler + " " + (100 to 120).map(i => s"x$i").mkString(" ")),
      (35L, "s1", boiler + " " + (200 to 220).map(i => s"y$i").mkString(" "))) ++
      // make the boilerplate grams frequent: many unrelated docs carry them
      (1 to 30).map(i => (100L + 5 * i, "s1", boiler + s" filler$i"))
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    docs.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = LlmOps.qContainmentBlocked(spark, dir, maxDf = 10L, minX1000 = 900L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 15L)),
      s"blocking must surface exactly the planted excerpt, got $out")
    // corpus-level equivalence regime (the registered D10 face's oracle
    // contract): rarest-m blocking must recall every exact report-class
    // pair on the provided corpus — blocked ≡ exact filtered at τ
    val exact = LlmOps.qContainmentExact(spark, sfDir)
      .filter($"containment_x1000" >= 300L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val blocked = LlmOps.qContainmentBlocked(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked == exact, s"equivalence regime must hold: ${blocked.diff(exact)} / ${exact.diff(blocked)}")
    // and the registered D10 face IS the blocked plan
    val registered = LlmOps.qContainment(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(registered == blocked, "registered face must be the blocked twin")
  }

  test("q_containment exact opt-in: bounds 0..1000, canonical order, sample respected") {
    val rows = LlmOps.qContainment(spark, sfDir, exact = true).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(0) % 5 == 0 && r.getLong(1) % 5 == 0)
      val c = r.getAs[Long]("containment_x1000")
      assert(c >= 0L && c <= 1000L)
    }
  }

  test("containment dominates Jaccard on every sampled pair") {
    val c = LlmOps.qContainmentExact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val j = LlmOps.qNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(c.keySet == j.keySet, "same grid-join candidate pairs")
    // |A∩B|/min ≥ |A∩B|/|A∪B| always; integer floors keep the inequality
    c.foreach { case (k, cv) => assert(cv >= j(k), s"pair $k") }
  }

  test("PMI pairs: min support respected, co-count bounded by doc frequencies") {
    val rows = LlmOps.qCooccurPmi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .filter($"text".isNotNull)
    val nDocs = docs.count()
    val df = docs
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .distinct().groupBy($"term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b, nab, pmi) =
        (r.getString(0), r.getString(1), r.getAs[Long]("n_ab"), r.getAs[Double]("pmi"))
      assert(a < b)
      assert(nab >= 5L)
      assert(nab <= math.min(df(a), df(b)), s"co-count can't exceed either df")
      val want = math.log(nab.toDouble * nDocs / (df(a).toDouble * df(b)))
      assert(math.abs(pmi - want) < 1e-2, s"($a,$b)")
    }
  }
}
