package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retrieval-stack operators (SURVEY §2 E9–E11): RRF hybrid fusion,
  * MMR diversification, ANN recall evaluation. */
class RetrievalSpec extends SparkSpec {

  test("rank fusion: bounded fanout, integer scores match rank arithmetic") {
    val out = Retrieval.qRankFusion(spark, sfDir).cache()
    val perQuery = out.groupBy("query_id").count()
    assert(perQuery.filter(col("count") > 10).count() == 0, "≤10 rows per query")
    // rrf score must equal the closed form of its two ranks
    val bad = out.filter(
      col("rrf_ppb") =!=
        when(col("dense_rank") > 0, expr("1000000000 DIV (60 + dense_rank)")).otherwise(0L)
          + when(col("sparse_rank") > 0, expr("1000000000 DIV (60 + sparse_rank)")).otherwise(0L))
    assert(bad.count() == 0, "rrf_ppb is exactly the two-list closed form")
    // a doc ranked in BOTH lists dominates any doc whose best single
    // rank is no better: both-lists rank-(a,b) ≥ single-list rank-min(a,b)
    val both = out.filter(col("dense_rank") > 0 && col("sparse_rank") > 0)
    if (both.count() > 0) {
      val w = both.select(min("rrf_ppb")).head().getLong(0)
      val singleBest = 1000000000L / 61
      assert(w > 1000000000L / 80 || w <= 2 * singleBest, "sane score range")
    }
    assert(out.count() > 0)
    out.unpersist()
  }

  test("indexed sparse leg ≡ exact sparse leg wherever Jaccard > 0") {
    // the exact Q×N leg may pad its top-k with score-0 docs; the
    // inverted-index leg by construction only generates docs sharing a
    // token. Restricted to positive quantized scores, the two must be
    // IDENTICAL — same docs, same scores, same ranks (both kernels
    // order score DESC, doc_id ASC).
    val exact = Retrieval.sparseTopK(spark, sfDir, k = 20)
      .filter(col("j_x1000") > 0).cache()
    val indexed = Retrieval.sparseTopKIndexed(spark, sfDir, k = 20).cache()
    assert(exact.count() > 0, "corpus must produce positive-Jaccard pairs")
    assert(exact.except(indexed).count() == 0 &&
      indexed.except(exact).count() == 0,
      "indexed candidates must reproduce the exact leg on J > 0 rows")
    exact.unpersist(); indexed.unpersist()
  }

  test("indexed sparse leg: df cap drops only ubiquitous-token candidates") {
    // k large enough to disable truncation: under top-k a cap could
    // PROMOTE a doc that missed the uncapped top-20, so the subset
    // property only holds on the full candidate sets
    val uncapped = Retrieval.sparseTopKIndexed(spark, sfDir, k = 1000)
      .select("query_id", "neighbor_id", "j_x1000").cache()
    val capped = Retrieval.sparseTopKIndexed(spark, sfDir, k = 1000, maxDf = 50L)
      .select("query_id", "neighbor_id", "j_x1000").cache()
    assert(capped.except(uncapped).count() == 0,
      "a df cap can only remove candidates, never invent or rescore them")
    assert(capped.count() > 0, "a 50-doc df cap must not empty the corpus")
    uncapped.unpersist(); capped.unpersist()
  }

  test("index recall matrix: exact control at 100, all rows bounded, uniform query count") {
    val rows = Retrieval.qIndexRecall(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("exact", "lsh", "ivf", "pq", "ivf_pq",
      "int8_cascade", "pca_cascade", "pq_cascade"))
    val (nq, meanE, minE) = rows("exact")
    assert(meanE == 100L && minE == 100L, "exact-vs-exact control must be perfect")
    rows.values.foreach { case (n, mean, mn) =>
      assert(n == nq, "every index evaluates the same query batch")
      assert(mean >= 0 && mean <= 100 && mn >= 0 && mn <= mean)
    }
    // the IVF row must agree with E11's per-query report aggregated
    val e11 = Retrieval.qAnnRecall(spark, sfDir).collect()
    val e11Mean = e11.map(_.getAs[Long]("recall_x100")).sum / e11.length
    assert(rows("ivf")._2 == e11Mean, "matrix row must equal the E11 aggregate")
    // the cascade argument: each exact-rescore cascade at least matches
    // the raw index its stage 1 builds on (rescoring never loses)
    assert(rows("pq_cascade")._2 >= rows("pq")._2,
      "PQ+refine must beat (or match) raw ADC ranking")
    assert(rows("int8_cascade")._2 >= 90L && rows("pca_cascade")._2 >= 80L,
      "the cascades must hold deployment-grade recall")
  }

  test("mmr: rank 1 is the most relevant; λ=1 degenerates to relevance order") {
    val pure = Retrieval.qMmrDiversify(spark, sfDir, lambda = 1.0).cache()
    val dense = Retrieval.denseTopK(spark, sfDir, k = 20)
      .filter(col("rank") <= 10).cache()
    // with no diversity term the MMR order IS the relevance order
    val mismatch = pure
      .join(dense,
        pure("query_id") === dense("query_id") &&
          pure("mmr_rank") === dense("rank") &&
          pure("doc_id") =!= dense("neighbor_id"))
    assert(mismatch.count() == 0, "λ=1 must reproduce the dense ranking")
    // λ=0.7: first pick is still the relevance argmax (no selected set yet)
    val mmr = Retrieval.qMmrDiversify(spark, sfDir, lambda = 0.7).cache()
    val firstMismatch = mmr.filter(col("mmr_rank") === 1)
      .join(dense.filter(col("rank") === 1),
        mmr("query_id") === dense("query_id") &&
          mmr("doc_id") =!= dense("neighbor_id"))
    assert(firstMismatch.count() == 0, "rank-1 pick is the relevance top-1")
    // determinism
    val again = Retrieval.qMmrDiversify(spark, sfDir, lambda = 0.7)
    assert(mmr.except(again).count() == 0 && again.except(mmr).count() == 0)
    pure.unpersist(); dense.unpersist(); mmr.unpersist()
  }

  test("mmr demotes a planted near-duplicate below a diverse pick") {
    import spark.implicits._
    // query q=0 with candidates: a (sim .9), a' (sim .89, clone of a),
    // b (sim .5, orthogonal). Pure relevance orders a, a', b; MMR with
    // λ=0.7 must pick a then b (a' pays .3 × ~1.0 clone penalty).
    val cand = Seq(
      (0L, 10L, 0.90, Seq(1.0, 0.0, 0.0)),
      (0L, 11L, 0.89, Seq(0.999, 0.01, 0.0)),
      (0L, 12L, 0.50, Seq(0.0, 1.0, 0.0)))
      .toDF("query_id", "neighbor_id", "sim", "nvec")
    val picks = Retrieval.mmrSelect(cand, lambda = 0.7, pick = 3)
      .orderBy("mmr_rank").collect()
    assert(picks.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 12L, 11L),
      s"expected relevant-then-diverse, got ${picks.mkString(",")}")
  }

  test("ann recall: self-recall is 100, report is bounded and integer") {
    val exact = LlmOps.qAnnTopK(spark, sfDir)
      .select(col("query_id"), col("neighbor_id")).cache()
    val self = Retrieval.recallReport(exact, exact)
    assert(self.filter(col("recall_x100") =!= 100).count() == 0,
      "exact vs itself must be perfect recall")
    val out = Retrieval.qAnnRecall(spark, sfDir).cache()
    assert(out.filter(col("recall_x100") < 0 || col("recall_x100") > 100).count() == 0)
    assert(out.filter(col("n_overlap") > col("n_exact")).count() == 0)
    // the IVF index at nprobe=4 of 16 cells should not be useless
    val mean = out.agg(avg("recall_x100")).head().getDouble(0)
    assert(mean >= 50.0, s"mean recall@10 suspiciously low: $mean")
    exact.unpersist(); out.unpersist()
  }

  test("embedding norms: buckets reconcile with a brute-force recompute, totals close") {
    val out = LlmOps.qEmbeddingNorms(spark, sfDir).collect()
      .map(r => r.getAs[Long]("norm_bucket") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_zero"),
          r.getAs[Double]("min_norm"), r.getAs[Double]("max_norm"))).toMap
    val vecs = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .select("embedding").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding"))
    assert(out.values.map(_._1).sum == vecs.length.toLong)
    val brute = vecs.map { v =>
      // same left-to-right float→double fold as the Column expression
      var acc = 0.0
      v.foreach(x => acc += x.toDouble * x.toDouble)
      math.sqrt(acc)
    }
    val bruteBuckets = brute.groupBy(n => math.floor(n * 10.0).toLong)
    assert(out.keySet == bruteBuckets.keySet)
    out.foreach { case (b, (n, nZero, mn, mx)) =>
      val g = bruteBuckets(b)
      assert(n == g.length.toLong)
      assert(nZero == g.count(_ == 0.0).toLong)
      def r4(d: Double) = BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).doubleValue
      assert(mn == r4(g.min) && mx == r4(g.max), s"bucket $b bounds")
    }
    // every bucket's [min, max] stays inside the bucket's range
    out.foreach { case (b, (_, _, mn, mx)) =>
      assert(mn >= b / 10.0 - 1e-4 && mx < (b + 1) / 10.0 + 1e-4)
    }
  }
}
