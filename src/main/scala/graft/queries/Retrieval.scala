package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.functions.{cosineSim, topKByScore}
import graft.sources.Tables

/** Retrieval-stack operators (SURVEY.md §2 E9–E11): hybrid rank
  * fusion, diversity re-ranking, and index-quality evaluation — the
  * ops between "an ANN index exists" and "retrieval you'd ship"
  * (RAG context selection, retrieval-based curation, hard-negative
  * pipelines). Reference analog: none — LLM-brief extension.
  */
object Retrieval {

  /** The query batch: every `queryMod`-th vector. The REGISTERED
    * queries fix queryMod=50 (so the oracle-checked face and the
    * corpus grow together — an exact-baseline stress the bench keeps
    * honest); deployment and the scale smoke bound the batch instead
    * (a retrieval batch is a request-side quantity, not a corpus-side
    * one — Q×N with Q ∝ N is quadratic by construction). */
  private def queryVecs(spark: SparkSession, dir: String, queryMod: Long): DataFrame =
    Tables.table(spark, dir, "embeddings")
      .filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), Ann.asDouble(col("embedding")).as("qvec"))

  /** Dense candidate list: exact cosine top-`k` per query, E1's shape
    * (queries broadcast, corpus streams, per-query bounded heap), but
    * KEEPING the similarity for downstream re-rankers. */
  private[queries] def denseTopK(spark: SparkSession, dir: String, k: Int,
      queryMod: Long = 50): DataFrame = {
    val corpus = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), Ann.asDouble(col("embedding")).as("emb"))
    corpus.join(broadcast(queryVecs(spark, dir, queryMod)), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineSim(col("qvec"), col("emb")).as("sim"))
      .groupBy("query_id")
      .agg(topKByScore(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nbr")))
      .select(col("query_id"), col("nbr.neighbor_id").as("neighbor_id"),
        col("nbr.sim").as("sim"), (col("pos") + 1).cast("long").as("rank"))
  }

  /** Sparse candidate list: token-SET Jaccard (×1000, integer) top-`k`
    * per query doc — the lexical leg of hybrid retrieval. Same
    * broadcast shape as the dense leg. Tokens reduce ONCE per doc to a
    * sorted distinct polyhash array, so each pair scores with the
    * fused merge-only [[graft.functions.longSetJaccardSorted]] kernel
    * (O(|A|+|B|) long compares — the string-array `array_intersect`
    * formulation cost 6.6s at sf0.1, the hashed merge ~1s; same D4
    * trade: a cross-token polyhash collision could perturb a count,
    * vocabulary-bounded odds ~V²/2³¹ — polyhash folds mod 2³¹−1, so the
    * birthday bound is over a 31-bit space). At 100 TB the
    * all-candidates product swaps for [[sparseTopKIndexed]]. */
  private[queries] def sparseTopK(spark: SparkSession, dir: String, k: Int,
      queryMod: Long = 50): DataFrame =
    sparseTopKFrom(docTokenSets(spark, dir), k, queryMod)

  /** [[sparseTopK]] over a caller-provided (doc_id, t) token-set frame —
    * the shared core; ScaleSmoke drives it on synthesized corpora. */
  private[graft] def sparseTopKFrom(toks: DataFrame, k: Int,
      queryMod: Long): DataFrame = {
    val qt = toks.filter(col("doc_id") % queryMod === 0)
      .select(col("doc_id").as("query_id"), col("t").as("qt"))
    toks.join(broadcast(qt), col("query_id") =!= col("doc_id"))
      .select(col("query_id"), col("doc_id"),
        graft.functions.longSetJaccardSorted(col("qt"), col("t"))
          .cast("double").as("j_x1000"))
      .groupBy("query_id")
      .agg(topKByScore(col("j_x1000"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nbr")))
      .select(col("query_id"), col("nbr.neighbor_id").as("neighbor_id"),
        col("nbr.sim").cast("long").as("j_x1000"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Per-doc sorted distinct token-hash set — the shared reduction both
    * sparse legs score with. */
  private def docTokenSets(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        sort_array(array_distinct(transform(split(col("text"), " "),
          t => graft.functions.polyhash(t)))).as("t"))

  /** [[sparseTopK]]'s 100 TB form: inverted-index candidate generation
    * instead of the Q×N product. Only docs sharing ≥1 token with the
    * query can have Jaccard > 0, so candidates come from a posting-list
    * equi-join (token → doc, F21's pattern): explode doc token sets,
    * equi-join on the query batch's exploded tokens, dedupe the
    * (query, doc) pairs, then score ONLY those pairs with the same
    * fused merge kernel. Every join is an equi-join — no
    * BroadcastNestedLoopJoin anywhere in the plan (PlanSpec pins this),
    * and the work is ∝ Σ_t df(t)·qf(t) over SHARED tokens, not Q×N.
    *
    * Output contract: identical to [[sparseTopK]] restricted to rows
    * with quantized Jaccard > 0 (RetrievalSpec proves it) — the exact
    * leg can pad its top-k with unrelated score-0 docs, the indexed leg
    * by construction cannot; both rank score DESC, doc_id ASC, so the
    * positive-score prefix agrees rank-for-rank.
    *
    * `maxDf` drops tokens with document frequency above the cap from
    * CANDIDATE GENERATION only (scoring still uses the full arrays) —
    * the standard stop-word hatch: at corpus scale a ubiquitous token's
    * posting list is ~N and contributes candidates that almost all
    * score near 0. The over-cap token set is small by construction
    * (bounded by corpus-tokens / maxDf), so it broadcasts as an
    * anti-join. Uncapped by default so the parity contract is exact. */
  private[graft] def sparseTopKIndexed(spark: SparkSession, dir: String, k: Int,
      queryMod: Long = 50, maxDf: Long = Long.MaxValue): DataFrame =
    sparseTopKIndexedFrom(docTokenSets(spark, dir), k, queryMod, maxDf,
      postingOverride = Some(postingIndex(spark, dir)))

  /** Session-memoized posting-list index per (session, dir) — the
    * sparse leg's build-once artifact, same amortization contract as
    * E2's bucketed corpus and E3's IVF assignment (the 50×/100×
    * crossover measurement says the build cost is exactly what a
    * query batch amortizes): (doc_id, tok) exploded once, persisted,
    * reused by every subsequent batch in the session. */
  private[graft] val postingCache =
    new graft.engine.IndexCache[(Int, String), DataFrame](
      sys.env.getOrElse("SPARK_GRAFT_INDEX_CACHE_CAP", "64").toInt)(
      df => { df.unpersist(); () })
  def postingIndex(spark: SparkSession, dir: String): DataFrame =
    postingCache.getOrElseUpdate((System.identityHashCode(spark), dir), {
      val p = docTokenSets(spark, dir)
        .select(col("doc_id"), explode(col("t")).as("tok")).persist()
      p.count()
      p
    })

  /** Release the memoized posting indexes (LlmOps.clearAnnIndexes calls
    * this so cold measurements drop EVERY session memo). */
  private[queries] def clearPostingIndex(): Unit = postingCache.clear()

  /** [[sparseTopKIndexed]] over a caller-provided token-set frame.
    * `postingOverride` lets the dir-based face reuse the memoized
    * [[postingIndex]] instead of re-exploding per run. */
  private[graft] def sparseTopKIndexedFrom(toks: DataFrame, k: Int,
      queryMod: Long, maxDf: Long,
      postingOverride: Option[DataFrame] = None): DataFrame = {
    val qt = toks.filter(col("doc_id") % queryMod === 0)
      .select(col("doc_id").as("query_id"), col("t").as("qt"))
    val posting = postingOverride.getOrElse(
      toks.select(col("doc_id"), explode(col("t")).as("tok")))
    val capped =
      if (maxDf == Long.MaxValue) posting
      else posting.join(
        broadcast(posting.groupBy("tok").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select("tok")),
        Seq("tok"), "left_anti")
    val cand = capped
      .join(qt.select(col("query_id"), explode(col("qt")).as("tok")), "tok")
      .filter(col("query_id") =!= col("doc_id"))
      .select("query_id", "doc_id").distinct()
    cand.join(toks, "doc_id").join(broadcast(qt), "query_id")
      .select(col("query_id"), col("doc_id"),
        graft.functions.longSetJaccardSorted(col("qt"), col("t"))
          .cast("double").as("j_x1000"))
      .filter(col("j_x1000") > 0) // sharing a token can still quantize to 0
      .groupBy("query_id")
      .agg(topKByScore(col("j_x1000"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nbr")))
      .select(col("query_id"), col("nbr.neighbor_id").as("neighbor_id"),
        col("nbr.sim").cast("long").as("j_x1000"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** E9: reciprocal-rank fusion of the dense (cosine) and sparse
    * (token Jaccard) top-20 lists — the standard hybrid-retrieval
    * combiner (Cormack/Clarke/Büttcher RRF, k=60). Scores are INTEGER
    * ppb (`1e9 DIV (60+rank)`, absent list contributes 0) so the fused
    * ordering can't diverge on a float ulp between engines. The final
    * per-query top-10 runs as a Window over a frame already bounded to
    * ≤40 rows/query BY CONSTRUCTION (two rank-≤20 lists) — bounded
    * input is what makes a window scale-safe here. */
  def qRankFusion(spark: SparkSession, dir: String): DataFrame =
    rankFusion(spark, dir, queryMod = 50)

  /** [[qRankFusion]] with the sparse leg swapped for the inverted-index
    * candidate path ([[sparseTopKIndexed]]) — the form that survives
    * 100 TB: no Q×N product anywhere. Differs from [[qRankFusion]] only
    * where the exact leg padded its sparse top-20 with score-0 docs
    * (which contribute rank-based RRF mass the index legitimately
    * doesn't generate). [O] since round 14: the oracle is E9's
    * statement with the J > 0 predicate on the sparse leg (the posting
    * join is candidate-complete for positive scores by construction);
    * RetrievalSpec additionally proves the legs agree wherever J > 0. */
  def qRankFusionIndexed(spark: SparkSession, dir: String): DataFrame =
    rankFusion(spark, dir, queryMod = 50, indexedSparse = true)

  /** [[qRankFusion]] with a caller-bounded query batch (deployment /
    * scale-smoke face). */
  def rankFusion(spark: SparkSession, dir: String, queryMod: Long,
      indexedSparse: Boolean = false): DataFrame = {
    val d = denseTopK(spark, dir, k = 20, queryMod)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("dr"))
    val sparse =
      if (indexedSparse) sparseTopKIndexed(spark, dir, k = 20, queryMod)
      else sparseTopK(spark, dir, k = 20, queryMod)
    val s = sparse
      .select(col("query_id").as("s_query_id"),
        col("neighbor_id").as("s_neighbor_id"), col("rank").as("sr"))
    val fused = d.join(s,
        col("query_id") === col("s_query_id") &&
          col("neighbor_id") === col("s_neighbor_id"), "full_outer")
      .select(
        coalesce(col("query_id"), col("s_query_id")).as("query_id"),
        coalesce(col("neighbor_id"), col("s_neighbor_id")).as("doc_id"),
        (coalesce(expr("1000000000 DIV (60 + dr)"), lit(0L))
          + coalesce(expr("1000000000 DIV (60 + sr)"), lit(0L))).as("rrf_ppb"),
        coalesce(col("dr"), lit(0L)).as("dense_rank"),
        coalesce(col("sr"), lit(0L)).as("sparse_rank"))
    val byFused = Window.partitionBy("query_id").orderBy(col("rrf_ppb").desc, col("doc_id"))
    fused.withColumn("fr", row_number().over(byFused))
      .filter(col("fr") <= 10)
      .select("query_id", "doc_id", "rrf_ppb", "dense_rank", "sparse_rank")
      .orderBy("query_id", "doc_id")
  }

  /** E10: MMR (maximal marginal relevance) diversity re-ranking — pick
    * 10 of the dense top-20 greedily by `λ·rel(q,i) − (1−λ)·max_{j∈S}
    * sim(i,j)`: relevant results that aren't near-duplicates of ones
    * already picked (the context-window curation step of RAG; λ=0.7).
    * Greedy selection is inherently sequential PER QUERY, so it runs as
    * one `mapGroups` over a group bounded to 20 candidates × dim
    * doubles — O(k²·dim) ≈ 25k flops per query, embarrassingly parallel
    * across queries; never a driver loop, never an unbounded group.
    * Scores exported as ×1e6 integers (rounded half-even) for stable
    * downstream comparison. */
  def qMmrDiversify(spark: SparkSession, dir: String, lambda: Double = 0.7,
      queryMod: Long = 50): DataFrame = {
    val vecs = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id").as("neighbor_id"), Ann.asDouble(col("embedding")).as("nvec"))
    val cand = denseTopK(spark, dir, k = 20, queryMod)
      .join(vecs, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("nvec"))
    mmrSelect(cand, lambda, pick = 10)
      .orderBy("query_id", "mmr_rank")
  }

  /** The MMR kernel over a candidate frame (query_id, neighbor_id, sim,
    * nvec) — bounded-group greedy selection; see [[qMmrDiversify]]. */
  private[queries] def mmrSelect(cand: DataFrame, lambda: Double, pick: Int): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    cand.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("sim").cast("double"), col("nvec"))
      .as[(Long, Long, Double, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cs = it.toArray.sortBy(c => (-c._3, c._2)) // rel desc, id asc
        val n = cs.length
        def dot(a: Seq[Double], b: Seq[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }; s
        }
        def norm(a: Seq[Double]): Double = math.sqrt(dot(a, a))
        val nrm = cs.map(c => norm(c._4))
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val pairSim = Array.ofDim[Double](n, n)
        for (i <- 0 until n; j <- 0 until n if j > i) {
          val s = dot(cs(i)._4, cs(j)._4) / (nrm(i) * nrm(j))
          pairSim(i)(j) = s; pairSim(j)(i) = s
        }
        (0 until math.min(pick, n)).map { r =>
          var best = -1; var bestScore = Double.NegativeInfinity
          for (i <- 0 until n if !selected.contains(i)) {
            val div = if (selected.isEmpty) 0.0
              else selected.map(pairSim(i)).max
            val score = lambda * cs(i)._3 - (1 - lambda) * div
            // deterministic: strict improvement, first (lowest-id) wins ties
            if (score > bestScore + 1e-12 ||
                (math.abs(score - bestScore) <= 1e-12 && best >= 0 && cs(i)._2 < cs(best)._2)) {
              best = i; bestScore = score
            }
          }
          selected += best
          (qid, (r + 1).toLong, cs(best)._2, math.rint(bestScore * 1e6).toLong)
        }
      }
      .toDF("query_id", "mmr_rank", "doc_id", "mmr_score_x1e6")
  }

  /** E11: ANN index-quality evaluation — per-query recall@10 of the
    * IVF index (E3, nprobe=4) against the exact top-10 (E1): the
    * measurement you run before trusting an approximate index for
    * curation or retrieval (AnnSpec asserts the aggregate bound; this
    * operator is the per-query REPORT — which queries the index fails
    * tells you which cells are under-probed). Two rank-≤10 frames
    * joined on (query, neighbor): output is O(queries), never corpus-
    * sized. [O] since round 14: both legs replay (exact + the pinned-
    * centroid IVF), so the overlap counts and recall lanes replay. */
  def qAnnRecall(spark: SparkSession, dir: String): DataFrame =
    recallReport(
      LlmOps.qAnnTopK(spark, dir).select(col("query_id"), col("neighbor_id")),
      LlmOps.qAnnIvf(spark, dir).select(col("query_id"), col("neighbor_id")))
      .orderBy("query_id")

  /** Per-query recall of `approx` against `exact` (both: query_id,
    * neighbor_id rank lists); see [[qAnnRecall]]. */
  private[queries] def recallReport(exact: DataFrame, approx: DataFrame): DataFrame = {
    val a = approx.select(col("query_id").as("a_query_id"),
      col("neighbor_id").as("a_neighbor_id"))
    val overlap = exact.join(a,
        col("query_id") === col("a_query_id") &&
          col("neighbor_id") === col("a_neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(overlap, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("recall_x100", expr("(n_overlap * 100) DIV n_exact"))
  }

  /** E11b: the INDEX-SELECTION report — every approximate index the
    * engine ships (LSH, IVF, PQ, IVF-PQ), evaluated against the exact
    * top-10 in ONE table of (index, n_queries, mean/min recall): the
    * acceptance matrix you read before choosing which index serves a
    * workload (mean = expected quality; MIN = the worst query — a mean
    * can hide an unserved cell; E11 is the per-query drill-down for
    * whichever row looks wrong). The `exact` control row pins the
    * harness itself at 100/100. Each leg is the registered face's own
    * frame, so this measures exactly what deployments run; output is
    * O(indexes), all integer. [O] since round 14: every leg replays in
    * SQL, so the matrix oracle is the UNION of the eight leg oracles
    * (SparkEntry.indexRecallOracle). */
  def qIndexRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = LlmOps.qAnnTopK(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
      // eight report legs read the exact frame (1000 rows at sf0.1):
      // materialize once, not eight broadcast-side recomputes
      .transform(graft.engine.Materialized.checkpoint)
    val legs: Seq[(String, DataFrame)] = Seq(
      "exact" -> exact,
      "lsh" -> LlmOps.qAnnLsh(spark, dir),
      "ivf" -> LlmOps.qAnnIvf(spark, dir),
      "pq" -> LlmOps.qPqTopK(spark, dir),
      "ivf_pq" -> LlmOps.qPqIvf(spark, dir),
      // the round-11 exact-rescore cascades: int8 (E21), PCA-prefilter
      // (E23), PQ+refine (E25) — the deployment shapes, in the same
      // acceptance matrix as the raw indexes they build on
      "int8_cascade" -> LlmOps.qAnnCascade(spark, dir),
      "pca_cascade" -> LlmOps.qAnnPca(spark, dir),
      "pq_cascade" -> LlmOps.qPqCascade(spark, dir))
    legs.map { case (name, approx) =>
      recallReport(exact, approx.select(col("query_id"), col("neighbor_id")))
        .agg(count(lit(1)).as("n_queries"),
          expr("(sum(recall_x100) ) DIV count(1)").as("mean_recall_x100"),
          min(col("recall_x100")).as("min_recall_x100"))
        .select(lit(name).as("index_name"), col("n_queries"),
          col("mean_recall_x100"), col("min_recall_x100"))
    }.reduce(_.unionAll(_)).orderBy("index_name")
  }
}
