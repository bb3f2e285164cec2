package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact + near-duplicate detection over document corpora — the
  * training-data-pipeline operator family (SURVEY.md §2 D-block).
  *
  * Scale notes (100 TB): every variant is one map-side pass to compute
  * per-document signatures plus a shuffle keyed on signature/band — the
  * document payload itself never joins until candidate verification, which
  * joins back by id on a tiny candidate set.
  */
object Dedup {

  /** D1: exact dedup by content hash. Hash-partitioned groupBy with
    * map-side partial aggregation; keeps the minimum id as canonical. */
  def exact(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** Word n-grams of a text column. 1-based element_at indices keep the
    * construction portable to the DuckDB oracle's 1-based lists.
    *
    * PERF: `toks` is spliced into every element_at — Catalyst does not
    * CSE an expression across lambda boundaries, so passing `split(text)`
    * here re-tokenizes the document n times PER GRAM (O(words²) per doc,
    * measured ~5s of a 6s decontamination pass). Materialize the token
    * array as its own projected column first and call
    * [[ngramsFromTokens]] on that attribute instead. */
  def wordNgrams(text: Column, n: Int): Column =
    ngramsFromTokens(split(text, " "), n)

  /** N-grams as SORTED xxhash64 values — the carry format of the Jaccard
    * verify stages: set Jaccard over hashed grams is the same similarity
    * (sets isomorphic; a 64-bit collision within one compared pair is
    * ~n²/2⁶⁴ — absent at any tested scale), 8-byte lanes shrink the
    * per-pair join-back exchange vs gram strings, and sorting ONCE here,
    * per document, lets the fused merge-only kernel
    * (functions.longSetJaccardSorted) skip its per-PAIR sort — a doc in p
    * candidate pairs would otherwise be re-sorted p times. */
  def hashedNgrams(toks: Column, n: Int): Column =
    array_sort(transform(ngramsFromTokens(toks, n), g => xxhash64(g)))

  /** N-grams over an already-tokenized array column — `toks` should be a
    * materialized attribute (one `split` per row), not an inline
    * expression. */
  def ngramsFromTokens(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, (i + lit(j)).cast("int"))): _*))
    // sequence(1, k) descends when k < 1 — short docs get no grams
    when(size(toks) < n, array().cast("array<string>")).otherwise(grams)
  }

  /** Exact Jaccard similarity of two token-array columns, scaled to x1000
    * integer (integer semantics match the oracle's `//`; double division of
    * small ints never crosses an integer boundary before the truncation). */
  def jaccardX1000(a: Column, b: Column): Column = {
    val inter = size(array_intersect(array_distinct(a), array_distinct(b)))
    val union = size(array_distinct(concat(a, b)))
    // two empty sets (docs shorter than the shingle size) are NOT dups:
    // 0/0 would be NaN and ANSI mode crashes casting NaN to long
    when(union === 0, lit(0L))
      .otherwise(((lit(1000) * inter) / union).cast("long"))
  }

  /** Connected components over near-dup pairs: (id, cluster_id) where the
    * cluster id is the minimum member id — turns pairwise output (D2/D3/
    * D5) into actionable dedup groups.
    *
    * Two execution paths, chosen by pair count (the same judgment call as
    * a broadcast threshold):
    *  - at or below `driverThreshold` pairs: union-find on the driver —
    *    the pair list is broadcast-scale data and an iterative fixpoint
    *    of Spark jobs is pure scheduling overhead at that size (measured
    *    5s+ for a 438-pair graph);
    *  - above it: distributed min-label propagation — labels start at
    *    each vertex's own id, every step takes the min over the
    *    neighborhood ∪ self (two hops per checkpointed step); labels are
    *    monotone non-increasing so the (cheap, distributed) label-sum
    *    fixpoint detects convergence. Steps needed = cluster diameter /
    *    2 — near-dup clusters are shallow (clone clusters arrive as
    *    stars from the capped candidate stages). `localCheckpoint` cuts
    *    lineage so plans stay constant-size. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      driverThreshold: Long = 1000000L, strict: Boolean = false): DataFrame = {
    // ids normalized to long so BOTH paths emit the same schema regardless
    // of which side of the threshold the input lands on
    val normalized = pairs.select(
      col("id_a").cast("long").as("id_a"), col("id_b").cast("long").as("id_b"))
    // cache across the size probe and the chosen path's first pass — but
    // never touch a caller-managed cache (persist is not ref-counted; an
    // unconditional unpersist here would evict the caller's copy)
    val callerCached = pairs.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached = if (callerCached) normalized else normalized.persist()
    try {
      val probeLimit = math.min(driverThreshold + 1, Int.MaxValue.toLong).toInt
      if (cached.limit(probeLimit).count() <= driverThreshold)
        connectedComponentsLocal(cached)
      else connectedComponentsDistributed(cached, maxIter, strict)
    } finally if (!callerCached) { cached.unpersist(); () }
  }

  /** Driver union-find with iterative find + path compression (recursion
    * would overflow the stack on adversarially-ordered long chains);
    * output identical to the distributed path (cluster_id = min member). */
  private def connectedComponentsLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var cur = x // second pass: compress the chain onto the root
      while (cur != root) { val next = parent(cur); parent(cur) = root; cur = next }
      root
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val vertices = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    vertices.map(v => (v, find(v))).toSeq.toDF("id", "cluster_id")
  }

  private def connectedComponentsDistributed(pairs: DataFrame, maxIter: Int,
      strict: Boolean = false): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    try {
      var labels = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label"))
        .transform(graft.engine.Materialized.checkpoint)
      // sum(label) over an empty frame is null → coalesce (empty pair
      // input is legal: zero near-dups found)
      def labelSum(df: DataFrame): Long =
        df.agg(coalesce(org.apache.spark.sql.functions.sum(col("label")), lit(0L)))
          .first().getLong(0)
      var prevSum = -1L
      var curSum = labelSum(labels)
      var i = 0
      while (i < maxIter && curSum != prevSum) {
        // two propagation hops per checkpointed step: iteration count is
        // bounded by graph diameter, but the wall cost at small scale is
        // fixed job overhead per step — batching hops halves it while the
        // sum-fixpoint check stays exact (sums are monotone under hops)
        var l = labels
        for (_ <- 0 until 2) {
          val prop = edges.join(l, edges("src") === l("id"))
            .select(col("dst").as("id"), col("label"))
          l = l.unionAll(prop)
            .groupBy(col("id")).agg(min(col("label")).as("label"))
        }
        labels = l.transform(graft.engine.Materialized.checkpoint)
        prevSum = curSum
        curSum = labelSum(labels)
        i += 1
      }
      if (curSum != prevSum) {
        // for DEDUP a split component is a safe degrade (fewer merges,
        // never a wrong merge); for a components REPORT it is silently
        // wrong output — strict callers fail loudly instead
        if (strict) throw new IllegalStateException(
          s"connectedComponents did not converge within $maxIter steps " +
            s"(${2 * maxIter} hops) and strict=true: raise maxIter " +
            "(iterations needed ≈ graph diameter / 2)")
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"connectedComponents did not converge within $maxIter steps " +
            s"(${2 * maxIter} hops): returning partially-merged clusters " +
            "(conservative — components may be split, never wrongly " +
            "merged). Raise maxIter for deeper graphs.")
      }
      labels.select(col("id"), col("label").as("cluster_id"))
    } finally edges.unpersist()
  }

  /** Keep one document per near-dup cluster (the minimum id), dropping the
    * rest — the "apply" step of near-dedup. Documents in no pair survive
    * untouched (left-anti against the non-canonical members only). */
  def keepCanonical(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("__loser"))
    docs.join(losers, docs(idCol) === col("__loser"), "left_anti")
  }
}
