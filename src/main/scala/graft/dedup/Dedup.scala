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
    * construction portable to the DuckDB oracle's 1-based lists. */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = split(text, " ")
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
    * Min-label propagation: labels start at each vertex's own id and every
    * iteration takes the min over the vertex's neighborhood ∪ itself.
    * Labels are monotone non-increasing, so convergence is detected by the
    * (cheap, distributed) label-sum fixpoint. Iterations needed = cluster
    * diameter — near-dup clusters are shallow (clone clusters are stars
    * already, per the capped candidate stages), so the default cap is
    * generous. Each iteration is one join + one aggregate hash-keyed on
    * id; `localCheckpoint` cuts the lineage so plans stay constant-size. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    try {
      var labels = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label"))
        .localCheckpoint()
      var prevSum = -1L
      var curSum = labels.agg(org.apache.spark.sql.functions.sum(col("label")))
        .first().getLong(0)
      var i = 0
      while (i < maxIter && curSum != prevSum) {
        val prop = edges.join(labels, edges("src") === labels("id"))
          .select(col("dst").as("id"), col("label"))
        val next = labels.unionAll(prop)
          .groupBy(col("id")).agg(min(col("label")).as("label"))
          .localCheckpoint()
        labels = next
        prevSum = curSum
        curSum = labels.agg(org.apache.spark.sql.functions.sum(col("label")))
          .first().getLong(0)
        i += 1
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
