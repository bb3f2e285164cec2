package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** H13: INCREMENTAL data-card maintenance — corpus statistics as a
  * mergeable one-row STATE instead of a rescan-only report (H11).
  *
  * At 100 TB the standing corpus is never rescanned for a dashboard: a
  * new ingest batch aggregates its own state (one pass over the
  * increment), and `merge` combines states in O(state size). Every field
  * is chosen mergeable: counts/sums add, extrema take least/greatest,
  * and distinct content mass rides a KMV sketch (F6) whose merge — the
  * k smallest of the union of two k-smallest sets — equals the sketch
  * of the union EXACTLY, so incremental maintenance loses nothing over
  * recomputation (spec-pinned as bit-equality of states).
  *
  * The non-mergeable H11 fields (count DISTINCT lang — exact) are the
  * reason H11 stays the full-scan oracle twin; here languages ride the
  * sketch too (distinct estimate, exact below k).
  */
object CorpusState {

  /** One pass over `docs` → a single-row state. */
  def state(docs: DataFrame, textCol: String, k: Int = 1024): DataFrame = {
    val t = col(textCol)
    val toks = (length(t) - length(replace(t, lit(" "), lit(""))) + 1).cast("long")
    docs
      .select(
        when(t.isNotNull, toks).as("__toks"),
        when(t.isNotNull, md5(t)).as("__h"),
        col("lang").as("__lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(col("__h")).as("n_text_docs"),
        coalesce(sum(col("__toks")), lit(0L)).as("total_tokens"),
        coalesce(min(col("__toks")), lit(Long.MaxValue)).as("min_tokens"),
        coalesce(max(col("__toks")), lit(Long.MinValue)).as("max_tokens"),
        graft.functions.kmvSketch(col("__h"), k).as("content_sketch"),
        graft.functions.kmvSketch(col("__lang"), k).as("lang_sketch"))
  }

  /** Merge any number of states (standing corpus + increments) in
    * O(states × k): counts add, extrema combine, sketches union to the
    * k smallest — an EXACT KMV sketch of the union. */
  def merge(states: DataFrame, k: Int = 1024): DataFrame = {
    def mergedSketch(c: Column): Column =
      slice(array_sort(array_distinct(flatten(collect_list(c)))), 1, k)
    states.agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_text_docs")).as("n_text_docs"),
      sum(col("total_tokens")).as("total_tokens"),
      min(col("min_tokens")).as("min_tokens"),
      max(col("max_tokens")).as("max_tokens"),
      mergedSketch(col("content_sketch")).as("content_sketch"),
      mergedSketch(col("lang_sketch")).as("lang_sketch"))
  }

  /** KMV distinct estimate from a sketch column (the array form of F6's
    * scalar estimator): exact set size below capacity, (k−1)/θ beyond
    * it, θ = the kth smallest hash as a fraction of 2^64. Sketch arrays
    * store sign-flipped hashes so ascending signed order IS unsigned
    * order; flip back before the unsigned→double conversion. */
  def distinctEstimate(sketch: Column, k: Int): Column = {
    val kth = element_at(sketch, k).bitwiseXOR(lit(Long.MinValue))
    val theta = (shiftrightunsigned(kth, 1).cast("double") * 2.0 +
      (kth.bitwiseAND(lit(1L))).cast("double")) / 1.8446744073709552e19
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(round(lit((k - 1).toDouble) / theta).cast("long"))
  }

  /** Render a state to the H11-style long (metric, value) card. */
  def render(state: DataFrame, k: Int = 1024): DataFrame =
    state
      .withColumn("distinct_content_est", distinctEstimate(col("content_sketch"), k))
      .withColumn("distinct_lang_est", distinctEstimate(col("lang_sketch"), k))
      .selectExpr("""stack(7,
          'n_docs', n_docs, 'n_text_docs', n_text_docs,
          'total_tokens', total_tokens,
          'min_tokens', min_tokens, 'max_tokens', max_tokens,
          'distinct_content_est', distinct_content_est,
          'distinct_lang_est', distinct_lang_est) AS (metric, value)""")
      .orderBy("metric")
}
