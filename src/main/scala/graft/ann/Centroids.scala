package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{cosineSim, vectorSum}

/** Per-group embedding centroids and distance-to-centroid scoring — the
  * curation step that catches mislabeled / off-cluster vectors: a sample
  * whose cosine to its own label's centroid is low is a labeling or
  * embedding outlier (the same signal contrastive-data pipelines use to
  * prune noisy pairs).
  *
  * Plan: ONE aggregate over the vectors (VectorSum partials — a dim-length
  * buffer per group per partition crosses the shuffle, not N×dim exploded
  * rows), centroids then BROADCAST back onto the vector scan (group
  * cardinality = labels, always tiny next to the corpus), and the cosine
  * is a map-side codegen expression. Total cost: one pass + one shuffle of
  * groups×dim, regardless of corpus size. Downstream top-k "worst
  * offenders per label" composes with functions.topKByScore over the
  * negated score — no global sort.
  */
object Centroids {

  /** Mean vector per group: (groupCol, centroid array<double>, n). */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), Ann.asDouble(col(vecCol)).as("__v"))
      .groupBy(col(groupCol))
      .agg(vectorSum(col("__v")).as("__sum"), count(col("__v")).as("n"))
      .select(col(groupCol),
        transform(col("__sum"), x => x / col("n")).as("centroid"), col("n"))

  /** E16: intra-group embedding DIVERSITY without materializing a single
    * pair — the sum identity `Σ_{i≠j} vᵢ·vⱼ = ‖Σv‖² − Σ‖vᵢ‖²` turns the
    * Θ(n²) mean-pairwise-dot (the batch-diversity metric curation uses
    * to detect mode collapse: near-duplicate clusters read high, diverse
    * groups read low) into ONE VectorSum aggregate — the same
    * groups×dim shuffle as a centroid, at ANY group size. Output per
    * group: n, mean pairwise dot, mean self dot (the ‖v‖² scale
    * reference that makes the pairwise number interpretable). Groups of
    * one vector are dropped (no pairs to speak of). */
  def diversity(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val v = Ann.asDouble(col(vecCol))
    df.select(col(groupCol), v.as("__v"))
      .groupBy(col(groupCol))
      .agg(vectorSum(col("__v")).as("__s"), count(lit(1)).as("n_vectors"),
        sum(expr("aggregate(__v, 0.0d, (a, x) -> a + x * x)")).as("__selfdot"))
      .filter(col("n_vectors") > 1)
      .select(col(groupCol), col("n_vectors"),
        round(expr("(aggregate(__s, 0.0d, (a, x) -> a + x * x) - __selfdot)" +
          " / (CAST(n_vectors AS DOUBLE) * (n_vectors - 1))"), 6)
          .as("mean_pair_dot"),
        round(col("__selfdot") / col("n_vectors"), 6).as("mean_self_dot"))
  }

  /** E17: per-DIMENSION moment profile of an embedding column — the
    * dead/dominant-dimension health check (a dimension with ~zero
    * variance is wasted capacity and a symptom of a collapsed or
    * truncated encoder; one with outsized variance dominates every
    * distance): two VectorSum aggregates (values and squares) in ONE
    * pass — dim-length buffers cross the shuffle, never N×dim rows —
    * then a dims-sized explode. Complements E12 (per-vector norms) on
    * the other axis of the matrix. */
  def dimProfile(df: DataFrame, vecCol: String): DataFrame = {
    val v = Ann.asDouble(col(vecCol))
    df.select(v.as("__v"))
      .agg(count(lit(1)).as("n_vectors"),
        vectorSum(col("__v")).as("__s"),
        vectorSum(expr("transform(__v, x -> x * x)")).as("__s2"))
      .select(col("n_vectors"),
        posexplode(arrays_zip(col("__s"), col("__s2"))))
      .select((col("pos") + 1).cast("long").as("dim"), col("n_vectors"),
        round(col("col.__s") / col("n_vectors"), 6).as("mean"),
        round(col("col.__s2") / col("n_vectors")
          - pow(col("col.__s") / col("n_vectors"), 2), 6).as("variance"))
  }

  /** E18: CENTROID MARGIN — which classes are CONFUSABLE: per vector,
    * the cosine to its own label's centroid minus the best cosine to
    * any OTHER label's centroid (negative margin = the vector sits
    * closer to a foreign class than its own — the multi-class
    * generalization of E5's single-centroid mislabel score), reported
    * per label as mean margin and confused count. Plan: one centroid
    * aggregate (groups×dim), centroids BROADCAST back onto the vector
    * scan with a labels-bounded expansion (|labels| cosines per vector,
    * map-side codegen), one conditional aggregate per vector, one tiny
    * per-label rollup — no pair join, no window. The confused count
    * uses a −1e-9 threshold so a last-ulp centroid difference between
    * engines cannot flip a boundary vector. */
  def centroidMargins(df: DataFrame, groupCol: String, vecCol: String,
      idCol: String): DataFrame = {
    val cents = centroids(df, groupCol, vecCol)
      .select(col(groupCol).as("__clabel"), col("centroid"))
    val scored = df
      .select(col(idCol), col(groupCol), Ann.asDouble(col(vecCol)).as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("__cos", cosineSim(col("__v"), col("centroid")))
      .groupBy(col(idCol), col(groupCol))
      .agg(max(when(col(groupCol) === col("__clabel"), col("__cos"))).as("__own"),
        max(when(col(groupCol) =!= col("__clabel"), col("__cos"))).as("__other"))
      .withColumn("__margin", col("__own") - col("__other"))
    scored.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_vectors"),
        round(avg(col("__margin")), 6).as("mean_margin"),
        sum(when(col("__margin") < -1e-9, 1L).otherwise(0L)).as("n_confused"))
  }

  /** Drift between two cohorts' centroids per group: ONE aggregate pass
    * with conditional VectorSums (null inputs skip, so `when(cohort, v)`
    * routes each row to exactly one sum — no second scan, no cohort
    * self-join). Output: (groupCol, n_a, n_b, cos_ab). Groups missing a
    * cohort emit NULL cos_ab (0-length sum ⇒ NULL centroid). */
  def cohortDrift(df: DataFrame, groupCol: String, vecCol: String,
      cohortACol: String): DataFrame = {
    val v = Ann.asDouble(col(vecCol))
    val isA = col(cohortACol)
    df.groupBy(col(groupCol))
      .agg(
        graft.functions.vectorSum(when(isA, v)).as("__sa"),
        count(when(isA, 1)).as("n_a"),
        graft.functions.vectorSum(when(!isA, v)).as("__sb"),
        count(when(!isA, 1)).as("n_b"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        round(cosineSim(
          transform(col("__sa"), x => x / col("n_a")),
          transform(col("__sb"), x => x / col("n_b"))), 4).as("cos_ab"))
  }

  /** Every vector scored against its own group's centroid:
    * (idCol, groupCol, cos_centroid). */
  def scoreAgainstCentroid(df: DataFrame, idCol: String, groupCol: String,
      vecCol: String): DataFrame = {
    val cents = centroids(df, groupCol, vecCol)
    df.select(col(idCol), col(groupCol), Ann.asDouble(col(vecCol)).as("__v"))
      .join(broadcast(cents), groupCol)
      .select(col(idCol), col(groupCol),
        round(cosineSim(col("__v"), col("centroid")), 4).as("cos_centroid"))
  }
}
