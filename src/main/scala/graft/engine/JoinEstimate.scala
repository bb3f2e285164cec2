package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight equi-join cardinality estimation from per-side KMV
  * sketches — answer "how big is this join?" WITHOUT running the join.
  *
  * Why it matters at 100 TB: a fact⋈fact join's output size decides the
  * whole downstream plan (shuffle partition count, whether the result
  * fits a broadcast, whether to pre-aggregate first). The engine's own
  * CBO only knows per-column NDVs from ANALYZE; a sketch pass gives the
  * INTERSECTION-aware estimate (two columns can each have 1e9 distinct
  * keys and share none). One map-side aggregate per side produces a
  * ~k-long bounded state; everything else is Column arithmetic on the
  * two one-row frames — no data-sized work after the scans.
  *
  * Method (Bar-Yossef et al. 2002 KMV + the theta-sketch intersection
  * rule): the k smallest hashes of A∪B are themselves a valid KMV sketch
  * of the union, so |A∪B| estimates from its k-th smallest hash, and the
  * fraction of that union sketch present in BOTH inputs estimates
  * J = |A∩B|/|A∪B|. Join rows then follow from the uniform-multiplicity
  * model: |A⋈B| ≈ |A∩B| · (nA/dA) · (nB/dB). The multiplicity model is
  * the one assumption (heavy-hitter keys break it — pair with F16's
  * Misra–Gries sketch when skew is suspected); the distinct-side
  * estimates carry the standard ~1/√(k−2) KMV error.
  */
object JoinEstimate {

  /** Distinct-count estimate from a [[graft.functions.kmvSketch]] array
    * (sign-flipped sorted hashes): exact when the sketch is under
    * capacity, else (k−1)/θ with θ = the k-th smallest hash mapped to
    * the unit interval. Mirrors KmvSketch.eval's non-array path. */
  def estimateFromSketch(sk: Column, k: Int): Column = {
    // flipped signed value e = unsigned hash − 2⁶³ ⇒ θ = e/2⁶⁴ + 0.5
    val theta = element_at(sk, k).cast("double") / 1.8446744073709552e19 + 0.5
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) / theta)
  }

  /** One-row per-side stats: total rows + key sketch, one map-side
    * bounded-state aggregate over the (pushed-down, pruned) key scan. */
  def sideStats(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.agg(
      count(col(keyCol)).as("n"),
      graft.functions.kmvSketch(col(keyCol), k).as("sk"))

  /** Estimate |A ⋈ B| on `aKey = bKey`. Returns ONE row:
    * (n_a, n_b, est_distinct_a, est_distinct_b, est_common_keys,
    * est_join_rows) — longs, deterministic (xxhash64 sketches).
    * The two single-row stat frames cross-join via broadcast; nothing
    * data-sized moves. */
  def estimateEquiJoin(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, k: Int = 8192): DataFrame =
    estimateFromSideStats(
      sideStats(a, aKey, k).select(col("n").as("n_a"), col("sk").as("sk_a")),
      sideStats(b, bKey, k).select(col("n").as("n_b"), col("sk").as("sk_b")),
      k)

  /** [[estimateEquiJoin]] over PRE-COMPUTED per-side stat frames — the
    * catalog-statistics deployment shape (ANALYZE runs once and persists;
    * estimation is pure arithmetic over the stored one-row frames). The
    * round-14 pinned-artifact faces feed this from
    * [[graft.queries.LlmOps.pinnedFrame]] so the DuckDB oracle can
    * replay the estimator from the same stored sketches. */
  def estimateFromSideStats(sa: DataFrame, sb: DataFrame, k: Int): DataFrame = {
    val u = array_sort(array_union(col("sk_a"), col("sk_b")))
    val unionK = slice(u, 1, k)
    val dU = when(size(u) < k, size(u).cast("double"))
      .otherwise(estimateFromSketch(unionK, k))
    val interFrac = when(size(unionK) === 0, lit(0.0))
      .otherwise(size(array_intersect(unionK,
        array_intersect(col("sk_a"), col("sk_b")))).cast("double")
        / size(unionK))
    val dA = estimateFromSketch(col("sk_a"), k)
    val dB = estimateFromSketch(col("sk_b"), k)
    val common = interFrac * dU
    sa.crossJoin(sb)
      .select(
        col("n_a"), col("n_b"),
        round(dA).cast("long").as("est_distinct_a"),
        round(dB).cast("long").as("est_distinct_b"),
        round(common).cast("long").as("est_common_keys"),
        round(common
          * (col("n_a").cast("double") / dA)
          * (col("n_b").cast("double") / dB)).cast("long")
          .as("est_join_rows"))
  }

  /** Skew-aware variant: heavy-hitter keys (per-side Misra–Gries sketch,
    * F16's aggregate) contribute their EXACT-ish cA(k)·cB(k) products;
    * the uniform-multiplicity model only covers the residual. This is
    * what makes self-join / fact⋈fact size prediction honest under Zipf
    * keys — Σc(k)² is dominated by the head the uniform model averages
    * away.
    *
    * A key counts as heavy only when its stored count clears the MG
    * noise floor n/(kHH+1) on BOTH sides — below it, survivors of the
    * decrement process carry junk counts and the residual model is the
    * better estimate (uniform inputs therefore reduce to
    * [[estimateEquiJoin]]'s answer). MG counts under-estimate by ≤ the
    * same floor, so the heavy part is conservative. Still one bounded
    * aggregate per side (k + kHH state), still nothing data-sized after
    * the scans. */
  def estimateEquiJoinSkewAware(a: DataFrame, aKey: String, b: DataFrame,
      bKey: String, k: Int = 8192, kHH: Int = 256): DataFrame =
    estimateSkewFromSideStats(
      skewSideStats(a, aKey, k, kHH)
        .select(col("n").as("n_a"), col("sk").as("sk_a"), col("hh").as("hh_a")),
      skewSideStats(b, bKey, k, kHH)
        .select(col("n").as("n_b"), col("sk").as("sk_b"), col("hh").as("hh_b")),
      k, kHH)

  /** One-row per-side stats for the skew-aware estimator: rows + KMV
    * sketch + Misra–Gries heavy-hitter map. */
  def skewSideStats(df: DataFrame, keyCol: String, k: Int, kHH: Int): DataFrame =
    df.agg(
      count(col(keyCol)).as("n"),
      graft.functions.kmvSketch(col(keyCol), k).as("sk"),
      graft.functions.freqItems(col(keyCol).cast("string"), kHH).as("hh"))

  /** [[estimateEquiJoinSkewAware]] over pre-computed stat frames (see
    * [[estimateFromSideStats]]). */
  def estimateSkewFromSideStats(sa: DataFrame, sb: DataFrame,
      k: Int, kHH: Int): DataFrame = {
    val u = array_sort(array_union(col("sk_a"), col("sk_b")))
    val unionK = slice(u, 1, k)
    val dU = when(size(u) < k, size(u).cast("double"))
      .otherwise(estimateFromSketch(unionK, k))
    val interFrac = when(size(unionK) === 0, lit(0.0))
      .otherwise(size(array_intersect(unionK,
        array_intersect(col("sk_a"), col("sk_b")))).cast("double")
        / size(unionK))
    val dA = estimateFromSketch(col("sk_a"), k)
    val dB = estimateFromSketch(col("sk_b"), k)
    val common = interFrac * dU
    val floorA = col("n_a").cast("double") / (kHH + 1)
    val floorB = col("n_b").cast("double") / (kHH + 1)
    val bVal = (e: Column) =>
      coalesce(element_at(col("hh_b"), e.getField("key")), lit(0L))
    val both = filter(map_entries(col("hh_a")), e =>
      e.getField("value").cast("double") >= floorA &&
        bVal(e).cast("double") >= floorB)
    val hhRows = aggregate(both, lit(0.0), (acc, e) =>
      acc + e.getField("value").cast("double") * bVal(e).cast("double"))
    val hhKeys = size(both).cast("double")
    val hhMassA = aggregate(both, lit(0L), (acc, e) =>
      acc + e.getField("value")).cast("double")
    val hhMassB = aggregate(both, lit(0L), (acc, e) =>
      acc + bVal(e)).cast("double")
    val dAr = dA - hhKeys
    val dBr = dB - hhKeys
    val commonR = greatest(common - hhKeys, lit(0.0))
    val resRows = when(dAr > 0.0 && dBr > 0.0,
      commonR * (greatest(col("n_a").cast("double") - hhMassA, lit(0.0)) / dAr)
        * (greatest(col("n_b").cast("double") - hhMassB, lit(0.0)) / dBr))
      .otherwise(lit(0.0))
    sa.crossJoin(sb)
      .select(
        col("n_a"), col("n_b"),
        round(dA).cast("long").as("est_distinct_a"),
        round(dB).cast("long").as("est_distinct_b"),
        round(common).cast("long").as("est_common_keys"),
        hhKeys.cast("long").as("hh_common_keys"),
        round(hhRows + resRows).cast("long").as("est_join_rows"))
  }
}
