package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §5). AQE's skew-join handles
  * moderate runtime skew; these are the explicit escape hatches for
  * pathological keys (a boilerplate shingle band, a mega-customer) where
  * you know the skew upfront.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) computes partial
    * aggregates across `salts` partitions, then a second tiny aggregation
    * merges per key. Use for additive aggregates over heavily skewed keys —
    * the first shuffle spreads each hot key over `salts` reducers.
    *
    * `partials`: aggregations valid on the salted groups;
    * `merge`: how to combine the partial columns per key.
    */
  /** Deterministic salt from row content. Partition-id/monotonic-id salts
    * are NOT retry-safe: a recomputed upstream task can re-salt its rows
    * differently mid-aggregate and duplicate or lose rows (the SPARK-23207
    * failure class). Hashing row content is stable under recompute.
    *
    * Limitation, inherent to any retry-safe scheme: rows that are
    * byte-identical hash identically and land on one salt — no pure
    * function of content can spread them. Pass `saltOn` naming a
    * discriminating column (a unique id, a timestamp) when one exists;
    * if hot keys consist of exact clones, deduplicate or pre-aggregate
    * them first (graft.dedup.Dedup.exact) — that collapse is cheaper than
    * any salting. */
  private def contentSalt(df: DataFrame, salts: Int, saltOn: Seq[Column]): Column = {
    val basis = if (saltOn.nonEmpty) saltOn else df.columns.map(col).toSeq
    pmod(xxhash64(basis: _*), lit(salts.toLong)).cast("int")
  }

  def saltedAgg(
      df: DataFrame, key: Column, salts: Int,
      partials: Seq[Column], merge: Seq[Column],
      saltOn: Seq[Column] = Nil): DataFrame =
    df.withColumn("__salt", contentSalt(df, salts, saltOn))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("__key"))
      .agg(merge.head, merge.tail: _*)

  /** Salted broadcast of a skewed join: replicate the small side `salts`
    * times (one copy per salt value) and salt the big side's key, so a hot
    * join key fans out over `salts` tasks instead of one. Returns the
    * prepared (bigSalted, smallReplicated) pair; join on
    * `key && __salt === __salt_r`. */
  def saltForJoin(big: DataFrame, small: DataFrame, salts: Int,
      saltOn: Seq[Column] = Nil): (DataFrame, DataFrame) = {
    val bigSalted = big.withColumn("__salt", contentSalt(big, salts, saltOn))
    val smallReplicated = small.withColumn("__salt_r",
      explode(sequence(lit(0), lit(salts - 1))))
    (bigSalted, smallReplicated)
  }
}
