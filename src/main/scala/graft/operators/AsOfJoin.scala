package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — for every left row, the single latest right row
  * of the same key with `rightTime <= leftTime` (or strictly `<`), the
  * time-series enrichment operator warehouses bolt on (DuckDB/kdb ASOF
  * JOIN; Flink temporal join). Spark has no native operator, and the naive
  * formulations are scale-broken: an inequality theta-join explodes to
  * every (left, earlier-right) pair before aggregation, and a per-left-row
  * subquery never distributes.
  *
  * Composition instead (preference (a) of the custom-operator ladder —
  * built-ins express the semantics exactly): tag and union both sides,
  * hash-shuffle ONCE on the key, sort each key's rows by (time,
  * side-order), and carry the right payload forward with
  * `last(_, ignoreNulls = true)` over rows-unbounded-preceding — each left
  * row then reads the latest right payload at-or-before it, left rows with
  * no prior right keep NULLs (left-outer semantics). Cost: one shuffle +
  * one per-key sort, rows = |L| + |R|; no pair blowup at any scale. A
  * pathologically hot key serializes its own sort (the general window
  * caveat) — pre-aggregate the right side per (key, time) first, which the
  * determinism contract wants anyway.
  *
  * Ties: at equal time the right row sorts before (inclusive, `ts >= rts`)
  * or after (strict, `ts > rts`) the left row via the side-order column.
  * Determinism contract: `right` must be unique per (key, time) —
  * pre-aggregate duplicates (e.g. max payload per instant); otherwise
  * "latest" among equal instants is tie-broken arbitrarily.
  */
object AsOfJoin {

  /** `left` keeps ALL its columns; `right` contributes `carryCols`.
    * `right` columns: keyCol, rightTime, carryCols. Output: left columns ++
    * carryCols (null where no right row qualifies). */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, carryCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    // side order: right rows first at equal time for inclusive (<=)
    // semantics, after for strict (<)
    val rightOrder = if (strict) 1 else -1
    // the right payload rides as ONE struct so `last(..., ignoreNulls)`
    // selects the latest right ROW atomically: carrying columns
    // independently would let a NULL field in the latest row fall through
    // to an older row's value — output rows that never existed (and a
    // divergence from ASOF JOIN semantics, which return the latest row's
    // NULL as-is). The struct itself is never null for right rows, so
    // ignoreNulls skips only the left rows' placeholder.
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(carryCols.map(c => right.schema(c)))
    val rTagged = right.select(
      col(keyCol).as("__key"), col(rightTime).as("__t"), lit(rightOrder).as("__side"),
      lit(null).cast(lType).as("__l"),
      struct(carryCols.map(col): _*).as("__r"))
    val lTagged = left.select(
      col(keyCol).as("__key"), col(leftTime).as("__t"), lit(0).as("__side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionAll(rTagged)
      .select(col("__side"), col("__l"),
        last(col("__r"), ignoreNulls = true).over(w).as("__carried"))
      .filter(col("__side") === 0)
      .select(left.columns.toIndexedSeq.map(c => col(s"__l.`$c`").as(c)) ++
        carryCols.map(c => col(s"__carried.`$c`").as(c)): _*)
  }

  /** FORWARD as-of: for every left row, the single EARLIEST right row of
    * the same key with `rightTime >= leftTime` (strict: `>`) — the
    * mirror image of [[asOf]] (pandas merge_asof direction='forward';
    * e.g. attribute each click to the user's next purchase). Same plan:
    * one key shuffle, one per-key sort, `first(_, ignoreNulls)` over
    * current-row-to-unbounded-FOLLOWING. Ties: at equal time the right
    * row sorts after the left for inclusive semantics (inside the
    * forward frame) and before it for strict (outside). Same determinism
    * contract: `right` unique per (key, time). */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, carryCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    val rightOrder = if (strict) -1 else 1
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(carryCols.map(c => right.schema(c)))
    val rTagged = right.select(
      col(keyCol).as("__key"), col(rightTime).as("__t"), lit(rightOrder).as("__side"),
      lit(null).cast(lType).as("__l"),
      struct(carryCols.map(col): _*).as("__r"))
    val lTagged = left.select(
      col(keyCol).as("__key"), col(leftTime).as("__t"), lit(0).as("__side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lTagged.unionAll(rTagged)
      .select(col("__side"), col("__l"),
        first(col("__r"), ignoreNulls = true).over(w).as("__carried"))
      .filter(col("__side") === 0)
      .select(left.columns.toIndexedSeq.map(c => col(s"__l.`$c`").as(c)) ++
        carryCols.map(c => col(s"__carried.`$c`").as(c)): _*)
  }
}
