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
    val lCols = Seq(
      col(keyCol).as("__key"), col(leftTime).as("__t"), lit(0).as("__side"),
      struct(left.columns.map(col): _*).as("__l")) ++
      carryCols.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val lTagged = left.select(lCols: _*)
    val rCols = Seq(
      col(keyCol).as("__key"), col(rightTime).as("__t"), lit(rightOrder).as("__side"),
      lit(null).cast(lTagged.schema("__l").dataType).as("__l")) ++
      carryCols.map(col)
    val rTagged = right.select(rCols: _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionAll(rTagged)
      .select(Seq(col("__side"), col("__l")) ++
        carryCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
    carried.filter(col("__side") === 0)
      .select(left.columns.map(c => col(s"__l.`$c`").as(c)) ++ carryCols.map(col): _*)
  }
}
