package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — for every left row, the single latest right row
  * of the same key with `rightTime <= leftTime` (or strictly `<`), the
  * time-series enrichment operator warehouses bolt on (DuckDB/kdb ASOF
  * JOIN; Flink temporal join); [[asOfForward]] is the mirror (earliest
  * right at-or-after — pandas merge_asof direction='forward'). Spark has
  * no native operator, and the naive formulations are scale-broken: an
  * inequality theta-join explodes to every (left, earlier-right) pair
  * before aggregation, and a per-left-row subquery never distributes.
  *
  * Composition instead (preference (a) of the custom-operator ladder —
  * built-ins express the semantics exactly): tag and union both sides,
  * hash-shuffle ONCE on the key, sort each key's rows by (time,
  * side-order), and carry the right payload with
  * `last(_, ignoreNulls = true)` over rows-unbounded-preceding — each left
  * row then reads the latest right payload at-or-before it, left rows with
  * no prior right keep NULLs (left-outer semantics). The FORWARD direction
  * reverses the time sort and keeps the SAME running frame — scanning
  * times descending, "last right seen" is the earliest right at-or-after —
  * rather than switching to a current-to-unbounded-FOLLOWING frame, whose
  * physical execution (UnboundedFollowingWindowFunctionFrame) re-scans the
  * suffix per row, O(n²) on a hot key where the running frame is O(n).
  *
  * Cost: one shuffle + one per-key sort, rows = |L| + |R|; no pair blowup
  * at any scale. A pathologically hot key serializes its own sort (the
  * general window caveat) — pre-aggregate the right side per (key, time)
  * first, which the determinism contract wants anyway.
  *
  * NULL times never match: right rows with a NULL time are dropped (no
  * comparison is ever true against them), and a left row with a NULL time
  * carries NULLs (sort position must not turn `t >= NULL` into a match).
  *
  * Ties: at equal time the right row sorts inside the frame for inclusive
  * semantics and outside for strict, via the side-order column.
  * Determinism contract: `right` must be unique per (key, time) —
  * pre-aggregate duplicates (e.g. max payload per instant); otherwise
  * "latest" among equal instants is tie-broken arbitrarily.
  */
object AsOfJoin {

  private def asOfImpl(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, carryCols: Seq[String],
      strict: Boolean, forward: Boolean): DataFrame = {
    // inclusive: the equal-time right row sorts before the left row in
    // SCAN order (inside the running frame); strict: after (outside).
    // The side column encodes that identically for both directions —
    // only the time sort flips.
    val rightOrder = if (strict) 1 else -1
    // the right payload rides as ONE struct so `last(..., ignoreNulls)`
    // selects the matched right ROW atomically: carrying columns
    // independently would let a NULL field in the matched row fall
    // through to another row's value — output rows that never existed
    // (and a divergence from ASOF JOIN semantics, which return the
    // matched row's NULL as-is). The struct itself is never null for
    // right rows, so ignoreNulls skips only the left rows' placeholder.
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(carryCols.map(c => right.schema(c)))
    val rTagged = right
      .where(col(rightTime).isNotNull) // a NULL right time matches nothing
      .select(
        col(keyCol).as("__key"), col(rightTime).as("__t"), lit(rightOrder).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(carryCols.map(col): _*).as("__r"))
    val lTagged = left.select(
      col(keyCol).as("__key"), col(leftTime).as("__t"), lit(0).as("__side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val timeOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__key"))
      .orderBy(timeOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a NULL left time never matches — guard the carry (its sort
    // position would otherwise hand it whatever the frame happens to
    // hold there)
    val leftTimeNotNull = col(s"__l.`$leftTime`").isNotNull
    lTagged.unionAll(rTagged)
      .select(col("__side"), col("__l"),
        last(col("__r"), ignoreNulls = true).over(w).as("__carried"))
      .filter(col("__side") === 0)
      .select(left.columns.toIndexedSeq.map(c => col(s"__l.`$c`").as(c)) ++
        carryCols.map(c =>
          when(leftTimeNotNull, col(s"__carried.`$c`")).as(c)): _*)
  }

  /** BACKWARD as-of: for every left row, the single LATEST right row of
    * the same key with `rightTime <= leftTime` (strict: `<`). `left`
    * keeps ALL its columns; `right` contributes `carryCols` (null where
    * no right row qualifies). */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, carryCols: Seq[String],
      strict: Boolean = false): DataFrame =
    asOfImpl(left, right, keyCol, leftTime, rightTime, carryCols, strict,
      forward = false)

  /** FORWARD as-of: for every left row, the single EARLIEST right row of
    * the same key with `rightTime >= leftTime` (strict: `>`) — pandas
    * merge_asof direction='forward'; e.g. attribute each click to the
    * user's next purchase. Same one-shuffle running-frame plan, time
    * sort reversed (see object doc). */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, carryCols: Seq[String],
      strict: Boolean = false): DataFrame =
    asOfImpl(left, right, keyCol, leftTime, rightTime, carryCols, strict,
      forward = true)

  /** NEAREST as-of: for every left row, the right row of the same key
    * MINIMIZING |rightTime − leftTime|, ties broken BACKWARD — pandas
    * merge_asof direction='nearest' (sensor alignment, quote-to-trade
    * matching where the quote may land just after the trade clock).
    *
    * Still ONE shuffle: both directional carries ride the same tagged
    * union and key partitioning — the ascending-sort running frame
    * yields the latest right at-or-before, the descending-sort one the
    * earliest right at-or-after (same side ordering: right rows sort
    * before the left row at equal time in BOTH scans, so both carries
    * are inclusive and an exact-time match wins at distance 0). The
    * plan is Exchange → Sort asc → Window → Sort desc → Window: two
    * per-key sorts, never two shuffles, never a pair blowup.
    *
    * Distances compare in µs for timestamp columns (micros is the
    * engine-truncated precision — see sources.Tables), raw long
    * otherwise. Same NULL / determinism contract as [[asOf]]. */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String, carryCols: Seq[String]): DataFrame = {
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val carryAll = (carryCols :+ rightTime).distinct
    val rType = org.apache.spark.sql.types.StructType(carryAll.map(c => right.schema(c)))
    val rTagged = right
      .where(col(rightTime).isNotNull)
      .select(
        col(keyCol).as("__key"), col(rightTime).as("__t"), lit(-1).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(carryAll.map(col): _*).as("__r"))
    val lTagged = left.select(
      col(keyCol).as("__key"), col(leftTime).as("__t"), lit(0).as("__side"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val wBack = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(col("__key"))
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def micros(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }
    val rtType = right.schema(rightTime).dataType
    val ltType = left.schema(leftTime).dataType
    val leftT = micros(col(s"__l.`$leftTime`"), ltType)
    val backT = micros(col(s"__back.`$rightTime`"), rtType)
    val fwdT = micros(col(s"__fwd.`$rightTime`"), rtType)
    val chooseBack = col("__fwd").isNull ||
      (col("__back").isNotNull && (leftT - backT) <= (fwdT - leftT))
    lTagged.unionAll(rTagged)
      .select(col("__side"), col("__l"),
        last(col("__r"), ignoreNulls = true).over(wBack).as("__back"),
        last(col("__r"), ignoreNulls = true).over(wFwd).as("__fwd"))
      .filter(col("__side") === 0)
      .withColumn("__carried", when(chooseBack, col("__back")).otherwise(col("__fwd")))
      .select(left.columns.toIndexedSeq.map(c => col(s"__l.`$c`").as(c)) ++
        carryCols.map(c =>
          when(col(s"__l.`$leftTime`").isNotNull, col(s"__carried.`$c`")).as(c)): _*)
  }
}
