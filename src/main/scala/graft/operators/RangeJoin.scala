package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: for every left row, ALL right rows with the same
  * key whose timestamp falls in `[leftTs - windowSec, leftTs]` — the
  * every-match companion to [[AsOfJoin]]'s latest-match.
  *
  * A naive inequality join plans as a BroadcastNestedLoopJoin (O(L×R) —
  * the classic Spark range-join trap). This operator uses the standard
  * bin-bucketing decomposition instead: both sides bucket time into bins
  * of exactly the window width, the left side probes its own bin and the
  * previous one (any right row within the window lies in one of those
  * two), and the equi-join on (key, bin) carries the exact predicate as a
  * post-filter. The join is a plain shuffled hash/sort-merge equi-join —
  * linear shuffle, AQE-skew-splittable — and DUPLICATE-FREE BY
  * CONSTRUCTION: a right row has one bin and the two probed bins are
  * distinct, so each qualifying pair meets in exactly one bin (the
  * gridSelfJoin lesson: no distinct pass to pay for).
  */
object RangeJoin {

  /** `left` and `right` must share exactly the `keyCols` column names (all
    * other names distinct across the two sides). Emits one row per
    * (left, right) pair with `right.tsRight ∈ [left.tsLeft - windowSec,
    * left.tsLeft]`, inner-join semantics, all columns from both sides. */
  def pointsInWindow(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsLeft: String, tsRight: String, windowSec: Long): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val w = windowSec * 1000000L // bin width in microseconds = window width
    // floor division: subtract pmod first (plain `div` truncates toward
    // zero — pre-epoch timestamps must bin downward), then INTEGRAL
    // division — the subtraction makes it exact, and a double-precision
    // divide would lose exactness past 2^53 µs and misplace bins
    def bin(ts: String) =
      expr(s"(unix_micros($ts) - pmod(unix_micros($ts), ${w}L)) div ${w}L")
    val l = left.withColumn("__bin",
      explode(array(bin(tsLeft) - 1, bin(tsLeft))))
    val r = right.withColumn("__bin", bin(tsRight))
    l.join(r, keyCols :+ "__bin")
      .filter(col(tsRight) >= col(tsLeft) - expr(s"INTERVAL '$windowSec' SECOND")
        && col(tsRight) <= col(tsLeft))
      .drop("__bin")
  }
}
