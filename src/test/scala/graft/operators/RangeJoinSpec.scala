package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000L)

  private def naive(l: DataFrame, r: DataFrame, windowSec: Long): Set[(Long, Long)] =
    l.join(r, l("user_id") === r("user_id")
        && r("click_ts") >= l("p_ts") - expr(s"INTERVAL '$windowSec' SECOND")
        && r("click_ts") <= l("p_ts"))
      .select(l("p_id"), r("c_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet

  test("window edges: both endpoints inclusive, outside excluded, keys separate") {
    import spark.implicits._
    val purchases = Seq((1L, 1L, ts(3600)), (2L, 2L, ts(3600)))
      .toDF("p_id", "user_id", "p_ts")
    val clicks = Seq(
      (10L, 1L, ts(0)),      // exactly windowSec before → included
      (11L, 1L, ts(1)),      // inside
      (12L, 1L, ts(3600)),   // same instant → included
      (13L, 1L, ts(-1)),     // one second too early → out
      (14L, 1L, ts(3601)),   // after the purchase → out
      (15L, 2L, ts(3599)),   // other user's window
      (16L, 3L, ts(3600)))   // user with no purchase
      .toDF("c_id", "user_id", "click_ts")
    val got = RangeJoin.pointsInWindow(purchases, clicks, Seq("user_id"),
      "p_ts", "click_ts", windowSec = 3600L)
      .select("p_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 15L)))
  }

  test("bin decomposition equals the naive inequality join on random data (no dupes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val purchases = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, ts(rnd.nextInt(50000).toLong)))
      .toDF("p_id", "user_id", "p_ts")
    val clicks = (1 to 600).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, ts(rnd.nextInt(50000).toLong)))
      .toDF("c_id", "user_id", "click_ts")
    for (w <- Seq(1L, 777L, 3600L)) {
      val binned = RangeJoin.pointsInWindow(purchases, clicks, Seq("user_id"),
        "p_ts", "click_ts", windowSec = w)
        .select("p_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.length == binned.toSet.size, s"duplicates at w=$w") // duplicate-free
      assert(binned.toSet == naive(purchases, clicks, w), s"mismatch at w=$w")
    }
  }

  test("plan is an equi-join, not a nested-loop join") {
    import spark.implicits._
    val purchases = Seq((1L, 1L, ts(0))).toDF("p_id", "user_id", "p_ts")
    val clicks = Seq((1L, 1L, ts(0))).toDF("c_id", "user_id", "click_ts")
    val plan = RangeJoin.pointsInWindow(purchases, clicks, Seq("user_id"),
      "p_ts", "click_ts", windowSec = 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
