package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of picks the latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 11:00:00")),
      (4L, 30L, ts("2024-01-01 09:00:00"))) // key with no right rows at all
      .toDF("lid", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), "a"),
      (10L, ts("2024-01-01 11:30:00"), "b"),
      (10L, ts("2024-01-01 13:00:00"), "future"), // after every left row
      (20L, ts("2024-01-01 11:00:00"), "tie"))    // exactly equal time
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("lid")
      .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    assert(out == Seq(
      (1L, Some("a")),    // 09:30 is the latest <= 10:00
      (2L, Some("b")),    // 11:30 supersedes 09:30; 13:00 is in the future
      (3L, Some("tie")),  // inclusive: equal instant qualifies
      (4L, None)))        // left-outer: no right row for key 30
  }

  test("forward as-of picks the earliest right row at-or-after; strict excludes ties") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 11:00:00")), // exactly equal right instant
      (4L, 30L, ts("2024-01-01 09:00:00"))) // no right rows for this key
      .toDF("lid", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), "past"),   // before every left row
      (10L, ts("2024-01-01 10:30:00"), "a"),
      (10L, ts("2024-01-01 13:00:00"), "b"),
      (20L, ts("2024-01-01 11:00:00"), "tie"),
      (20L, ts("2024-01-01 12:00:00"), "later"))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asOfForward(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("lid")
      .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    assert(out == Seq(
      (1L, Some("a")),    // 10:30 is the earliest >= 10:00; 09:30 is past
      (2L, Some("b")),
      (3L, Some("tie")),  // inclusive: equal instant qualifies
      (4L, None)))
    val strict = AsOfJoin.asOfForward(left, right, "k", "t", "rt", Seq("v"),
      strict = true)
      .orderBy("lid")
      .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    assert(strict(2) == ((3L, Some("later")))) // equal instant excluded under >
  }

  test("forward as-of equals the naive earliest-at-or-after scan on random series") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      .toDF("lid", "k", "t")
    // right unique per (key, time) — the operator's determinism contract
    val right = (1 to 200).map(i =>
      (rnd.nextInt(6).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("k", "rt", "rid")
    val rightRows = right.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    for (strict <- Seq(false, true)) {
      val got = AsOfJoin.asOfForward(left, right, "k", "t", "rt", Seq("rid"), strict)
        .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      left.collect().foreach { l =>
        val (lid, k, t) = (l.getLong(0), l.getLong(1), l.getTimestamp(2))
        val expect = rightRows
          .filter(r => r._1 == k && (if (strict) r._2.after(t) else !r._2.before(t)))
          .sortBy(_._2.getTime).headOption.map(_._3)
        assert(got(lid) == expect, s"lid=$lid strict=$strict")
      }
    }
  }

  test("NULL times never match: null-time left carries NULL, null-time right is ignored") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, Some(ts("2024-01-01 10:00:00"))),
      (2L, 10L, None)) // null left time — no comparison is ever true
      .toDF("lid", "k", "t")
    val right = Seq(
      (10L, Some(ts("2024-01-01 09:00:00")), "before"),
      (10L, Some(ts("2024-01-01 11:00:00")), "after"),
      (10L, None, "null-time")) // must not be carried anywhere
      .toDF("k", "rt", "v")
    val back = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(back == Map(1L -> Some("before"), 2L -> None))
    val fwd = AsOfJoin.asOfForward(left, right, "k", "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(fwd == Map(1L -> Some("after"), 2L -> None))
  }

  test("forward plan uses the running frame, not the O(n^2) following frame") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("lid", "k", "t")
    val right = Seq((1L, ts("2024-01-01 11:00:00"), 9L)).toDF("k", "rt", "rid")
    val plan = AsOfJoin.asOfForward(left, right, "k", "t", "rt", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("unboundedfollowing"),
      s"forward must reverse the sort and keep the incremental frame:\n$plan")
  }

  test("a NULL in the latest right row returns as-is, never an older row's value") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("lid", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), "old", 100L),
      (10L, ts("2024-01-01 11:00:00"), null, 200L)) // latest: v NULL, q 200
      .toDF("k", "rt", "v", "q")
    val row = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v", "q")).collect().head
    // the whole latest row is carried atomically: its NULL v stays NULL
    // (ASOF JOIN semantics) and q comes from the SAME row — never a blend
    assert(row.isNullAt(3))
    assert(row.getLong(4) == 200L)
  }

  test("strict mode excludes the equal-instant right row") {
    import spark.implicits._
    val left = Seq((1L, 20L, ts("2024-01-01 11:00:00"))).toDF("lid", "k", "t")
    val right = Seq(
      (20L, ts("2024-01-01 10:00:00"), "before"),
      (20L, ts("2024-01-01 11:00:00"), "tie")).toDF("k", "rt", "v")
    val inclusive = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"))
      .collect().head.getString(3)
    val strict = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"), strict = true)
      .collect().head.getString(3)
    assert(inclusive == "tie")
    assert(strict == "before")
  }

  test("nearest as-of picks the closer side, ties backward, one-sided keys degrade") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // back 09:00 (1h) vs fwd 10:30 (30m) → fwd
      (2L, 10L, ts("2024-01-01 11:30:00")), // back 10:30 (1h) vs fwd 14:00 (2.5h) → back
      (3L, 20L, ts("2024-01-01 11:00:00")), // equidistant ±1h → tie goes BACKWARD
      (4L, 30L, ts("2024-01-01 09:00:00")), // only a future right row → forward
      (5L, 40L, ts("2024-01-01 09:00:00"))) // no right rows at all → NULL
      .toDF("lid", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), "b1"),
      (10L, ts("2024-01-01 10:30:00"), "f1"),
      (10L, ts("2024-01-01 14:00:00"), "f2"),
      (20L, ts("2024-01-01 10:00:00"), "tb"),
      (20L, ts("2024-01-01 12:00:00"), "tf"),
      (30L, ts("2024-01-01 23:00:00"), "fut"))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asOfNearest(left, right, "k", "t", "rt", Seq("v"))
      .orderBy("lid")
      .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    assert(out == Seq(
      (1L, Some("f1")), (2L, Some("f1")), (3L, Some("tb")),
      (4L, Some("fut")), (5L, None)), s"got $out")
  }

  test("nearest as-of equals the naive argmin scan on random series") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(100000).toLong)).toDF("lid", "k", "t")
    val right = (1 to 200).map(i =>
      ((i % 7).toLong, rnd.nextInt(100000).toLong, i.toLong)).toDF("k", "rt", "rid")
    // determinism contract: unique right per (key, time)
    val rightU = right.groupBy("k", "rt").agg(max("rid").as("rid"))
    val got = AsOfJoin.asOfNearest(left, rightU, "k", "t", "rt", Seq("rid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val rights = rightU.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    left.collect().foreach { l =>
      val (lid, k, t) = (l.getLong(0), l.getLong(1), l.getLong(2))
      val expected = rights.get(k).flatMap { rs =>
        // nearest by |Δt|; tie → backward (rt <= t), then the unique row
        val best = rs.minBy(r => (math.abs(r._2 - t), if (r._2 <= t) 0 else 1))
        Some(best._3)
      }
      assert(got(lid) == expected, s"lid=$lid k=$k t=$t")
    }
  }

  test("registered query: every purchase row present, attribution never in the future") {
    val out = graft.queries.Warehouse.qAsofJoin(spark, sfDir).collect()
    val purchases = graft.sources.Tables.table(spark, sfDir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(out.length.toLong == purchases) // left-outer keeps all purchases
    assert(out.forall { r =>
      r.isNullAt(4) || !r.getTimestamp(4).after(r.getTimestamp(2))
    })
  }
}
