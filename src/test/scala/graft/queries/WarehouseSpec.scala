package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("q1 pricing summary: 3x2 status groups, totals add up") {
    val df = Warehouse.q1PricingSummary(spark, sfDir)
    val rows = df.collect()
    assert(rows.length >= 4 && rows.length <= 9)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01")).count()
    assert(total == expected)
  }

  test("q3 returns top-10 by revenue, descending") {
    val rows = Warehouse.q3ShippingPriority(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q5 groups by nation within ASIA") {
    val rows = Warehouse.q5LocalSupplier(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("n_name")).distinct.length == rows.length)
  }

  test("window topN keeps at most 3 rows per user, ranked by value") {
    val df = Warehouse.qWindowTopN(spark, sfDir)
    val perUser = df.groupBy("user_id").count().collect()
    assert(perUser.forall(_.getAs[Long]("count") <= 3))
    val ranks = df.filter(col("user_id") === df.select("user_id").first().getLong(0))
      .orderBy("rn").collect()
    val vals = ranks.map(_.getAs[Double]("value"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("sessionize: session ids start at 1 and events fall inside sessions") {
    val rows = Warehouse.qSessionize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("session_id")).min == 1L)
    assert(rows.forall { r =>
      !r.getAs[java.sql.Timestamp]("session_start").after(r.getAs[java.sql.Timestamp]("session_end"))
    })
  }

  test("stream window agg: counts per bucket sum to table size") {
    val df = Warehouse.qStreamWindowAgg(spark, sfDir)
    val total = df.agg(sum("n")).first().getLong(0)
    assert(total == graft.sources.Tables.table(spark, sfDir, "events").count())
  }

  test("rollup: subtotal rows aggregate their detail rows, grand total tops out") {
    val rows = Warehouse.qRollup(spark, sfDir).collect()
    val detail = rows.filter(_.getLong(2) == 0L)
    val subtotals = rows.filter(_.getLong(2) == 1L)
    val grand = rows.filter(_.getLong(2) == 3L)
    assert(grand.length == 1)
    assert(grand.head.getLong(3) == detail.map(_.getLong(3)).sum)
    // each returnflag subtotal equals the sum of its detail rows
    subtotals.foreach { s =>
      val n = detail.filter(_.getString(0) == s.getString(0)).map(_.getLong(3)).sum
      assert(s.getLong(3) == n, s"subtotal ${s.getString(0)}")
    }
  }

  test("funnel requires temporal order: a click before the first view does not count") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)
    val rows = Seq(
      // user 1: full ordered funnel
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      // user 2: click BEFORE first view → funnel stalls at view
      (2L, ts(10), "click"), (2L, ts(20), "view"),
      // user 3: purchase before click → stalls at click
      (3L, ts(0), "view"), (3L, ts(2), "purchase"), (3L, ts(4), "click"),
      // user 4: never viewed → not in the funnel at all
      (4L, ts(0), "click"), (4L, ts(1), "purchase"))
      .map { case (u, t, e) => (u * 10, t, u, e, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Warehouse.qFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.get(1) != null, r.get(2) != null, r.get(3) != null)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((true, true, true)))
    assert(out(2L) == ((true, false, false)))
    assert(out(3L) == ((true, true, false)))
  }

  test("debounce suppresses sub-window chains, keeps exact-boundary and other keys") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)
    val rows = Seq(
      // user 1 / p: chain at 0, 4, 8 min — debounce re-arms on every
      // repeat, so BOTH 4 and 8 drop (NOT dropDuplicatesWithinWatermark,
      // which would re-emit at 8)
      (10L, ts(0), 1L, "x", "p"), (11L, ts(4), 1L, "x", "p"), (12L, ts(8), 1L, "x", "p"),
      // user 1 / p: exactly 5 minutes after the last occurrence → still
      // dropped (strict >; kept only when the gap EXCEEDS the window)
      (13L, ts(13), 1L, "x", "p"),
      // and 5 min + 1 min later → kept
      (14L, ts(19), 1L, "x", "p"),
      // same instant, different payload or different user → independent
      (20L, ts(4), 1L, "x", "q"), (21L, ts(4), 2L, "x", "p"))
      .map { case (id, t, u, et, pr) => (id, t, u, et, 0.0, pr) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("debounce").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val kept = Warehouse.qEventDebounce(spark, dir).collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 14L, 20L, 21L))
  }

  test("approx_percentile (the 100 TB path) tracks the exact percentiles") {
    import spark.implicits._
    // exact percentile buffers each group's values; approx_percentile is
    // the mergeable bounded-memory summary you'd run at scale — assert it
    // lands within accuracy tolerance of the exact oracle baseline
    val exact = Warehouse.qPercentile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val approx = graft.sources.Tables.table(spark, sfDir, "events")
      .groupBy($"event_type")
      .agg(
        expr("approx_percentile(value, 0.5, 10000)").as("p50"),
        expr("approx_percentile(value, 0.9, 10000)").as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      val spread = math.max(1.0, math.abs(p90) + math.abs(p50))
      assert(math.abs(a50 - p50) / spread < 0.05, s"$k p50 exact=$p50 approx=$a50")
      assert(math.abs(a90 - p90) / spread < 0.05, s"$k p90 exact=$p90 approx=$a90")
    }
  }

  test("cube: all four grouping sets present, every margin sums its details") {
    val rows = Warehouse.qCube(spark, sfDir).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val details = byGid(0L)
    // flag margins (gid=1: linestatus rolled away) sum their detail counts
    byGid(1L).foreach { m =>
      val want = details.filter(_.getAs[String]("returnflag") == m.getAs[String]("returnflag"))
        .map(_.getAs[Long]("n")).sum
      assert(m.getAs[Long]("n") == want)
    }
    // status margins (gid=2) too, and the grand total tops out
    byGid(2L).foreach { m =>
      val want = details.filter(_.getAs[String]("linestatus") == m.getAs[String]("linestatus"))
        .map(_.getAs[Long]("n")).sum
      assert(m.getAs[Long]("n") == want)
    }
    assert(byGid(3L).head.getAs[Long]("n") == details.map(_.getAs[Long]("n")).sum)
  }

  test("retention: week-0 cell equals cohort size, offsets never negative") {
    val rows = Warehouse.qRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("week_offset") >= 0L))
    // offset-0 count per cohort = number of users whose first week is that week
    val cohortSizes = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .groupBy(col("user_id")).agg(min(col("w")).as("cw"))
      .groupBy(col("cw")).count()
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    rows.filter(_.getAs[Long]("week_offset") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_users") == cohortSizes(r.get(0)))
    }
    // retained users never exceed the cohort
    rows.foreach(r => assert(r.getAs[Long]("n_users") <= cohortSizes(r.get(0))))
  }

  test("rolling agg matches a brute-force trailing-hour scan") {
    val rows = Warehouse.qRollingAgg(spark, sfDir)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("roll_n"), r.getAs[Double]("roll_avg"))).toMap
    // compare on microsecond epoch — Timestamp.getTime is millis and
    // would blur the frame boundary the query computes in micros
    val ev = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val byUser = ev.groupBy(_._2)
    ev.foreach { case (id, user, ts, _) =>
      val frame = byUser(user).filter { case (_, _, t, _) =>
        t <= ts && t >= ts - 3600000000L }
      val vals = frame.flatMap(_._4)
      val (gotN, gotAvg) = rows(id)
      assert(gotN == frame.length, s"event $id frame size")
      if (vals.nonEmpty)
        assert(math.abs(gotAvg - vals.sum / vals.length) < 1e-3, s"event $id avg")
    }
  }

  test("moments match a driver-side population-formula computation") {
    val got = Warehouse.qMoments(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val byType = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("event_type"), col("value")).na.drop()
      .collect().map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    byType.foreach { case (t, xs) =>
      val v = xs.map(_._2); val n = v.length.toDouble
      val mean = v.sum / n
      val m2 = v.map(x => (x - mean) * (x - mean)).sum / n
      val m3 = v.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = v.map(x => math.pow(x - mean, 4)).sum / n
      val r = got(t)
      assert(r.getAs[Long]("n") == v.length)
      assert(math.abs(r.getAs[Double]("mean") - mean) < 1e-3)
      assert(math.abs(r.getAs[Double]("stddev") - math.sqrt(m2)) < 1e-3)
      assert(math.abs(r.getAs[Double]("skewness") - m3 / math.pow(m2, 1.5)) < 1e-3)
      assert(math.abs(r.getAs[Double]("kurtosis") - (m4 / (m2 * m2) - 3.0)) < 1e-3)
    }
  }

  test("corr column equals Spark's built-in Pearson corr (corrections cancel)") {
    val got = Warehouse.qCorr(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("corr")).toMap
    val want = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("event_type"), col("value").as("x"),
        get_json_object(col("props"), "$.k").cast("double").as("y"))
      .na.drop()
      .groupBy(col("event_type")).agg(corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (t, c) => assert(math.abs(c - want(t)) < 1e-3, t) }
  }

  test("abtest: cohorts partition each type; z sign follows the mean difference") {
    val rows = Warehouse.qAbtest(spark, sfDir).collect()
    val totals = graft.sources.Tables.table(spark, sfDir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == totals(r.getString(0)))
      val diff = r.getAs[Double]("mean_a") - r.getAs[Double]("mean_b")
      assert(diff == 0.0 || math.signum(diff) == math.signum(r.getAs[Double]("z")))
    }
  }

  test("zscore: per-group mean ~0, stddev ~1, order preserved within group") {
    val rows = Warehouse.qZscore(spark, sfDir).collect()
    val byType = rows.groupBy(_.getString(1))
    byType.foreach { case (t, rs) =>
      val z = rs.map(_.getAs[Double]("z"))
      val mean = z.sum / z.length
      val sd = math.sqrt(z.map(x => (x - mean) * (x - mean)).sum / z.length)
      assert(math.abs(mean) < 1e-2, s"$t mean")
      assert(math.abs(sd - 1.0) < 1e-2, s"$t stddev")
    }
  }

  test("winsorize: clipped values inside [p05, p95], ~10% of rows clipped") {
    val rows = Warehouse.qWinsorize(spark, sfDir).collect()
    val byType = rows.groupBy(_.getString(1))
    byType.foreach { case (t, rs) =>
      val clipped = rs.count(_.getAs[Boolean]("was_clipped"))
      val frac = clipped.toDouble / rs.length
      assert(frac > 0.02 && frac < 0.2, s"$t clip fraction $frac")
      val lo = rs.map(_.getAs[Double]("value_clipped")).min
      val hi = rs.map(_.getAs[Double]("value_clipped")).max
      // clipped extremes sit exactly at the cut points
      assert(rs.filter(_.getAs[Boolean]("was_clipped"))
        .forall { r =>
          val v = r.getAs[Double]("value_clipped"); v == lo || v == hi })
    }
  }

  test("unpivot inverts the pivot: per-user long rows sum to event counts") {
    val rows = Warehouse.qUnpivot(spark, sfDir).collect()
    val users = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.length == users * 5)
    val perUser = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getAs[Long]("n")).sum)
    val wantTotals = graft.sources.Tables.table(spark, sfDir, "events")
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    wantTotals.foreach { case (u, n) => assert(perUser(u) == n, s"user $u") }
  }

  test("active users: coarser periods are supersets; new+returning partition days") {
    val au = Warehouse.qActiveUsers(spark, sfDir).collect()
    val byPeriod = au.groupBy(_.getString(0))
    assert(byPeriod.keySet == Set("day", "week", "month"))
    val maxDay = byPeriod("day").map(_.getAs[Long]("active_users")).max
    val maxMonth = byPeriod("month").map(_.getAs[Long]("active_users")).max
    assert(maxMonth >= maxDay, "monthly actives can never trail a day within the month")
    val nvr = Warehouse.qNewVsReturning(spark, sfDir).collect()
    val totalUsers = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    assert(nvr.map(_.getAs[Long]("n_new")).sum == totalUsers,
      "every user is new exactly once")
    assert(nvr.head.getAs[Long]("n_returning") == 0L,
      "nobody returns on the first day of history")
  }

  test("sliding window: every event lands in exactly size/hop = 2 windows") {
    val total = graft.sources.Tables.table(spark, sfDir, "events").count()
    val rows = Warehouse.qSlidingWindow(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 2 * total)
    // consecutive window starts differ by the 5-minute hop, not the size
    val starts = rows.map(_.getTimestamp(0).getTime).distinct.sorted
    assert(starts.sliding(2).forall(w => w.length < 2 || (w(1) - w(0)) % 300000L == 0))
  }

  test("time-weighted avg: hand-computed spans; constant series gives the constant") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("twa").toString
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    Seq(
      // user 1: 10 for 10s, then 20 for 20s; last value (99) holds nothing
      (1L, 1L, ts(0), 10.0), (2L, 1L, ts(10), 20.0), (3L, 1L, ts(30), 99.0),
      // user 2: constant 5.0
      (4L, 2L, ts(0), 5.0), (5L, 2L, ts(7), 5.0), (6L, 2L, ts(100), 5.0),
      // user 3: single event — no holding period, drops out
      (7L, 3L, ts(0), 42.0))
      .toDF("event_id", "user_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Warehouse.qTimeWeightedAvg(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).getAs[Long]("n_spans") == 2L)
    assert(out(1L).getAs[Long]("dur_us") == 30000000L)
    // (10*10 + 20*20) / 30 = 16.6667
    assert(out(1L).getAs[Double]("twa") == 16.6667)
    assert(out(2L).getAs[Double]("twa") == 5.0)
  }

  test("event transitions: probabilities sum to ~1e6 per state; pair mass = events - users") {
    val rows = Warehouse.qEventTransitions(spark, sfDir).collect()
    val byFrom = rows.groupBy(_.getAs[String]("from_type"))
    byFrom.foreach { case (from, rs) =>
      val pSum = rs.map(_.getAs[Long]("prob_ppm")).sum
      // each DIV floors: the sum undershoots 1e6 by at most |types|
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length,
        s"$from: prob mass $pSum over ${rs.length} targets")
      val nFrom = rs.head.getAs[Long]("n_from")
      assert(rs.map(_.getAs[Long]("n")).sum == nFrom)
    }
    val events = graft.sources.Tables.table(spark, sfDir, "events")
    val expectedPairs = events.count() -
      events.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expectedPairs,
      "every event except each user's first contributes exactly one transition")
  }

  test("trailing active users: window-1 equals daily; trailing >= daily; approx exact when unsaturated") {
    val daily = Warehouse.qActiveUsersTrailing(spark, sfDir, window = 1).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("active_users_7d")).toMap
    val dailyRef = Warehouse.qActiveUsers(spark, sfDir).collect()
      .filter(_.getAs[String]("period") == "day")
      .map(r => r.getTimestamp(1).toLocalDateTime.toLocalDate.toString ->
        r.getAs[Long]("active_users")).toMap
    assert(daily == dailyRef, "window=1 must reproduce the daily distinct exactly")
    val trailing = Warehouse.qActiveUsersTrailing(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("active_users_7d")).toMap
    assert(daily.forall { case (d, n) => trailing(d) >= n },
      "a 7-day window can only add users over its last day")
    // k=1024 over this corpus' ~150 daily users: sketches unsaturated,
    // the merged sketch IS the distinct hash set, estimate must be exact
    val approx = Warehouse.qActiveUsersTrailingApprox(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("active_users_7d_est")).toMap
    assert(approx == trailing, s"unsaturated sketch must be exact")
  }

  test("trailing active users approx: saturated sketch stays within the 1/sqrt(k) band") {
    val k = 64
    val exact = Warehouse.qActiveUsersTrailing(spark, sfDir).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("active_users_7d")).toMap
    val approx = Warehouse.qActiveUsersTrailingApprox(spark, sfDir, k = k).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("active_users_7d_est")).toMap
    exact.foreach { case (d, n) =>
      val est = approx(d)
      val bound = math.max(3.0 * n / math.sqrt(k.toDouble), 1.0)
      assert(math.abs(est - n) <= bound || n < k,
        s"$d: est $est vs exact $n beyond 3 sigma of k=$k")
    }
  }
}
