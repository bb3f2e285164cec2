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

  test("conversion ci: Wilson form recomputes from each row's own counts, brackets the rate") {
    val rows = Warehouse.qConversionCi(spark, sfDir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val k = r.getAs[Long]("k").toDouble
      val p = k / n
      val z2 = 1.96 * 1.96
      val denom = 1.0 + z2 / n
      val center = (p + z2 / (2 * n)) / denom
      val half = 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / denom
      assert(math.abs(r.getAs[Double]("ci_lo") - (center - half)) < 1e-5)
      assert(math.abs(r.getAs[Double]("ci_hi") - (center + half)) < 1e-5)
      assert(r.getAs[Double]("ci_lo") >= 0.0 && r.getAs[Double]("ci_hi") <= 1.0,
        "Wilson stays inside [0,1]")
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("rate")
        && r.getAs[Double]("rate") <= r.getAs[Double]("ci_hi"))
    }
  }

  test("gini: uniform spend scores zero, a single whale scores (n-1)/n") {
    import spark.implicits._
    import java.sql.Timestamp
    def mk(vals: Seq[Double]) = {
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, new Timestamp(1700000000000L + i * 1000L), i.toLong,
          "purchase", v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val dir = java.nio.file.Files.createTempDirectory("gini").toString
      rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
      Warehouse.qGini(spark, dir).collect().head
    }
    val even = mk(Seq.fill(10)(25.0))
    assert(even.getAs[Double]("gini") == 0.0, s"uniform: $even")
    val whale = mk(0.01 +: Seq.fill(9)(0.0)) // zero spenders don't register
    // 9 users at 0 cents + 1 whale: G = (n-1)/n with n=10... but zero
    // purchases still create user rows with cents=0 — expected 0.9
    assert(math.abs(whale.getAs[Double]("gini") - 0.9) < 1e-6, s"whale: $whale")
    assert(whale.getAs[Long]("n_users") == 10L)
  }

  test("acf: a pure weekly series scores 1.0 at lags 7 and 14, bounded everywhere") {
    val s = Seq(30L, 10L, 50L, 20L, 5L, 40L, 15L)
    val rows = Warehouse.acfOf(
      syntheticSeries((0 until 70).map(i => s(i % 7)))).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf")).toMap
    assert(rows.keySet == (1 to 14).toSet)
    assert(rows(7) == 1.0, s"exact periodicity: ${rows(7)}")
    assert(rows(14) == 1.0)
    assert(rows.values.forall(a => a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9))
    assert(rows(1) < 1.0, "non-trivial off-period lag must not be perfect")
    // the real corpus' ACF is bounded and complete
    val real = Warehouse.qAcf(spark, sfDir).collect()
    assert(real.length == 14)
    real.foreach(r => assert(math.abs(r.getAs[Double]("acf")) <= 1.0 + 1e-9))
  }

  test("lorenz deciles: shares close, curve convex, trapezoid AUC cross-checks the Gini") {
    val rows = Warehouse.qLorenzDeciles(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    assert(rows.last.getAs[Long]("cum_share_ppm") == 1000000L)
    // per-user MEAN spend ascends with the decile (decile TOTALS can
    // zigzag when n isn't divisible by 10 and sizes differ by one)
    val means = rows.map(r =>
      r.getAs[Long]("cents_decile").toDouble / r.getAs[Long]("n_users_decile"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"per-user decile means must be non-decreasing: ${means.toList}")
    // trapezoid AUC with USER-WEIGHTED widths cross-checks C59's Gini
    // (decile granularity → a small discretization bias band)
    val nTotal = rows.map(_.getAs[Long]("n_users_decile")).sum.toDouble
    val cums = 0.0 +: rows.map(_.getAs[Long]("cum_share_ppm") / 1e6)
    val widths = rows.map(_.getAs[Long]("n_users_decile") / nTotal)
    val auc = cums.zip(cums.tail).zip(widths)
      .map { case ((a, b), w) => (a + b) / 2 * w }.sum
    val giniFromCurve = 1.0 - 2.0 * auc
    val gini = Warehouse.qGini(spark, sfDir).collect().head.getAs[Double]("gini")
    assert(math.abs(giniFromCurve - gini) < 0.02,
      s"curve $giniFromCurve vs exact $gini")
  }

  test("sampled gini twin: full sample is BIT-EQUAL to exact, default sample tracks it") {
    // Σi·x is tie-permutation-invariant, so the full-sample twin must
    // reproduce C59 exactly — not approximately
    val exact = Warehouse.qGini(spark, sfDir).collect().head
    val full = Warehouse.qGiniApprox(spark, sfDir, sampleMod = 1L).collect().head
    assert(full.getAs[Long]("n_sample") == exact.getAs[Long]("n_users"))
    assert(full.getAs[Double]("gini") == exact.getAs[Double]("gini"),
      s"full-sample twin must degenerate to the exact Gini: $full vs $exact")
    // the spec corpus is below the default minSample fallback (the twin
    // correctly takes all 15 purchasers whole) — force a real 1/2 draw
    // to exercise the sampled regime
    val s = Warehouse.qGiniApprox(spark, sfDir, sampleMod = 2L, minSample = 1)
      .collect().head
    assert(s.getAs[Long]("n_sample") < s.getAs[Long]("n_users"))
    assert(math.abs(s.getAs[Double]("gini") - exact.getAs[Double]("gini")) < 0.15,
      s"sampled estimate tracks exact: $s vs $exact")
  }

  test("sampled lorenz twin: value-range deciles, exact shares within, balanced sizes") {
    val rows = Warehouse.qLorenzDecilesApprox(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.forall(r => r.getAs[Long]("decile") >= 1
      && r.getAs[Long]("decile") <= 10))
    assert(rows.last.getAs[Long]("cum_share_ppm") == 1000000L,
      "cumulative share must exhaust the corpus")
    // buckets are VALUE ranges, so per-user decile means strictly order
    val means = rows.map(r =>
      r.getAs[Long]("cents_decile").toDouble / r.getAs[Long]("n_users_decile"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b + 1e-9 })
    // sizes: every user lands in exactly one decile, and each decile
    // holds ~n/10 within the sampled-cutoff error band (4σ of the
    // order-statistic error at sample size m, plus tie slack)
    val n = rows.map(_.getAs[Long]("n_users_decile")).sum
    val exactN = Warehouse.qGini(spark, sfDir).collect().head.getAs[Long]("n_users")
    assert(n == exactN, "every purchaser must land in exactly one decile")
    val m = Warehouse.qGiniApprox(spark, sfDir).collect().head.getAs[Long]("n_sample")
    val tol = 4.0 * math.sqrt(0.1 * 0.9 / m) * n + 3
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("n_users_decile") - n / 10.0) <= tol,
        s"decile ${r.getAs[Long]("decile")} size ${r.getAs[Long]("n_users_decile")}" +
          s" vs ${n / 10.0} ± $tol") }
  }

  test("decile migration: stable spenders stay diagonal, the planted whale moves 1→10") {
    import spark.implicits._
    import java.sql.Timestamp
    val day = 86400000L
    // 100 users, identical spend in both halves of the timeline —
    // except user 0, who 10000×es in the second half
    val rows = (0 until 100).flatMap { u =>
      val cents = (u + 1) * 1.00
      Seq(
        (u.toLong * 2, new Timestamp(1700000000000L), u.toLong, "purchase", cents),
        (u.toLong * 2 + 1, new Timestamp(1700000000000L + 10 * day), u.toLong,
          "purchase", if (u == 0) 10000.0 else cents))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("decmig").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Warehouse.qDecileMigration(spark, dir).collect()
      .map(r => (r.getAs[Long]("decile_from"), r.getAs[Long]("decile_to"),
        r.getAs[Long]("n_users")))
    assert(out.map(_._3).sum == 100L, "every both-period user transitions once")
    assert(out.forall { case (f, t, _) => f >= 1 && f <= 10 && t >= 1 && t <= 10 })
    // the whale: lowest decile → top decile
    assert(out.exists { case (f, t, n) => f == 1L && t == 10L && n >= 1L },
      s"planted whale must surface: ${out.toSeq}")
    // everyone else holds steady: identical values + identical per-user
    // draw ⇒ identical cutoffs up to the whale's sample contribution —
    // allow ±1 decile of cutoff shift, nothing further
    val farMovers = out.filter { case (f, t, n) =>
      math.abs(f - t) > 1 && !(f == 1L && t == 10L) && n > 0 }
    assert(farMovers.isEmpty, s"stable spenders must stay near-diagonal: ${farMovers.toSeq}")
    // real-corpus sanity: row total equals the both-period user count
    val real = Warehouse.qDecileMigration(spark, sfDir).collect()
    assert(real.map(_.getAs[Long]("n_users")).sum > 0)
  }

  test("sampled rfm twin: full-sample scores land inside each tie group's exact range") {
    val exact = Warehouse.qRfmSegments(spark, sfDir).collect()
    val full = Warehouse.qRfmSegmentsApprox(spark, sfDir, sampleMod = 1L)
      .collect()
    assert(full.length == exact.length)
    // the approx face collapses a value-tie group to ONE score where the
    // exact face splits it by rank — the collapsed score must be a score
    // the exact face actually assigns to that value (per dimension)
    for ((dim, score) <- Seq("recency_days" -> "r_score",
        "frequency" -> "f_score", "monetary_cents" -> "m_score")) {
      val ranges = exact.groupBy(_.getAs[Long](dim))
        .map { case (v, rs) =>
          v -> (rs.map(_.getAs[Long](score)).min, rs.map(_.getAs[Long](score)).max) }
      full.foreach { r =>
        val (lo, hi) = ranges(r.getAs[Long](dim))
        val s = r.getAs[Long](score)
        assert(s >= lo && s <= hi,
          s"$score=$s for $dim=${r.getAs[Long](dim)} outside exact range [$lo,$hi]")
      }
    }
    // default sample: scores stay in range, monotone per dimension,
    // segment arithmetic holds
    val s = Warehouse.qRfmSegmentsApprox(spark, sfDir).collect()
    s.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        assert(r.getAs[Long](c) >= 1L && r.getAs[Long](c) <= 5L) }
      assert(r.getAs[Long]("segment") == 100 * r.getAs[Long]("r_score")
        + 10 * r.getAs[Long]("f_score") + r.getAs[Long]("m_score"))
    }
    val byF = s.sortBy(_.getAs[Long]("frequency"))
    byF.zip(byF.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("f_score") <= b.getAs[Long]("f_score"),
        "f_score must be monotone in frequency") }
  }

  test("benford: digit lane and chi2 self-consistent; flat digits flag, log-uniform passes") {
    import spark.implicits._
    import java.sql.Timestamp
    def mk(vals: Seq[Double]) = {
      val rows = vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, new Timestamp(1700000000000L + i * 1000L), i.toLong, "view", v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val dir = java.nio.file.Files.createTempDirectory("benford").toString
      rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
      Warehouse.qBenford(spark, dir).collect()
    }
    // internal consistency on the real corpus
    val real = Warehouse.qBenford(spark, sfDir).collect()
    assert(real.map(_.getAs[Long]("first_digit")).toSet.subsetOf((1L to 9L).toSet))
    val totPpm = real.map(_.getAs[Long]("observed_ppm")).sum
    assert(totPpm > 999990L && totPpm <= 1000000L, s"ppm total $totPpm")
    real.foreach { r =>
      val d = r.getAs[Long]("first_digit").toDouble
      assert(r.getAs[Long]("expected_ppm") ==
        math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)
    }
    // fabricated flat digits: every digit equally often — the chi2 mass
    // concentrates where Benford diverges most (digit 1 under, 9 over)
    val flat = mk((1 to 9).flatMap(d => Seq.fill(100)(d.toDouble + 0.5)))
    val chiFlat = flat.map(_.getAs[Long]("chi2_x1000")).sum / 1000.0
    assert(chiFlat > 15.5, s"flat digits must reject Benford: $chiFlat")
    // organic log-uniform magnitudes conform (deterministic grid over
    // 3 decades — each decade a Benford-ideal digit layout)
    val organic = mk((0 until 3000).map(i => math.pow(10.0, i / 1000.0)))
    val chiOrg = organic.map(_.getAs[Long]("chi2_x1000")).sum / 1000.0
    assert(chiOrg < 15.5, s"log-uniform grid must conform: $chiOrg")
    // magnitude tails: in-range decades up to 1e11 REGISTER a digit;
    // values past 1e12 or below 1e-6 are COUNTED as excluded, not
    // silently dropped (the r10 ADVICE item)
    val wide = mk(Seq(2e10, 3e11, 7.0, 5e12, 9e13, 1e-7))
    assert(wide.map(_.getAs[Long]("n")).sum == 3L,
      "2e10/3e11/7 are in the extended ladder range")
    assert(wide.forall(_.getAs[Long]("n_excluded") == 3L),
      s"5e12, 9e13, 1e-7 must be reported excluded: ${wide.toSeq}")
  }

  test("skyline: planted frontier exact — twins kept, same-price ties resolved, interior dropped") {
    import spark.implicits._
    val parts = Seq(
      (1L, 10.0, 5),  // frontier (cheapest)
      (2L, 20.0, 8),  // frontier (bigger than anything cheaper)
      (3L, 20.0, 4),  // dominated by 2 (same price, smaller)
      (4L, 30.0, 8),  // dominated by 2 (same size, pricier)
      (5L, 40.0, 9),  // frontier
      (6L, 40.0, 9),  // equal twin of 5 — BOTH kept (no strict dominance)
      (7L, 50.0, 3),  // interior
      (8L, 5.0, 2))   // frontier (cheapest of all)
      .map { case (k, p, sz) => (k, s"part$k", "b", "t", sz, p) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val dir = java.nio.file.Files.createTempDirectory("skyline").toString
    parts.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Warehouse.qSkyline(spark, dir).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L, 6L, 8L), s"got $got")
    // C57b: the grid prefilter is exact — identical frontier, including
    // the equal twins, on the planted corpus (cells sized so planted
    // points share and split cells both ways)
    val grid = Warehouse.qSkylineGrid(spark, dir, priceCell = 10.0, sizeCell = 2)
      .collect().map(_.getLong(0)).toSet
    assert(grid == got, s"grid $grid != exact $got")
  }

  test("skyline grid twin: frontier identical to the exact sweep; prefilter prunes interior mass") {
    // corpus-level equivalence (the sf0.01 part table): grid cells at the
    // registered defaults must reproduce the exact frontier bit-for-bit
    val exact = Warehouse.qSkyline(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val grid = Warehouse.qSkylineGrid(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(grid == exact, s"grid frontier diverged: ${grid.diff(exact)} / ${exact.diff(grid)}")
    // the sweep input must be grid-BOUNDED, not the whole part table —
    // the executed 100 TB contract (r11 verdict: narrated-only is banned)
    val total = graft.sources.Tables.table(spark, sfDir, "part").count()
    val survivors = Warehouse.skylineGridSurvivors(spark, sfDir, 1.0, 1).count()
    assert(survivors * 5 <= total,
      s"grid prefilter kept $survivors of $total — not a bound")
  }

  test("ntile approx twin: mass conserved vs exact C18, deciles complete, bounds nested") {
    val exact = Warehouse.qNtile(spark, sfDir).collect()
    val approx = Warehouse.qNtileApprox(spark, sfDir).collect()
    def total(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Long]("n")).sum
    assert(total(approx) == total(exact), "decile assignment must conserve rows")
    val byType = approx.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Long]("decile")).toSet == (1L to 10L).toSet,
        s"$t: every decile populated on this corpus")
      // buckets ordered: lo/hi ranges must be non-overlapping in order
      val sorted = rs.sortBy(_.getAs[Long]("decile"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 1e-9,
            s"$t: decile ranges overlap")
        case _ =>
      }
    }
  }

  test("winsorize approx twin: agrees with the exact clip away from the cutoff gap") {
    val exact = Warehouse.qWinsorize(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("value_clipped")).toMap
    val approx = Warehouse.qWinsorizeApprox(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Double]("value_clipped"),
        r.getAs[Boolean]("was_clipped")))
    assert(approx.length == exact.size)
    // the two cutoff definitions (interpolated vs discrete-rank) sit
    // within one observation gap, so the clip DECISION flips only for
    // rows inside that narrow band — interior rows must agree exactly
    val exactFlag = Warehouse.qWinsorize(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("was_clipped")).toMap
    val interiorDisagree = approx.count { case (id, v, clipped) =>
      !clipped && !exactFlag(id) && math.abs(exact(id) - v) > 1e-9
    }
    assert(interiorDisagree == 0,
      s"$interiorDisagree interior (unclipped-both) rows changed value")
    val flagAgree = approx.count { case (id, _, c) => c == exactFlag(id) }
    assert(flagAgree.toDouble / approx.length > 0.98,
      s"clip decisions diverge beyond the cutoff band: $flagAgree/${approx.length}")
    // clip mass is the designed ~10% per group
    val frac = approx.count(_._3).toDouble / approx.length
    assert(frac > 0.05 && frac < 0.15, s"clipped fraction $frac off the 10% design")
  }

  test("position attribution: U-shaped ppm weights exact, credit conserves per purchase") {
    import spark.implicits._
    import java.sql.Timestamp
    // planted timelines: users with 1, 2, 3, and 5 clicks inside the
    // lookback, plus one stale click outside it (user 5)
    def ts(min: Long) = new Timestamp(1704067200000L + min * 60000L)
    val rows = Seq(
      (1L, 1L, "click", ts(0)), (2L, 1L, "purchase", ts(10)),
      (3L, 2L, "click", ts(0)), (4L, 2L, "click", ts(5)), (5L, 2L, "purchase", ts(10)),
      (6L, 3L, "click", ts(0)), (7L, 3L, "click", ts(2)), (8L, 3L, "click", ts(4)),
      (9L, 3L, "purchase", ts(10)),
      (10L, 4L, "click", ts(0)), (11L, 4L, "click", ts(1)), (12L, 4L, "click", ts(2)),
      (13L, 4L, "click", ts(3)), (14L, 4L, "click", ts(4)), (15L, 4L, "purchase", ts(10)),
      (16L, 5L, "click", ts(-8L * 24 * 60)), (17L, 5L, "purchase", ts(10)))
      .map { case (e, u, t, s) => (e, u, t, s, 1.0) }
    val dir = java.nio.file.Files.createTempDirectory("attrpos").toString
    rows.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Warehouse.qAttributionPosition(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) =>
        p -> rs.sortBy(_.getAs[Long]("touch_rank")).map(_.getAs[Long]("weight_ppm")).toSeq
      }
    assert(out(2L) == Seq(1000000L), "single touch takes all credit")
    assert(out(5L) == Seq(500000L, 500000L))
    // n=3: one interior touch takes the whole 20%
    assert(out(9L) == Seq(400000L, 200000L, 400000L))
    // n=5: 200000 DIV 3 = 66666, remainder 2 on the earliest interior
    assert(out(15L) == Seq(400000L, 66668L, 66666L, 66666L, 400000L))
    assert(!out.contains(17L), "a purchase with only stale clicks emits nothing")
    out.values.foreach(ws => assert(ws.sum == 1000000L, "credit must conserve"))
    // corpus: conservation holds for every purchase
    val corpus = Warehouse.qAttributionPosition(spark, sfDir).collect()
    corpus.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("weight_ppm")).sum == 1000000L)
    }
  }

  test("kcore: planted clique survives the peel, tail is shed; corpus reaches fixpoint in budget") {
    import spark.implicits._
    // K4 clique on parts 1..4 plus a pendant path 4-5-6: the 3-core is
    // exactly the clique (each member degree 3); the path peels away in
    // two waves. Each edge rides two shared orders (support >= 2).
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val rows = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i, a), (2L * i, b), (2L * i + 1, a), (2L * i + 1, b))
    }
    val dir = java.nio.file.Files.createTempDirectory("kcore").toString
    rows.toDF("l_orderkey", "l_partkey")
      .withColumn("l_suppkey", lit(1L)).withColumn("l_quantity", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Warehouse.qKcore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("core_degree")).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $out")
    // corpus: every survivor carries core degree >= k, and one extra
    // round is a no-op — the fixed-round face IS the fixpoint here
    val c8 = Warehouse.qKcore(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("core_degree")))
    assert(c8.nonEmpty && c8.forall(_._2 >= 3L))
    val c9 = Warehouse.qKcore(spark, sfDir, rounds = 9).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("core_degree")))
    assert(c9.toSet == c8.toSet, "round 9 must be a no-op (fixpoint reached)")
  }

  test("bootstrap ci: percentile interval brackets the mean and tracks the jackknife se") {
    val boot = Warehouse.qBootstrapCi(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val jack = Warehouse.qJackknifeCi(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(boot.nonEmpty && boot.keySet == jack.keySet)
    boot.foreach { case (t, r) =>
      assert(r.getAs[Long]("n_replicas") == 100L, s"$t: replicas lost")
      val (mean, lo, hi) = (r.getAs[Double]("mean"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= mean && mean <= hi, s"$t: CI [$lo, $hi] misses mean $mean")
      // two independent CI constructions for the same estimator must
      // agree on scale: percentile width within 2x of the normal width
      val jackWidth = 2.0 * 1.96 * jack(t).getAs[Double]("se")
      val bootWidth = hi - lo
      assert(bootWidth < 2.0 * jackWidth && bootWidth > jackWidth / 2.0,
        s"$t: bootstrap width $bootWidth vs jackknife $jackWidth")
    }
  }

  test("bootstrap weight lane: Poisson(1) moments and no id-adjacency structure") {
    import spark.implicits._
    // 20k consecutive ids, one replica — the structured-id-block shape
    // where raw/single-mixed polyhash lanes carried ±4σ adjacency bias
    val n = 20000
    val ws = spark.range(n.toLong)
      .select(Warehouse.bootstrapWeight(col("id"), lit(7L)).as("w"))
      .collect().map(_.getLong(0).toDouble)
    val mean = ws.sum / n
    val varw = ws.map(w => (w - mean) * (w - mean)).sum / n
    assert(math.abs(mean - 1.0) < 0.03, s"weight mean $mean drifted from 1")
    assert(math.abs(varw - 1.0) < 0.06, s"weight variance $varw drifted from 1")
    val p0 = ws.count(_ == 0.0).toDouble / n
    assert(math.abs(p0 - math.exp(-1.0)) < 0.02, s"P(w=0) $p0 vs 1/e")
    // adjacency: consecutive ids' weights must be uncorrelated — the
    // H16c audit shape (|r| ~ 1/sqrt(n) ≈ 0.007 under independence)
    val pairs = ws.sliding(2).map { case Array(a, b) => (a, b) }.toArray
    val (ma, mb) = (pairs.map(_._1).sum / pairs.length, pairs.map(_._2).sum / pairs.length)
    val cov = pairs.map { case (a, b) => (a - ma) * (b - mb) }.sum / pairs.length
    val sa = math.sqrt(pairs.map(p => (p._1 - ma) * (p._1 - ma)).sum / pairs.length)
    val sb = math.sqrt(pairs.map(p => (p._2 - mb) * (p._2 - mb)).sum / pairs.length)
    val r = cov / (sa * sb)
    assert(math.abs(r) < 0.03, s"adjacent-id weight correlation $r — draw lane is striped")
  }

  test("bootstrap weight lane: prefixed integer extension ≡ the full string hash, every replica") {
    // r17 — qBootstrapCi hashes the "boot:<id>:" prefix once per row and
    // extends per replica in integer arithmetic; the lane must stay
    // bit-identical to the string-keyed draw for every (id, b) incl.
    // one- vs two-digit replica ids and ids of every digit width
    val ids = spark.range(500L)
      .select((col("id") * col("id") * 37L + col("id")).as("id"))
    val both = ids
      .withColumn("b", explode(expr("sequence(0L, 99L)")))
      .withColumn("__hp", Warehouse.bootstrapPrefixHash(col("id")))
      .select(col("id"), col("b"),
        Warehouse.bootstrapWeight(col("id"), col("b")).as("w_full"),
        Warehouse.bootstrapWeightPrefixed(col("__hp"), col("b")).as("w_pre"))
    assert(both.filter(col("w_full") =!= col("w_pre")).count() === 0L)
  }

  test("did: four-cell arithmetic matches brute force; the null design stays near zero") {
    val rows = Warehouse.qDid(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // brute-force replication of the cells
    val ev = graft.sources.Tables.table(spark, sfDir, "events")
      .filter(col("value").isNotNull)
      .select("event_type", "user_id", "ts", "value").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts"), r.getAs[Double]("value")))
    val days = ev.map(_._3.getTime / 86400000L)
    val mid = days.min + (days.max - days.min) / 2
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val cells = ev.filter(_._1 == t).groupBy { case (_, u, ts, _) =>
        (u % 2 == 0, ts.getTime / 86400000L >= mid) }
      def mean(k: (Boolean, Boolean)) = {
        val vs = cells(k).map(_._4); vs.sum / vs.length }
      val did = (mean((true, true)) - mean((true, false))) -
        (mean((false, true)) - mean((false, false)))
      assert(math.abs(r.getAs[Double]("did") - did) < 1e-5,
        s"$t: ${r.getAs[Double]("did")} vs $did")
      assert(r.getAs[Long]("n") == ev.count(_._1 == t).toLong)
      // treatment is a synthetic id split — the true effect is zero, so
      // the estimate should sit within a few se of it
      assert(math.abs(r.getAs[Double]("did")) <= 5.0 * r.getAs[Double]("se"),
        s"$t: null design rejected — ${r.getAs[Double]("did")} vs se ${r.getAs[Double]("se")}")
    }
  }

  test("power analysis: internally consistent — detecting its own MDE needs ~n/2 per arm") {
    val rows = Warehouse.qPowerAnalysis(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val sd = r.getAs[Double]("sd")
      val mdeAbs = r.getAs[Double]("mde_abs")
      val mean = r.getAs[Double]("mean")
      assert(sd > 0 && mdeAbs > 0)
      // mde_abs recomputes from the row's own (n, sd)
      assert(math.abs(mdeAbs - 2.8016 * sd * math.sqrt(4.0 / n)) < 1e-4)
      // self-consistency: the per-arm n that detects mde_abs is ~n/2
      val nArm = 2.0 * math.pow(2.8016 * sd / mdeAbs, 2)
      assert(math.abs(nArm - n / 2) / (n / 2) < 0.01,
        s"${r.getAs[String]("event_type")}: $nArm vs ${n / 2}")
      // bps form is the absolute form relative to the mean
      assert(math.abs(r.getAs[Double]("mde_bps") - mdeAbs / mean * 10000.0) < 0.2)
      // a 1% lift needs more samples than this corpus iff mde_bps > 100
      val needs = r.getAs[Double]("n_per_arm_1pct")
      assert((needs > n / 2) == (r.getAs[Double]("mde_bps") > 100.0))
    }
  }

  test("windowed funnel: a step past its 24h deadline stalls where the plain funnel converts") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(h: Long) = new Timestamp(1700000000000L + h * 3600000L)
    val rows = Seq(
      // user 1: click 2h after view, purchase 3h after click — converts
      (1L, ts(0), 1L, "view"), (2L, ts(2), 1L, "click"), (3L, ts(5), 1L, "purchase"),
      // user 2: click 25h after view — PAST the deadline; the plain
      // funnel credits it, the windowed funnel stalls at view
      (10L, ts(0), 2L, "view"), (11L, ts(25), 2L, "click"),
      // user 3: click in time (23h), purchase 30h after click — stalls
      // at click in the windowed funnel only
      (20L, ts(0), 3L, "view"), (21L, ts(23), 3L, "click"), (22L, ts(53), 3L, "purchase"),
      // user 4: boundary — click exactly 24h after view still counts
      (30L, ts(0), 4L, "view"), (31L, ts(24), 4L, "click"))
      .map { case (id, t, u, e) => (id, t, u, e, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("wfunnel").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.get(1) != null, r.get(2) != null, r.get(3) != null))
      .toMap
    val windowed = shape(Warehouse.qFunnelWindowed(spark, dir))
    val plain = shape(Warehouse.qFunnel(spark, dir))
    assert(windowed(1L) == ((true, true, true)))
    assert(windowed(2L) == ((true, false, false)) && plain(2L) == ((true, true, false)))
    assert(windowed(3L) == ((true, true, false)) && plain(3L) == ((true, true, true)))
    assert(windowed(4L) == ((true, true, false)), "inclusive 24h boundary")
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

  test("outlier mad: planted 100x spike flagged, clean uniform column flags zero") {
    import spark.implicits._
    // uniform [0,1): max |dev| = 2*MAD < 3*1.4826*MAD — zero outliers
    val clean = (0 until 1000)
      .map(i => ("g", (i.toDouble + 0.5) / 1000.0)).toDF("grp", "v")
    val cleanRow = Warehouse.robustOutlierReport(clean, "grp", "v").collect()(0)
    assert(cleanRow.getAs[Long]("n_outliers") == 0L,
      s"uniform column must flag nothing, got $cleanRow")
    // same column plus ten 100x spikes: exactly those ten flagged, and
    // the spikes move the median by at most one rank step
    val spiked = clean.union(Seq.fill(10)(("g", 100.0)).toDF("grp", "v"))
    val spikedRow = Warehouse.robustOutlierReport(spiked, "grp", "v").collect()(0)
    assert(spikedRow.getAs[Long]("n_outliers") == 10L,
      s"exactly the planted spikes must be flagged, got $spikedRow")
    assert(math.abs(spikedRow.getAs[Double]("med") - 0.5) < 0.02,
      "median must shrug off 1% contamination")
  }

  test("outlier mad face: per-type rates are small and stats are sane") {
    val rows = Warehouse.qOutlierMad(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val out = r.getAs[Long]("n_outliers")
      assert(out >= 0 && out < n / 5, s"rate implausible: $r")
      assert(r.getAs[Double]("mad") > 0.0 && r.getAs[Double]("med") > 0.0)
    }
  }

  test("cohort value: cumulative is monotone, closes on the day sum, cohort sizes cover all users") {
    val rows = Warehouse.qCohortValue(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0).toString)
    byCohort.foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("day_idx"))
      val cums = sorted.map(_.getAs[Double]("cum_value"))
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"cohort $c: cumulative value must be monotone")
      val daySum = sorted.map(_.getAs[Double]("day_value")).sum
      assert(math.abs(cums.last - daySum) < 0.01 * sorted.length,
        s"cohort $c: final cum $daySum vs ${cums.last}")
    }
    val nUsers = byCohort.values
      .map(_.head.getAs[Long]("n_users")).sum
    val distinctUsers = graft.sources.Tables.table(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(nUsers <= distinctUsers,
      "cohorts with zero purchases may be absent, but never overcounted")
  }

  test("attribution: credited click precedes the purchase within the lookback") {
    val rows = Warehouse.qAttribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val events = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          r.getAs[Long]("us"))).toMap
    val lookback = 7L * 86400L * 1000000L
    var attributed = 0
    rows.foreach { r =>
      val user = r.getAs[Long]("user_id")
      val pUs = r.getAs[Long]("purchase_us")
      if (r.getAs[Boolean]("attributed")) {
        attributed += 1
        val (cUser, cType, cUs) = events(r.getAs[Long]("attributed_click_id"))
        assert(cUser == user && cType == "click", s"wrong credit: $r")
        assert(cUs <= pUs && pUs - cUs <= lookback, s"outside lookback: $r")
        assert(r.getAs[Long]("lag_us") == pUs - cUs)
      } else {
        // no click in (purchase - 7d, purchase) for this user
        val stale = events.values.forall { case (u, t, us) =>
          u != user || t != "click" || us >= pUs || pUs - us > lookback
        }
        assert(stale, s"unattributed purchase had an eligible click: $r")
      }
    }
    assert(attributed > 0, "corpus should attribute at least one purchase")
  }

  test("market basket: pair counts bounded by item supports, lift arithmetic exact") {
    val rows = Warehouse.qMarketBasket(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val d = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    val nTotal = d.map(_._1).distinct.length.toLong
    val support = d.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"))
      val nAb = r.getAs[Long]("n_ab")
      assert(a < b, s"pair must be canonical: $r")
      assert(nAb >= 2 && nAb <= math.min(support(a), support(b)),
        s"support inconsistency: $r")
      assert(r.getAs[Long]("n_a") == support(a) &&
        r.getAs[Long]("n_b") == support(b))
      assert(r.getAs[Long]("lift_ppm") ==
        nAb * nTotal * 1000000L / (support(a) * support(b)))
    }
    // brute-force the most frequent pair's count
    val byOrder = d.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val top = rows.maxBy(_.getAs[Long]("n_ab"))
    val (ta, tb) = (top.getAs[Long]("part_a"), top.getAs[Long]("part_b"))
    val brute = byOrder.values.count(s => s.contains(ta) && s.contains(tb))
    assert(top.getAs[Long]("n_ab") == brute.toLong)
  }

  test("event paths: counts reconcile with the triple total; cut is deterministic") {
    val rows = Warehouse.qEventPaths(spark, sfDir, k = 1000).collect()
    assert(rows.nonEmpty)
    // with k large enough to keep every path, counts sum to the number
    // of consecutive triples = sum over users of max(0, n_events - 2)
    val perUser = graft.sources.Tables.table(spark, sfDir, "events")
      .groupBy("user_id").count().collect().map(_.getAs[Long]("count"))
    val triples = perUser.map(n => math.max(0L, n - 2L)).sum
    assert(rows.map(_.getAs[Long]("n")).sum == triples)
    // ordering: non-increasing counts, path asc within equal counts
    val ns = rows.map(r => (r.getAs[Long]("n"), r.getAs[String]("path")))
    ns.zip(ns.tail).foreach { case ((n1, p1), (n2, p2)) =>
      assert(n1 > n2 || (n1 == n2 && p1 < p2), s"cut order broken at $p1/$p2")
    }
    // top-20 face is a prefix of the full ranking
    val top = Warehouse.qEventPaths(spark, sfDir).collect()
      .map(_.getAs[String]("path")).toSeq
    assert(top == ns.take(top.length).map(_._2).toSeq)
  }

  test("jackknife ci: se tracks the analytic sd/sqrt(n); band brackets the mean") {
    val rows = Warehouse.qJackknifeCi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val stats = graft.sources.Tables.table(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), stddev(col("value")).as("sd"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("sd"))).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (n, sd) = stats(t)
      val analytic = sd / math.sqrt(n.toDouble)
      val se = r.getAs[Double]("se")
      assert(se > analytic * 0.75 && se < analytic * 1.25,
        s"$t: jackknife se $se vs analytic $analytic")
      val mean = r.getAs[Double]("mean")
      assert(r.getAs[Double]("ci_lo") < mean && mean < r.getAs[Double]("ci_hi"))
      assert(r.getAs[Long]("n") == n)
    }
  }

  test("funnel time: counts reconcile with the funnel frame, p90 >= median >= 0") {
    val rows = Warehouse.qFunnelTime(spark, sfDir).collect()
      .map(r => r.getAs[String]("step") -> r).toMap
    assert(rows.keySet == Set("view_to_click", "click_to_purchase"))
    val funnel = Warehouse.qFunnel(spark, sfDir).collect()
    val clicks = funnel.count(_.getAs[java.sql.Timestamp]("t_click") != null)
    val purchases = funnel.count(_.getAs[java.sql.Timestamp]("t_purchase") != null)
    assert(rows("view_to_click").getAs[Long]("n_converted") == clicks.toLong)
    assert(rows("click_to_purchase").getAs[Long]("n_converted") == purchases.toLong)
    rows.values.foreach { r =>
      val med = r.getAs[Double]("median_lat_us")
      val p90 = r.getAs[Double]("p90_lat_us")
      assert(med >= 0.0 && p90 >= med, s"quantile ordering broken: $r")
    }
  }

  private def syntheticSeries(ys: Seq[Long]) = {
    import spark.implicits._
    val day0 = java.time.LocalDate.parse("2024-01-01") // a Monday
    ys.zipWithIndex
      .map { case (y, i) => (java.sql.Date.valueOf(day0.plusDays(i)), y) }
      .toDF("d", "y")
  }

  test("ewma: constant series is its own smooth, a step halves the gap daily") {
    // constant: s == 1000·y from day one, deviation 0 after the seed
    val flat = Warehouse.ewmaOf(syntheticSeries(Seq.fill(10)(40L))).collect()
    assert(flat.forall(_.getAs[Long]("ewma_x1000") == 40000L))
    assert(flat.tail.forall(_.getAs[Long]("dev_x1000") == 0L))
    // step 0→100 at day 5: the gap to 100000 halves (floor) each day,
    // and dev spikes exactly at the step then decays
    val step = Warehouse.ewmaOf(
      syntheticSeries(Seq.fill(5)(0L) ++ Seq.fill(6)(100L))).collect()
      .sortBy(_.getAs[java.sql.Date]("d").getTime)
    val s = step.map(_.getAs[Long]("ewma_x1000"))
    assert(s.take(5).forall(_ == 0L))
    assert(s(5) == 50000L && s(6) == 75000L && s(7) == 87500L)
    val dev = step.map(_.getAs[Long]("dev_x1000"))
    assert(dev(5) == 100000L, "the step day deviates by the full jump")
    assert(dev(6) == 50000L && dev(7) == 25000L, "deviation decays with s")
    // real corpus: one row per spine day, deterministic rerun
    val real = Warehouse.qEwmaDaily(spark, sfDir).collect()
    assert(real.length > 0)
    assert(real.map(_.getAs[java.sql.Date]("d")).distinct.length == real.length)
  }

  test("forecast backtest: pure weekly series gives snaive zero error, naive nonzero") {
    val s = Seq(30L, 10L, 50L, 20L, 5L, 40L, 15L)
    val rows = Warehouse.forecastBacktestOf(
      syntheticSeries((0 until 28).map(i => s(i % 7)))).collect()
      .sortBy(_.getAs[java.sql.Date]("d").getTime)
    // first 7 days lack a same-weekday predecessor — 21 backtest days
    assert(rows.length == 21)
    assert(rows.forall(_.getAs[Long]("ae_snaive") == 0L),
      "seasonal-naive must be exact on a pure weekly plant")
    assert(rows.forall(r => r.getAs[Long]("ae_naive") ==
      math.abs(r.getAs[Long]("y") - r.getAs[Long]("naive_y"))))
    assert(rows.exists(_.getAs[Long]("ae_naive") > 0L),
      "day-over-day naive must miss on a varying series")
    // real corpus runs and every error is consistent
    val real = Warehouse.qForecastBacktest(spark, sfDir).collect()
    real.foreach { r =>
      assert(r.getAs[Long]("ae_snaive") ==
        math.abs(r.getAs[Long]("y") - r.getAs[Long]("snaive_y"))) }
  }

  test("fulfillment lag and discount lift: ordered quantiles, exact baseline arithmetic") {
    val lag = Warehouse.qFulfillmentLag(spark, sfDir).collect()
    assert(lag.nonEmpty)
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem").count()
    assert(lag.map(_.getAs[Long]("n_lines")).sum == li,
      "every line item contributes to exactly one priority")
    lag.foreach { r =>
      assert(r.getAs[Double]("p50_days") <= r.getAs[Double]("p90_days"))
      assert(r.getAs[Double]("p90_days") <= r.getAs[Long]("max_days").toDouble)
    }
    val lift = Warehouse.qDiscountLift(spark, sfDir).collect()
      .map(r => r.getAs[Long]("discount_pct") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("avg_qty_x100"),
          r.getAs[Long]("lift_ppm"))).toMap
    assert(lift.contains(0L) && lift(0L)._3 == 0L, "baseline lifts itself by 0")
    val base = lift(0L)._2
    lift.foreach { case (_, (_, avg, ppm)) =>
      assert(ppm == (BigInt(avg) - base) * 1000000 / base, "lift arithmetic") }
  }

  test("psi: a stable plant reads near zero, a shifted plant alarms") {
    import spark.implicits._
    import java.sql.Timestamp
    val day = 86400000L
    // "stable": same value grid both periods; "shift": period-2 values
    // jump +1000 (every row beyond the reference's top decile cutoff)
    val rows = (0 until 400).map { i =>
      val period2 = i >= 200
      val t = new Timestamp(1700000000000L + (if (period2) 10 else 0) * day
        + (i % 200) * 1000L)
      val v = (i % 100) + 1.0
      (i.toLong * 2, t, i.toLong, "stable", v)
    } ++ (0 until 400).map { i =>
      val period2 = i >= 200
      val t = new Timestamp(1700000000000L + (if (period2) 10 else 0) * day
        + (i % 200) * 1000L)
      val v = (i % 100) + 1.0 + (if (period2) 1000.0 else 0.0)
      (100000L + i * 2, t, 1000L + i, "shift", v)
    }
    val dir = java.nio.file.Files.createTempDirectory("psi").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Warehouse.qPsi(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
          r.getAs[Double]("psi"))).toMap
    assert(out("stable")._3 < 0.1,
      s"identical distributions must read stable: ${out("stable")}")
    assert(out("shift")._3 > 1.0,
      s"a wholesale shift must alarm hard: ${out("shift")}")
    assert(out("stable")._1 == 200L && out("stable")._2 == 200L)
    // real corpus: every type scored, PSI bounded sane
    val real = Warehouse.qPsi(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getAs[Double]("psi") >= 0.0 - 1e-9))
  }

  test("key skew: buckets partition keys and rows; a planted hot key surfaces alone") {
    import spark.implicits._
    import java.sql.Timestamp
    val out = Warehouse.qKeySkew(spark, sfDir).collect()
    val ev = graft.sources.Tables.table(spark, sfDir, "events")
    assert(out.map(_.getAs[Long]("n_rows")).sum == ev.count())
    assert(out.map(_.getAs[Long]("n_keys")).sum ==
      ev.select("user_id").distinct().count())
    val shares = out.map(_.getAs[Long]("rows_share_ppm")).sum
    assert(shares > 1000000L - out.length && shares <= 1000000L)
    // planted: 1000 rows on one key + 10 singletons → the hot key owns
    // bucket 9 (512..1023) alone with ~99% of the row mass
    val rows = ((1 to 1000).map(i => (i.toLong, 99L)) ++
      (1 to 10).map(i => (10000L + i, i.toLong)))
      .map { case (id, u) =>
        (id, new Timestamp(1700000000000L + id), u, "view", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("skew").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = Warehouse.qKeySkew(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("max_rows_per_key"),
          r.getAs[Long]("rows_share_ppm"))).toMap
    assert(planted(9L) == ((1L, 1000L, 990099L)),
      s"hot key must own its bucket: ${planted.toSeq.sortBy(_._1)}")
    assert(planted(0L)._1 == 10L, "singletons share bucket 0")
  }

  test("stickiness: DAU never exceeds trailing MAU, ratio consistent") {
    import org.apache.spark.sql.functions._
    val out = Warehouse.qStickiness(spark, sfDir).collect()
    assert(out.nonEmpty)
    val dauDirect = graft.sources.Tables.table(spark, sfDir, "events")
      .select(to_date(date_trunc("day", col("ts"))).as("day"), col("user_id"))
      .distinct().groupBy("day").count().collect()
      .map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("count")).toMap
    out.foreach { r =>
      val (dau, mau) = (r.getAs[Long]("dau"), r.getAs[Long]("mau_28d"))
      assert(dau == dauDirect(r.getAs[java.sql.Date]("day")))
      assert(dau <= mau, "a day's actives are a subset of its trailing month's")
      assert(r.getAs[Long]("stickiness_ppm") == BigInt(dau) * 1000000 / mau)
    }
    // the KMV twin: below-k windows estimate EXACTLY (every id kept),
    // so at spec scale the approx face must reproduce the exact ppm
    val approx = Warehouse.qStickinessApprox(spark, sfDir).collect()
      .map(r => r.getAs[java.sql.Date]("day") ->
        r.getAs[Long]("stickiness_ppm_est")).toMap
    out.foreach { r =>
      assert(approx(r.getAs[java.sql.Date]("day")) ==
        r.getAs[Long]("stickiness_ppm"),
        "below-k KMV regime must degenerate to the exact ratio") }
  }

  test("survival: planted churn cohort reproduces the KM curve by hand") {
    import spark.implicits._
    import java.sql.Timestamp
    val day = 86400000L
    def ev(id: Long, u: Long, d: Int) =
      (id, new Timestamp(1700000000000L + d * day), u, "view", 1.0)
    // horizon = day 30; u1,u2 churn at t=2, u3 at t=5; u4 (t=28) and
    // u5 (t=30) are censored (within 7 days of the horizon)
    val log = Seq(
      ev(1, 1, 0), ev(2, 1, 2),
      ev(3, 2, 0), ev(4, 2, 2),
      ev(5, 3, 0), ev(6, 3, 5),
      ev(7, 4, 0), ev(8, 4, 28),
      ev(9, 5, 0), ev(10, 5, 30))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("surv").toString
    log.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Warehouse.qSurvival(spark, dir).collect()
      .map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("n_churned"), r.getAs[Double]("survival")))
      .sortBy(_._1)
    // hand KM: S(2)=1−2/5=0.6, S(5)=0.6·(1−1/3)=0.4, flat thereafter
    assert(out.toSeq == Seq(
      (2L, 5L, 2L, 0.6), (5L, 3L, 1L, 0.4),
      (28L, 2L, 0L, 0.4), (30L, 1L, 0L, 0.4)), s"got ${out.toSeq}")
    // monotone non-increasing always; the real corpus (fully censored
    // at sf scale) stays at 1.0 — the censoring-aware answer, where a
    // naive mean lifetime would report ~28 days of "churn"
    val real = Warehouse.qSurvival(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("t_days")).map(_.getAs[Double]("survival"))
    real.zip(real.tail).foreach { case (a, b) => assert(b <= a + 1e-12) }
  }

  test("seasonal decompose: pure weekly plant recovered bit-exactly") {
    val s = Seq(3L, -2L, 5L, 0L, -4L, 1L, -3L) // Σ = 0, indexed by weekday
    val series = syntheticSeries((0 until 35).map(i => 100L + s(i % 7)))
    val rows = Warehouse.seasonalDecompose(series).collect()
    assert(rows.length == 35 - 6) // edge days without a full window drop
    rows.foreach { r =>
      val dow = r.getAs[Long]("dow").toInt
      assert(r.getAs[Long]("trend_x7") == 700L, s"trend at $r")
      assert(r.getAs[Long]("seas_x7000") == 7000L * s(dow), s"seasonal at $r")
      assert(r.getAs[Long]("resid_x7000") == 0L, s"residual at $r")
    }
  }

  test("seasonal decompose face: decomposition identity and dow-mean floor bound") {
    val rows = Warehouse.qSeasonalDecompose(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // identity: 7000·y == 1000·trend_x7 + seas_x7000 + resid_x7000 by construction
    rows.foreach { r =>
      assert(7000L * r.getAs[Long]("y") ==
        1000L * r.getAs[Long]("trend_x7") + r.getAs[Long]("seas_x7000")
          + r.getAs[Long]("resid_x7000"))
    }
    // seasonal is the floor of the dow-group detrended mean (×7000)
    rows.groupBy(_.getAs[Long]("dow")).foreach { case (_, g) =>
      val n = g.length
      val sumDetr = g.map(r => 7L * r.getAs[Long]("y") - r.getAs[Long]("trend_x7")).sum
      val seas = g.head.getAs[Long]("seas_x7000")
      assert(g.forall(_.getAs[Long]("seas_x7000") == seas))
      assert(seas * n <= 1000L * sumDetr && 1000L * sumDetr < (seas + 1) * n)
    }
  }

  test("late arrivals: regressions measured against the per-user running max, in-order streams clean") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L) // minute marks
    val rows = Seq(
      // u1 arrival order (event_id): 0', 30', then 15' (LATE by 15 min
      // vs the running max 30'), then 40' (on time)
      (1L, ts(0), 1L), (2L, ts(30), 1L), (3L, ts(15), 1L), (4L, ts(40), 1L),
      // u2 strictly in order — contributes no lateness
      (10L, ts(5), 2L), (11L, ts(20), 2L), (12L, ts(35), 2L),
      // u3: first event can never be late even at an early timestamp
      (20L, ts(2), 3L))
      .map { case (id, t, u) => (id, t, u, "view", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("late").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Warehouse.qLateArrivals(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n")).sum == 8L)
    val late = out.filter(_.getAs[Long]("n_late") > 0L)
    assert(late.length == 1, s"exactly one hour carries the late event: ${out.toList}")
    val h = late.head
    assert(h.getAs[Long]("n_late") == 1L)
    assert(h.getAs[Long]("max_late_us") == 15L * 60L * 1000000L)
    assert(h.getAs[Long]("mean_late_us") == 15L * 60L * 1000000L)
    // the late event buckets by ITS OWN event time (15' → hour 0)
    assert(h.getAs[java.sql.Timestamp]("hour").getTime == 1700000000000L - 1700000000000L % 3600000L)
    out.filter(_.getAs[Long]("n_late") == 0L).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("mean_late_us")),
        "clean hours have no mean lateness (nullif), not zero")
      assert(r.getAs[Long]("late_ppm") == 0L)
    }
  }

  test("event gaps: known gaps land in their log2 buckets, double-fires in -1, cum_ppm closes at 1e6") {
    import spark.implicits._
    import java.sql.Timestamp
    def at(us: Long) = { val t = new Timestamp(us / 1000); t.setNanos((us % 1000000).toInt * 1000); t }
    val base = 1700000000000000L
    val rows = Seq(
      // u1: gap of exactly 1s (bucket 19: 2^19 ≤ 1e6 < 2^20), then a
      // same-instant double-fire (bucket -1), then a 30-min gap
      // (1.8e9 µs → bucket 30)
      (1L, at(base), 1L), (2L, at(base + 1000000L), 1L),
      (3L, at(base + 1000000L), 1L), (4L, at(base + 1000000L + 1800000000L), 1L),
      // u2: one 2µs gap (bucket 1) — and NO cross-user gap with u1
      (10L, at(base), 2L), (11L, at(base + 2L), 2L))
      .map { case (id, t, u) => (id, t, u, "view", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("gaps").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Warehouse.qEventGaps(spark, dir).collect()
      .map(r => r.getAs[Long]("gap_bucket") ->
        (r.getAs[Long]("n"), r.getAs[Long]("min_gap_us"),
          r.getAs[Long]("max_gap_us"), r.getAs[Long]("cum_ppm"))).toMap
    assert(out.keySet == Set(-1L, 1L, 19L, 30L), s"got ${out.keySet}")
    assert(out(-1L)._1 == 1L && out(-1L)._2 == 0L && out(-1L)._3 == 0L)
    assert(out(1L) == ((1L, 2L, 2L, 500000L)))
    assert(out(19L)._2 == 1000000L)
    assert(out(30L)._3 == 1800000000L)
    assert(out(30L)._4 == 1000000L, "cumulative ppm must close at 1e6")
    // cumulative monotone in bucket order
    val cums = out.toSeq.sortBy(_._1).map(_._2._4)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
  }

  test("anomaly days: a planted spike is flagged, the noisy tail mostly is not") {
    // LCG noise keeps MAD > 0 — a noise-free periodic plant makes >half
    // the residuals exactly the median, MAD collapses to 0, and EVERY
    // deviation flags (the degenerate case C34 documents for clean data)
    val s = Seq(3L, -2L, 5L, 0L, -4L, 1L, -3L)
    val noise = Iterator.iterate(123456789L)(x =>
      x * 6364136223846793005L + 1442695040888963407L)
      .drop(1).take(70).map(x => math.floorMod(x, 21L) - 10L).toSeq
    val ys = (0 until 70).map(i =>
      100L + s(i % 7) + noise(i) + (if (i == 35) 500L else 0L))
    val rows = Warehouse.anomalyDays(
      Warehouse.seasonalDecompose(syntheticSeries(ys))).collect()
      .sortBy(_.getAs[java.sql.Date]("d"))
    // row index 35 - 3 dropped edge days = 32
    val spike = rows(32)
    val med = spike.getAs[Double]("med")
    assert(math.abs(spike.getAs[Long]("resid_x7000") - med) ==
      rows.map(r => math.abs(r.getAs[Long]("resid_x7000") - med)).max)
    assert(spike.getAs[Int]("is_anomaly") == 1, "spike day must flag")
    assert(spike.getAs[Double]("mad") > 0.0, "noise must keep MAD positive")
    // the spike bleeds into its ±3-day trend windows and its weekday's
    // seasonal mean, and uniform noise has fat MAD-relative tails
    // (MAD of U[−a,a] is a/2, so 3·1.4826·MAD ≈ 2.2a — noise days DO
    // exceed it at a nontrivial rate); the contract worth pinning is
    // SELECTIVITY — the flag separates a minority, it does not
    // degenerate to everything-or-nothing — plus the spike dominating
    val flagged = rows.count(_.getAs[Int]("is_anomaly") == 1)
    assert(flagged >= 1 && flagged <= rows.length / 3,
      s"flag must be selective: $flagged of ${rows.length}")
  }

  test("graph components: min-member ids, consistent sizes, ids are members") {
    val rows = Warehouse.qGraphComponents(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val parts = rows.map(_.getAs[Long]("part")).toSet
    val byComp = rows.groupBy(_.getAs[Long]("component_id"))
    byComp.foreach { case (cid, members) =>
      assert(members.forall(_.getAs[Long]("part") >= cid),
        "component id must be the minimum member")
      assert(parts.contains(cid), "component id must itself be a node")
      assert(members.forall(_.getAs[Long]("component_size") == members.length),
        s"size mismatch in component $cid")
    }
    assert(byComp.values.map(_.length).sum == rows.length)
  }

  test("cusum: flat series accumulates nothing and never alarms") {
    val rows = Warehouse.cusum(syntheticSeries(Seq.fill(20)(42L))).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("s_pos_x1000") == 0L && r.getAs[Long]("s_neg_x1000") == 0L)
      assert(r.getAs[Int]("alarm_up") == 0 && r.getAs[Int]("alarm_down") == 0)
    }
  }

  test("cusum: level shift alarms up only after the shift, down only before") {
    val series = syntheticSeries(Seq.fill(15)(100L) ++ Seq.fill(15)(400L))
    val rows = Warehouse.cusum(series).collect().sortBy(_.getAs[java.sql.Date]("d"))
    val (pre, post) = rows.splitAt(15)
    assert(pre.forall(_.getAs[Long]("s_pos_x1000") == 0L))
    assert(pre.forall(_.getAs[Int]("alarm_up") == 0))
    assert(post.exists(_.getAs[Int]("alarm_up") == 1), "up-shift undetected")
    // s_neg DECAYS after the shift (CUSUM drains at v≈−212k/day from
    // ~1.3M, crossing h=500k on post-day 4) — it does not reset
    assert(post.drop(5).forall(_.getAs[Int]("alarm_down") == 0))
    assert(pre.exists(_.getAs[Int]("alarm_down") == 1),
      "below-global-mean prefix should trip the down side")
    // once alarming, the up side stays on through the end (sustained shift)
    val firstUp = rows.indexWhere(_.getAs[Int]("alarm_up") == 1)
    assert(rows.drop(firstUp).forall(_.getAs[Int]("alarm_up") == 1))
  }

  test("percentile approx: returns observed values within the GK rank bound") {
    // the GK contract: each reported quantile is an OBSERVED value whose
    // empirical rank is within n/accuracy (+1 for the rank convention)
    // of the target rank — NOT a relative-value bound (the exact face
    // interpolates; in a long tail the neighbor gap can exceed any
    // fixed percentage, which is what this spec originally tripped on)
    val raw = graft.sources.Tables.table(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Double]("value")).sorted }
    val approx = Warehouse.qPercentileApprox(spark, sfDir).collect()
    assert(approx.size == raw.size && approx.nonEmpty)
    approx.foreach { a =>
      val vs = raw(a.getAs[String]("event_type"))
      val n = vs.length
      assert(a.getAs[Long]("n") == n.toLong)
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach { case (c, p) =>
        val av = a.getAs[Double](c)
        // reported value is observed (face rounds to 4dp — match that)
        def r4(v: Double) = BigDecimal(v)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).doubleValue
        assert(vs.exists(v => math.abs(r4(v) - av) < 1e-9),
          s"$c=$av is not an observed value")
        val rank = vs.count(v => r4(v) <= av)
        val bound = n.toDouble / 10000 + 1
        assert(math.abs(rank - p * n) <= bound + 1,
          s"${a.getAs[String]("event_type")} $c: rank $rank vs target ${p * n}")
      }
      assert(a.getAs[Double]("p50") <= a.getAs[Double]("p90")
        && a.getAs[Double]("p90") <= a.getAs[Double]("p99"))
    }
  }

  test("rfm: quintiles balanced, monetary is the brute-force cents sum, segment arithmetic") {
    val rows = Warehouse.qRfmSegments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val hist = rows.groupBy(_.getAs[Long](c)).map { case (k, v) => k -> v.length }
      assert(hist.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)), s"$c out of range")
      // exact integer quintiles: bucket sizes differ by at most 1
      if (n >= 5) assert(hist.values.max - hist.values.min <= 1,
        s"$c unbalanced: $hist")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("segment") ==
        100 * r.getAs[Long]("r_score") + 10 * r.getAs[Long]("f_score")
          + r.getAs[Long]("m_score"))
      assert(r.getAs[Long]("recency_days") >= 0L)
      assert(r.getAs[Long]("frequency") >= 1L)
    }
    // monetary = brute-force per-user cents sum from the raw events
    val brute = graft.sources.Tables.table(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, es) =>
        u -> es.map(e => math.round(e.getAs[Double]("value") * 100)).sum }
    rows.foreach { r =>
      assert(r.getAs[Long]("monetary_cents") == brute(r.getAs[Long]("user_id")))
    }
  }

  test("peak concurrency: plateau carry, handoff tie, and drain hour exact") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // A spans 09:10–11:50 (carry-only plateau through hour 10 until a
    // drain); B 09:20–09:40; C starts 09:40 exactly as B ends (handoff
    // tie: closed intervals ⇒ momentarily 3 concurrent); D 11:00–11:05
    val sessions = Seq(
      ("A", t("2024-01-01 09:10:00"), t("2024-01-01 11:50:00")),
      ("B", t("2024-01-01 09:20:00"), t("2024-01-01 09:40:00")),
      ("C", t("2024-01-01 09:40:00"), t("2024-01-01 10:55:00")),
      ("D", t("2024-01-01 11:00:00"), t("2024-01-01 11:05:00"))
    ).toDF("user_id", "session_start", "session_end")
    val rows = Warehouse.peakConcurrency(sessions).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour").toString,
        r.getAs[Long]("n_starts"), r.getAs[Long]("peak_concurrency"))).toList
    assert(rows == List(
      ("2024-01-01 09:00:00.0", 3L, 3L), // A+B, then C starts AS B ends
      ("2024-01-01 10:00:00.0", 0L, 2L), // carried plateau A+C, then C drains
      ("2024-01-01 11:00:00.0", 1L, 2L)  // A carried + D
    ), s"got $rows")
  }

  test("peak concurrency face: decomposed windows equal the global brute-force sweep") {
    val face = Warehouse.qPeakConcurrency(spark, sfDir).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour").getTime,
        r.getAs[Long]("peak_concurrency"))).toMap
    val sessions = Warehouse.qSessionize(spark, sfDir).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getAs[java.sql.Timestamp]("session_end").getTime))
    val pts = sessions.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .sortBy { case (ts, d) => (ts, -d) }
    val hourMs = 3600L * 1000L
    var run = 0L
    val peaks = scala.collection.mutable.Map[Long, Long]()
    pts.foreach { case (ts, d) =>
      val h = ts / hourMs * hourMs
      // carried plateau: the hour opens at the pre-point running value
      peaks.getOrElseUpdate(h, run)
      run += d
      if (run > peaks(h)) peaks(h) = run
    }
    assert(face.keySet == peaks.keySet)
    face.foreach { case (h, p) =>
      assert(p == peaks(h), s"hour $h: face $p vs sweep ${peaks(h)}")
    }
  }

  private def edgeDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .distinct.toDF("a", "b")
  }

  test("triangle count: K4 + pendant path + star counted exactly") {
    // K4 on 1..4 (4 triangles), path 4-5-6, star hub 10 with leaves 11..14
    val es = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (4L,5L),(5L,6L),(10L,11L),(10L,12L),(10L,13L),(10L,14L))
    val r = Warehouse.triangleCount(edgeDf(es)).collect().head
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Long]("n_edges") == 12L)
    assert(r.getAs[Long]("n_nodes") == 11L)
    // wedges: K4 degs (4,3,3,3 with node4 deg 4) path adds.. compute directly
    val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map(_._2.length.toLong)
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    assert(r.getAs[Long]("n_wedges") == wedges)
    assert(r.getAs[Long]("clustering_ppm") == 3000000L * 4L / wedges)
  }

  test("triangle count: empty edge frame reports zeros, not NULLs") {
    val r = Warehouse.triangleCount(edgeDf(Seq.empty)).collect().head
    assert(r.getAs[Long]("n_nodes") == 0L && r.getAs[Long]("n_edges") == 0L)
    assert(r.getAs[Long]("n_wedges") == 0L, "empty graph must coalesce wedges to 0")
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.isNullAt(r.fieldIndex("clustering_ppm")),
      "0/0 clustering is undefined — NULL via nullif on both engines")
  }

  test("triangle count: star graph has zero triangles, matches brute force on LCG graph") {
    val hub = (1L to 20L).map(i => (0L, i))
    val star = Warehouse.triangleCount(edgeDf(hub)).collect().head
    assert(star.getAs[Long]("n_triangles") == 0L)
    assert(star.getAs[Long]("clustering_ppm") == 0L)
    // LCG-random graph on 24 nodes vs brute-force enumeration
    val rnd = Iterator.iterate(42L)(x => x * 6364136223846793005L + 1442695040888963407L)
      .drop(1).take(300).toSeq
    val es = rnd.map { x =>
      val a = math.floorMod(x, 24L); val b = math.floorMod(x >> 17, 24L)
      (a, b)
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val eset = es.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var brute = 0L
    for (i <- nodes; j <- nodes if i < j; k <- nodes if j < k)
      if (eset((i, j)) && eset((j, k)) && eset((i, k))) brute += 1
    val r = Warehouse.triangleCount(edgeDf(es)).collect().head
    assert(r.getAs[Long]("n_triangles") == brute,
      s"oriented count ${r.getAs[Long]("n_triangles")} vs brute $brute")
    assert(r.getAs[Long]("n_edges") == es.length.toLong)
  }

  test("cusum by type: each type's lane equals the single-series core run alone") {
    import spark.implicits._
    val byType = Warehouse.qChangepointByType(spark, sfDir).collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(byType.nonEmpty)
    byType.foreach { case (t, rows) =>
      val solo = Warehouse.cusum(Warehouse.dailySeries(
        graft.sources.Tables.table(spark, sfDir, "events")
          .filter($"event_type" === t)
          .select(to_date($"ts").as("d")))).collect()
        .map(r => r.getAs[java.sql.Date]("d").toString ->
          (r.getAs[Long]("s_pos_x1000"), r.getAs[Long]("s_neg_x1000"),
            r.getAs[Int]("alarm_up"), r.getAs[Int]("alarm_down"))).toMap
      assert(rows.length == solo.size, s"$t row count")
      rows.foreach { r =>
        val k = r.getAs[java.sql.Date]("d").toString
        assert(solo(k) == ((r.getAs[Long]("s_pos_x1000"),
          r.getAs[Long]("s_neg_x1000"), r.getAs[Int]("alarm_up"),
          r.getAs[Int]("alarm_down"))), s"$t @ $k")
      }
    }
  }

  test("cusum: window identity equals the max(0,·) recursion replayed") {
    // deterministic LCG series — no Math.random in specs
    val ys = Iterator.iterate(987654321L)(x => (x * 6364136223846793005L + 1442695040888963407L))
      .drop(1).take(60).map(x => math.floorMod(x, 200L)).toSeq
    val rows = Warehouse.cusum(syntheticSeries(ys)).collect()
      .sortBy(_.getAs[java.sql.Date]("d"))
    val mu = math.floorDiv(1000L * ys.sum, ys.length.toLong) // positive: DIV == floor
    val k = mu / 4
    var sp = 0L; var sn = 0L
    rows.zip(ys).foreach { case (r, y) =>
      sp = math.max(0L, sp + (1000L * y - mu - k))
      sn = math.max(0L, sn + (mu - 1000L * y - k))
      assert(r.getAs[Long]("s_pos_x1000") == sp, s"pos at $r")
      assert(r.getAs[Long]("s_neg_x1000") == sn, s"neg at $r")
    }
  }

  test("order priority (C73): semi-join census equals the recomputed EXISTS set") {
    val rows = Warehouse.qOrderPriority(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val o = graft.sources.Tables.table(spark, sfDir, "orders")
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
    // reference: distinct late orderkeys via the fan-out + dedup route
    val late = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
      .select(col("o_orderkey"), col("o_orderpriority")).distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_late_orders") ==
        late(r.getAs[String]("o_orderpriority")))
    }
  }

  test("top customers (C74): descending cents, each row's revenue recomputes") {
    val rows = Warehouse.qTopCustomers(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Long]("revenue_cents"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("c_custkey")).distinct.length == rows.length)
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
    val o = graft.sources.Tables.table(spark, sfDir, "orders")
    val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100
        + 0.5).cast("long")).as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(
      r.getAs[Long]("revenue_cents") == expect(r.getAs[Long]("c_custkey"))))
  }

  test("min-cost supplier (C75): struct-min argmin == min + min-suppkey tiebreak") {
    val rows = Warehouse.qMinCostSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("p_partkey")).distinct.length == rows.length,
      "exactly one winner per part")
    val offers = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") / col("l_quantity") * 100 + 0.5)
          .cast("long").as("c"))
      .groupBy("l_partkey", "l_suppkey").agg(min(col("c")).as("c"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (p, rs) =>
        val best = rs.map(_.getLong(2)).min
        p -> (best, rs.filter(_.getLong(2) == best).map(_.getLong(1)).min)
      }
    rows.foreach { r =>
      val (cents, supp) = offers(r.getAs[Long]("p_partkey"))
      assert(r.getAs[Long]("unit_cents") == cents)
      assert(r.getAs[Long]("s_suppkey") == supp, "ties break to min suppkey")
    }
  }

  test("customer order distribution (C77): masses add up, zero bucket counted") {
    val rows = Warehouse.qCustOrderDist(spark, sfDir).collect()
    val nCust = graft.sources.Tables.table(spark, sfDir, "customer").count()
    val nOrd = graft.sources.Tables.table(spark, sfDir, "orders").count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    assert(rows.map(r =>
      r.getAs[Long]("n_orders") * r.getAs[Long]("n_customers")).sum == nOrd)
    val ordering = graft.sources.Tables.table(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    val zero = rows.find(_.getAs[Long]("n_orders") == 0L)
      .map(_.getAs[Long]("n_customers")).getOrElse(0L)
    assert(zero == nCust - ordering, "zero-order customers survive the left join")
  }

  test("linear trend (C83): exact on planted lines, incl. the negative-slope floor path") {
    val up = Warehouse.linearTrendOf(
      syntheticSeries((0 until 30).map(i => 7L + 5L * i))).collect().head
    assert(up.getAs[Long]("n_days") == 30L)
    assert(up.getAs[Long]("slope_ppm") == 5000000L)
    assert(up.getAs[Long]("intercept_x1000") == 7000L)
    val down = Warehouse.linearTrendOf(
      syntheticSeries((0 until 30).map(i => 100L - 3L * i))).collect().head
    assert(down.getAs[Long]("slope_ppm") == -3000000L)
    assert(down.getAs[Long]("intercept_x1000") == 100000L)
    // non-exact fit floors (not truncates): y = [0,0,1] has slope 1/2
    // → floor(0.5e6·…) lanes; replay the closed form by hand
    val frac = Warehouse.linearTrendOf(syntheticSeries(Seq(0L, 0L, 1L))).collect().head
    // n=3, sx=3, sy=1, sxy=2, sxx=5 → num=1e6·(6−3)=3e6, den=15−9=6 → 500000
    assert(frac.getAs[Long]("slope_ppm") == 500000L)
    // inum=1000·(1·5−3·2)=−1000, den=6 → floor(−166.67) = −167
    assert(frac.getAs[Long]("intercept_x1000") == -167L)
    val real = Warehouse.qLinearTrend(spark, sfDir).collect()
    assert(real.length == 1 && real.head.getAs[Long]("n_days") > 0)
  }

  test("theil-sen (C99): exact on planted lines, robust where OLS is dragged by one outlier") {
    // perfect line: every pairwise slope is exactly 5e6 ppm; residuals
    // all equal the intercept in ×2e6 lanes
    val up = Warehouse.theilSenOf(
      syntheticSeries((0 until 30).map(i => 7L + 5L * i))).collect().head
    assert(up.getAs[Long]("n_days") == 30L)
    assert(up.getAs[Long]("n_pairs") == 435L) // C(30,2)
    assert(up.getAs[Long]("slope_ppm_x2") == 10000000L)
    assert(up.getAs[Long]("intercept_x4e6") == 28000000L)
    // one wild outlier at the END of the window (at the center it would
    // sit on x̄ and not move OLS at all): the pairwise-slope median is
    // untouched while least squares is dragged three orders of magnitude
    val ys = (0 until 21).map(i => 10L + 2L * i).updated(20, 100000L)
    val ts = Warehouse.theilSenOf(syntheticSeries(ys)).collect().head
    assert(ts.getAs[Long]("slope_ppm_x2") == 4000000L,
      "median slope must ignore the outlier")
    val ols = Warehouse.linearTrendOf(syntheticSeries(ys)).collect().head
    assert(ols.getAs[Long]("slope_ppm") > 3L * 2000000L,
      "OLS on the same series is dragged — the robustness gap is real")
    // scala replay on a small irregular series: every lane re-derived
    val ys2 = Seq(3L, 1L, 4L, 1L, 5L)
    val got = Warehouse.theilSenOf(syntheticSeries(ys2)).collect().head
    val xs = ys2.indices.map(_.toLong)
    val slopes = for (i <- xs.indices; j <- xs.indices if i < j)
      yield Math.floorDiv(1000000L * (ys2(j) - ys2(i)), xs(j) - xs(i))
    val ss = slopes.sorted
    val sx2 = if (ss.size % 2 == 1) 2L * ss(ss.size / 2)
              else ss(ss.size / 2 - 1) + ss(ss.size / 2)
    assert(got.getAs[Long]("slope_ppm_x2") == sx2)
    assert(got.getAs[Long]("n_pairs") == ss.size.toLong)
    val rs = ys2.zip(xs).map { case (y, x) => 2000000L * y - sx2 * x }.sorted
    val rx2 = if (rs.size % 2 == 1) 2L * rs(rs.size / 2)
              else rs(rs.size / 2 - 1) + rs(rs.size / 2)
    assert(got.getAs[Long]("intercept_x4e6") == rx2)
    val real = Warehouse.qTheilSen(spark, sfDir).collect()
    assert(real.length == 1 && real.head.getAs[Long]("n_days") > 0)
  }

  test("holt (C72): scala replay of the two-state fold matches every lane") {
    def replay(ys: Seq[Long]): Seq[(Long, Long, Long)] = {
      var l = -1L; var b = 0L
      ys.map { y =>
        if (l < 0) { l = 1000 * y; b = 0; (l, b, 0L) }
        else {
          val dev = 1000 * y - (l + b)
          val l2 = math.floorDiv(1000 * y + l + b, 2)
          val b2 = math.floorDiv(b + l2 - l, 2)
          l = l2; b = b2; (l, b, dev)
        }
      }
    }
    // a falling ramp drives the trend state NEGATIVE — the floor-div path
    val ys = Seq(100L, 90L, 80L, 70L, 60L, 55L, 55L, 55L, 90L, 20L)
    val rows = Warehouse.holtOf(syntheticSeries(ys)).collect()
      .sortBy(_.getAs[java.sql.Date]("d").getTime)
    val exp = replay(ys)
    rows.zip(exp).foreach { case (r, (l, b, dev)) =>
      assert(r.getAs[Long]("level_x1000") == l, s"level at $r")
      assert(r.getAs[Long]("trend_x1000") == b, s"trend at $r")
      assert(r.getAs[Long]("dev_x1000") == dev, s"dev at $r")
    }
    assert(exp.exists(_._2 < 0), "the plant must exercise a negative trend")
    // constant series: level locks to 1000·y, trend 0, dev 0 after seed
    val flat = Warehouse.holtOf(syntheticSeries(Seq.fill(8)(42L))).collect()
    assert(flat.forall(_.getAs[Long]("level_x1000") == 42000L))
    assert(flat.forall(_.getAs[Long]("trend_x1000") == 0L))
  }

  test("volume shipping (C78): lanes match the flat-join recompute, no self-lanes") {
    val rows = Warehouse.qVolumeShipping(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation")))
    val t = graft.sources.Tables
    val li = t.table(spark, sfDir, "lineitem")
    val o = t.table(spark, sfDir, "orders")
    val c = t.table(spark, sfDir, "customer")
    val sN = t.table(spark, sfDir, "supplier")
      .join(t.table(spark, sfDir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("sn"))
    val cN = t.table(spark, sfDir, "nation")
      .select(col("n_nationkey").as("ck"), col("n_name").as("cn"))
    val flat = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(cN, col("c_nationkey") === col("ck"))
      .join(sN, col("l_suppkey") === col("s_suppkey"))
      .filter(col("sn") =!= col("cn"))
      .groupBy(col("sn"), col("cn"), year(col("l_shipdate")).cast("long").as("y"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100
        + 0.5).cast("long")).as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(rows.length == flat.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"),
        r.getAs[Long]("ship_year"))
      assert(r.getAs[Long]("revenue_cents") == flat(k), s"lane $k")
    }
  }

  test("market share (C79): shares are the floored ppm of the region-year total") {
    val rows = Warehouse.qMarketShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byGroup = rows.groupBy(r =>
      (r.getAs[Number]("cust_regionkey").longValue(), r.getAs[Long]("ship_year")))
    byGroup.foreach { case (_, rs) =>
      val total = rs.map(_.getAs[Long]("revenue_cents")).sum
      rs.foreach { r =>
        val expect = (BigInt(r.getAs[Long]("revenue_cents")) * 1000000 / total).toLong
        assert(r.getAs[Long]("share_ppm") == expect)
      }
      // floored shares can only round DOWN: the group never exceeds 1e6
      assert(rs.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
    }
  }

  test("product profit (C80): the 60%-of-retail proxy recomputes per nation-year") {
    val rows = Warehouse.qProductProfit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val t = graft.sources.Tables
    val flat = t.table(spark, sfDir, "lineitem")
      .join(t.table(spark, sfDir, "part").filter(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey"))
      .join(t.table(spark, sfDir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t.table(spark, sfDir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("y"))
      .agg(sum(
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
          .cast("long")
        - floor(col("p_retailprice") * 60 + 0.5).cast("long")
          * floor(col("l_quantity")).cast("long")).as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.length == flat.size)
    rows.foreach(r => assert(r.getAs[Long]("profit_cents") ==
      flat((r.getAs[String]("supp_nation"), r.getAs[Long]("ship_year")))))
  }

  test("revenue concentration (C81): exactly the parts at/above the ppm threshold") {
    val rows = Warehouse.qRevenueConcentration(spark, sfDir).collect()
    val perPart = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100
        + 0.5).cast("long")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = perPart.values.map(BigInt(_)).sum
    val expect = perPart.collect {
      case (pk, c) if BigInt(c) * 1000000 / total >= 500 =>
        pk -> (c, (BigInt(c) * 1000000 / total).toLong)
    }
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val (c, ppm) = expect(r.getAs[Long]("p_partkey"))
      assert(r.getAs[Long]("revenue_cents") == c)
      assert(r.getAs[Long]("share_ppm") == ppm)
    }
    val ppms = rows.map(_.getAs[Long]("share_ppm"))
    assert(ppms.zip(ppms.tail).forall { case (a, b) => a >= b }, "sorted desc")
  }

  test("top supplier (C82): per-quarter max revenue, ties to min suppkey") {
    val rows = Warehouse.qTopSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("year_q")).distinct.length == rows.length)
    val per = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .groupBy((year(col("l_shipdate")) * 10 + quarter(col("l_shipdate")))
        .cast("long").as("q"), col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100
        + 0.5).cast("long")).as("c"))
      .collect().groupBy(_.getLong(0))
    rows.foreach { r =>
      val rs = per(r.getAs[Long]("year_q"))
      val best = rs.map(_.getLong(2)).max
      assert(r.getAs[Long]("revenue_cents") == best)
      assert(r.getAs[Long]("s_suppkey") ==
        rs.filter(_.getLong(2) == best).map(r2 => r2.getLong(1)).min)
    }
  }

  test("small-quantity revenue (C84): integer sub-half-average predicate recomputes") {
    val rows = Warehouse.qSmallQtyRevenue(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_partkey"), floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val stats = li.groupBy(_._1).map { case (p, xs) =>
      p -> (xs.map(_._2).sum, xs.length.toLong) }
    val brand = graft.sources.Tables.table(spark, sfDir, "part")
      .collect().map(r => r.getAs[Long]("p_partkey") -> r.getAs[String]("p_brand")).toMap
    val expect = li.filter { case (p, q, _) =>
      val (sq, n) = stats(p); q * n * 2 < sq }
      .groupBy(x => brand(x._1))
      .map { case (b, xs) => b -> (xs.map(_._3).sum, xs.length.toLong) }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (c, n) = expect(r.getAs[String]("p_brand"))
      assert(r.getAs[Long]("revenue_cents") == c)
      assert(r.getAs[Long]("n_small_items") == n)
    }
  }

  test("laggard suppliers (C85): sole-late-supplier census recomputes") {
    val rows = Warehouse.qLaggardSuppliers(spark, sfDir).collect()
    val t = graft.sources.Tables
    val f = t.table(spark, sfDir, "lineitem")
      .join(t.table(spark, sfDir, "orders").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max((col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
        .cast("int")).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byOrder = f.groupBy(_._1)
    val expect = f.filter { case (ok, sk, late) =>
      late == 1 &&
        byOrder(ok).exists(x => x._2 != sk) &&
        !byOrder(ok).exists(x => x._2 != sk && x._3 == 1)
    }.groupBy(_._2).map { case (sk, xs) => sk -> xs.length.toLong }
    assert(rows.length == expect.size)
    rows.foreach(r => assert(
      r.getAs[Long]("n_waiting_orders") == expect(r.getAs[Long]("s_suppkey"))))
    val ns = rows.map(_.getAs[Long]("n_waiting_orders"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "sorted desc")
  }

  test("idle customers (C86): above-average balance, dormant since cutoff") {
    val rows = Warehouse.qIdleCustomers(spark, sfDir).collect()
    val cust = graft.sources.Tables.table(spark, sfDir, "customer")
      .collect().map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("c_mktsegment"),
        math.floor(r.getAs[Double]("c_acctbal") * 100 + 0.5).toLong))
    val pos = cust.map(_._3).filter(_ > 0)
    val (sumBal, nBal) = (pos.sum, pos.length.toLong)
    val active = graft.sources.Tables.table(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("2000-08-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expect = cust.filter { case (ck, _, bal) =>
      bal * nBal > sumBal && !active(ck) }
      .groupBy(_._2).map { case (seg, xs) =>
        seg -> (xs.length.toLong, xs.map(_._3).sum) }
    assert(rows.nonEmpty && rows.length == expect.size)
    rows.foreach { r =>
      val (n, tot) = expect(r.getAs[String]("c_mktsegment"))
      assert(r.getAs[Long]("n_customers") == n)
      assert(r.getAs[Long]("total_bal_cents") == tot)
    }
  }

  test("promo revenue (C87): conditional share recomputes, ppm bounded") {
    val rows = Warehouse.qPromoRevenue(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val promo = graft.sources.Tables.table(spark, sfDir, "part")
      .collect().map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[String]("p_type") == "PROMO")).toMap
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_partkey"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("m"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = li.groupBy(_._2).map { case (m, xs) =>
      m -> (xs.filter(x => promo(x._1)).map(_._3).sum, xs.map(_._3).sum) }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (pc, tc) = expect(r.getAs[Long]("ship_month"))
      assert(r.getAs[Long]("promo_cents") == pc)
      assert(r.getAs[Long]("total_cents") == tc)
      val ppm = r.getAs[Long]("promo_ppm")
      assert(ppm == (BigInt(pc) * 1000000 / tc).toLong)
      assert(ppm >= 0 && ppm <= 1000000)
    }
  }

  test("supplier diversity (C88): distinct count excludes brand and bad suppliers") {
    val rows = Warehouse.qSupplierDiversity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val t = graft.sources.Tables
    val f = t.table(spark, sfDir, "lineitem")
      .join(t.table(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
          .cast("long").as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bad = f.groupBy(_._1).collect {
      case (sk, xs) if xs.map(_._2).sum * 1000000L > xs.length * 520000L => sk
    }.toSet
    assert(bad.nonEmpty, "threshold should exclude someone at this sf")
    val part = t.table(spark, sfDir, "part").collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[String]("p_brand"), r.getAs[String]("p_type"), r.getAs[Int]("p_size")))
      .toMap
    val li = t.table(spark, sfDir, "lineitem").select("l_partkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = li.flatMap { case (pk, sk) =>
      val (b, ty, sz) = part(pk)
      if (b != "Brand#1" && sz <= 25 && !bad(sk)) Some(((b, ty, sz), sk)) else None
    }.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).distinct.length.toLong }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("p_brand"), r.getAs[String]("p_type"), r.getAs[Int]("p_size"))
      assert(r.getAs[Long]("supplier_cnt") == expect(k))
    }
    val cnts = rows.map(_.getAs[Long]("supplier_cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "sorted desc")
  }

  test("disjunctive revenue (C89): branch tags are the exclusive conjunctions") {
    val rows = Warehouse.qDisjunctiveRevenue(spark, sfDir).collect()
    assert(rows.length == 3 && rows.map(_.getAs[Long]("branch")).toSeq == Seq(1L, 2L, 3L))
    val part = graft.sources.Tables.table(spark, sfDir, "part").collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[String]("p_brand"), r.getAs[Int]("p_size"))).toMap
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_partkey"), floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def tag(pk: Long, q: Long): Option[Long] = {
      val (b, sz) = part(pk)
      if (b == "Brand#12" && sz >= 1 && sz <= 15 && q >= 1 && q <= 11) Some(1L)
      else if (b == "Brand#23" && sz >= 1 && sz <= 25 && q >= 10 && q <= 20) Some(2L)
      else if (b == "Brand#5" && sz >= 1 && sz <= 50 && q >= 20 && q <= 30) Some(3L)
      else None
    }
    val expect = li.flatMap { case (pk, q, c) => tag(pk, q).map(_ -> c) }
      .groupBy(_._1).map { case (br, xs) => br -> (xs.length.toLong, xs.map(_._2).sum) }
    rows.foreach { r =>
      val (n, c) = expect(r.getAs[Long]("branch"))
      assert(r.getAs[Long]("n_items") == n)
      assert(r.getAs[Long]("revenue_cents") == c)
    }
  }

  test("time to convert (C96): histogram recomputes from per-user firsts, non-converters cap the curve") {
    import org.apache.spark.sql.functions._
    val rows = Warehouse.qTimeToConvert(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver replay: first view, first purchase at/after it
    val evs = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tFrom = evs.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val deltas = evs.filter(_._2 == "purchase").groupBy(_._1).flatMap {
      case (u, xs) => tFrom.get(u).flatMap { t0 =>
        val after = xs.map(_._3).filter(_ >= t0)
        if (after.isEmpty) None else Some(after.min - t0)
      }
    }.toSeq
    def bucket(d: Long): Long =
      if (d == 0) -1L else 63 - java.lang.Long.numberOfLeadingZeros(d)
    val expect = deltas.groupBy(bucket).map { case (b, ds) =>
      b -> (ds.length.toLong, ds.min, ds.max) }
    assert(rows.length == expect.size)
    var cum = 0L
    rows.sortBy(_.getAs[Long]("bucket")).foreach { r =>
      val (n, mn, mx) = expect(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_users") == n)
      assert(r.getAs[Long]("min_delta_us") == mn && r.getAs[Long]("max_delta_us") == mx)
      cum += n
      assert(r.getAs[Long]("cum_converted_ppm") ==
        (BigInt(cum) * 1000000 / tFrom.size).toLong)
    }
    // the curve can only reach 1e6 when every viewer converted
    val last = rows.map(_.getAs[Long]("cum_converted_ppm")).max
    assert(last <= 1000000L &&
      (last == 1000000L) == (deltas.length == tFrom.size))
  }

  test("holt-winters (C95): pure weekly plant converges, constant series degenerates to Holt") {
    import spark.implicits._
    // pure period-7 signal around level 100: seasonals learn at gamma=1/2,
    // so the one-step forecast error roughly halves per cycle
    val pattern = Array(20L, -10L, 0L, 15L, -25L, 5L, -5L)
    val start = java.time.LocalDate.of(2024, 1, 1) // a Monday: weekday 0
    val planted = (0 until 70).map { i =>
      (java.sql.Date.valueOf(start.plusDays(i)), 100L + pattern(i % 7))
    }.toDF("d", "y")
    val rows = Warehouse.holtWintersOf(planted).collect()
    assert(rows.length == 70)
    def cycleErr(c: Int): Long = rows.slice(c * 7, c * 7 + 7)
      .map(r => math.abs(r.getAs[Long]("dev_x1000"))).sum
    // the coupled level lane chases the seasonal signal, so per-cycle
    // error decay is ~0.78, not the bare gamma=1/2 — 9 cycles give 4x
    assert(cycleErr(9) * 4 < cycleErr(1),
      s"seasonal learning must shrink the forecast error: ${cycleErr(1)} -> ${cycleErr(9)}")
    // by week 10 the learned seasonal for Monday approaches its plant
    val lastMon = rows(63)
    assert(math.abs(lastMon.getAs[Long]("seasonal_x1000") - 20000L) < 6000L)
    // degeneracy: a constant series keeps seasonals at ~0 and dev -> 0
    val const = (0 until 28).map(i =>
      (java.sql.Date.valueOf(start.plusDays(i)), 50L)).toDF("d", "y")
    val cr = Warehouse.holtWintersOf(const).collect()
    assert(cr.drop(14).forall(r =>
      math.abs(r.getAs[Long]("dev_x1000")) <= 1000L &&
        math.abs(r.getAs[Long]("seasonal_x1000")) <= 1000L))
    // the registered face runs and is deterministic
    val a = Warehouse.qHoltWinters(spark, sfDir).collect()
    val b = Warehouse.qHoltWinters(spark, sfDir).collect()
    assert(a.nonEmpty && a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("graph distances (C93): planted path + star read exact hop counts, bound respected") {
    import spark.implicits._
    // path 1-2-3-4-5-6 plus star center 10 -> {11,12,13}; seeds {1, 10}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (10L, 12L), (10L, 13L)).toDF("a", "b")
    val seeds = Seq(1L, 10L).toDF("id")
    val out = Warehouse.bfsDistances(edges, seeds, maxHops = 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("hops")).toMap
    val expect = Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      10L -> 0L, 11L -> 1L, 12L -> 1L, 13L -> 1L)
    assert(out == expect, s"got $out — node 5 (4 hops) must be absent, min-hop wins")
    // the registered face: every hop level within [0, 3], seeds at 0
    val rows = Warehouse.qGraphDistances(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byHop = rows.groupBy(_.getAs[Long]("hops")).view.mapValues(_.length).toMap
    assert(byHop.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    val seedCount = graft.sources.Tables.table(spark, sfDir, "part")
      .filter(col("p_brand") === "Brand#12").count()
    assert(byHop(0L).toLong == seedCount, "hop 0 is exactly the seed set")
    assert(rows.map(_.getAs[Long]("p_partkey")).distinct.length == rows.length)
  }

  test("xcorr (C91): a planted 2-day lead reads 1.0 at lag 2, and the real face is sane") {
    import spark.implicits._
    // series B is exactly A shifted 2 days later: corr(A_d, B_{d+2}) = 1
    val base = (0 until 30).map(i => (i, 3L + (i * 7) % 11))
    val planted = (
      base.map { case (i, v) =>
        ("A", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), v) } ++
      base.map { case (i, v) =>
        ("B", java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i + 2)), v) }
    ).toDF("event_type", "d", "y")
    val rows = Warehouse.xcorrOf(planted, maxLag = 4).collect()
    val ab = rows.filter(r => r.getAs[String]("type_a") == "A" &&
      r.getAs[String]("type_b") == "B")
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("xcorr")).toMap
    assert(ab(2) == 1.0, s"lag-2 xcorr should be exactly 1.0, got ${ab(2)}")
    assert(ab.filter(_._1 != 2).values.forall(_ < 0.9),
      "off-lag correlations stay below the planted peak")
    // the registered face: full pair×lag grid, xcorr bounded
    val out = Warehouse.qXcorr(spark, sfDir).collect()
    val types = out.map(_.getAs[String]("type_a")).distinct.length
    assert(out.length == types * (types - 1) * 8)
    out.foreach { r =>
      val x = r.getAs[Double]("xcorr")
      assert(r.isNullAt(r.fieldIndex("xcorr")) || (x >= -1.0 && x <= 1.0))
    }
  }

  test("majority supplier (C90): integer ppm dominance recomputes") {
    val rows = Warehouse.qMajoritySupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val gear = graft.sources.Tables.table(spark, sfDir, "part")
      .filter(col("p_name").contains("gear"))
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("l_quantity")).cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(x => gear(x._1))
    val ps = li.groupBy(x => (x._1, x._2)).map { case (k, xs) => k -> xs.map(_._3).sum }
    val tot = ps.groupBy(_._1._1).map { case (pk, xs) => pk -> xs.map(_._2).sum }
    val dom = ps.filter { case ((pk, _), q) => q * 1000000L >= tot(pk) * 120000L }
    val expect = dom.groupBy(_._1._2).map { case (sk, xs) =>
      sk -> (xs.size.toLong, xs.map(_._2).sum) }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, q) = expect(r.getAs[Long]("s_suppkey"))
      assert(r.getAs[Long]("n_dominated_parts") == n)
      assert(r.getAs[Long]("qty_shipped") == q)
    }
  }
}
