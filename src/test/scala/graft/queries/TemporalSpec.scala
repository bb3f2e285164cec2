package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  test("cdc apply: tombstoned keys are absent, survivors carry their latest payload") {
    import spark.implicits._
    val events = graft.sources.Tables.table(spark, sfDir, "events")
    val snapshot = Temporal.qCdcApply(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // independent expectation via a window (the oracle's form)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val latest = events
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_type", $"props").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    latest.foreach { case (uid, typ, props) =>
      if (typ == "error") assert(!snapshot.contains(uid), s"user $uid should be deleted")
      else assert(snapshot(uid) == props, s"user $uid carries stale payload")
    }
    assert(snapshot.size == latest.count(_._2 != "error"))
  }

  test("cdc compact: the four net rules, collapse counts, tombstone payload nulled") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, u: Long, t: Long, typ: String, v: Double) =
      (id, new Timestamp(1700000000000L + t * 1000L), u, typ, v, s"p$id")
    val log = Seq(
      ev(1, 1, 0, "signup", 1.0), ev(2, 1, 1, "view", 2.0),   // I…U → I, last payload
      ev(3, 2, 0, "signup", 1.0), ev(4, 2, 1, "error", 9.0),  // I…D → NONE
      ev(5, 3, 0, "view", 3.0), ev(6, 3, 1, "click", 4.0),    // U…U → U
      ev(7, 4, 0, "view", 5.0), ev(8, 4, 1, "error", 9.0),    // U…D → D, payload null
      ev(9, 5, 0, "signup", 6.0),                             // lone I → I
      ev(10, 6, 0, "error", 9.0))                             // lone D → D
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("cdccompact").toString
    log.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Temporal.qCdcCompact(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("net_op"), r.getAs[Long]("n_ops"),
          Option(r.getAs[java.lang.Double]("value")),
          Option(r.getAs[String]("props")))).toMap
    assert(!out.contains(2L), "born-and-deleted inside the batch emits nothing")
    assert(out(1L) == (("I", 2L, Some(2.0), Some("p2"))),
      s"net insert carries the LAST payload: ${out(1L)}")
    assert(out(3L) == (("U", 2L, Some(4.0), Some("p6"))))
    assert(out(4L) == (("D", 2L, None, None)), "tombstone payload is nulled")
    assert(out(5L) == (("I", 1L, Some(6.0), Some("p9"))))
    assert(out(6L) == (("D", 1L, None, None)))
    // real corpus: compaction never exceeds the distinct-key count and
    // every emitted row collapses at least one op
    val real = Temporal.qCdcCompact(spark, sfDir).collect()
    assert(real.forall(_.getAs[Long]("n_ops") >= 1L))
    assert(real.length <= graft.sources.Tables.table(spark, sfDir, "events")
      .select("user_id").distinct().count())
  }

  test("scd2: per-user episodes are contiguous, start at first event, one current row") {
    import spark.implicits._
    val hist = Temporal.qScd2(spark, sfDir)
      .select($"user_id", $"valid_from", $"valid_to", $"is_current").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) null else r.getTimestamp(2), r.getBoolean(3)))
      .groupBy(_._1)
    val firstEvent = graft.sources.Tables.table(spark, sfDir, "events")
      .groupBy($"user_id").agg(min($"ts").as("t0")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    hist.foreach { case (uid, rows) =>
      val sorted = rows.sortBy(_._2.getTime)
      assert(sorted.head._2 == firstEvent(uid), s"user $uid history misses first event")
      // intervals chain: each valid_to equals the next valid_from
      sorted.sliding(2).foreach {
        case Array((_, _, to, _), (_, from2, _, _)) => assert(to == from2)
        case _ =>
      }
      assert(sorted.count(_._4) == 1, s"user $uid must have exactly one current row")
      assert(sorted.last._3 == null && sorted.last._4)
    }
  }

  test("scd2 is null-safe: transitions to/from NULL are episodes, NULL runs are one") {
    import spark.implicits._
    val ts = (s: Int) => new java.sql.Timestamp(s * 1000L)
    val log = Seq(
      (1L, ts(1), 1L, Option("A")),   // A → NULL → NULL → B: 3 episodes
      (1L, ts(2), 2L, None),
      (1L, ts(3), 3L, None),
      (1L, ts(4), 4L, Option("B")),
      (2L, ts(1), 5L, None),          // starts NULL: episode from first event
      (2L, ts(2), 6L, Option("C")))
      .toDF("k", "ts", "seq", "attr")
    val hist = Temporal.scd2(log, "k", "ts", "seq", "attr")
      .orderBy($"k", $"valid_from").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getTimestamp(2),
        Option(r.getTimestamp(3))))
    val u1 = hist.filter(_._1 == 1L)
    assert(u1.map(_._2).toSeq == Seq(Some("A"), None, Some("B")),
      "NULL transition must open ONE episode, not zero or two")
    assert(u1.map(_._3).toSeq == Seq(ts(1), ts(2), ts(4)))
    assert(u1.map(_._4).toSeq == Seq(Some(ts(2)), Some(ts(4)), None))
    val u2 = hist.filter(_._1 == 2L)
    assert(u2.map(_._2).toSeq == Seq(None, Some("C")),
      "a key whose first value is NULL still opens at its first event")
  }

  test("fill gaps: every hour in each type's span is present; LOCF carries last value") {
    import spark.implicits._
    val rows = Temporal.qFillGaps(spark, sfDir)
      .select($"event_type", $"h", $"n", $"sum_value", $"locf_value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getDouble(4)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    var sawGap = false
    rows.foreach { case (_, series) =>
      val sorted = series.sortBy(_._2)
      // completeness: consecutive buckets are exactly one hour apart
      sorted.sliding(2).foreach {
        case Array((_, t1, _, _, _), (_, t2, _, _, _)) =>
          assert(t2 - t1 == 3600 * 1000L, "series has a missing or duplicate bucket")
        case _ =>
      }
      var lastSeen = Double.NaN
      sorted.foreach { case (_, _, n, sv, locf) =>
        if (n == 0L) {
          sawGap = true
          assert(sv.isEmpty, "gap rows carry no direct sum")
          assert(locf == lastSeen, "LOCF must carry the last observed value")
        } else {
          assert(sv.isDefined && locf == sv.get)
          lastSeen = sv.get
        }
      }
    }
    assert(sawGap, "test data should contain at least one empty hour")
  }

  test("pivot: per-user counts sum to the user's event total") {
    import spark.implicits._
    val piv = Warehouse.qPivot(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (1 to 5).map(r.getLong).sum).toMap
    val totals = graft.sources.Tables.table(spark, sfDir, "events")
      .groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(piv == totals)
  }

  test("histogram: bins partition the rows; clamped edges hold stragglers") {
    import spark.implicits._
    val rows = Warehouse.qHistogram(spark, sfDir).collect()
    val total = rows.map(_.getLong(3)).sum
    assert(total == graft.sources.Tables.table(spark, sfDir, "events").count())
    rows.foreach { r =>
      val bin = r.getLong(1)
      assert(bin >= 0L && bin <= 19L)
      assert(r.getDouble(2) == bin * 25.0)
    }
  }

  test("salted join result equals the plain join (semantics-transparent)") {
    import spark.implicits._
    val salted = Warehouse.qSkewJoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val events = graft.sources.Tables.table(spark, sfDir, "events")
    val dim = events.select($"event_type").distinct()
      .select($"event_type".as("d_type"), length($"event_type").cast("long").as("weight"))
    val plain = events.join(dim, $"event_type" === $"d_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value" * $"weight"), 2).as("wv"))
      .orderBy($"event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("snapshot series: each checkpoint replays the log truncated at its horizon") {
    import spark.implicits._
    val rows = Temporal.qSnapshotSeries(spark, sfDir).collect()
    assert(rows.length == 4, "one row per checkpoint with activity before it")
    // replay each checkpoint by brute force from the raw log
    val log = graft.sources.Tables.table(spark, sfDir, "events")
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        $"event_type", $"value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    rows.foreach { r =>
      val cpUs = r.getAs[java.sql.Date]("checkpoint").toLocalDate
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
      val lasts = log.filter(_._2 < cpUs).groupBy(_._1)
        .map { case (_, es) => es.maxBy(e => (e._2, e._3)) }
        .filter(_._4 != "error")
      assert(r.getAs[Long]("live_users") == lasts.size.toLong,
        s"live count mismatch at $r")
      val v = BigDecimal(lasts.map(_._5).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("total_value") - v) < 0.02,
        s"value mass mismatch at $r: brute $v")
    }
    // hand-built scenario: upsert → tombstone → re-upsert across horizons
    val mini = Seq(
      (1L, 1000L, 1L, "U", 5.0), (1L, 2000L, 2L, "D", 0.0),
      (1L, 3000L, 3L, "U", 7.0), (2L, 1500L, 4L, "U", 2.0))
    val expect = Map(1500L -> Set(1L), 2500L -> Set(2L), 3500L -> Set(1L, 2L))
    expect.foreach { case (cp, want) =>
      val got = mini.filter(_._2 < cp).groupBy(_._1)
        .map { case (_, es) => es.maxBy(e => (e._2, e._3)) }
        .filter(_._4 != "D").map(_._1).toSet
      assert(got == want, s"scenario at $cp: got $got")
    }
  }

  test("scd2 asof: each lookup row is the episode covering its checkpoint") {
    import spark.implicits._
    val rows = Temporal.qScd2Asof(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // uniqueness: one version per (checkpoint, user)
    val keys = rows.map(r => (r.getDate(0).toString, r.getAs[Long]("user_id")))
    assert(keys.distinct.length == keys.length, "as-of lookup must be unique")
    // cross-check against the history: the matched episode contains T,
    // and it is the LATEST valid_from at or before T
    val hist = Temporal.qScd2(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("props"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        Option(r.getAs[java.sql.Timestamp]("valid_to"))))
    val byUser = hist.groupBy(_._1)
    rows.foreach { r =>
      val cp = java.sql.Timestamp.valueOf(
        r.getDate(0).toLocalDate.atStartOfDay())
      val user = r.getAs[Long]("user_id")
      val eps = byUser(user).filter(e =>
        !e._3.after(cp) && e._4.forall(_.after(cp)))
      assert(eps.length == 1, s"episodes covering $cp for $user: ${eps.length}")
      assert(eps.head._2 == r.getAs[String]("props"), s"wrong version at $r")
    }
    // completeness per checkpoint: exactly the users whose history had
    // started by T appear (no episode is ever skipped or invented)
    val cps = rows.map(_.getDate(0).toString).distinct
    cps.foreach { cpS =>
      val cp = java.sql.Timestamp.valueOf(
        java.time.LocalDate.parse(cpS).atStartOfDay())
      val started = byUser.collect {
        case (u, eps) if eps.exists(!_._3.after(cp)) => u
      }.toSet
      val got = rows.filter(_.getDate(0).toString == cpS)
        .map(_.getAs[Long]("user_id")).toSet
      assert(got == started, s"$cpS: coverage mismatch")
    }
  }

  test("replay diff (I9): planted stragglers restate exactly the recomputed cells") {
    import org.apache.spark.sql.functions._
    val rows = Warehouse.qReplayDiff(spark, sfDir).collect()
    assert(rows.nonEmpty, "the planted stragglers must restate some cells")
    // driver replay of the planted mutation + I6 lateness definition
    val evs = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .collect()
      .map { r =>
        val id = r.getAs[Long]("event_id")
        val raw = r.getAs[java.sql.Timestamp]("ts")
        val ts = if (id % 37 == 0)
          new java.sql.Timestamp(raw.getTime - 2L * 24 * 3600 * 1000) else raw
        (r.getAs[Long]("user_id"), id, r.getAs[String]("event_type"), ts)
      }
    val late = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var seen = Long.MinValue
      es.sortBy(_._2).toSeq.flatMap { case (_, id, _, ts) =>
        val us = ts.getTime
        val l = seen != Long.MinValue && us < seen
        seen = math.max(seen, us)
        if (l) Some(id) else None
      }
    }.toSet
    assert(late.nonEmpty && late.forall(_ % 37 == 0))
    val cells = evs.groupBy(e => (e._4.toLocalDateTime.toLocalDate.toString, e._3))
      .map { case (k, es) =>
        k -> (es.count(e => !late(e._2)).toLong, es.length.toLong) }
    val expect = cells.filter { case (_, (p, c)) => p != c }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val k = (r.getDate(0).toString, r.getAs[String]("event_type"))
      val (p, c) = expect(k)
      assert(r.getAs[Long]("n_published") == p && r.getAs[Long]("n_corrected") == c)
      assert(p < c, "published can only undercount")
      assert(r.getAs[Long]("correction_ppm") ==
        (BigInt(c - p) * 1000000 / c).toLong)
    }
  }
}
