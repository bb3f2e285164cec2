package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitionedSpec extends SparkSpec {

  test("compaction collapses a fragmented table to byte-sized files, data intact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val events = Tables.table(spark, sfDir, "events")
    // fragment: 64 micro-files, the incremental-append pathology
    events.repartition(64).write.parquet(s"$tmp/frag")
    val fragBytes = new java.io.File(s"$tmp/frag").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target a quarter of the total: expect ~4 files
    val (before, after) = Partitioned.compact(
      spark, s"$tmp/frag", s"$tmp/compact", targetFileBytes = fragBytes / 4)
    assert(before == 64L)
    assert(after >= 3L && after <= 6L, s"expected ~4 files, got $after")
    val a = spark.read.parquet(s"$tmp/compact")
    assert(a.count() == events.count())
    assert(a.agg(sum(col("event_id"))).first().getLong(0) ==
      events.agg(sum(col("event_id"))).first().getLong(0))
  }

  test("sorted compaction re-clusters so row-group stats prune on the sort key") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    Tables.table(spark, sfDir, "events").repartition(16)
      .write.parquet(s"$tmp/frag")
    val fragBytes = new java.io.File(s"$tmp/frag").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    Partitioned.compact(spark, s"$tmp/frag", s"$tmp/sorted",
      targetFileBytes = fragBytes / 4, sortBy = Some("user_id"))
    // every output file covers a disjoint user range → per-file min==max
    // spread, and a point lookup's effective input is one file
    val perFile = spark.read.parquet(s"$tmp/sorted")
      .select(col("user_id"), input_file_name().as("f"))
      .groupBy("f").agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length > 1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "ranges must not interleave")
      case _ =>
    }
  }

  test("zorder compaction bounds per-file ranges on BOTH columns") {
    val sparkSession = spark
    import sparkSession.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // a 64x64 grid of (x, y) — the two-dimensional lookup workload
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, x * 64 + y))
      .toDF("x", "y", "payload")
    grid.repartition(16).write.parquet(s"$tmp/frag")
    val fragBytes = new java.io.File(s"$tmp/frag").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    def perFileSpan(dir: String): Array[(Long, Long)] =
      spark.read.parquet(dir)
        .select($"x", $"y", input_file_name().as("f"))
        .groupBy("f").agg(
          (max("x") - min("x") + 1).as("sx"), (max("y") - min("y") + 1).as("sy"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    Partitioned.compact(spark, s"$tmp/frag", s"$tmp/zorder",
      targetFileBytes = fragBytes / 16, zorderBy = Seq("x", "y"))
    Partitioned.compact(spark, s"$tmp/frag", s"$tmp/xsort",
      targetFileBytes = fragBytes / 16, sortBy = Some("x"))
    val zSpans = perFileSpan(s"$tmp/zorder")
    val xSpans = perFileSpan(s"$tmp/xsort")
    assert(zSpans.length > 4)
    // x-sort: y is unconstrained per file (full 64-wide span) — a
    // y-predicate scans every file. z-order balances the axes: the
    // worst-axis span per file shrinks, so stats prune on EITHER column
    def avgMaxSpan(s: Array[(Long, Long)]) =
      s.map { case (a, b) => math.max(a, b) }.sum.toDouble / s.length
    assert(xSpans.forall(_._2 >= 60), "x-sort leaves y unconstrained")
    assert(avgMaxSpan(zSpans) * 1.5 < avgMaxSpan(xSpans),
      s"z=${avgMaxSpan(zSpans)} x=${avgMaxSpan(xSpans)}")
    // data intact
    assert(spark.read.parquet(s"$tmp/zorder").agg(sum($"payload")).head().getLong(0) ==
      grid.agg(sum($"payload")).head().getLong(0))
  }

  test("single-column zorder survives the max-value row under ANSI (no CAST_OVERFLOW)") {
    val sparkSession = spark
    import sparkSession.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder1").toString
    // bits=63 ⇒ mask.toDouble rounds up to 2^63; the v==hi row used to
    // throw CAST_OVERFLOW on the double→long cast
    val df = (0L to 1000L).map(v => (v, v * 7)).toDF("v", "payload")
    df.repartition(8).write.parquet(s"$tmp/frag")
    Partitioned.compact(spark, s"$tmp/frag", s"$tmp/z",
      targetFileBytes = 4096L, zorderBy = Seq("v"))
    val back = spark.read.parquet(s"$tmp/z")
    assert(back.count() == 1001L)
    assert(back.agg(sum($"payload")).head().getLong(0) ==
      df.agg(sum($"payload")).head().getLong(0))
    // the lane itself stays in [0, mask] with hi mapping to the top
    val keys = df.select(Partitioned.zorderKey(df, Seq("v")).as("z"))
      .agg(min($"z"), max($"z")).head()
    assert(keys.getLong(0) >= 0L && keys.getLong(1) <= Long.MaxValue)
  }

  test("zorder key degrades cleanly on empty input and all-NULL lanes") {
    val sparkSession = spark
    import sparkSession.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    // used to NPE on the driver reading NULL min/max bounds
    assert(empty.select(Partitioned.zorderKey(empty, Seq("a", "b"))).count() == 0L)
    val allNull = Seq((Option.empty[java.lang.Long], 1L),
      (Option.empty[java.lang.Long], 2L)).toDF("a", "b")
    val keys = allNull.select(Partitioned.zorderKey(allNull, Seq("a", "b")).as("z"))
      .collect()
    assert(keys.length == 2) // null lane clamps inside InterleaveBits
  }

  test("zorder key handles date, timestamp, and string lanes") {
    val sparkSession = spark
    import sparkSession.implicits._
    val df = Seq(
      ("2024-01-01", "2024-01-01 10:00:00", "alpha", 1L),
      ("2024-06-30", "2024-06-30 23:59:59", "omega", 2L))
      .toDF("d", "ts", "s", "v")
      .select(to_date($"d").as("d"), to_timestamp($"ts").as("ts"), $"s", $"v")
    val keys = df.select(Partitioned.zorderKey(df, Seq("d", "ts", "s", "v")).as("z"))
      .collect().map(_.getLong(0))
    assert(keys.length == 2 && keys.forall(_ >= 0L) && keys(0) != keys(1))
  }
}
