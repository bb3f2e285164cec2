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
}
