package graft.target

import graft.SparkSpec
import scala.jdk.CollectionConverters._

class VersionedSinkSpec extends SparkSpec {

  test("activate repoints current and prunes superseded versions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-versioned").toString
    VersionedSink.write(Seq((1L, "old")).toDF("id", "v"), dir, "accounts", 100L)
    VersionedSink.activate(dir, "accounts", 100L)
    assert(VersionedSink.readCurrent(spark, dir, "accounts")
      .collect().map(_.getString(1)).toSeq == Seq("old"))

    VersionedSink.write(Seq((1L, "new"), (2L, "new2")).toDF("id", "v"), dir, "accounts", 200L)
    // not yet activated: readers still see version 100
    assert(VersionedSink.readCurrent(spark, dir, "accounts").count() == 1L)
    VersionedSink.activate(dir, "accounts", 200L)
    assert(VersionedSink.readCurrent(spark, dir, "accounts").count() == 2L)
    // superseded version pruned
    assert(!new java.io.File(s"$dir/stream=accounts/version=100").exists())
  }

  test("activate-first ordering: truncate-early on a fresh version, then the write lands") {
    import graft.Pipeline
    import graft.catalog.Streams
    import graft.sync.SyncState
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-versioned").toString
    // simulate a prior activated version the consumer is still reading
    VersionedSink.write(Seq((1L, "stale")).toDF("id", "v"), dir, "warehouse_account", 100L)
    VersionedSink.activate(dir, "warehouse_account", 100L)
    val cfg = ApiSink.SinkConfig(
      ApiSink.Endpoint("https://example.invalid", "account"),
      callsPerPeriod = 1000000, periodMillis = 1000L, parallelism = 1)
    // activateFirst with a FRESH version (state carries no version):
    // the old version is truncated up front (sync.py:115-133 emits
    // ACTIVATE_VERSION before records), then the full write lands and the
    // final activate is a no-op repoint
    val res = Pipeline.runFullTable(spark, sfDir, Streams.accounts,
      new ApiSink.RecordingPoster(), cfg, dir, SyncState(), nowMs = 200L,
      activateFirst = true)
    assert(res.version == 200L)
    assert(!new java.io.File(s"$dir/stream=warehouse_account/version=100").exists())
    assert(VersionedSink.readCurrent(spark, dir, "warehouse_account").count() == 150L)
  }

  test("default ordering: readers keep the previous version until the new one is whole") {
    import graft.Pipeline
    import graft.catalog.Streams
    import graft.sync.SyncState
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-versioned").toString
    VersionedSink.write(Seq((1L, "stale")).toDF("id", "v"), dir, "warehouse_account", 100L)
    VersionedSink.activate(dir, "warehouse_account", 100L)
    // a poster that observes the mid-sync state: with the default
    // ordering, version 100 must still be active while records push.
    // Observations go through a static holder — the poster is serialized
    // into executor tasks, so instance/closure state would mutate a copy.
    MidSyncProbeState.seen.clear()
    val cfg = ApiSink.SinkConfig(
      ApiSink.Endpoint("https://example.invalid", "account"),
      callsPerPeriod = 1000000, periodMillis = 1000L, parallelism = 1)
    Pipeline.runFullTable(spark, sfDir, Streams.accounts,
      MidSyncProbe(s"$dir/stream=warehouse_account"), cfg, dir, SyncState(), nowMs = 200L)
    val observed = MidSyncProbeState.seen.asScala.toSet
    assert(observed == Set("100")) // stale-but-complete served during sync
    assert(VersionedSink.readCurrent(spark, dir, "warehouse_account").count() == 150L)
  }
}

/** Static holder: executor tasks deserialize their own poster copy, so
  * only JVM-static state is observable back on the driver in local mode. */
object MidSyncProbeState {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** Reads the stream's `current` version marker at post time. */
final case class MidSyncProbe(streamDir: String) extends ApiSink.HttpPoster {
  override def post(url: String, b: Seq[String]): ApiSink.PostResult = {
    MidSyncProbeState.seen.add(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$streamDir/current")).trim)
    ApiSink.PostResult(200, b.size, 0, Seq.empty)
  }
}
