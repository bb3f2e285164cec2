package graft

import graft.catalog.Streams
import graft.sync.{Bookmarks, SyncState}
import graft.target.{ApiSink, VersionedSink}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** End-to-end pipeline: extract → transform → push (stub HTTP) →
  * versioned landing → state, full-table then incremental with a
  * bookmark — the complete reference workflow in one job graph. */
class PipelineSpec extends SparkSpec {

  private def cfg = ApiSink.SinkConfig(
    ApiSink.Endpoint("https://example.invalid", "account"),
    maxRecords = 400, callsPerPeriod = 1000000, periodMillis = 1000L, parallelism = 1)

  test("full-table sync pushes every account and lands a versioned table") {
    ApiSink.RecordingPoster.reset()
    val landing = java.nio.file.Files.createTempDirectory("graft-landing").toString
    val res = Pipeline.runFullTable(spark, sfDir, Streams.accounts,
      new ApiSink.RecordingPoster(), cfg, landing, SyncState(), nowMs = 12345L)
    assert(res.version == 12345L)
    assert(res.metrics.records.value == 150L) // sf0.001 customer count
    val landed = VersionedSink.readCurrent(spark, landing, "warehouse_account")
    assert(landed.count() == 150L)
    assert(landed.columns.contains("accountId"))
    // full-table leaves the stream versionless for the next run (sync.py:202)
    assert(res.state.bookmark("warehouse_account").version.isEmpty)
    // payloads are the Pendo bulk shape
    val sample = ApiSink.RecordingPoster.calls.asScala.head._2.head
    assert(sample.contains(""""accountId":""") && sample.contains(""""values":{"""))
  }

  test("incremental sync respects bookmark and advances it") {
    ApiSink.RecordingPoster.reset()
    import spark.implicits._
    val active = graft.sources.Tables.table(spark, sfDir, "customer")
      .select($"c_custkey")
    val state0 = Bookmarks.buildState(SyncState(), Streams.all)
      .withBookmark("warehouse_visitor", _.copy(
        replicationKeyValue = Some("1999-01-01T00:00:00")))
    val res = Pipeline.runIncremental(spark, sfDir, Streams.visitors,
      active, "o_custkey", new ApiSink.RecordingPoster(), cfg, state0, nowMs = 777L)
    val expected = graft.sources.Tables.table(spark, sfDir, "orders")
      .filter($"o_orderdate" > lit("1999-01-01T00:00:00")).count()
    assert(res.metrics.records.value == expected)
    val bm = res.state.bookmark("warehouse_visitor")
    assert(bm.version.contains(777L))
    // bookmark advanced to the max replication value of the slice
    val maxDate = graft.sources.Tables.table(spark, sfDir, "orders")
      .agg(date_format(max($"o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")).first().getString(0)
    assert(bm.replicationKeyValue.contains(maxDate))
    // a second run from the new state extracts nothing new
    ApiSink.RecordingPoster.reset()
    val res2 = Pipeline.runIncremental(spark, sfDir, Streams.visitors,
      active, "o_custkey", new ApiSink.RecordingPoster(), cfg, res.state, nowMs = 778L)
    assert(res2.metrics.records.value == 0L)
    assert(res2.state.bookmark("warehouse_visitor").replicationKeyValue.contains(maxDate))
  }

  test("limit cutting inside an equal-replication-key group loses no rows") {
    ApiSink.RecordingPoster.reset()
    import spark.implicits._
    val active = graft.sources.Tables.table(spark, sfDir, "customer").select($"c_custkey")
    val orders = graft.sources.Tables.table(spark, sfDir, "orders")
    // choose a limit that cuts strictly inside a group of equal o_orderdate
    val counts = orders.groupBy($"o_orderdate").count()
      .orderBy($"o_orderdate").collect()
    val idx = counts.indexWhere(_.getLong(1) >= 2)
    assert(idx >= 1, "need a multi-order date with at least one earlier date")
    val cut = (counts.take(idx).map(_.getLong(1)).sum + 1).toInt
    val state0 = Bookmarks.buildState(SyncState(), Streams.all)
    val res1 = Pipeline.runIncremental(spark, sfDir, Streams.visitors,
      active, "o_custkey", new ApiSink.RecordingPoster(), cfg, state0,
      limit = cut, nowMs = 1L)
    // the bookmark must NOT advance to the boundary date (its group was
    // split by the limit) — only to the last fully-included date
    val lastFull = orders.filter($"o_orderdate" < lit(counts(idx).get(0)))
      .agg(date_format(max($"o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .first().getString(0)
    assert(res1.state.bookmark("warehouse_visitor").replicationKeyValue.contains(lastFull))
    val ids1 = res1.pushed.select(col(res1.pushed.columns.head).cast("string"))
      .collect().map(_.getString(0)).toSet
    // second run picks up everything after the retreated bookmark
    val res2 = Pipeline.runIncremental(spark, sfDir, Streams.visitors,
      active, "o_custkey", new ApiSink.RecordingPoster(), cfg, res1.state,
      nowMs = 2L)
    val ids2 = res2.pushed.select(col(res2.pushed.columns.head).cast("string"))
      .collect().map(_.getString(0)).toSet
    val all = orders.select($"o_orderkey".cast("string"))
      .collect().map(_.getString(0)).toSet
    assert((ids1 union ids2) == all) // every order synced — nothing skipped
  }

  test("a slice that lands exactly on the limit advances the bookmark fully") {
    ApiSink.RecordingPoster.reset()
    import spark.implicits._
    val active = graft.sources.Tables.table(spark, sfDir, "customer").select($"c_custkey")
    val orders = graft.sources.Tables.table(spark, sfDir, "orders")
    val total = orders.count().toInt
    val state0 = Bookmarks.buildState(SyncState(), Streams.all)
    // limit == remaining rows: NOT truncated, so no bookmark retreat and
    // no duplicate re-push on the next run
    val res1 = Pipeline.runIncremental(spark, sfDir, Streams.visitors,
      active, "o_custkey", new ApiSink.RecordingPoster(), cfg, state0,
      limit = total, nowMs = 1L)
    assert(res1.metrics.records.value == total.toLong)
    val maxDate = orders
      .agg(date_format(max($"o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .first().getString(0)
    assert(res1.state.bookmark("warehouse_visitor").replicationKeyValue.contains(maxDate))
    val res2 = Pipeline.runIncremental(spark, sfDir, Streams.visitors,
      active, "o_custkey", new ApiSink.RecordingPoster(), cfg, res1.state, nowMs = 2L)
    assert(res2.metrics.records.value == 0L)
  }

  test("chunked sync: state flushes per chunk, a kill+resume loses and re-pushes nothing") {
    ApiSink.RecordingPoster.reset()
    import spark.implicits._
    val active = graft.sources.Tables.table(spark, sfDir, "customer").select($"c_custkey")
    val orders = graft.sources.Tables.table(spark, sfDir, "orders")
    val total = orders.count()
    val state0 = Bookmarks.buildState(SyncState(), Streams.all)
    var flushed = Seq.empty[SyncState]
    // phase 1: the "crash" — the loop dies after two committed chunks
    val r1 = Pipeline.runIncrementalChunked(spark, sfDir, Streams.visitors,
      active, "o_custkey", new ApiSink.RecordingPoster(), cfg, state0,
      chunkRows = 150, onStateFlush = s => flushed = flushed :+ s,
      maxChunks = 2, nowMs = 1L)
    assert(r1.chunks == 2 && !r1.exhausted && flushed.size == 2)
    assert(r1.totalRecords > 0L && r1.totalRecords <= 300L)
    val phase1 = ApiSink.RecordingPoster.calls.asScala.flatMap(_._2).toSeq
    assert(phase1.size.toLong == r1.totalRecords)
    assert(phase1.distinct.size == phase1.size) // no within-phase dup push
    // resume purely from the last durably-flushed state (what a restarted
    // job would read back from state.json)
    ApiSink.RecordingPoster.reset()
    val r2 = Pipeline.runIncrementalChunked(spark, sfDir, Streams.visitors,
      active, "o_custkey", new ApiSink.RecordingPoster(), cfg, flushed.last,
      chunkRows = 150, nowMs = 2L)
    assert(r2.exhausted)
    val phase2 = ApiSink.RecordingPoster.calls.asScala.flatMap(_._2).toSeq
    assert((phase1.toSet intersect phase2.toSet).isEmpty) // no re-push of committed chunks
    assert(phase1.size + phase2.size == total) // and no loss
  }

  test("chunked sync stops instead of spinning when a key group exceeds the chunk") {
    ApiSink.RecordingPoster.reset()
    import spark.implicits._
    val active = graft.sources.Tables.table(spark, sfDir, "customer").select($"c_custkey")
    val state0 = Bookmarks.buildState(SyncState(), Streams.all)
    // chunkRows=1 is below every multi-order date group: the first chunk
    // cannot align a bookmark, pushes nothing, and the loop must stop
    // (stuck) rather than loop forever — with nothing double-pushed
    val r = Pipeline.runIncrementalChunked(spark, sfDir, Streams.visitors,
      active, "o_custkey", new ApiSink.RecordingPoster(), cfg, state0,
      chunkRows = 1, maxChunks = 1000, nowMs = 1L)
    assert(!r.exhausted)
    assert(r.chunks < 1000) // terminated by stuck detection, not maxChunks
  }

  test("message round-trip: parse/validate catches malformed lines") {
    import spark.implicits._
    val lines = Seq(
      """{"type":"RECORD","stream":"s","version":1,"record":{"a":"1"}}""",
      """{"type":"RECORD","stream":"s","version":1}""",
      """{"type":"WHAT","stream":"s"}""",
      """not json at all""").toDF("line")
    val verdicts = graft.sync.MessageParser.withValidity(graft.sync.MessageParser.parse(lines))
      .select("problem").collect().map(_.getString(0))
    assert(verdicts(0) == null)
    assert(verdicts(1).contains("RECORD missing"))
    assert(verdicts(2).contains("unknown message type"))
    assert(verdicts(3) != null)
  }
}
