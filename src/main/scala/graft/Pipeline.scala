package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{ReplicationMethod, StreamDef}
import graft.sources.Tables
import graft.sync.{Bookmarks, Messages, Sync, SyncState}
import graft.target.{ApiSink, Transform, VersionedSink}

/** The whole reference pipeline as one API: extract (full/incremental) →
  * transform (map/coerce/shape) → load (batched rate-limited API push +
  * versioned table) → state.
  *
  * tap-redshift | target-pendo as a Unix pipe becomes a single Spark job
  * graph here: no serialization hop between tap and target, one cluster
  * schedules the whole flow, and the intermediate "messages" exist only
  * where a consumer actually wants them (Messages.recordMessages).
  */
object Pipeline {

  final case class SyncResult(
      pushed: DataFrame,
      state: SyncState,
      metrics: ApiSink.SinkMetrics,
      version: Long,
      /** false when the run's LIMIT truncated the slice — more rows remain
        * past the advanced bookmark (drives the chunked-sync loop). */
      exhausted: Boolean = true)

  /** FULL_TABLE run: extract + map + shape + push + versioned landing +
    * state (version semantics per sync.py:199-206 — fresh epoch version,
    * activated after a complete replication).
    *
    * `activateFirst`: the reference emits ACTIVATE_VERSION at sync START
    * when the stream's version is fresh (sync.py:115-133), letting the
    * consumer truncate old data before the new replication lands — at the
    * cost of serving nothing between truncate and completion. Default
    * (false) activates only after a complete replication: readers keep the
    * previous version until the new one is whole. Both orderings are
    * protocol-legal; pick by whether stale-but-complete beats
    * empty-but-truthful during the sync window. */
  def runFullTable(
      spark: SparkSession, dir: String, stream: StreamDef,
      poster: ApiSink.HttpPoster, cfg: ApiSink.SinkConfig,
      landingDir: String, state: SyncState,
      nowMs: => Long = System.currentTimeMillis(),
      deadLetterDir: Option[String] = None,
      activateFirst: Boolean = false): SyncResult = {
    val version = Bookmarks.streamVersion(state, stream.streamName, nowMs)
    if (activateFirst && state.bookmark(stream.streamName).version.isEmpty)
      VersionedSink.activate(landingDir, stream.streamName, version)
    val mapped = Transform.applyFieldMappings(
      Tables.table(spark, dir, stream.sourceTable), stream)
    val payloads = Transform.shapePayloads(mapped, stream.targetPrimaryKey)
    val metrics = ApiSink.push(payloads, poster, cfg, deadLetterDir = deadLetterDir)
    VersionedSink.write(mapped, landingDir, stream.streamName, version)
    VersionedSink.activate(landingDir, stream.streamName, version)
    val newState = state.withBookmark(stream.streamName, _.copy(version = None))
    SyncResult(payloads, newState, metrics, version)
  }

  /** INCREMENTAL run: bookmark-filtered extract, broadcast semi-join
    * against the target's active keys, push, and a new bookmark =
    * max(replication_key) of the synced slice (computed distributed).
    *
    * `alignToBookmark` (the chunked-loop mode): when LIMIT truncates the
    * slice, push only the rows the advanced bookmark fully covers — the
    * partial boundary group is neither pushed nor bookmarked, so the next
    * chunk picks it up exactly once. Off by default: the single-shot
    * contract pushes the full slice and lets the conservative bookmark
    * re-sync the boundary group on the next run (at-least-once). */
  def runIncremental(
      spark: SparkSession, dir: String, stream: StreamDef,
      activeKeys: DataFrame, joinColumn: String,
      poster: ApiSink.HttpPoster, cfg: ApiSink.SinkConfig,
      state: SyncState, limit: Int = 1000000,
      nowMs: => Long = System.currentTimeMillis(),
      deadLetterDir: Option[String] = None,
      alignToBookmark: Boolean = false,
      /** extract from this frame instead of `dir`'s parquet warehouse
        * (e.g. a live Jdbc.read — see Sync.incrementalSlice). */
      source: Option[DataFrame] = None): SyncResult = {
    val replKey = stream.replicationKey.getOrElse(
      throw new IllegalArgumentException(s"${stream.streamName} is not incremental"))
    val version = Bookmarks.streamVersion(state, stream.streamName, nowMs)
    val bookmark = state.bookmark(stream.streamName).replicationKeyValue
    // probe one row PAST the limit so a slice that lands exactly on the
    // limit is distinguishable from a truncated one (count == limit alone
    // cannot tell them apart, and treating an exact fit as truncated
    // would retreat the bookmark and re-push the whole boundary group);
    // persisted because the plan feeds the bookmark agg and the push
    val probe = Sync.incrementalSlice(
      spark, dir, stream, bookmark, activeKeys, joinColumn, limit + 1,
      sourceOverride = source).persist()
    try {
      val truncated = probe.count() > limit
      val slice =
        if (truncated)
          probe.orderBy(col(replKey), col(stream.keyProperties.head)).limit(limit)
        else probe
      // one distributed agg computes the next bookmark — no per-row
      // writes; microsecond precision so same-second rows aren't
      // re-extracted forever
      val fmt6 = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
      val maxK = Option(
        slice.agg(date_format(max(col(replKey)), fmt6).as("maxk")).first().getString(0))
      // When LIMIT truncated the slice, rows sharing the boundary key value
      // may remain beyond the cut — advancing to the boundary would skip
      // them forever under the next run's strict `>` filter. Advance only
      // to the largest key value that is *fully* included; if the whole
      // slice shares one key value the bookmark cannot advance safely (the
      // caller must raise `limit`), so it stays put and the rows re-sync.
      val nextBookmark =
        if (!truncated) maxK
        else maxK.flatMap { mk =>
          Option(slice
            .agg(max(when(date_format(col(replKey), fmt6) < mk,
              date_format(col(replKey), fmt6))).as("b"))
            .first().getString(0))
        }
      val pushSlice =
        if (truncated && alignToBookmark)
          nextBookmark
            .map(nb => slice.filter(date_format(col(replKey), fmt6) <= nb))
            .getOrElse(slice.limit(0)) // one giant key group: no safe progress
        else slice
      val mapped = Transform.applyFieldMappings(pushSlice, stream)
      val payloads = Transform.shapePayloads(mapped, stream.targetPrimaryKey)
      val metrics = ApiSink.push(payloads, poster, cfg, deadLetterDir = deadLetterDir)
      val newState = state.withBookmark(stream.streamName, bm => bm.copy(
        replicationKey = stream.replicationKey,
        replicationKeyValue = nextBookmark.orElse(bm.replicationKeyValue),
        version = Some(version)))
      SyncResult(payloads, newState, metrics, version, exhausted = !truncated)
    } finally probe.unpersist()
  }

  /** Aggregate of a chunked incremental run. `metrics` is the last chunk's
    * (each chunk gets fresh accumulators); `totalRecords` sums the pushed
    * records across chunks. */
  final case class ChunkedResult(
      state: SyncState, chunks: Int, totalRecords: Long, exhausted: Boolean)

  /** INCREMENTAL sync as a loop of bounded, individually-committed chunks —
    * the Spark-native analog of the reference's periodic STATE emission
    * (sync.py:195-197 writes state every 1000 rows so an interrupted sync
    * resumes from the last flush). Each iteration extracts ≤`chunkRows`
    * rows past the current bookmark via [[runIncremental]] (inheriting its
    * exact-fit probe and boundary-group-safe bookmark advance), pushes
    * them, then hands the advanced state to `onStateFlush` for durable
    * capture (e.g. `Bookmarks.save`) BEFORE the next chunk starts: a crash
    * between chunks costs at most one chunk of re-extraction, never a
    * re-push of the whole 100 TB table.
    *
    * The loop ends when a chunk drains the remainder (`exhausted`), when
    * `maxChunks` is hit (resumable: call again with the returned state), or
    * when the bookmark cannot advance (an equal-key group wider than
    * `chunkRows` — the caller must raise the chunk size; looping again
    * would re-extract the same rows forever). */
  def runIncrementalChunked(
      spark: SparkSession, dir: String, stream: StreamDef,
      activeKeys: DataFrame, joinColumn: String,
      poster: ApiSink.HttpPoster, cfg: ApiSink.SinkConfig,
      state: SyncState, chunkRows: Int,
      onStateFlush: SyncState => Unit = _ => (),
      maxChunks: Int = Int.MaxValue,
      nowMs: => Long = System.currentTimeMillis(),
      deadLetterDir: Option[String] = None,
      source: Option[DataFrame] = None): ChunkedResult = {
    require(chunkRows > 0 && maxChunks > 0, "chunkRows and maxChunks must be positive")
    var st = state
    var chunks = 0
    var total = 0L
    var exhausted = false
    var stuck = false
    while (!exhausted && !stuck && chunks < maxChunks) {
      // per-chunk dead-letter subdir: the sink's capture write is an
      // overwrite, so sharing one dir would clobber earlier chunks'
      // captured rejects with later (possibly empty) ones
      val chunkDlq = deadLetterDir.map(d => s"$d/chunk_$chunks")
      val res = runIncremental(spark, dir, stream, activeKeys, joinColumn,
        poster, cfg, st, chunkRows, nowMs, chunkDlq, alignToBookmark = true,
        source = source)
      onStateFlush(res.state)
      total += res.metrics.records.value
      exhausted = res.exhausted
      stuck = !exhausted && res.state == st
      st = res.state
      chunks += 1
    }
    if (stuck)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"chunked sync of ${stream.streamName} stopped: bookmark cannot " +
          s"advance within chunkRows=$chunkRows (an equal-replication-key " +
          "group spans the whole chunk). Raise chunkRows past the widest " +
          "group to make progress.")
    ChunkedResult(st, chunks, total, exhausted)
  }
}
