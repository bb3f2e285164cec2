package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import java.sql.Timestamp

/** Per-user open-session state for streaming sessionization (top-level —
  * Spark's state encoder generates code against the public constructor). */
final case class SessionState(startMs: Long, lastMs: Long, n: Long)

/** G2b: the same gap-sessionization as [[Events.sessionize]] on Spark 4's
  * `transformWithState` API (the successor to flatMapGroupsWithState):
  * typed `ValueState` from the handle, an explicit per-key EVENT-TIME
  * TIMER re-armed at session-close + gap instead of a timeout config, and
  * emission from `handleExpiredTimer` when the watermark passes. Requires
  * the RocksDB state store provider (a transformWithState constraint).
  * Top-level class: the processor is serialized into the stream. */
final class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Events.Event, Events.Session] {

  @transient private var state: ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SessionState]("session",
      org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

  private def toSession(userId: Long, s: SessionState) =
    Events.Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)

  override def handleInputRows(userId: Long, rows: Iterator[Events.Event],
      timers: TimerValues): Iterator[Events.Session] = {
    val sorted = rows.toSeq.sortBy(_.ts.getTime)
    var closed = List.empty[Events.Session]
    var cur = if (state.exists()) Some(state.get()) else None
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastMs <= gapMs =>
          cur = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
        case Some(s) =>
          closed ::= toSession(userId, s)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    // exactly one armed timer per key: timers are not a single timeout
    // slot (every registerTimer adds one), so clear before re-arming
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    cur.foreach { s =>
      state.update(s)
      getHandle.registerTimer(s.lastMs + gapMs)
    }
    closed.reverseIterator
  }

  override def handleExpiredTimer(userId: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[Events.Session] = {
    val out = if (state.exists()) Iterator.single(toSession(userId, state.get()))
      else Iterator.empty
    state.clear()
    out
  }
}

/** Structured Streaming operators over the events stream (SURVEY.md §2 G).
  *
  * The reference streams rows tap→target as a Unix pipe of Singer messages;
  * the Spark-native continuous form is readStream → transform → writeStream
  * with watermarked event-time state. The transforms here are the streaming
  * twins of the batch operators (C5/C6) — same plan shape, plus watermark.
  */
object Events {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** A CDC change record: op is "U" (upsert) or "D" (delete). */
  final case class CdcChange(user_id: Long, ts: Timestamp, event_id: Long,
      op: String, value: Double, props: String)

  /** The current snapshot row a key's changes reduce to; `deleted` marks
    * a tombstone (key absent from the materialized snapshot). */
  final case class CdcCurrent(user_id: Long, last_ts: Timestamp, event_id: Long,
      deleted: Boolean, value: Double, props: String)

  /** G1: watermarked tumbling-window counts — streaming twin of
    * Warehouse.qStreamWindowAgg. Append-mode capable: the watermark bounds
    * state and lets windows finalize. */
  def windowedCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** G10: watermarked HOPPING-window counts — streaming twin of
    * Warehouse.qSlidingWindow (10-minute windows every 5 minutes). Same
    * map-side window-set expansion as batch; per-event state cost is
    * size/hop concurrent windows, all bounded by the watermark. */
  def hoppingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** G2: streaming sessionization with explicit state — the 30-minute-gap
    * semantics of the batch C5 operator, kept incrementally per user via
    * flatMapGroupsWithState with an event-time timeout. Sessions emit when
    * the watermark passes their close. */
  def sessionize(events: Dataset[Event], gapMinutes: Long = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      def toSession(s: SessionState) =
        Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
      if (state.hasTimedOut) {
        val out = state.getOption.map(toSession).iterator
        state.remove()
        out
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[Session]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs <= gapMs =>
              cur = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
            case Some(s) =>
              closed ::= toSession(s)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** G2b: sessionization via `transformWithState` (see
    * [[SessionProcessor]]) — identical semantics to [[sessionize]],
    * expressed on the Spark 4 arbitrary-state API. */
  def sessionizeTws(events: Dataset[Event], gapMinutes: Long = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** G9: continuous CDC apply — the streaming face of
    * [[graft.queries.Temporal.qCdcApply]]. Per-key state holds the
    * current snapshot row (the latest change by (ts, seq)); a key emits
    * one upsert/tombstone per micro-batch ONLY when its current row
    * actually advanced, and out-of-order deliveries at or below the
    * key's high-water mark are ignored — exactly the batch operator's
    * max_by semantics, so a consumer materializing the emissions holds
    * the same snapshot the batch query computes.
    *
    * State is one row per live key — the inherent floor for CDC
    * materialization (the state IS the snapshot); no watermark is
    * involved because a snapshot key never expires. */
  def cdcApplyStream(changes: Dataset[CdcChange]): Dataset[CdcCurrent] = {
    val spark = changes.sparkSession
    import spark.implicits._
    def update(key: Long, rows: Iterator[CdcChange],
        state: GroupState[CdcCurrent]): Iterator[CdcCurrent] = {
      val before = state.getOption
      var cur = before
      rows.foreach { c =>
        val advances = cur.forall(s =>
          c.ts.getTime > s.last_ts.getTime ||
            (c.ts.getTime == s.last_ts.getTime && c.event_id > s.event_id))
        if (advances)
          cur = Some(CdcCurrent(key, c.ts, c.event_id, c.op == "D", c.value, c.props))
      }
      if (cur != before) { state.update(cur.get); cur.iterator }
      else Iterator.empty
    }
    changes.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
  }

  /** A purchase's attribution verdict (G12); `attributed_click_id` is
    * None when the user's latest prior click is absent or stale. */
  final case class Attribution(purchase_id: Long, user_id: Long,
      purchase_us: Long, attributed_click_id: Option[Long],
      lag_us: Option[Long], attributed: Boolean)

  /** G12: streaming last-touch attribution — the continuous face of
    * Warehouse.qAttribution (C36). State per user = ONE (us, event_id)
    * pair: the latest click seen so far (monotone — an out-of-order
    * click older than the stored one is ignored, the G9 contract).
    * Each purchase emits exactly once, credited against that state if
    * within the lookback. Batch rows arrive unordered, so the group
    * iterator sorts in-memory (micro-batch-bounded, same as G2);
    * ACROSS batches correctness needs clicks delivered no later than
    * the purchases they precede — the upstream watermark's job, as
    * with every cross-batch ordering contract in this file. */
  def attributionStream(events: Dataset[Event],
      lookbackUs: Long = 7L * 86400L * 1000000L): Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    def micros(ts: Timestamp): Long =
      ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[(Long, Long)]): Iterator[Attribution] = {
      var lastClick = state.getOption // (us, event_id)
      val out = Seq.newBuilder[Attribution]
      rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val us = micros(e.ts)
        e.event_type match {
          case "click" if lastClick.forall(c =>
              c._1 < us || (c._1 == us && c._2 < e.event_id)) =>
            lastClick = Some((us, e.event_id))
          case "purchase" =>
            val hit = lastClick.filter(c => us - c._1 <= lookbackUs)
            out += Attribution(e.event_id, userId, us,
              hit.map(_._2), hit.map(us - _._1), hit.isDefined)
          case _ => ()
        }
      }
      lastClick.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  final case class DailyCount(event_type: String, d: java.sql.Date, y: Long)
  final case class CusumPoint(event_type: String, d: java.sql.Date, y: Long,
      s_pos_x1000: Long, s_neg_x1000: Long, alarm_up: Boolean, alarm_down: Boolean)

  /** G13: streaming per-type CUSUM — the continuous face of the batch
    * C45b detector, run over an (already day-aggregated) count stream:
    * per event type, ONE (s⁺, s⁻) pair of state advances through the
    * max(0, s + x) recursion day by day and emits an alarmed point per
    * day. μ arrives as a PARAMETER per type — the deployment reality for
    * control charts: parameters are fit OFFLINE on a reference window
    * (the batch C45b face, or any stable period) and the stream only
    * evaluates, because a streaming job cannot see the full series its
    * own mean would need. Slack k = μ/4 and threshold h = 2μ follow
    * C45. In-batch day order is restored by a micro-batch-bounded sort
    * (the G12 contract); cross-batch order is the upstream window
    * aggregation's watermark contract. State is TWO longs per monitored
    * type — bounded by the metric catalog, not the data. */
  def cusumStream(daily: Dataset[DailyCount],
      muX1000: Map[String, Long]): Dataset[CusumPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    def update(eventType: String, rows: Iterator[DailyCount],
        state: GroupState[(Long, Long)]): Iterator[CusumPoint] = {
      val mu = muX1000.getOrElse(eventType, 0L)
      val k = mu / 4
      val h = 2L * mu
      var (sp, sn) = state.getOption.getOrElse((0L, 0L))
      val out = Seq.newBuilder[CusumPoint]
      rows.toSeq.sortBy(_.d.getTime).foreach { r =>
        sp = math.max(0L, sp + (1000L * r.y - mu - k))
        sn = math.max(0L, sn + (mu - 1000L * r.y - k))
        out += CusumPoint(eventType, r.d, r.y, sp, sn, sp > h, sn > h)
      }
      state.update((sp, sn))
      out.result().iterator
    }
    daily.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  final case class EwmaPoint(event_type: String, d: java.sql.Date, y: Long,
      ewma_x1000: Long, dev_x1000: Long)

  /** G15: streaming per-type EWMA — the continuous face of the batch
    * C64 smoother, run over an (already day-aggregated) count stream:
    * per event type ONE long of state (the scaled smooth) advances
    * through the exact integer recursion `s ← (1000·y + s) DIV 2`
    * (seeded at the first observed day, C64's rule) and emits
    * (ewma, deviation-from-smoothed-PAST) per day — the drift-tolerant
    * alert lane evaluated at arrival time. Unlike G13, no offline
    * parameter is needed: the smoother IS its own baseline, which is
    * exactly why EWMA is the streaming-native control chart. In-batch
    * day order restored by the micro-batch-bounded sort (the G12
    * contract); state is ONE long per monitored type. StreamingSpec
    * proves stream ≡ the batch recursion on the same planted series. */
  def ewmaStream(daily: Dataset[DailyCount]): Dataset[EwmaPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    def update(eventType: String, rows: Iterator[DailyCount],
        state: GroupState[Long]): Iterator[EwmaPoint] = {
      var s = state.getOption.getOrElse(-1L)
      val out = Seq.newBuilder[EwmaPoint]
      rows.toSeq.sortBy(_.d.getTime).foreach { r =>
        val dev = if (s < 0) 0L else 1000L * r.y - s
        s = if (s < 0) 1000L * r.y else (1000L * r.y + s) / 2
        out += EwmaPoint(eventType, r.d, r.y, s, dev)
      }
      state.update(s)
      out.result().iterator
    }
    daily.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** Streaming exact dedup — the continuous face of graft.dedup.Dedup
    * (D1): drops events whose id was already seen within the watermark
    * horizon. State is bounded by the watermark (expired keys age out),
    * which is what makes exactly-once-per-key feasible on an unbounded
    * stream. */
  def dedupStream(events: DataFrame, idCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** A document arriving on the ingestion stream (G17). */
  final case class IngestDoc(doc_id: Long, text: String, source: String)

  /** A document the G17 gate admitted: the canonical first arrival of
    * its content hash. */
  final case class KeptDoc(doc_id: Long, content_hash: String, source: String)

  /** G17: streaming EXACT-DEDUP GATE — the continuous face of D8's
    * incremental ingestion dedup (drop any arriving doc whose content was
    * already admitted, at any point in the stream's history). Keyed by
    * content hash; state is ONE boolean per distinct admitted content —
    * ~50 B/distinct doc, the same asymptotics as D8's accumulated hash
    * corpus, carried by the state store instead of a parquet side table
    * (at 100 TB: RocksDB state store, `useRocksDbState`). Within a batch
    * the smallest doc_id wins (D1's keep-min rule, so replaying a batch
    * is deterministic); across batches first arrival wins — exactly the
    * semantics of running D8 once per micro-batch against everything
    * admitted before it. Unlike `dedupStream` above (event-id dedup
    * bounded to the watermark horizon, for at-least-once transport), this
    * state is deliberately unbounded: content dedup that "forgets" old
    * documents readmits every recrawl. Ref: dedup/Dedup.scala (D1/D8),
    * reference sync.py's primary-key dedup on FULL_TABLE resync. */
  def contentDedupStream(docs: Dataset[IngestDoc]): Dataset[KeptDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def update(hash: String, rows: Iterator[IngestDoc],
        state: GroupState[Boolean]): Iterator[KeptDoc] =
      if (state.exists) Iterator.empty
      else {
        state.update(true)
        val first = rows.minBy(_.doc_id)
        Iterator.single(KeptDoc(first.doc_id, hash, first.source))
      }
    docs.groupByKey(d => md5hex(d.text))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }

  /** G18: streaming heavy hitters — F16's Misra-Gries aggregate
    * (functions.freqItems) runs UNCHANGED as a Complete-mode streaming
    * aggregate over the exploded term stream: the sketch is a mergeable
    * TypedImperativeAggregate, and BELOW capacity (vocab < k) it holds
    * exact counts, so the live top-k equals the batch F16 face over the
    * data seen so far regardless of arrival order or micro-batch splits
    * (the G16 arrival-order-independence contract); above capacity the
    * Misra-Gries `count > n/(k+1)` presence guarantee still holds at
    * every prefix. State is the k-entry map — corpus size never enters
    * the store. */
  def heavyHittersStream(docs: DataFrame, textCol: String,
      k: Int = 4096): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("term"))
      .agg(graft.functions.freqItems(col("term"), k).as("m"))

  /** Stream-stream interval join: enrich the event stream with a second
    * stream (e.g. late-arriving entity metadata) on a key, accepting
    * matches within `intervalMinutes` of event time. Both sides are
    * watermarked so Spark bounds the join state buffers — the condition
    * every unbounded stream-stream join needs to not grow state forever.
    * Inner join: events wait for their enrichment up to the interval. */
  def enrichStream(events: DataFrame, meta: DataFrame, key: String,
      watermark: String = "1 hour", intervalMinutes: Long = 30): DataFrame = {
    val e = events.withWatermark("ts", watermark)
    val m = meta.withWatermark("m_ts", watermark)
    e.join(m,
      e(key) === m(s"m_$key") &&
        m("m_ts") >= e("ts") - expr(s"INTERVAL $intervalMinutes MINUTES") &&
        m("m_ts") <= e("ts") + expr(s"INTERVAL $intervalMinutes MINUTES"))
  }

  /** File-stream source: continuous ingestion of parquet drops into the
    * warehouse directory — the streaming face of Tables.table. Structured
    * Streaming's file source tracks processed files in the checkpoint, so
    * each drop is read exactly once; `maxFilesPerTrigger` bounds micro-batch
    * size (backpressure at 100 TB backfills). The schema must be declared —
    * streaming scans cannot infer it per batch. */
  def fileStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Switch streaming state to RocksDB — the provider that keeps state off
    * the executor heap (HDFS-backed in-memory maps OOM at 100 TB key
    * cardinalities; RocksDB spills to local disk with changelog
    * checkpointing). Session-wide conf read at query start. */
  def useRocksDbState(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  }

  /** Continuous API push: the streaming writer face of the target —
    * foreachBatch reuses the batch ApiSink so each micro-batch pushes
    * rate-limited batched updates (the reference's tap|target pipe as a
    * writeStream). */
  def pushStream(payloads: DataFrame, poster: graft.target.ApiSink.HttpPoster,
      cfg: graft.target.ApiSink.SinkConfig, checkpointDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    payloads.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.target.ApiSink.push(batch, poster, cfg): Unit
      }
}
