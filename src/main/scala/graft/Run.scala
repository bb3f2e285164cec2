package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.catalog.{Config, ReplicationMethod, StreamDef, Streams}
import graft.sync.{Bookmarks, SyncState}
import graft.target.{ApiSink, JavaHttpPoster}

/** Tap-style CLI entry point — the engine's `tap-redshift -c config.json
  * --catalog catalog.json -s state.json | target-pendo -c target.json`
  * (tap-redshift/src/parsed_args.py:18-72), as ONE process: config/state
  * files in, full pipeline run, state file out.
  *
  * Flags (parsed_args.py parity, plus the engine's data plane):
  *   -c/--config <tap.json>      connection + start_date (required)
  *   -s/--state <state.json>     previous run's state (optional)
  *   -d/--discover               print the catalog and exit
  *   -l/--limit <n>              single-shot incremental row limit
  *   --catalog <catalog.json>    catalog file (restricts synced streams)
  *   --target-config <t.json>    stream defs + integration key
  *   --data-dir <dir>            warehouse parquet dir (the "connection"
  *                               in this zero-egress container; a real
  *                               deployment reads the tap config's JDBC)
  *   --landing-dir <dir>         versioned-table landing dir
  *   --base-url <url>            target API base
  *   --out-state <path>          where to flush state (default: stdout only)
  *   --chunk-rows <n>            chunked resumable sync (state per chunk)
  *   --active-keys <tbl:col>     active-entity key table for the
  *                               incremental semi-join (default: no filter)
  *   --active-url <base>         fetch the active-entity set over HTTP from
  *                               the target's aggregation endpoint instead
  *                               (sync.py:30-54 fetch_uuids parity)
  *   --join-column <col>         source column joined to the active keys
  *   --activate-first            emit ACTIVATE_VERSION at full-table start
  */
object Run {

  final case class RunArgs(
      config: String = "",
      state: Option[String] = None,
      discover: Boolean = false,
      limit: Option[Int] = None,
      catalog: Option[String] = None,
      targetConfig: Option[String] = None,
      dataDir: String = "/root/testdata/sf0.001",
      landingDir: String = "/tmp/graft-landing",
      baseUrl: String = "https://app.pendo.io",
      outState: Option[String] = None,
      chunkRows: Option[Int] = None,
      activeKeys: Option[(String, String)] = None,
      activeUrl: Option[String] = None,
      joinColumn: Option[String] = None,
      activateFirst: Boolean = false)

  def parseArgs(argv: Seq[String]): RunArgs = {
    def loop(rest: List[String], acc: RunArgs): RunArgs = rest match {
      case Nil => acc
      case ("-c" | "--config") :: v :: t => loop(t, acc.copy(config = v))
      case ("-s" | "--state") :: v :: t => loop(t, acc.copy(state = Some(v)))
      case ("-d" | "--discover") :: t => loop(t, acc.copy(discover = true))
      case ("-l" | "--limit") :: v :: t => loop(t, acc.copy(limit = Some(v.toInt)))
      case "--catalog" :: v :: t => loop(t, acc.copy(catalog = Some(v)))
      case "--target-config" :: v :: t => loop(t, acc.copy(targetConfig = Some(v)))
      case "--data-dir" :: v :: t => loop(t, acc.copy(dataDir = v))
      case "--landing-dir" :: v :: t => loop(t, acc.copy(landingDir = v))
      case "--base-url" :: v :: t => loop(t, acc.copy(baseUrl = v))
      case "--out-state" :: v :: t => loop(t, acc.copy(outState = Some(v)))
      case "--chunk-rows" :: v :: t => loop(t, acc.copy(chunkRows = Some(v.toInt)))
      case "--active-keys" :: v :: t =>
        v.split(":", 2) match {
          case Array(tbl, c) if tbl.nonEmpty && c.nonEmpty =>
            loop(t, acc.copy(activeKeys = Some((tbl, c))))
          case _ => throw new IllegalArgumentException(
            s"--active-keys expects <table>:<column>, got: $v")
        }
      case "--active-url" :: v :: t => loop(t, acc.copy(activeUrl = Some(v)))
      case "--join-column" :: v :: t => loop(t, acc.copy(joinColumn = Some(v)))
      case "--activate-first" :: t => loop(t, acc.copy(activateFirst = true))
      case other :: _ => throw new IllegalArgumentException(s"unknown argument: $other")
    }
    val parsed = loop(argv.toList, RunArgs())
    require(parsed.discover || parsed.config.nonEmpty, "-c/--config is required")
    parsed
  }

  /** The sync body, poster-injectable for tests (main wires the real
    * [[JavaHttpPoster]]). Returns the final state. */
  def sync(spark: SparkSession, a: RunArgs, poster: ApiSink.HttpPoster): SyncState = {
    val tap = if (a.config.nonEmpty)
      Some(Config.parseTapConfig(Files.readString(Paths.get(a.config)))) else None
    val target = a.targetConfig.map(p =>
      Config.parseTargetConfig(Files.readString(Paths.get(p))))
    val catalogStreams = a.catalog.map(p =>
      graft.sources.CatalogJson.selectedStreams(Files.readString(Paths.get(p))))
    val streams0 = target.map(_.streams).getOrElse(Streams.all)
    // catalog streams are named by source table; stream defs by stream name
    val streams = catalogStreams match {
      case Some(sel) =>
        streams0.filter(s => sel.contains(s.streamName) || sel.contains(s.sourceTable))
      case None => streams0
    }
    val integrationKey = target.map(_.integrationKey).filter(_.nonEmpty)
      .orElse(tap.flatMap(_.targetIntegrationKey)).getOrElse("")
    val raw = a.state.map(Bookmarks.load).getOrElse(SyncState())
    var st = Bookmarks.buildState(raw, streams)
    def flush(s: SyncState): Unit = a.outState.foreach(p => Bookmarks.save(s, p))

    streams.foreach { s =>
      st = st.copy(currentlySyncing = Some(s.streamName))
      flush(st)
      val kind = if (s.targetEntity == "visitors") "visitor" else "account"
      val cfg = ApiSink.SinkConfig(
        ApiSink.Endpoint(a.baseUrl, kind),
        headers = if (integrationKey.nonEmpty)
          Map("X-Pendo-Integration-Key" -> integrationKey) else Map.empty)
      s.replicationMethod match {
        case ReplicationMethod.FullTable =>
          val r = Pipeline.runFullTable(spark, a.dataDir, s, poster, cfg,
            a.landingDir, st, activateFirst = a.activateFirst)
          st = r.state
        case ReplicationMethod.Incremental =>
          val jc = a.joinColumn.getOrElse(s.keyProperties.head)
          // active set precedence: HTTP fetch from the target's
          // aggregation endpoint (fetch_uuids parity) > a local key
          // table > the slice's own join keys (no target-side filter)
          val ak = (a.activeUrl, a.activeKeys) match {
            case (Some(url), _) =>
              graft.sources.ApiSource.fetchActiveKeys(
                spark, url, s.targetEntity, s.targetPrimaryKey, cfg.headers)
            case (None, Some((tbl, c))) =>
              graft.sources.Tables.table(spark, a.dataDir, tbl)
                .select(org.apache.spark.sql.functions.col(c)).distinct()
            case (None, None) =>
              graft.sources.Tables.table(spark, a.dataDir, s.sourceTable)
                .select(org.apache.spark.sql.functions.col(jc)).distinct()
          }
          a.chunkRows match {
            case Some(n) =>
              val r = Pipeline.runIncrementalChunked(spark, a.dataDir, s, ak, jc,
                poster, cfg, st, chunkRows = n, onStateFlush = flush)
              st = r.state
            case None =>
              val r = Pipeline.runIncremental(spark, a.dataDir, s, ak, jc,
                poster, cfg, st, limit = a.limit.getOrElse(1000000))
              st = r.state
          }
      }
      flush(st)
    }
    st = st.copy(currentlySyncing = None)
    flush(st)
    st
  }

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args.toIndexedSeq)
    val cores = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(8)
    val spark = graft.engine.GraftSession.getOrCreate("graft-run", cores = cores)
    try {
      if (a.discover) {
        val json = graft.sources.CatalogJson.render(spark, a.dataDir)
        a.catalog match {
          // never clobber an existing (possibly hand-edited) catalog —
          // stream selections live in that file; the reference writes via
          // shell redirect, where overwrite is the user's explicit choice
          case Some(out) if !Files.exists(Paths.get(out)) =>
            Files.writeString(Paths.get(out), json); ()
          case Some(out) =>
            println(json)
            System.err.println(
              s"refusing to overwrite existing catalog $out; printed to stdout")
          case None => println(json)
        }
      } else {
        val st = sync(spark, a,
          JavaHttpPoster(connectTimeoutMillis = 10000, readTimeoutMillis = 300000))
        println(Bookmarks.toJson(st)) // emit_state parity (__init__.py:262-269)
      }
    } finally spark.stop()
  }
}
