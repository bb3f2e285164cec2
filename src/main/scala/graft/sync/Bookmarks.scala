package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{ReplicationMethod, StreamDef}
import graft.sources.Tables
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Singer-style sync state — tap-redshift/src/bookmarks.py + the
  * build_state logic in sync.py:215-257.
  *
  * State shape:
  * {"currently_syncing": id|null,
  *  "bookmarks": {stream_id: {"replication_key": k,
  *                            "replication_key_value": v, "version": n}}}
  */
final case class Bookmark(
    replicationKey: Option[String] = None,
    replicationKeyValue: Option[String] = None,
    version: Option[Long] = None)

final case class SyncState(
    currentlySyncing: Option[String] = None,
    bookmarks: Map[String, Bookmark] = Map.empty) {

  def withBookmark(stream: String, f: Bookmark => Bookmark): SyncState =
    copy(bookmarks = bookmarks.updated(stream, f(bookmarks.getOrElse(stream, Bookmark()))))

  def bookmark(stream: String): Bookmark = bookmarks.getOrElse(stream, Bookmark())
}

object Bookmarks {

  /** build_state (sync.py:215-257): seed the run's state from the previous
    * run's raw state, per stream replication config. INCREMENTAL streams
    * carry their replication_key_value forward only when the configured
    * replication key still matches the bookmarked one; versions carry
    * forward; FULL_TABLE streams restart versionless. */
  def buildState(raw: SyncState, streams: Seq[StreamDef]): SyncState = {
    val seeded = streams.foldLeft(SyncState(currentlySyncing = raw.currentlySyncing)) { (st, s) =>
      s.replicationMethod match {
        case ReplicationMethod.Incremental =>
          val rawBm = raw.bookmark(s.streamName)
          val keep = rawBm.replicationKey == s.replicationKey
          st.withBookmark(s.streamName, _ => Bookmark(
            replicationKey = s.replicationKey,
            replicationKeyValue = if (keep) rawBm.replicationKeyValue else None,
            version = rawBm.version))
        case ReplicationMethod.FullTable =>
          st
      }
    }
    seeded
  }

  /** Stream version: bookmarked version if present, else fresh epoch-ms
    * (sync.py:209-212). */
  def streamVersion(state: SyncState, stream: String, nowMs: => Long = System.currentTimeMillis()): Long =
    state.bookmark(stream).version.getOrElse(nowMs)

  /** Distributed bookmark computation: max(replication_key) over the synced
    * slice — the Spark-native replacement for the reference's per-row
    * bookmark writes (sync.py:188-197, one write per 1000 cursor rows).
    * One aggregation, no driver-side iteration. */
  def computeBookmarks(spark: SparkSession, dir: String, streams: Seq[StreamDef]): DataFrame = {
    import spark.implicits._
    streams.flatMap { s => s.replicationKey.map((s.streamName, _)) }
      .map { case (name, rk) =>
        // microsecond precision: a seconds-truncated bookmark would
        // re-extract every row sharing the max value's second forever
        Tables.table(spark, dir, streamSource(streams, name))
          .agg(date_format(max(col(rk)), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("replication_key_value"))
          .select(lit(name).as("stream"), lit(rk).as("replication_key"), $"replication_key_value")
      }.reduce(_.unionAll(_))
  }

  private def streamSource(streams: Seq[StreamDef], name: String): String =
    streams.find(_.streamName == name).get.sourceTable

  // ---- JSON serialization (state.json round-trip) ----

  private val mapper = new ObjectMapper()

  def toJson(state: SyncState): String = {
    val root = mapper.createObjectNode()
    state.currentlySyncing match {
      case Some(s) => root.put("currently_syncing", s)
      case None => root.putNull("currently_syncing")
    }
    val bms = root.putObject("bookmarks")
    state.bookmarks.toSeq.sortBy(_._1).foreach { case (stream, bm) =>
      val node = bms.putObject(stream)
      bm.replicationKey.foreach(node.put("replication_key", _))
      bm.replicationKeyValue.foreach(node.put("replication_key_value", _))
      bm.version.foreach(node.put("version", _))
    }
    mapper.writeValueAsString(root)
  }

  def fromJson(json: String): SyncState = {
    val root = mapper.readTree(json)
    val cur = Option(root.get("currently_syncing")).filterNot(_.isNull).map(_.asText())
    val bms = Option(root.get("bookmarks")).collect { case o: ObjectNode =>
      o.properties().asScala.map { e =>
        val v = e.getValue
        e.getKey -> Bookmark(
          Option(v.get("replication_key")).filterNot(_.isNull).map(_.asText()),
          Option(v.get("replication_key_value")).filterNot(_.isNull).map(_.asText()),
          Option(v.get("version")).filterNot(_.isNull).map(_.asLong()))
      }.toMap
    }.getOrElse(Map.empty[String, Bookmark])
    SyncState(cur, bms)
  }

  def save(state: SyncState, path: String): Unit =
    Files.writeString(Paths.get(path), toJson(state))

  def load(path: String): SyncState =
    fromJson(Files.readString(Paths.get(path)))
}
