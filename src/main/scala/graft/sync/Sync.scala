package graft.sync

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{ReplicationMethod, StreamDef, Streams}
import graft.sources.Tables

/** Replication operators — tap-redshift/src/sync.py re-expressed as
  * declarative Spark plans.
  *
  * The reference builds `SELECT cols FROM t WHERE repl_key > bookmark AND
  * pkey = ANY(active_ids) ORDER BY repl_key LIMIT n` (sync.py:107-156) and
  * streams rows through a cursor. Here the same semantics are a parquet
  * scan with pushed-down predicates, a **broadcast left-semi join** against
  * the active-id set (the reference materializes the id list in memory and
  * ships it inside the SQL text — the broadcast join is the cluster-scale
  * version of that), and TakeOrderedAndProject for the ORDER BY+LIMIT.
  */
object Sync {

  /** Apply a stream's field mappings (rename + select). Pure projection —
    * Catalyst prunes the scan to exactly the mapped source columns. */
  def mapped(df: DataFrame, stream: StreamDef): DataFrame =
    df.select(stream.fieldMappings.map { case (target, source) =>
      col(source).as(target)
    }: _*)

  /** FULL_TABLE replication (sync.py:199-206): whole table, mapped, tagged
    * with stream name + version (ACTIVATE_VERSION overwrite semantics are
    * the writer's mode=overwrite on the versioned output). */
  def fullTable(spark: SparkSession, dir: String, stream: StreamDef, version: Long): DataFrame =
    mapped(Tables.table(spark, dir, stream.sourceTable), stream)
      .withColumn("stream", lit(stream.streamName))
      .withColumn("version", lit(version))

  /** INCREMENTAL slice (sync.py:132-156), source columns intact: pushdown
    * filter on the replication key, semi-join against the target's
    * active-entity keys, deterministic order, bounded batch. `activeKeys`
    * must be a 1-column DataFrame of join keys; it is broadcast — the
    * fact side never shuffles. */
  def incrementalSlice(
      spark: SparkSession,
      dir: String,
      stream: StreamDef,
      bookmark: Option[String],
      activeKeys: DataFrame,
      joinColumn: String,
      limit: Int = 1000000,
      broadcastKeys: Boolean = true,
      bloomPrefilter: Option[(Long, Double)] = None,
      /** extract from this frame instead of the parquet warehouse — the
        * JDBC deployment shape (Jdbc.read): the bookmark filter below
        * lands on the frame and pushes into the warehouse query
        * (JdbcDerbySpec proves the replication-key pushdown). */
      sourceOverride: Option[DataFrame] = None): DataFrame = {
    val replKey = stream.replicationKey.getOrElse(
      throw new IllegalArgumentException(s"stream ${stream.streamName} has no replication key"))
    val src = sourceOverride.getOrElse(Tables.table(spark, dir, stream.sourceTable))
    val filtered = bookmark match {
      case Some(b) => src.filter(col(replKey) > lit(b))
      case None => src
    }
    val keyCol = activeKeys.columns.head
    // Scale hatch (set broadcastKeys=false, bloomPrefilter=Some(n, fpp))
    // for an active-entity set past the broadcast threshold: Bloom bits
    // prefilter the fact scan map-side, the residual left-semi join runs
    // shuffled on the surviving sliver only — semantics unchanged (the
    // Bloom stage only ever over-keeps; the join removes false positives).
    val probeSide = bloomPrefilter match {
      case Some((n, fpp)) =>
        val bytes = graft.engine.BloomSemiJoin.buildBloom(activeKeys, keyCol, n, fpp)
        filtered.filter(graft.functions.bloomMightContain(col(joinColumn), bytes))
      case None => filtered
    }
    val buildSide = if (broadcastKeys) broadcast(activeKeys) else activeKeys
    probeSide
      .join(buildSide, probeSide(joinColumn) === activeKeys(keyCol), "left_semi")
      .orderBy(col(replKey), col(stream.keyProperties.head))
      .limit(limit)
  }

  /** INCREMENTAL replication with the stream's field mappings applied. */
  def incremental(
      spark: SparkSession,
      dir: String,
      stream: StreamDef,
      bookmark: Option[String],
      activeKeys: DataFrame,
      joinColumn: String,
      limit: Int = 1000000): DataFrame =
    mapped(incrementalSlice(spark, dir, stream, bookmark, activeKeys, joinColumn, limit), stream)

  /** VOLUME counts (sync.py:153-163): per-stream record counts. */
  def volumes(spark: SparkSession, dir: String, streams: Seq[StreamDef] = Streams.all): DataFrame = {
    import spark.implicits._
    streams.map { s =>
      Tables.table(spark, dir, s.sourceTable)
        .agg(count(lit(1)).as("record_count"))
        .select(lit(s.streamName).as("stream"), $"record_count")
    }.reduce(_.unionAll(_))
  }
}
