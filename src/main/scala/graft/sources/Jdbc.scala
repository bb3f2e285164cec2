package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned JDBC source for warehouse extraction (SURVEY.md §2 A10) —
  * the cluster-scale replacement for the reference's single psycopg2
  * cursor (tap-redshift/src/connect.py + sync.py:104: one connection
  * streams the whole table).
  *
  * At 100 TB the extraction itself must parallelize: `partitionColumn` +
  * bounds split the source query into `numPartitions` range-predicated
  * reads executed by different tasks, and Spark's JDBC source pushes
  * filters/projections into the warehouse (`pushDownPredicate`). The
  * replication-key filter of an incremental sync therefore runs inside
  * the warehouse, not in Spark.
  */
object Jdbc {

  final case class JdbcSourceConfig(
      url: String,
      table: String,
      user: String,
      password: String,
      /** numeric/date column to range-partition the read on (the stream's
        * key or replication key) */
      partitionColumn: Option[String] = None,
      lowerBound: Option[String] = None,
      upperBound: Option[String] = None,
      numPartitions: Int = 8,
      fetchSize: Int = 10000,
      driver: String = "org.postgresql.Driver")

  /** Render the Spark JDBC option map (pure — unit-testable without a
    * database; the container has no network egress). */
  def options(cfg: JdbcSourceConfig): Map[String, String] = {
    val base = Map(
      "url" -> cfg.url,
      "dbtable" -> cfg.table,
      "user" -> cfg.user,
      "password" -> cfg.password,
      "driver" -> cfg.driver,
      "fetchsize" -> cfg.fetchSize.toString,
      "pushDownPredicate" -> "true",
      "pushDownLimit" -> "true")
    val partitioned = for {
      pc <- cfg.partitionColumn
      lo <- cfg.lowerBound
      hi <- cfg.upperBound
    } yield Map(
      "partitionColumn" -> pc,
      "lowerBound" -> lo,
      "upperBound" -> hi,
      "numPartitions" -> cfg.numPartitions.toString)
    base ++ partitioned.getOrElse(Map.empty)
  }

  def read(spark: SparkSession, cfg: JdbcSourceConfig): DataFrame =
    spark.read.format("jdbc").options(options(cfg)).load()

  /** Warehouse WRITE-BACK config — the sink half of the north star's
    * "JDBC source/sink" (round-12; the reference itself loads via HTTP,
    * so this extends rather than mirrors it: a user round-tripping
    * curated data back into the warehouse hits this first).
    *
    * Scale knobs: `batchSize` sizes the executeBatch units each task
    * flushes (too small = per-row round-trips; too large = warehouse
    * statement limits); `numPartitions` CAPS the number of concurrent
    * warehouse connections (Spark coalesces the frame down to it — a
    * 1000-task stage must not open 1000 connections against a
    * connection-limited warehouse); `isolationLevel` trades write
    * atomicity visibility vs lock pressure; `truncate=true` makes
    * overwrite reuse the existing table (TRUNCATE) instead of
    * DROP+CREATE, preserving warehouse-side grants/sort keys — exactly
    * the properties a provisioned Redshift table carries. */
  final case class JdbcSinkConfig(
      url: String,
      table: String,
      user: String,
      password: String,
      /** SaveMode: "append" (incremental load) or "overwrite" (full
        * refresh) — the two reference sync modes' landing shapes */
      mode: String = "append",
      batchSize: Int = 10000,
      isolationLevel: String = "READ_COMMITTED",
      truncate: Boolean = false,
      /** cap on concurrent warehouse connections (coalesce, no shuffle) */
      numPartitions: Option[Int] = None,
      /** warehouse-side column DDL for CREATE, e.g. "name VARCHAR(64)" —
        * without it the dialect default can land strings as CLOB/TEXT,
        * which many warehouses can't index or compare (a pushed string
        * predicate against a Derby CLOB is a hard error) */
      createTableColumnTypes: Option[String] = None,
      driver: String = "org.postgresql.Driver")

  /** Render the Spark JDBC writer option map (pure — unit-testable
    * without a database, same contract as [[options]]). */
  def sinkOptions(cfg: JdbcSinkConfig): Map[String, String] =
    Map(
      "url" -> cfg.url,
      "dbtable" -> cfg.table,
      "user" -> cfg.user,
      "password" -> cfg.password,
      "driver" -> cfg.driver,
      "batchsize" -> cfg.batchSize.toString,
      "isolationLevel" -> cfg.isolationLevel,
      "truncate" -> cfg.truncate.toString) ++
      cfg.numPartitions.map(n => "numPartitions" -> n.toString) ++
      cfg.createTableColumnTypes.map("createTableColumnTypes" -> _)

  /** Write `df` into the warehouse table per `cfg`. */
  def write(df: DataFrame, cfg: JdbcSinkConfig): Unit =
    df.write.format("jdbc").options(sinkOptions(cfg)).mode(cfg.mode).save()
}
