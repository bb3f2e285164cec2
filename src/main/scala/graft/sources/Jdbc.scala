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
}
