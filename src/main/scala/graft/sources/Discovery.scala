package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.catalog.Streams

/** Catalog discovery — the engine analog of the reference's discovery mode
  * (tap-redshift/src/discover.py:17-97 introspects INFORMATION_SCHEMA;
  * schema.py:38-83 maps warehouse types to JSON-schema types + inclusion).
  *
  * Here the warehouse is parquet, so the table schemas come from the Spark
  * catalog. The output is itself a DataFrame (metadata is small — this is
  * driver-side schema work, not data movement).
  */
object Discovery {

  final case class ColumnInfo(
      table_name: String,
      ordinal: Long,
      column_name: String,
      sql_type: String,
      json_type: String,
      format: String,
      inclusion: String,
      is_replication_key: Boolean)

  /** schema.py:38-83 type mapping, re-expressed over Spark DataTypes. */
  def jsonTypeOf(dt: DataType): (String, String) = dt match {
    case BooleanType => ("boolean", "")
    case ByteType | ShortType | IntegerType | LongType => ("integer", "")
    case FloatType | DoubleType | _: DecimalType => ("number", "")
    case StringType => ("string", "")
    case DateType => ("string", "date")
    case TimestampType | TimestampNTZType => ("string", "date-time")
    case _ => ("unsupported", "")
  }

  /** Key properties per table (the discover.py PK-constraint introspection;
    * parquet has no constraint metadata so the registry declares them). */
  val keyProperties: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  def columns(spark: SparkSession, dir: String, table: String): Seq[ColumnInfo] = {
    val schema = Tables.table(spark, dir, table).schema
    val pkey = keyProperties.get(table)
    schema.fields.zipWithIndex.map { case (f, i) =>
      val (jt, fmt) = jsonTypeOf(f.dataType)
      val inclusion =
        if (jt == "unsupported") "unsupported"
        else if (pkey.contains(f.name)) "automatic"
        else "available"
      // timestamp_ntz and timestamp are one warehouse type in the catalog
      // (parquet files may carry either depending on isAdjustedToUTC)
      val sqlType = f.dataType.simpleString.replace("timestamp_ntz", "timestamp")
      ColumnInfo(table, i + 1L, f.name, sqlType, jt, fmt,
        inclusion, fmt == "date-time")
    }.toSeq
  }

  /** Full-catalog discovery over every table in the warehouse dir. */
  def discoverCatalog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.all.flatMap(columns(spark, dir, _)).toDF()
      .orderBy("table_name", "ordinal")
  }
}

/** Column-selection resolution — tap-redshift/src/resolve.py:10-44.
  * The selected set is intersected with 'available' columns and unioned
  * with 'automatic' (key) columns; 'unsupported' picks are dropped.
  * In Spark terms the result drives the projection, so pruning reaches the
  * parquet scan.
  */
object Resolve {

  def desiredColumns(
      selected: Set[String],
      inclusions: Seq[(String, String)]): Seq[String] = {
    val available = inclusions.collect { case (c, "available") => c }.toSet
    val automatic = inclusions.collect { case (c, "automatic") => c }.toSet
    inclusions.collect {
      case (c, _) if (selected.contains(c) && available.contains(c)) || automatic.contains(c) => c
    }
  }

  /** Apply selection to a table: projection (column pruning) only. */
  def select(spark: SparkSession, dir: String, table: String, selected: Set[String]): DataFrame = {
    val inclusions = Discovery.columns(spark, dir, table).map(c => c.column_name -> c.inclusion)
    val cols = desiredColumns(selected, inclusions)
    Tables.table(spark, dir, table).select(cols.map(org.apache.spark.sql.functions.col): _*)
  }

  /** Resume support (resolve.py:72-76): when a previous run died mid-sync,
    * skip streams until the one recorded in currently_syncing. */
  def resumeStreams[S](streams: Seq[S], streamName: S => String,
      currentlySyncing: Option[String]): Seq[S] =
    currentlySyncing match {
      case Some(cur) if streams.exists(streamName(_) == cur) =>
        streams.dropWhile(streamName(_) != cur)
      case _ => streams
    }
}
