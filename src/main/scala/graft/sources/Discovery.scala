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
      is_replication_key: Boolean,
      minimum: Option[Long],
      maximum: Option[Long],
      max_length: Option[Long],
      is_view: Boolean)

  /** schema.py:38-83 type mapping, re-expressed over Spark DataTypes. */
  def jsonTypeOf(dt: DataType): (String, String) = dt match {
    case BooleanType => ("boolean", "")
    case ByteType | ShortType | IntegerType | LongType => ("integer", "")
    case FloatType | DoubleType | _: DecimalType => ("number", "")
    case StringType | _: VarcharType | _: CharType => ("string", "")
    case DateType => ("string", "date")
    case TimestampType | TimestampNTZType => ("string", "date-time")
    case _ => ("unsupported", "")
  }

  /** Integer range bounds by byte width (schema.py:60-64: bits = bytes*8,
    * minimum = -2^(bits-1), maximum = 2^(bits-1)-1 — the int2/int4/int8
    * contract a catalog consumer relies on for range checks). */
  def boundsOf(dt: DataType): Option[(Long, Long)] = dt match {
    case ByteType    => Some((Byte.MinValue.toLong, Byte.MaxValue.toLong))
    case ShortType   => Some((Short.MinValue.toLong, Short.MaxValue.toLong))
    case IntegerType => Some((Int.MinValue.toLong, Int.MaxValue.toLong))
    case LongType    => Some((Long.MinValue, Long.MaxValue))
    case _           => None
  }

  /** Declared character length for char/varchar columns. Spark keeps the
    * original char/varchar type either as the DataType itself or in field
    * metadata (plain parquet strings are unbounded → None). */
  def maxLengthOf(f: StructField): Option[Long] = f.dataType match {
    case VarcharType(n) => Some(n.toLong)
    case CharType(n)    => Some(n.toLong)
    case _ =>
      val key = "__CHAR_VARCHAR_TYPE_STRING"
      if (f.metadata.contains(key))
        "\\((\\d+)\\)".r.findFirstMatchIn(f.metadata.getString(key))
          .map(_.group(1).toLong)
      else None
  }

  /** Key properties per table (the discover.py PK-constraint introspection;
    * parquet has no constraint metadata so the registry declares them). */
  val keyProperties: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  /** Column inventory from a schema (separable from the parquet read so
    * synthetic schemas — e.g. varchar-typed views — are testable). */
  def columnsOf(schema: StructType, table: String, isView: Boolean = false): Seq[ColumnInfo] = {
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
      val bounds = boundsOf(f.dataType)
      ColumnInfo(table, i + 1L, f.name, sqlType, jt, fmt,
        inclusion, fmt == "date-time",
        bounds.map(_._1), bounds.map(_._2), maxLengthOf(f), isView)
    }.toSeq
  }

  /** Streams known to be views (discover.py:83 marks table_type == 'VIEW');
    * the registry lives with the view definitions in [[Tables.views]]. */
  def views: Set[String] = Tables.views.toSet

  def columns(spark: SparkSession, dir: String, table: String): Seq[ColumnInfo] = {
    val isView = views.contains(table)
    val schema =
      if (isView) Tables.view(spark, dir, table).schema
      else Tables.table(spark, dir, table).schema
    columnsOf(schema, table, isView)
  }

  /** Full-catalog discovery over every table AND view in the warehouse
    * dir — both branches of the reference's table_type marking. */
  def discoverCatalog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    (Tables.all ++ Tables.views).flatMap(columns(spark, dir, _)).toDF()
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
