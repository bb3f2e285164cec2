package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Parquet table registry for the synthetic warehouse.
  *
  * The reference extracts from Redshift tables discovered at runtime
  * (tap-redshift/src/discover.py:17); here the warehouse is a directory of
  * parquet tables. Reads are lazy scans — projection and predicates placed
  * on the returned DataFrame reach the parquet reader (column pruning +
  * predicate pushdown), which is the property that matters at 100 TB.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Logical views over the base tables — the catalog analog of
    * discover.py:83's table_type == 'VIEW' streams (Redshift exposes
    * views next to tables in INFORMATION_SCHEMA; a parquet warehouse
    * has no system catalog, so the registry declares them). Views are
    * discoverable (A1 marks them is_view=true, with no 'automatic'
    * key columns — views carry no PK constraint, same as the
    * reference's discovered views) but are not sync streams: `all`
    * drives extraction, `views` only joins it for discovery. */
  val views: Seq[String] = Seq("v_active_customer")

  def view(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "v_active_customer" =>
      table(spark, dir, "customer")
        .filter(expr("c_acctbal > 0"))
        .select("c_custkey", "c_name", "c_acctbal")
    case other =>
      throw new IllegalArgumentException(s"unknown view: $other")
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The events table carries TIMESTAMP(NANOS) which Spark's vectorized
    // parquet reader rejects; read nanos as long and truncate to micros —
    // the same floor-truncation DuckDB applies when it reads nanos into its
    // microsecond TIMESTAMP, so oracle comparison stays exact. The conf is
    // normally set by GraftSession; only fixed up here for foreign sessions.
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Timestamps in the driver-written testdata are isAdjustedToUTC=false;
    // Spark 4 would infer TIMESTAMP_NTZ, but the engine's temporal operators
    // (epoch casts, unix_micros, window ranges) and the DuckDB oracle
    // compare are built on session-UTC TIMESTAMP (LTZ). With the session
    // timezone pinned to UTC the wall-clock values are identical either
    // way, so reading as LTZ changes no query result — only the type.
    // The "identical either way" equivalence REQUIRES the UTC session
    // timezone, so the foreign-session fixup pins the two confs
    // INDEPENDENTLY (a non-UTC session reading NTZ-written micros as
    // LTZ would shift every wall-clock value by its zone offset — and
    // that session may well arrive with inferTimestampNTZ already
    // false, so the timezone pin must not hide behind the NTZ guard).
    if (spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if (spark.conf.get("spark.sql.session.timeZone", "") != "UTC")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // only when the file actually carried nanos (read back as long) —
    // tables written by this engine already carry micros timestamps
    // FLOOR division (not `div`, which truncates toward zero): a pre-epoch
    // nanosecond value must round down like DuckDB's conversion does.
    // (x - pmod(x, 1000)) is divisible by 1000, so the `div` is exact.
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
    else df
  }
}
