package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL / CSV ingest and export — the interchange formats around the
  * parquet core: crawls arrive as JSONL or CSV, and training pipelines
  * hand off JSONL shards.
  *
  * Read side: the schema is always DECLARED. `spark.read.json/csv`
  * without a schema runs a full inference pass over the data first — at
  * 100 TB that doubles the read — and inferred types drift with content.
  * Malformed lines land in a `_corrupt` column (PERMISSIVE) instead of
  * failing the job, mirroring q_json_extract's per-row degrade. Caveat:
  * Spark disallows raw-file queries that reference ONLY the corrupt
  * column — cache or write the parsed frame before corrupt-only
  * predicates (SPARK-26224).
  *
  * Write side: `writeJsonlSharded` targets a shard SIZE, not a shard
  * count — exact byte accounting (sum of line lengths + newlines) in one
  * aggregate, then one repartition to ceil(total/target) shards. Same
  * philosophy as Partitioned.compact: size from measured bytes, never
  * from guessed row widths.
  */
object TextFormats {

  /** JSONL with declared schema; malformed lines → `_corrupt`, not a
    * job failure. */
  def readJsonl(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read
      .schema(StructType.fromDDL(schemaDdl).add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** CSV with declared schema. Quotes/escapes per RFC defaults;
    * malformed lines → `_corrupt`. */
  def readCsv(spark: SparkSession, path: String, schemaDdl: String,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(StructType.fromDDL(schemaDdl).add("_corrupt", "string"))
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Write `df` as JSONL shards of ~targetBytes each; returns the shard
    * count. Bytes are measured (UTF-8 line lengths + newline), not
    * estimated; shard count is total/target rounded up, so shards stay
    * near the target regardless of row width skew. Round-robin
    * repartition spreads rows evenly across shards. */
  def writeJsonlSharded(df: DataFrame, path: String,
      targetBytes: Long = 64L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val lines = df.select(
      to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
    val total = lines
      .agg(coalesce(sum(octet_length(col("value")) + lit(1L)), lit(0L)).as("b"))
      .first().getLong(0)
    val shards = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    lines.repartition(shards).write.mode("overwrite").text(path)
    shards
  }

  /** ORC export — the Hive-ecosystem columnar interchange (a corpus
    * handed to an ORC-native warehouse keeps stripe min/max stats, so
    * the receiving engine prunes like we prune parquet). zstd default
    * matches the compaction path's parquet codec choice. */
  def writeOrc(df: DataFrame, path: String, compression: String = "zstd"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** ORC read. Schema rides the file footer (no inference pass to dodge,
    * unlike JSONL/CSV), and the scan supports the same predicate
    * pushdown + column pruning as parquet — OrcSpec pins both, plus
    * timestamp/array round-trip fidelity. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
