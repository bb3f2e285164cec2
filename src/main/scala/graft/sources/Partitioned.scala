package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned storage layout for incremental facts (SURVEY.md §5).
  *
  * At 100 TB the bookmark predicate must prune DIRECTORIES, not just row
  * groups: writing the fact table partitioned by the replication key's
  * date means an incremental sync from bookmark B lists only the
  * partitions ≥ date(B) — the scan never opens older files at all
  * (PartitionFilters in the plan, distinct from pushed data filters).
  */
object Partitioned {

  /** Write `df` partitioned by the date of `tsCol` (one directory per
    * day). The original timestamp column is preserved; `p_date` is the
    * partition column. */
  def writeDatePartitioned(df: DataFrame, tsCol: String, outDir: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("p_date")
      .parquet(outDir)

  /** Incremental read: partition-level prune on the date, row-level filter
    * on the exact timestamp (both reach the scan — the first as a
    * PartitionFilter, the second as a PushedFilter). */
  def readSince(spark: SparkSession, dir: String, tsCol: String,
      bookmark: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("p_date") >= to_date(lit(bookmark)))
      .filter(col(tsCol) > lit(bookmark))
}
