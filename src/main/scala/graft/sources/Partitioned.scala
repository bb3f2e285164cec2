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

  /** Compact a parquet directory into ~`targetFileBytes` output files —
    * the small-file remedy for incrementally-appended tables (a year of
    * hourly micro-batches = tens of thousands of KB-scale files whose
    * open/footer overhead dwarfs the read; NameNode/listing pressure at
    * cluster scale). File count derives from the INPUT's actual on-disk
    * bytes (compressed), not row counts, so output sizes track the
    * target; `sortBy` optionally re-clusters rows (range partition +
    * in-file sort) so min/max row-group stats prune on that key after
    * compaction. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortBy: Option[String] = None): (Long, Long) = {
    val files = listParquet(new java.io.File(inDir))
    val totalBytes = files.map(_.length()).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val shaped = sortBy match {
      case Some(c) => df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(col(c))
      case None => df.repartition(nFiles)
    }
    shaped.write.mode("overwrite").parquet(outDir)
    (files.length.toLong, listParquet(new java.io.File(outDir)).length.toLong)
  }

  private def listParquet(dir: java.io.File): Seq[java.io.File] = {
    val here = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
    here.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
      here.filter(_.isDirectory).flatMap(listParquet)
  }
}
