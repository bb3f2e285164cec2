package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
      sortBy: Option[String] = None,
      zorderBy: Seq[String] = Nil): (Long, Long) = {
    require(sortBy.isEmpty || zorderBy.isEmpty,
      "pass sortBy OR zorderBy, not both — they are competing layouts")
    val files = listParquet(new java.io.File(inDir))
    val totalBytes = files.map(_.length()).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val shaped =
      if (zorderBy.nonEmpty) {
        // multi-column clustering: range-partition + sort on the Morton
        // key so every output file covers a small hyper-rectangle —
        // min/max stats then prune on ANY zorderBy column (a plain
        // sortBy prunes only its leading column). The projection after
        // the sort is narrow, so in-partition order survives the drop.
        val z = zorderKey(df, zorderBy)
        df.withColumn("__z", z)
          .repartitionByRange(nFiles, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
      } else sortBy match {
        case Some(c) => df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(col(c))
        case None => df.repartition(nFiles)
      }
    shaped.write.mode("overwrite").parquet(outDir)
    (files.length.toLong, listParquet(new java.io.File(outDir)).length.toLong)
  }

  /** Morton key over `cols`, each min/max-normalized into its 63/N-bit
    * lane (one tiny agg computes the bounds; double scaling is fine —
    * the key orders the LAYOUT, row values stay exact). Timestamps/dates
    * are keyed by their underlying numeric; strings hash into the lane
    * (hash order ≠ lexicographic, but co-clustering equal/skewed values
    * still bounds per-file distinct sets, which is what dictionary+stats
    * pruning uses). */
  def zorderKey(df: DataFrame, cols: Seq[String]): org.apache.spark.sql.Column = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    val bits = 63 / cols.size // keep clear of the sign bit (see InterleaveBits)
    val mask = (1L << bits) - 1L
    val numeric: Map[String, org.apache.spark.sql.Column] = cols.map { c =>
      val dt = df.schema(c).dataType
      c -> (dt match {
        case org.apache.spark.sql.types.StringType => xxhash64(col(c)).bitwiseAND(lit(mask))
        case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
        // CAST(date AS int) is rejected by ANSI Spark — days-since-epoch
        case org.apache.spark.sql.types.DateType => unix_date(col(c)).cast("long")
        case _ => col(c).cast("double")
      })
    }.toMap
    // ONE scan gets every column's bounds — a per-column agg would rescan
    // the (multi-TB, this is compaction) input once per clustered column
    val numericCols = cols.filter(c =>
      df.schema(c).dataType != org.apache.spark.sql.types.StringType)
    val bounds: Map[String, (Double, Double)] =
      if (numericCols.isEmpty) Map.empty
      else {
        val row = df.agg(
          numericCols.flatMap(c => Seq(
            min(numeric(c)).cast("double").as(s"__mn_$c"),
            max(numeric(c)).cast("double").as(s"__mx_$c"))).head,
          numericCols.flatMap(c => Seq(
            min(numeric(c)).cast("double").as(s"__mn_$c"),
            max(numeric(c)).cast("double").as(s"__mx_$c"))).tail: _*).head()
        numericCols.zipWithIndex.map { case (c, i) =>
          // empty input / all-NULL column: min & max come back NULL —
          // degrade that lane to the degenerate-range constant instead
          // of an NPE on the driver
          val lo = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
          val hi = if (row.isNullAt(2 * i + 1)) lo else row.getDouble(2 * i + 1)
          c -> (lo, hi)
        }.toMap
      }
    val scaled = cols.map { c =>
      val v = numeric(c)
      if (df.schema(c).dataType == org.apache.spark.sql.types.StringType) v
      else {
        val (lo, hi) = bounds(c)
        if (hi <= lo) lit(0L)
        else
          // top-of-range note: with one column bits=63, mask.toDouble
          // rounds UP to 2^63 and the hi row's product is exactly 2^63 —
          // safe because Spark's Floor(double) RETURNS LongType via a
          // saturating (long)Math.floor(x) (JVM d2l, not an ANSI Cast):
          // 2^63 saturates to Long.MaxValue == mask, NaN maps to lane 0.
          // No explicit cast may be added here — double→long Cast IS
          // ANSI-checked and would throw on that row.
          floor((v.cast("double") - lit(lo)) / lit(hi - lo) * lit(mask.toDouble))
      }
    }
    graft.functions.zorder(scaled: _*)
  }

  private def listParquet(dir: java.io.File): Seq[java.io.File] = {
    val here = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
    here.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
      here.filter(_.isDirectory).flatMap(listParquet)
  }
}
