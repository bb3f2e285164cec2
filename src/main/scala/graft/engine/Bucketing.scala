package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table storage layout for co-located joins — the pre-shuffle
  * lever for tables that are joined on the same key query after query
  * (SURVEY.md §5: "repartition/bucketing for co-located joins").
  *
  * A 100 TB fact table joined repeatedly on its key pays one exchange per
  * query unless the data is WRITTEN hash-bucketed on that key: then every
  * read is already `HashPartitioning(key, n)` and a join between two
  * co-bucketed tables (same key, same bucket count, sorted buckets) plans
  * as a sort-merge join with NO Exchange on either side — the shuffle was
  * paid once at write time.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted parquet table registered in
    * the session catalog. `path` keeps the data external (the catalog
    * entry carries the bucket spec; the files live where you point it). */
  def writeBucketed(df: DataFrame, name: String, key: String,
      buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)

  /** Join two co-bucketed tables on their bucket key. With matching bucket
    * specs the plan contains no Exchange — verify with
    * `.explain("formatted")` or the BucketingSpec plan assertion. */
  def cobucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
