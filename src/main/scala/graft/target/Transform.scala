package graft.target

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.StreamDef

/** Record-shaping operators from the load side of the reference
  * (target-pendo/src/__init__.py), re-expressed as schema-driven column
  * transforms: the reference walks every record dict in Python per row;
  * here the schema is walked ONCE at plan time and the per-row work is
  * codegen'd projection.
  */
object Transform {

  /** Nested-record flattening (target-pendo/src/__init__.py:408-418):
    * struct fields become `parent__child` columns (recursively); arrays are
    * stringified (the reference does Python `str(list)`; we use to_json —
    * stable and engine-portable). */
  def flatten(df: DataFrame, sep: String = "__"): DataFrame = {
    def expand(prefix: String, field: StructField, path: Column): Seq[Column] =
      field.dataType match {
        case s: StructType =>
          s.fields.toSeq.flatMap(f => expand(prefix + field.name + sep, f, path.getField(f.name)))
        case _: ArrayType => Seq(to_json(path).as(prefix + field.name))
        case _ => Seq(path.as(prefix + field.name))
      }
    val cols = df.schema.fields.toSeq.flatMap(f => expand("", f, col(f.name)))
    df.select(cols: _*)
  }

  /** Field mapping + dtype coercion (__init__.py:530-548): rename source
    * columns to target attributes; coerce non-string values to string for
    * attributes the target types as string (the reference checks
    * isinstance(int) → str per row; here it's a cast chosen at plan time
    * from the declared mapping). */
  def applyFieldMappings(df: DataFrame, stream: StreamDef): DataFrame =
    df.select(stream.fieldMappings.map { case (target, source) =>
      val c = col(source)
      (if (stream.stringTyped.contains(target)) c.cast("string") else c).as(target)
    }: _*)

  /** Payload shaping (__init__.py:549-558): the Pendo bulk-update body
    * `{pkey: id, "values": {attr: val, ...}}`. Values are pre-cast to
    * string for format stability; the JSON object is built by codegen'd
    * to_json. */
  def shapePayloads(df: DataFrame, primaryKey: String): DataFrame = {
    val valueCols = df.columns.filterNot(_ == primaryKey).toSeq
    df.select(
      col(primaryKey),
      to_json(struct(
        col(primaryKey).cast("string").as(primaryKey),
        struct(valueCols.map(c => col(c).cast("string").as(c)): _*).as("values"))).as("payload"))
  }

  /** Deterministic batch assignment (__init__.py:371-405 batches by
    * max_records): global row number ordered by the primary key, then
    * integer division — computed WITHOUT a global window.
    *
    * Plan: range-repartition on the key (evenly spread, globally ordered
    * across partitions) + sort within partitions, then `zipWithIndex` over
    * THAT materialized RDD for the global row number. zipWithIndex is the
    * sound structure here: its per-partition count pass and its indexing
    * pass run over the SAME RDD instance, so both see one set of range
    * bounds. (Two separate DataFrame actions would each re-execute
    * repartitionByRange, and RangePartitioner's reservoir-sample seed
    * mixes in the rdd id — at data sizes where the sample is non-
    * exhaustive the two executions can draw DIFFERENT bounds, silently
    * misaligning offsets.) The RDD hop deserializes rows once; acceptable
    * for an operator whose output feeds a sink, and still no stage ever
    * holds more than one partition — vs. the single-task WindowExec a
    * `Window.orderBy` would schedule. */
  def assignBatches(df: DataFrame, primaryKey: String, maxRecords: Int,
      numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val ranged = df.repartitionByRange(n, col(primaryKey))
      .sortWithinPartitions(col(primaryKey))
    val schema = ranged.schema.add("__rn", org.apache.spark.sql.types.LongType,
      nullable = false)
    val rows = ranged.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    // integer `div` keeps the assignment exact (a double divide + cast
    // would truncate identically for positives, but be fuzzy)
    spark.createDataFrame(rows, schema)
      .withColumn("batch_id", expr(s"CAST(__rn DIV $maxRecords AS BIGINT)"))
      .drop("__rn")
  }

  /** Per-batch accounting: record count + payload byte volume. */
  def batchStats(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.groupBy(col("batch_id"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(octet_length(col(payloadCol)).cast("long")).as("batch_bytes"))
      .orderBy(col("batch_id"))
}
