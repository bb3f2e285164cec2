package graft.sync

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Target-side Singer message consumption — the parse/validate state
  * machine of target-pendo (__init__.py:421-622 iterates stdin lines,
  * validates type/stream/version/schema agreement, and batches RECORDs),
  * re-expressed columnar: a DataFrame of raw JSON lines becomes typed
  * message columns, a validity verdict, and extracted records — one
  * codegen'd pass, no per-row driver loop.
  */
object MessageParser {

  val messageSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("stream", StringType),
    StructField("version", LongType),
    StructField("time_extracted", StringType),
    StructField("count", LongType),
    StructField("record", MapType(StringType, StringType)),
    StructField("schema", StringType),
    StructField("key_properties", ArrayType(StringType)),
    StructField("value", StringType)))

  /** Parse raw message lines (column `line`) into typed message columns.
    * Unparseable lines get message type null (the reference raises on
    * json.decoder.JSONDecodeError; callers filter or fail on `bad`). */
  def parse(lines: DataFrame): DataFrame =
    lines.withColumn("msg", from_json(col("line"), messageSchema))
      .select(
        col("msg.type").as("msg_type"),
        col("msg.stream").as("stream"),
        col("msg.version").as("version"),
        col("msg.time_extracted").as("time_extracted"),
        col("msg.count").as("count"),
        col("msg.record").as("record"),
        col("msg.value").as("state_value"),
        col("line"))

  /** Validation verdict per message (the reference's required-key checks:
    * RECORD needs stream+record, SCHEMA needs stream+schema,
    * ACTIVATE_VERSION needs stream+version, VOLUME needs count). */
  def withValidity(parsed: DataFrame): DataFrame = {
    val t = col("msg_type")
    val problem =
      when(t.isNull, "unparseable or missing type")
        .when(t === "RECORD" && (col("stream").isNull || col("record").isNull),
          "RECORD missing stream or record")
        .when(t === "SCHEMA" && col("stream").isNull, "SCHEMA missing stream")
        .when(t === "ACTIVATE_VERSION" && (col("stream").isNull || col("version").isNull),
          "ACTIVATE_VERSION missing stream or version")
        .when(t === "VOLUME" && col("count").isNull, "VOLUME missing count")
        .when(!t.isin("RECORD", "SCHEMA", "STATE", "VOLUME", "ACTIVATE_VERSION"),
          "unknown message type")
        .otherwise(null)
    parsed.withColumn("problem", problem)
  }

  /** Extract the RECORD payloads of one stream (+ expected version, like
    * the reference's version_match guard) into columns. */
  def records(parsed: DataFrame, stream: String, version: Long, fields: Seq[String]): DataFrame = {
    val base = parsed.filter(
      col("msg_type") === "RECORD" && col("stream") === stream && col("version") === version)
    base.select(
      (col("stream") +: col("version") +:
        fields.map(f => col("record").getItem(f).as(f))): _*)
  }
}
