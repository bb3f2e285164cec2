package graft.sync

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.catalog.StreamDef

/** Singer message algebra — tap-redshift/src/messages.py re-expressed as
  * columnar JSON construction. A message "stream" in Spark is a DataFrame
  * of JSON lines built with codegen'd `to_json` — no per-row driver code
  * (the reference serializes row-by-row through a Python generator,
  * messages.py:346-358).
  *
  * Field values are pre-cast to string before JSON embedding so the output
  * is format-stable across engines (SURVEY.md §6).
  */
object Messages {

  /** JSON string literal with full escaping (quotes, backslashes, control
    * chars) — hand-interpolated names/streams must not break the line
    * protocol (the reference routes everything through json.dumps). */
  private[graft] def js(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** RECORD messages: {"type":"RECORD","stream":s,"record":{...},"version":v,
    * "time_extracted":t}. `fields` are (name, column) pairs; order is
    * preserved in the JSON object. */
  def recordMessages(
      df: DataFrame,
      stream: String,
      version: Long,
      timeExtracted: String,
      fields: Seq[(String, Column)]): DataFrame = {
    val record = struct(fields.map { case (n, c) => c.cast("string").as(n) }: _*)
    df.select(to_json(struct(
      lit("RECORD").as("type"),
      lit(stream).as("stream"),
      record.as("record"),
      lit(version).as("version"),
      lit(timeExtracted).as("time_extracted"))).as("message"))
  }

  /** SCHEMA message for a stream (messages.py:73-111) — single JSON value
    * built from the stream's field mappings + JSON types. */
  def schemaMessage(stream: StreamDef, jsonTypes: Seq[(String, String)]): String = {
    val props = jsonTypes.map { case (n, t) => s"""${js(n)}:{"type":["null",${js(t)}]}""" }.mkString(",")
    val keys = stream.keyProperties.map(js).mkString("[", ",", "]")
    s"""{"type":"SCHEMA","stream":${js(stream.streamName)},"schema":{"type":"object","properties":{$props}},"key_properties":$keys}"""
  }

  /** STATE message (messages.py:135-149). */
  def stateMessage(state: SyncState): String =
    s"""{"type":"STATE","value":${Bookmarks.toJson(state)}}"""

  /** VOLUME message (messages.py:114-132). */
  def volumeMessage(stream: String, count: Long): String =
    s"""{"type":"VOLUME","stream":${js(stream)},"count":$count}"""

  /** ACTIVATE_VERSION message (messages.py:152-173). */
  def activateVersionMessage(stream: String, version: Long): String =
    s"""{"type":"ACTIVATE_VERSION","stream":${js(stream)},"version":$version}"""
}
