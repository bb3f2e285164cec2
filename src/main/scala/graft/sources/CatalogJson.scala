package graft.sources

import org.apache.spark.sql.SparkSession
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Singer catalog document rendering — discovery mode's output format
  * (tap-redshift/src/discover.py:13 `.dump()`: a catalog.json of stream
  * objects with JSON-schema properties and metadata breadcrumbs, README
  * "Catalog discovery"). Produces the document a reference user would
  * redirect to catalog.json and hand-edit to select streams.
  */
object CatalogJson {

  private val mapper = new ObjectMapper()

  def render(spark: SparkSession, dir: String, dbName: String = "graft"): String = {
    val root = mapper.createObjectNode()
    val streams = root.putArray("streams")
    // views render next to tables (discover.py:83 emits both, the view
    // streams carrying is-view=true and no table-key-properties)
    (Tables.all ++ Tables.views).foreach { table =>
      streams.add(streamNode(spark, dir, table, dbName))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Stream names marked selected in an (edited) catalog document — sync
    * mode's selection input (the reference resolves selected streams from
    * catalog metadata, resolve.py). A stream is selected when its
    * root-breadcrumb metadata says `"selected": true` (the user's edit),
    * falling back to `selected-by-default`. */
  def selectedStreams(catalogJson: String): Set[String] = {
    val root = mapper.readTree(catalogJson)
    Option(root.get("streams")).map(_.elements().asScala.filter { s =>
      val rootMd = Option(s.get("metadata")).toSeq
        .flatMap(_.elements().asScala)
        .find(m => Option(m.get("breadcrumb")).exists(_.size() == 0))
        .flatMap(m => Option(m.get("metadata")))
      rootMd.exists(m =>
        Option(m.get("selected")).map(_.asBoolean()).getOrElse(
          Option(m.get("selected-by-default")).exists(_.asBoolean())))
    }.flatMap(s => Option(s.get("stream")).map(_.asText())).toSet)
      .getOrElse(Set.empty)
  }

  private def streamNode(spark: SparkSession, dir: String, table: String, dbName: String): ObjectNode = {
    val cols = Discovery.columns(spark, dir, table)
    val node = mapper.createObjectNode()
    node.put("tap_stream_id", s"$dbName.$table")
    node.put("stream", table)
    node.put("database_name", dbName)
    node.put("table_name", table)
    val schema = node.putObject("schema")
    schema.put("type", "object")
    val props = schema.putObject("properties")
    cols.foreach { c =>
      val p = props.putObject(c.column_name)
      if (c.json_type == "unsupported") {
        p.put("inclusion", "unsupported")
      } else {
        val types = p.putArray("type")
        types.add("null"); types.add(c.json_type)
        if (c.format.nonEmpty) p.put("format", c.format)
        p.put("inclusion", c.inclusion)
        // integer range bounds and declared char lengths (schema.py:60-64
        // int2/4/8 min/max; char/varchar length) so catalog consumers get
        // the same validation contract the reference emits
        c.minimum.foreach(v => p.put("minimum", v))
        c.maximum.foreach(v => p.put("maximum", v))
        c.max_length.foreach(v => p.put("maxLength", v))
      }
    }
    val metadata = node.putArray("metadata")
    val tableMd = metadata.addObject()
    tableMd.putArray("breadcrumb")
    val md = tableMd.putObject("metadata")
    md.put("selected-by-default", false)
    md.put("is-view", cols.headOption.exists(_.is_view))
    md.put("schema-name", table)
    md.put("database-name", dbName)
    val keys = md.putArray("table-key-properties")
    Discovery.keyProperties.get(table).foreach(keys.add)
    val replKeys = cols.filter(_.is_replication_key)
    if (replKeys.nonEmpty) {
      val vk = md.putArray("valid-replication-keys")
      replKeys.foreach(c => vk.add(c.column_name))
    }
    cols.foreach { c =>
      val colMd = metadata.addObject()
      val bc = colMd.putArray("breadcrumb")
      bc.add("properties"); bc.add(c.column_name)
      val m = colMd.putObject("metadata")
      m.put("selected-by-default", c.inclusion != "unsupported")
      m.put("sql-datatype", c.sql_type)
      m.put("inclusion", c.inclusion)
    }
    node
  }
}
