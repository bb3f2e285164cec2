package graft.catalog

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Config-file compatibility layer: parses the reference's tap/target
  * config documents (tap-redshift/tap_config.json: connection + start_date;
  * tap-redshift/target_config.json: integration_key + per-stream
  * definitions with field_mappings) into the engine's structures, so a
  * reference user's existing config files drive this engine unchanged.
  */
object Config {

  private val mapper = new ObjectMapper()

  final case class TapConfig(
      host: String, port: String, dbname: String,
      user: String, password: String,
      startDate: Option[String], schema: Option[String],
      targetIntegrationKey: Option[String]) {

    /** Spark JDBC source config for this connection (Redshift speaks the
      * postgres wire protocol). */
    def jdbc(table: String): graft.sources.Jdbc.JdbcSourceConfig =
      graft.sources.Jdbc.JdbcSourceConfig(
        url = s"jdbc:postgresql://$host:$port/$dbname",
        table = table, user = user, password = password)
  }

  final case class TargetConfig(
      integrationKey: String,
      streams: Seq[StreamDef])

  private def optText(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)

  def parseTapConfig(json: String): TapConfig = {
    val n = mapper.readTree(json)
    TapConfig(
      host = n.get("host").asText(),
      port = n.get("port").asText(),
      dbname = n.get("dbname").asText(),
      user = n.get("user").asText(),
      password = n.get("password").asText(),
      startDate = optText(n, "start_date"),
      schema = optText(n, "schema"),
      targetIntegrationKey = optText(n, "target_integration_key"))
  }

  /** Parse target_config.json: every object-valued top-level field is a
    * stream definition (the reference iterates config keys minus
    * integration_key, target __init__.py:675). */
  def parseTargetConfig(json: String): TargetConfig = {
    val n = mapper.readTree(json)
    val streams = n.properties().asScala.toSeq
      .filter { e => e.getValue.isObject }
      .map { e => streamDef(e.getKey, e.getValue) }
    TargetConfig(
      integrationKey = optText(n, "integration_key").getOrElse(""),
      streams = streams)
  }

  private def streamDef(name: String, n: JsonNode): StreamDef = {
    val mappings = Option(n.get("field_mappings")).map { fm =>
      fm.properties().asScala.toSeq.map(e => e.getKey -> e.getValue.asText())
    }.getOrElse(Seq.empty)
    StreamDef(
      streamName = name,
      sourceTable = name,
      targetEntity = if (name.contains("visitor")) "visitors" else "accounts",
      keyProperties = Option(n.get("key_properties"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty),
      targetPrimaryKey = optText(n, "primary_key").getOrElse(""),
      replicationMethod = optText(n, "replication_method") match {
        case Some("INCREMENTAL") => ReplicationMethod.Incremental
        case _ => ReplicationMethod.FullTable
      },
      replicationKey = Option(n.get("replication_key"))
        .flatMap(_.elements().asScala.map(_.asText()).toSeq.headOption),
      fieldMappings = mappings,
      // the reference coerces ints to string when the target attr is
      // string-typed; ids are the always-string case
      stringTyped = Set(optText(n, "primary_key").getOrElse("")))
  }
}
