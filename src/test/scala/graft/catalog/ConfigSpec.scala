package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

/** Parses config documents in the REFERENCE's exact file shapes (the
  * tap_config.json / target_config.json formats from the README). */
class ConfigSpec extends AnyFunSuite {

  private val tapJson =
    """{
      |  "host": "warehouse.example", "port": "5439", "dbname": "analytics",
      |  "user": "etl", "password": "secret",
      |  "start_date": "2000-01-01T00:00:00Z", "schema": "public",
      |  "target_integration_key": "key-123"
      |}""".stripMargin

  private val targetJson =
    """{
      |  "integration_key": "key-123",
      |  "pendo_integration_account": {
      |    "stream": "pendo_integration_account",
      |    "key_properties": ["platform_account_public_id"],
      |    "primary_key": "accountId",
      |    "replication_method": "FULL_TABLE",
      |    "replication_key": ["last_updated"],
      |    "bookmark_type": "datetime",
      |    "field_mappings": {
      |      "accountId": "platform_account_public_id",
      |      "sgaccountstatus": "sg_account_status"
      |    }
      |  },
      |  "pendo_integration_visitor": {
      |    "stream": "pendo_integration_visitor",
      |    "key_properties": ["platform_user_public_id"],
      |    "primary_key": "visitorId",
      |    "replication_method": "INCREMENTAL",
      |    "replication_key": ["last_updated"],
      |    "field_mappings": {"visitorId": "platform_user_public_id"}
      |  }
      |}""".stripMargin

  test("tap config parses and builds a partitionable JDBC source") {
    val tap = Config.parseTapConfig(tapJson)
    assert(tap.startDate.contains("2000-01-01T00:00:00Z"))
    val jdbc = tap.jdbc("public.pendo_integration_account")
    assert(jdbc.url == "jdbc:postgresql://warehouse.example:5439/analytics")
    assert(graft.sources.Jdbc.options(jdbc)("dbtable") == "public.pendo_integration_account")
  }

  test("target config yields stream definitions with mappings") {
    val target = Config.parseTargetConfig(targetJson)
    assert(target.integrationKey == "key-123")
    assert(target.streams.map(_.streamName).toSet ==
      Set("pendo_integration_account", "pendo_integration_visitor"))
    val acct = target.streams.find(_.streamName == "pendo_integration_account").get
    assert(acct.replicationMethod == ReplicationMethod.FullTable)
    assert(acct.fieldMappings.contains("accountId" -> "platform_account_public_id"))
    assert(acct.targetEntity == "accounts")
    val vis = target.streams.find(_.streamName == "pendo_integration_visitor").get
    assert(vis.replicationMethod == ReplicationMethod.Incremental)
    assert(vis.replicationKey.contains("last_updated"))
    assert(vis.targetEntity == "visitors")
  }
}
