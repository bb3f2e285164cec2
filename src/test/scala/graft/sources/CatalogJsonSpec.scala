package graft.sources

import graft.SparkSpec

class CatalogJsonSpec extends SparkSpec {

  test("catalog document has the Singer shape for every table") {
    val json = CatalogJson.render(spark, sfDir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val streams = root.get("streams")
    assert(streams.size() == Tables.all.size)
    val orders = (0 until streams.size()).map(streams.get)
      .find(_.get("stream").asText() == "orders").get
    assert(orders.get("tap_stream_id").asText() == "graft.orders")
    val props = orders.get("schema").get("properties")
    assert(props.get("o_orderdate").get("format").asText() == "date-time")
    assert(props.get("o_orderkey").get("inclusion").asText() == "automatic")
    val tableMd = orders.get("metadata").get(0).get("metadata")
    assert(tableMd.get("valid-replication-keys").get(0).asText() == "o_orderdate")
    assert(tableMd.get("table-key-properties").get(0).asText() == "o_orderkey")
    // unsupported column carried with inclusion=unsupported, no type
    val emb = (0 until streams.size()).map(streams.get)
      .find(_.get("stream").asText() == "embeddings").get
    assert(emb.get("schema").get("properties").get("embedding")
      .get("inclusion").asText() == "unsupported")
  }
}
