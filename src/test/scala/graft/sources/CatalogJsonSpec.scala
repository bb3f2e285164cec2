package graft.sources

import graft.SparkSpec

class CatalogJsonSpec extends SparkSpec {

  test("catalog document has the Singer shape for every table") {
    val json = CatalogJson.render(spark, sfDir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val streams = root.get("streams")
    assert(streams.size() == Tables.all.size + Tables.views.size)
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
    // integer bounds (schema.py:60-64) + is-view metadata present
    assert(props.get("o_orderkey").get("minimum").asLong() == Long.MinValue)
    assert(props.get("o_orderkey").get("maximum").asLong() == Long.MaxValue)
    assert(!props.get("o_orderstatus").has("minimum"))
    assert(!tableMd.get("is-view").asBoolean())
    // the view stream renders is-view=true with NO automatic key columns
    // (views carry no PK constraint — discover.py:83's VIEW branch)
    val view = (0 until streams.size()).map(streams.get)
      .find(_.get("stream").asText() == "v_active_customer").get
    val viewMd = view.get("metadata").get(0).get("metadata")
    assert(viewMd.get("is-view").asBoolean())
    assert(viewMd.get("table-key-properties").size() == 0)
    assert(view.get("schema").get("properties").get("c_custkey")
      .get("inclusion").asText() == "available")
  }

  test("discoverCatalog covers both table_type branches end-to-end") {
    val cat = Discovery.discoverCatalog(spark, sfDir)
    val viewRows = cat.filter("is_view").collect()
    assert(viewRows.length == 3)
    assert(viewRows.forall(_.getAs[String]("table_name") == "v_active_customer"))
    assert(viewRows.forall(_.getAs[String]("inclusion") == "available"))
    assert(cat.filter("NOT is_view AND table_name = 'customer'").count() == 5)
    // the view is readable and its schema matches what discovery declared
    val v = Tables.view(spark, sfDir, "v_active_customer")
    assert(v.columns.toSeq == Seq("c_custkey", "c_name", "c_acctbal"))
    assert(v.count() > 0)
  }

  test("columnsOf emits declared varchar lengths and view flags") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", VarcharType(25)),
      StructField("code", CharType(3)),
      StructField("free", StringType)))
    val cols = Discovery.columnsOf(schema, "synthetic", isView = true)
    val byName = cols.map(c => c.column_name -> c).toMap
    assert(byName("name").max_length.contains(25L))
    assert(byName("code").max_length.contains(3L))
    assert(byName("free").max_length.isEmpty)
    assert(byName("id").minimum.contains(Int.MinValue.toLong))
    assert(byName("id").maximum.contains(Int.MaxValue.toLong))
    assert(cols.forall(_.is_view))
    // varchar/char carried in field metadata (how parquet DDL round-trips)
    val mdField = StructField("v", StringType, metadata =
      new MetadataBuilder().putString("__CHAR_VARCHAR_TYPE_STRING", "varchar(42)").build())
    assert(Discovery.maxLengthOf(mdField).contains(42L))
  }
}
