package graft.sources

import graft.SparkSpec
import java.sql.DriverManager
import org.apache.spark.sql.functions._

/** LIVE JDBC write-back round-trip over in-JVM Derby — the sink half of
  * the north star's "JDBC source/sink" (round-12 verdict item 6),
  * mirroring JdbcDerbySpec's live-connection discipline: append
  * accumulates, overwrite replaces, truncate-overwrite preserves the
  * warehouse-provisioned table, and the read-back equals the written
  * frame value-for-value. */
class JdbcSinkSpec extends SparkSpec {

  private val dbUrl = "jdbc:derby:memory:graftsinkdb;create=true"
  private val derbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private def sinkCfg(table: String, mode: String = "append",
      truncate: Boolean = false) = Jdbc.JdbcSinkConfig(
    url = dbUrl, table = table, user = "", password = "",
    mode = mode, batchSize = 50, truncate = truncate,
    numPartitions = Some(2), driver = derbyDriver)

  private def srcCfg(table: String) = Jdbc.JdbcSourceConfig(
    url = dbUrl, table = table, user = "", password = "",
    driver = derbyDriver)

  private def frame(lo: Int, hi: Int) = {
    import spark.implicits._
    spark.range(lo, hi).select(
      col("id").as("k"),
      concat(lit("row-"), col("id")).as("name"),
      (col("id") * 1.5).as("score"))
  }

  test("sink options render every writer knob") {
    val opts = Jdbc.sinkOptions(sinkCfg("t", mode = "overwrite", truncate = true))
    assert(opts("batchsize") == "50")
    assert(opts("isolationLevel") == "READ_COMMITTED")
    assert(opts("truncate") == "true")
    assert(opts("numPartitions") == "2")
    assert(opts("driver") == derbyDriver)
    assert(!Jdbc.sinkOptions(sinkCfg("t").copy(numPartitions = None))
      .contains("numPartitions"), "no connection cap unless configured")
  }

  test("append write round-trips value-for-value and accumulates") {
    // typed string column: the dialect default (Derby CLOB) can't take
    // a pushed equality predicate — the createTableColumnTypes knob is
    // exactly the warehouse-side DDL control this exercises
    Jdbc.write(frame(0, 100), sinkCfg("loaded_a")
      .copy(createTableColumnTypes = Some("name VARCHAR(32)")))
    val back = Jdbc.read(spark, srcCfg("loaded_a"))
    assert(back.count() == 100)
    // value parity, not just counts: sum of a derived column
    assert(back.agg(sum(col("k"))).first().getLong(0) == 4950L)
    assert(back.filter(col("name") === "row-7").count() == 1)
    // second append accumulates — the incremental-load shape
    Jdbc.write(frame(100, 150), sinkCfg("loaded_a"))
    assert(Jdbc.read(spark, srcCfg("loaded_a")).count() == 150)
  }

  test("overwrite replaces the prior load — the full-refresh shape") {
    Jdbc.write(frame(0, 100), sinkCfg("loaded_o"))
    Jdbc.write(frame(0, 10), sinkCfg("loaded_o", mode = "overwrite"))
    val back = Jdbc.read(spark, srcCfg("loaded_o"))
    assert(back.count() == 10)
    assert(back.agg(sum(col("k"))).first().getLong(0) == 45L)
  }

  test("truncate-overwrite reuses the provisioned table instead of DROP+CREATE") {
    // provision the table warehouse-side with its own column widths —
    // the grants/sort-keys stand-in a DROP would destroy
    val conn = DriverManager.getConnection(dbUrl)
    try {
      conn.createStatement().executeUpdate(
        "CREATE TABLE loaded_t (k BIGINT, name VARCHAR(32), score DOUBLE)")
    } finally conn.close()
    Jdbc.write(frame(0, 20), sinkCfg("loaded_t"))
    Jdbc.write(frame(50, 60), sinkCfg("loaded_t", mode = "overwrite", truncate = true))
    val back = Jdbc.read(spark, srcCfg("loaded_t"))
    assert(back.count() == 10)
    assert(back.agg(min(col("k"))).first().getLong(0) == 50L)
    // the provisioned VARCHAR(32) survived: a DROP+CREATE would have
    // re-rendered name as Derby's default CLOB/VARCHAR(255)
    val width = {
      val c = DriverManager.getConnection(dbUrl)
      try {
        val rs = c.getMetaData.getColumns(null, null, "LOADED_T", "NAME")
        assert(rs.next()); rs.getInt("COLUMN_SIZE")
      } finally c.close()
    }
    assert(width == 32, s"table was re-created, VARCHAR width now $width")
  }
}
