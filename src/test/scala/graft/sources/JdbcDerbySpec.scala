package graft.sources

import graft.SparkSpec
import java.sql.DriverManager
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LIVE JDBC round-trip over an in-JVM Derby database (the Derby jars
  * ship with the Spark distribution) — proves A10's partitioned source
  * against a real connection, not just option assembly: range-partitioned
  * parallel read, predicate pushdown into the warehouse, and the JDBC
  * type map feeding A1's discovery schema rendering.
  *
  * Derby stands in for Redshift (reference connect.py): same Spark JDBC
  * data source, different dialect/driver string — exactly the two knobs
  * JdbcSourceConfig externalizes. */
class JdbcDerbySpec extends SparkSpec {

  private val dbUrl = "jdbc:derby:memory:graftdb;create=true"
  private val derbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(dbUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE orders_src (
          |  o_id INT NOT NULL PRIMARY KEY,
          |  o_key BIGINT,
          |  o_name VARCHAR(64),
          |  o_price DECIMAL(12,2),
          |  o_ratio DOUBLE,
          |  o_date DATE,
          |  o_ts TIMESTAMP)""".stripMargin)
      val ps = conn.prepareStatement(
        "INSERT INTO orders_src VALUES (?, ?, ?, ?, ?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i)
        ps.setLong(2, i.toLong * 1000L)
        ps.setString(3, s"order-$i")
        ps.setBigDecimal(4, new java.math.BigDecimal(s"$i.25"))
        ps.setDouble(5, i / 100.0)
        ps.setDate(6, java.sql.Date.valueOf(s"1995-01-${i % 28 + 1}"))
        ps.setTimestamp(7, java.sql.Timestamp.valueOf(s"1995-06-01 12:00:${i % 60}"))
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  private def cfg = Jdbc.JdbcSourceConfig(
    url = dbUrl, table = "orders_src", user = "", password = "",
    partitionColumn = Some("o_id"),
    lowerBound = Some("1"), upperBound = Some("101"),
    numPartitions = 4, driver = derbyDriver)

  test("partitioned read executes 4 range slices against a live database") {
    seeded
    val df = Jdbc.read(spark, cfg)
    assert(df.rdd.getNumPartitions == 4,
      "the read must split into numPartitions range-predicated slices")
    assert(df.count() == 100)
    // every row arrived exactly once across the partition ranges
    assert(df.agg(sum(col("o_id"))).first().getLong(0) == 5050L)
  }

  test("filters push down into the warehouse query") {
    seeded
    val df = Jdbc.read(spark, cfg).filter(col("o_id") > 90)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("O_ID"),
      s"the o_id predicate must reach the JDBC scan, got:\n$plan")
    assert(df.count() == 10)
  }

  test("JDBC type map feeds discovery's JSON-schema rendering") {
    seeded
    val schema = Jdbc.read(spark, cfg).schema
    val byName = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    assert(byName("o_id") == IntegerType)
    assert(byName("o_key") == LongType)
    assert(byName("o_name") == StringType)
    assert(byName("o_price") == DecimalType(12, 2))
    assert(byName("o_ratio") == DoubleType)
    assert(byName("o_date") == DateType)
    assert(byName("o_ts") == TimestampType)
    // A1's discovery renders this schema the same way it renders a
    // parquet table's — the source of the schema is transparent to it
    val cols = Discovery.columnsOf(schema, "orders_src")
    val byCol = cols.map(c => c.column_name.toLowerCase -> c).toMap
    assert(byCol("o_id").json_type == "integer")
    assert(byCol("o_name").json_type == "string")
    assert(byCol("o_ratio").json_type == "number")
    assert(byCol("o_date").format == "date" && byCol("o_ts").format == "date-time",
      "date/timestamp columns must carry a format annotation for the catalog")
  }

  test("an incremental replication-key predicate runs inside the warehouse") {
    seeded
    // the bookmark filter of an incremental sync, pushed as SQL — the
    // warehouse scans its own index instead of shipping all rows to Spark
    val df = Jdbc.read(spark, cfg)
      .filter(col("o_ts") > lit(java.sql.Timestamp.valueOf("1995-06-01 12:00:49")))
      .select(col("o_id"), col("o_ts"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("O_TS"),
      s"replication-key filter must push down, got:\n$plan")
    assert(df.count() == 10) // o_ts second = i % 60 > 49 → i in 50..59
  }
}
