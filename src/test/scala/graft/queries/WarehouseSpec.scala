package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {

  test("q1 pricing summary: 3x2 status groups, totals add up") {
    val df = Warehouse.q1PricingSummary(spark, sfDir)
    val rows = df.collect()
    assert(rows.length >= 4 && rows.length <= 9)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01")).count()
    assert(total == expected)
  }

  test("q3 returns top-10 by revenue, descending") {
    val rows = Warehouse.q3ShippingPriority(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q5 groups by nation within ASIA") {
    val rows = Warehouse.q5LocalSupplier(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("n_name")).distinct.length == rows.length)
  }

  test("window topN keeps at most 3 rows per user, ranked by value") {
    val df = Warehouse.qWindowTopN(spark, sfDir)
    val perUser = df.groupBy("user_id").count().collect()
    assert(perUser.forall(_.getAs[Long]("count") <= 3))
    val ranks = df.filter(col("user_id") === df.select("user_id").first().getLong(0))
      .orderBy("rn").collect()
    val vals = ranks.map(_.getAs[Double]("value"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("sessionize: session ids start at 1 and events fall inside sessions") {
    val rows = Warehouse.qSessionize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("session_id")).min == 1L)
    assert(rows.forall { r =>
      !r.getAs[java.sql.Timestamp]("session_start").after(r.getAs[java.sql.Timestamp]("session_end"))
    })
  }

  test("stream window agg: counts per bucket sum to table size") {
    val df = Warehouse.qStreamWindowAgg(spark, sfDir)
    val total = df.agg(sum("n")).first().getLong(0)
    assert(total == graft.sources.Tables.table(spark, sfDir, "events").count())
  }
}
