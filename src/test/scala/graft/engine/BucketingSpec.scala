package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("co-bucketed join plans without any Exchange") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val orders = graft.sources.Tables.table(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val customer = graft.sources.Tables.table(spark, sfDir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_name", $"c_acctbal")
    // at test scale the dim side broadcasts (which bypasses bucketing
    // entirely); disable auto-broadcast to observe the co-located shape a
    // large-large join would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 8, s"$base/orders_b")
      Bucketing.writeBucketed(customer, "customer_b", "o_custkey", 8, s"$base/customer_b")
      val joined = Bucketing.cobucketedJoin(spark, "orders_b", "customer_b", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      // and it computes the same result as the plain join
      val expected = orders.join(customer, "o_custkey").count()
      assert(joined.count() == expected)
      assert(expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
