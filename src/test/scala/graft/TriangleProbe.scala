package graft

import org.apache.spark.sql.functions._

/** Paired same-JVM measurement for C43's edge-reuse strategy (the
  * market-basket lesson says hand-materializing can LOSE to Catalyst's
  * ReusedExchange — measure, don't guess). Run:
  * `sbt "Test/runMain graft.TriangleProbe [dir]"`. */
object TriangleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("triangle-probe")
    val dir = args.headOption.getOrElse("/tmp/graft-sf100x")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    import spark.implicits._
    val d = graft.sources.Tables.table(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
    val edgesPlan = d.as("a")
      .join(d.as("b"),
        $"a.l_orderkey" === $"b.l_orderkey" && $"a.l_partkey" < $"b.l_partkey")
      .groupBy($"a.l_partkey".as("a"), $"b.l_partkey".as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= 2)
      .select($"a", $"b")
    t("edges_alone")(println("  edges=" + edgesPlan.count()))
    t("census_plain")(
      println("  " + queries.Warehouse.triangleCount(edgesPlan).collect().head))
    val cached = edgesPlan.persist()
    t("census_persist")(
      println("  " + queries.Warehouse.triangleCount(cached).collect().head))
    t("census_persist_warm")(
      println("  " + queries.Warehouse.triangleCount(cached).collect().head))
    cached.unpersist()
    val ckpt = graft.engine.Materialized.checkpoint(edgesPlan)
    t("census_checkpoint")(
      println("  " + queries.Warehouse.triangleCount(ckpt).collect().head))
    graft.engine.Materialized.release(spark)
    spark.stop()
  }
}
