package graft

import org.apache.spark.sql.functions._

/** Head-to-head of the q_integrity formulations on an amplified dir:
  * `sbt "Test/runMain graft.IntegrityProbe /tmp/graft-sf50x"`.
  * single-scan (registered): one lineitem pass, broadcast dims + one
  * orders left join, conditional aggregate. triple-scan (round-5 shape):
  * one left-anti join per FK relation. */
object IntegrityProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("integrity-probe")
    val dir = args.headOption.getOrElse("/tmp/graft-sf50x")
    def t(n: String) = graft.sources.Tables.table(spark, dir, n)

    def time(name: String)(thunk: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = thunk
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  n=$n")
    }

    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      time("single-scan (new)") {
        graft.queries.Etl.qIntegrity(spark, dir).count()
      }
      time("single-scan li-only") {
        t("lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
          .join(broadcast(t("part").select(col("p_partkey")).distinct()
            .withColumn("__in_part", lit(true))),
            col("l_partkey") === col("p_partkey"), "left")
          .join(broadcast(t("supplier").select(col("s_suppkey")).distinct()
            .withColumn("__in_supp", lit(true))),
            col("l_suppkey") === col("s_suppkey"), "left")
          .join(t("orders").select(col("o_orderkey")).distinct()
            .withColumn("__in_ord", lit(true)),
            col("l_orderkey") === col("o_orderkey"), "left")
          .agg(
            sum(when(col("__in_ord").isNull, 1L).otherwise(0L)),
            sum(when(col("__in_part").isNull, 1L).otherwise(0L)),
            sum(when(col("__in_supp").isNull, 1L).otherwise(0L)))
          .count()
      }
      time("cust->nation anti") {
        t("customer").select(col("c_nationkey").as("k"))
          .join(broadcast(t("nation").select(col("n_nationkey").as("k")).distinct()),
            Seq("k"), "left_anti").agg(count(lit(1))).count()
      }
      time("ord->cust anti") {
        t("orders").select(col("o_custkey").as("k"))
          .join(broadcast(t("customer").select(col("c_custkey").as("k")).distinct()),
            Seq("k"), "left_anti").agg(count(lit(1))).count()
      }
      time("anti-join-per-rel") {
        val checks = Seq(
          ("lineitem.l_orderkey->orders",
            t("lineitem").select(col("l_orderkey").as("k")),
            t("orders").select(col("o_orderkey").as("k"))),
          ("lineitem.l_partkey->part",
            t("lineitem").select(col("l_partkey").as("k")),
            t("part").select(col("p_partkey").as("k"))),
          ("lineitem.l_suppkey->supplier",
            t("lineitem").select(col("l_suppkey").as("k")),
            t("supplier").select(col("s_suppkey").as("k"))))
        checks.map { case (name, fact, dim) =>
          fact.join(dim.distinct(), Seq("k"), "left_anti")
            .agg(count(lit(1)).as("n_orphans"))
            .select(lit(name).as("relation"), col("n_orphans"))
        }.reduce(_ unionAll _).count()
      }
    }
    spark.stop()
  }
}
