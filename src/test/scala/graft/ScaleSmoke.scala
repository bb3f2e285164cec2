package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke — builds a ~10x copy of sf0.1 (shifted-key unions) under
  * /tmp and times the load-bearing operators on it, to observe scaling
  * behavior beyond the provided SFs. Run:
  * `sbt "Test/runMain graft.ScaleSmoke"`.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("scale-smoke")
    val src = "/root/testdata/sf0.1"
    val dir = "/tmp/graft-sf1x"
    val mult = 10

    def amplify(table: String, keyCols: Seq[String], shift: Long): Unit = {
      val base = graft.sources.Tables.table(spark, src, table)
      val copies = (0 until mult).map { i =>
        keyCols.foldLeft(base) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * shift))
        }
      }
      copies.reduce(_.unionAll(_)).write.mode("overwrite")
        .parquet(s"$dir/$table.parquet")
    }

    if (!new java.io.File(s"$dir/lineitem.parquet").exists()) {
      println("amplifying tables (10x sf0.1)...")
      amplify("lineitem", Seq("l_orderkey"), 10000000L)
      amplify("orders", Seq("o_orderkey"), 10000000L)
      amplify("customer", Seq.empty, 0L) // same customers, 10x orders per
      amplify("events", Seq("event_id"), 100000000L)
      amplify("documents", Seq("doc_id"), 1000000L)
      amplify("embeddings", Seq("vec_id"), 1000000L)
      Seq("region", "nation", "supplier", "part").foreach(amplify(_, Seq.empty, 0L))
    }

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    println(s"lineitem rows: ${spark.read.parquet(s"$dir/lineitem.parquet").count()}")
    time("q1_pricing_summary") { queries.Warehouse.q1PricingSummary(spark, dir) }
    time("q3_shipping_priority") { queries.Warehouse.q3ShippingPriority(spark, dir) }
    time("q5_local_supplier") { queries.Warehouse.q5LocalSupplier(spark, dir) }
    time("q_incremental_sync") { queries.Etl.qIncrementalSync(spark, dir) }
    time("q_sessionize") { queries.Warehouse.qSessionize(spark, dir) }
    time("q_dedup_exact") { queries.LlmOps.qDedupExact(spark, dir) }
    time("q_dedup_minhash") { queries.LlmOps.qDedupMinhash(spark, dir) }
    time("q_embedding_neardup") { queries.LlmOps.qEmbeddingNearDup(spark, dir) }
    time("q_ann_topk") { queries.LlmOps.qAnnTopK(spark, dir) }
    time("q_token_count") { queries.LlmOps.qTokenCount(spark, dir) }
    spark.stop()
  }
}
