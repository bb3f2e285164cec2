package graft

/** Plan audit — prints formatted physical plans for the load-bearing
  * queries so scan pruning / pushdown / broadcast / codegen can be
  * inspected. Run with `sbt "Test/runMain graft.PlanAudit"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("plan-audit", cores = 4)
    val dir = "/root/testdata/sf0.01"
    val targets: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "q1_pricing_summary" -> queries.Warehouse.q1PricingSummary(spark, dir),
      "q3_shipping_priority" -> queries.Warehouse.q3ShippingPriority(spark, dir),
      "q5_local_supplier" -> queries.Warehouse.q5LocalSupplier(spark, dir),
      "q_incremental_sync" -> queries.Etl.qIncrementalSync(spark, dir),
      "q_select_columns" -> queries.Etl.qSelectColumns(spark, dir),
      "q_embedding_neardup" -> queries.LlmOps.qEmbeddingNearDup(spark, dir),
      "q_dedup_minhash" -> queries.LlmOps.qDedupMinhash(spark, dir),
      "q_range_join" -> queries.Warehouse.qRangeJoin(spark, dir),
      "q_rollup" -> queries.Warehouse.qRollup(spark, dir),
      "q_bloom_sync" -> queries.Etl.qBloomSync(spark, dir),
      "q_boilerplate" -> queries.LlmOps.qBoilerplate(spark, dir),
      "q_vocab" -> queries.LlmOps.qVocab(spark, dir))
    targets.foreach { case (name, df) =>
      println(s"\n########## $name ##########")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
