package graft

import org.apache.spark.sql.functions._

/** Timing probe for connected components on the real pair outputs. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("cc-probe", cores = 32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    var t0 = System.nanoTime()
    val pairs = graft.queries.LlmOps.qDedupSimhash(spark, dir)
      .select(col("id_a"), col("id_b")).persist()
    println(s"pairs: ${pairs.count()} in ${(System.nanoTime()-t0)/1e9}s")
    t0 = System.nanoTime()
    val cc = graft.dedup.Dedup.connectedComponents(pairs)
    println(s"cc rows: ${cc.count()} in ${(System.nanoTime()-t0)/1e9}s")
    val nClusters = cc.select("cluster_id").distinct().count()
    println(s"clusters: $nClusters")
    pairs.unpersist()
    spark.stop()
  }
}
