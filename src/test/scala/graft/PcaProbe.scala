package graft

import org.apache.spark.sql.functions._

/** One-off timing probe for the E23 PCA cascade at an amplified corpus:
  * separates index build, the stage-1 coarse scan (by heap size), and
  * the full cascade, so regressions attribute to the right stage.
  * Usage: Test/runMain graft.PcaProbe <mult> (corpus from ScaleSmoke's
  * /tmp/graft-sf<mult>x amplification). */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.getOrElse("100")
    val dir = s"/tmp/graft-sf${mult}x"
    val spark = graft.engine.GraftSession.getOrCreate("pca-probe", cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val (m, projected) = time("index build") {
      val idx = queries.LlmOps.pcaIndex(spark, dir)
      idx._2.count()
      idx
    }
    val q = graft.sources.Tables.table(spark, dir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"),
        graft.ann.Ann.asDouble(col("embedding")).as("qvec"))
      .withColumn("__n", sqrt(aggregate(col("qvec"), lit(0.0), (a, x) => a + x * x)))
      .filter(col("__n") > 0.0)
      .select(col("query_id"),
        graft.ann.Pca.projectExpr(
          transform(col("qvec"), x => x / col("__n")), m, 16).as("qpvec"))
    val scored = projected
      .join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (graft.functions.dotProductDouble(col("pvec"), col("qpvec")) * 2.0
          - col("pnorm2")).as("sim"))
    time("stage1 pairs count")(println("  pairs: " + scored.count()))
    for (kc <- Seq(10, 100, 200)) {
      time(s"stage1 heap kCand=$kc") {
        scored.groupBy(col("query_id"))
          .agg(graft.functions.topKByScore(col("sim"), col("neighbor_id"), kc).as("top"))
          .select(count(lit(1))).head
      }
    }
    val cand = scored.groupBy(col("query_id"))
      .agg(graft.functions.topKByScore(col("sim"), col("neighbor_id"), 200).as("top"))
      .select(col("query_id"), explode(col("top")).as("nbr"))
      .select(col("query_id"), col("nbr.neighbor_id").as("neighbor_id"))
    time("cand explode count")(println("  cands: " + cand.count()))
    val rescored = cand
      .join(graft.sources.Tables.table(spark, dir, "embeddings")
        .select(col("vec_id").as("neighbor_id"),
          graft.ann.Ann.asDouble(col("embedding")).as("nvec")), "neighbor_id")
      .join(broadcast(graft.sources.Tables.table(spark, dir, "embeddings")
        .filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"),
          graft.ann.Ann.asDouble(col("embedding")).as("qvec"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.cosineSim(col("qvec"), col("nvec")).as("sim"))
    time("rescore count")(println("  rescored: " + rescored.count()))
    time("rescore heap")(rescored.groupBy(col("query_id"))
      .agg(graft.functions.topKByScore(col("sim"), col("neighbor_id"), 10).as("t"))
      .select(count(lit(1))).head)
    time("full cascade")(queries.LlmOps.qAnnPca(spark, dir).count())
    spark.stop()
  }
}
