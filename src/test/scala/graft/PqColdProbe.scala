package graft

import org.apache.spark.sql.functions._

/** Scratch decomposition of the q_pq_topk_cold block (r17): times the
  * PQ fit (current parallel+sampled vs the r16 sequential full-corpus
  * shape), the encode pass, and the warm ADC scan separately on the
  * clone-amplified corpus. Run:
  * `SPARK_DRIVER_MEM=80g sbt "Test/runMain graft.PqColdProbe [dir]"`. */
object PqColdProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("pq-cold-probe")
    val dir = args.headOption.getOrElse("/tmp/graft-sf100x")
    val corpus = graft.sources.Tables.table(spark, dir, "embeddings")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    // the r16 sequential full-corpus fit, inline
    def fitSeq(): ann.Pq.PqCodebooks = {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val emb = ann.Ann.asDouble(col("embedding"))
      val m = 8; val k = 32; val dsub = 8
      val subs = corpus.select(
        (0 until m).map(j => slice(emb, j * dsub + 1, dsub).as(s"__s$j")): _*)
        .persist()
      val flat = new Array[Double](m * k * dsub)
      try {
        (0 until m).foreach { j =>
          val model = new KMeans()
            .setK(k).setSeed(42L + j).setMaxIter(10)
            .setFeaturesCol("__features")
            .fit(subs.select(array_to_vector(col(s"__s$j")).as("__features")))
          model.clusterCenters.zipWithIndex.foreach { case (v, c) =>
            val a = v.toArray
            var d = 0
            while (d < dsub) { flat((j * k + c) * dsub + d) = a(d); d += 1 }
          }
        }
      } finally subs.unpersist()
      ann.Pq.PqCodebooks(flat, m, k, dsub)
    }
    var cbNew: ann.Pq.PqCodebooks = null
    var cbOld: ann.Pq.PqCodebooks = null
    t("fit_parallel_sampled") { cbNew = ann.Pq.fit(corpus, "embedding", 8, 32) }
    t("fit_sequential_full") { cbOld = fitSeq() }
    def scanWith(cb: ann.Pq.PqCodebooks, label: String): Unit = {
      val encoded = ann.Pq.encode(corpus, "vec_id", "embedding", cb).persist()
      t(s"encode_$label") { encoded.count(): Unit }
      val queries = corpus.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"),
          ann.Ann.asDouble(col("embedding")).as("qvec"))
      for (p <- 1 to 3)
        t(s"scan_${label}_p$p") {
          graft.engine.Consume.rows(
            ann.Pq.pqTopK(queries, encoded, "vec_id", cb, topK = 10)): Unit
        }
      encoded.unpersist(): Unit
    }
    scanWith(cbNew, "newcb")
    scanWith(cbOld, "oldcb")
    spark.stop()
  }
}
