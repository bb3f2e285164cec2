package graft

/** One-off probe feeding WarmArtifactSpec's budgets: run every
  * pinned-artifact face twice and print the Spark job count of the WARM
  * invocation. Run: `sbt "Test/runMain graft.WarmJobsProbe"`. */
object WarmJobsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("warm-probe", cores = 4)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val faces =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq(
        // pinned-artifact faces (the original sweep)
        "q_dsir_weights", "q_dsir_resample", "q_compression_ratio",
        "q_bloom_fpr", "q_dedup_simhash", "q_dedup_simhash_apply",
        "q_dedup_minhash_fast", "q_sketch_calibration", "q_minhash_tuning",
        "q_pca", "q_pca_project", "q_join_estimate", "q_join_estimate_skew",
        // r16: the top-20 most expensive registered faces by the r15
        // driver bench — cost regressions can hide anywhere, not just
        // behind pinned artifacts (r15 verdict item 4)
        "q_embedding_neardup_lsh", "q_epoch_independence", "q_pagerank",
        "q_bootstrap_ci", "q_triangle_count", "q_ngram_coverage",
        "q_index_recall", "q_volume_shipping", "q_rank_fusion_indexed",
        "q_market_basket", "q_video_neardup", "q_market_share",
        "q_dedup_minhash_apply", "q_fd_profile", "q_video_frames",
        "q_dedup_apply_lsh", "q_parse_messages", "q_supplier_diversity",
        "q_peak_concurrency", "q_image_dedup_apply")
    faces.foreach { name =>
      SparkEntry.queries(name)(spark, dir).collect()
      graft.engine.Materialized.release(spark)
      val counter = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          counter.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      SparkEntry.queries(name)(spark, dir).collect()
      var last = -1
      var spins = 0
      while (counter.get != last && spins < 50) {
        last = counter.get; Thread.sleep(100); spins += 1
      }
      spark.sparkContext.removeSparkListener(l)
      graft.engine.Materialized.release(spark)
      println(f"$name%-24s warm_jobs=${counter.get}")
    }
    spark.stop()
  }
}
