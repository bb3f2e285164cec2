package graft

/** r15 sweep gate (r14 verdict item 8): the H31 bug class — eager fit
  * work OUTSIDE a pinnedFrame thunk — is invisible to both correctness
  * (the oracle stays green) and plan audits (each plan is individually
  * fine); the cost is simply paid again on every warm call. This sweep
  * pins a per-face WARM JOB BUDGET: with the artifact memoized, a
  * second invocation may launch at most the declared number of Spark
  * jobs. A regression that re-runs fit scans per call (the r14
  * q_dsir_weights defect added exactly +2 corpus jobs) blows the budget
  * and fails here, the way the partitionless-window sweep gates window
  * abuse. Budgets are the WarmJobsProbe measurements at sf0.001 on the
  * shared 4-core session — exact, no slack: job counts at fixed data,
  * fixed config and a memoized artifact are deterministic, and slack
  * wide enough to absorb variance would also absorb the bug class. */
class WarmArtifactSpec extends SparkSpec {

  private def jobs(f: => Unit): Int = {
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      // drain the async listener bus DETERMINISTICALLY (r15 advice: a
      // lagging bus undercounted jobs and let a budget regression pass;
      // count-stability polling also false-failed on a slow bus).
      // LiveListenerBus.waitUntilEmpty is private[spark] (public in
      // bytecode); fall back to count-stability polling if the
      // reflective call ever stops resolving on a Spark upgrade.
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch {
        case _: ReflectiveOperationException =>
          var last = -1
          var spins = 0
          while (counter.get != last && spins < 50) {
            last = counter.get; Thread.sleep(100); spins += 1
          }
      }
      counter.get
    } finally spark.sparkContext.removeSparkListener(l)
  }

  // every face whose registered query consumes a pinnedFrame artifact
  // (or a loader-backed model artifact), with its measured warm budget
  // (re-measured r16 under the deterministic listener drain — the
  // polled counts read one high on two faces)
  private val budgets: Seq[(String, Int)] = Seq(
    "q_dsir_weights" -> 6, // broadcast λ + one gram aggregate (NOT 8: the
    //                        two pre-fix eager fit counts would land here)
    "q_dsir_resample" -> 5,
    "q_compression_ratio" -> 3,
    "q_bloom_fpr" -> 6,
    "q_dedup_simhash" -> 13, // 12 in the 4-core probe session; +1 here
    "q_dedup_simhash_apply" -> 20, // per-call checkpoint + cc probe/pass;
    //                        17 measured on the r15 corpus, 18 on r16's
    //                        (CC round count is data-dependent — see
    //                        q_image_dedup_apply) + one round of headroom
    "q_dedup_minhash_fast" -> 16,
    "q_sketch_calibration" -> 10,
    "q_minhash_tuning" -> 3,
    "q_pca" -> 0, // spectrum reads the in-session model rows only
    "q_pca_project" -> 4,
    "q_join_estimate" -> 2,
    "q_join_estimate_skew" -> 2,
    // r16 (r15 verdict item 4): the top-20 most expensive registered
    // faces by the r15 driver bench — the bench-tail episode showed
    // cost regressions hide anywhere, and a JOB budget is ambient-
    // immune where a seconds budget is not. WarmJobsProbe measurements
    // at sf0.001 on the shared 4-core session; any plan that grows an
    // extra action goes red here before it shows in a bench median.
    "q_embedding_neardup_lsh" -> 11, // r16 payload-free candidate legs
    "q_epoch_independence" -> 7, // r16 fused one-aggregate shape
    "q_pagerank" -> 60, // bounded: 20 iterations x 3 (checkpoint+rank)
    "q_bootstrap_ci" -> 8,
    "q_triangle_count" -> 17,
    "q_ngram_coverage" -> 8,
    "q_index_recall" -> 80, // runs all eight index legs by construction
    //                        (56/57 pre-r16); the r16 rep collapse adds
    //                        eager checkpoint jobs (groups + members per
    //                        collapsed kernel, plus the int8 code
    //                        materialization) across the exact and int8
    //                        legs — measured 78 post-collapse; deliberate
    //                        plumbing, not an eager-fit leak
    "q_volume_shipping" -> 15,
    "q_rank_fusion_indexed" -> 16,
    "q_market_basket" -> 13,
    "q_video_neardup" -> 6,
    "q_market_share" -> 17,
    "q_dedup_minhash_apply" -> 20,
    "q_fd_profile" -> 25, // |candidate FDs| bounded probe batches
    "q_video_frames" -> 4,
    "q_dedup_apply_lsh" -> 19,
    "q_parse_messages" -> 4,
    "q_supplier_diversity" -> 13,
    "q_peak_concurrency" -> 9,
    // 18 measured on the r15 corpus; connected-components job count is
    // DATA-dependent (min-label propagation runs to convergence, one
    // probe+pass pair per round, and the driver regenerates testdata
    // each round — the r16 corpus converged one probe later, 19). The
    // budget allows one extra CC round over the measurement so a fresh
    // corpus can't redden a plan that didn't change; an eager-fit leak
    // adds jobs OUTSIDE the iteration and still trips it.
    "q_image_dedup_apply" -> 21,
    // r17 (r16 verdict item 1): the H10 consumers read the pinned
    // scored frame — a regression that re-runs the feature+sigmoid
    // corpus pass shows up as extra jobs here long before a bench
    // median moves. Measured 4/3 warm (WarmJobsProbe, sf0.001) + 1
    // session headroom.
    "q_calibration" -> 5,
    "q_quality_classifier" -> 4,
    // r17: the rep-collapsed E-faces with their memoized membership
    // indexes — fixed plan shapes (no data-dependent iteration), so a
    // grown count means the gm memo or an expansion stage regressed.
    // Measured warm counts + 1 headroom.
    "q_ann_topk" -> 11,
    "q_ann_int8" -> 10,
    "q_ann_pca" -> 17,
    "q_ann_cascade" -> 12,
    "q_pq_topk" -> 12,
    "q_hard_negatives" -> 10,
    "q_knn_classify" -> 13)

  test("warm-cost sweep: every pinned-artifact face stays inside its declared job budget") {
    // collect EVERY violation before failing — a budget sweep that stops
    // at the first face hides whether a regression is one plan or a
    // session-wide drift (and re-measuring 20 faces one red at a time
    // is how budget numbers rot)
    val violations = budgets.flatMap { case (name, budget) =>
      // first call memoizes/pins the artifact (cold or already warm —
      // either way the SECOND call below measures the steady state)
      SparkEntry.queries(name)(spark, sfDir).collect()
      graft.engine.Materialized.release(spark)
      val warm = jobs { SparkEntry.queries(name)(spark, sfDir).collect(); () }
      graft.engine.Materialized.release(spark)
      if (warm <= budget) None else Some(s"$name: $warm jobs, budget $budget")
    }
    assert(violations.isEmpty,
      s"warm job budgets exceeded — fit work is leaking outside the " +
        "pinnedFrame thunk (the r14 q_dsir_weights defect class) or a " +
        "plan grew an extra action; move every fit action inside the " +
        "by-name build block, or re-declare the budget with the " +
        s"plan-shape justification:\n  ${violations.mkString("\n  ")}")
  }
}
