package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Etl, LlmOps, Mix, Retrieval, Temporal, Warehouse}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Warehouse.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, dir) => Warehouse.q1PricingSummary(s, dir)),
    "q3_shipping_priority" -> ((s, dir) => Warehouse.q3ShippingPriority(s, dir)),
    "q5_local_supplier" -> ((s, dir) => Warehouse.q5LocalSupplier(s, dir)),
    "q_window_topn" -> ((s, dir) => Warehouse.qWindowTopN(s, dir)),
    "q_anti_join" -> ((s, dir) => Warehouse.qAntiJoin(s, dir)),
    "q_asof_join" -> ((s, dir) => Warehouse.qAsofJoin(s, dir)),
    "q_asof_forward" -> ((s, dir) => Warehouse.qAsofForward(s, dir)),
    "q_range_join" -> ((s, dir) => Warehouse.qRangeJoin(s, dir)),
    "q_funnel" -> ((s, dir) => Warehouse.qFunnel(s, dir)),
    "q_event_debounce" -> ((s, dir) => Warehouse.qEventDebounce(s, dir)),
    "q_rollup" -> ((s, dir) => Warehouse.qRollup(s, dir)),
    "q_percentile" -> ((s, dir) => Warehouse.qPercentile(s, dir)),
    "q_skew_agg" -> ((s, dir) => Warehouse.qSkewAgg(s, dir)),
    "q_quantize" -> ((s, dir) => LlmOps.qQuantize(s, dir)),
    "q_repetition" -> ((s, dir) => LlmOps.qRepetition(s, dir)),
    "q_distinct_sketch" -> ((s, dir) => LlmOps.qDistinctSketch(s, dir)),
    "q_sketch_jaccard" -> ((s, dir) => LlmOps.qSketchJaccard(s, dir)),
    "q_top_terms" -> ((s, dir) => LlmOps.qTopTerms(s, dir)),
    "q_sessionize" -> ((s, dir) => Warehouse.qSessionize(s, dir)),
    "q_stream_window_agg" -> ((s, dir) => Warehouse.qStreamWindowAgg(s, dir)),
    "q_discover_catalog" -> ((s, dir) => Etl.qDiscoverCatalog(s, dir)),
    "q_select_columns" -> ((s, dir) => Etl.qSelectColumns(s, dir)),
    "q_full_table_sync" -> ((s, dir) => Etl.qFullTableSync(s, dir)),
    "q_incremental_sync" -> ((s, dir) => Etl.qIncrementalSync(s, dir)),
    "q_uuid_filter" -> ((s, dir) => Etl.qUuidFilter(s, dir)),
    "q_volume_counts" -> ((s, dir) => Etl.qVolumeCounts(s, dir)),
    "q_bookmark_state" -> ((s, dir) => Etl.qBookmarkState(s, dir)),
    "q_row_to_record" -> ((s, dir) => Etl.qRowToRecord(s, dir)),
    "q_parse_messages" -> ((s, dir) => Etl.qParseMessages(s, dir)),
    "q_flatten" -> ((s, dir) => Etl.qFlatten(s, dir)),
    "q_field_mapping" -> ((s, dir) => Etl.qFieldMapping(s, dir)),
    "q_payload_shape" -> ((s, dir) => Etl.qPayloadShape(s, dir)),
    "q_batch_assign" -> ((s, dir) => Etl.qBatchAssign(s, dir)),
    "q_schema_validate" -> ((s, dir) => Etl.qSchemaValidate(s, dir)),
    "q_bloom_sync" -> ((s, dir) => Etl.qBloomSync(s, dir)),
    "q_bloom_fpr" -> ((s, dir) => Etl.qBloomFpr(s, dir)),
    "q_dedup_exact" -> ((s, dir) => LlmOps.qDedupExact(s, dir)),
    "q_span_dedup" -> ((s, dir) => LlmOps.qSpanDedup(s, dir)),
    "q_join_estimate" -> ((s, dir) => Warehouse.qJoinEstimate(s, dir)),
    "q_join_estimate_skew" -> ((s, dir) => Warehouse.qJoinEstimateSkew(s, dir)),
    "q_span_dedup_apply" -> ((s, dir) => LlmOps.qSpanDedupApply(s, dir)),
    "q_dedup_incremental" -> ((s, dir) => LlmOps.qDedupIncremental(s, dir)),
    "q_dedup_minhash" -> ((s, dir) => LlmOps.qDedupMinhash(s, dir)),
    "q_dedup_minhash_fast" -> ((s, dir) => LlmOps.qDedupMinhashFast(s, dir)),
    "q_dedup_simhash" -> ((s, dir) => LlmOps.qDedupSimhash(s, dir)),
    "q_ngram_jaccard" -> ((s, dir) => LlmOps.qNgramJaccard(s, dir)),
    "q_dedup_clusters" -> ((s, dir) => LlmOps.qDedupClusters(s, dir)),
    "q_dedup_apply" -> ((s, dir) => LlmOps.qDedupApply(s, dir)),
    "q_decontaminate" -> ((s, dir) => LlmOps.qDecontaminate(s, dir)),
    "q_contamination_report" -> ((s, dir) => LlmOps.qContaminationReport(s, dir)),
    "q_split_assign" -> ((s, dir) => LlmOps.qSplitAssign(s, dir)),
    "q_sample_per_group" -> ((s, dir) => LlmOps.qSamplePerGroup(s, dir)),
    "q_embedding_neardup" -> ((s, dir) => LlmOps.qEmbeddingNearDup(s, dir)),
    "q_embedding_neardup_lsh" -> ((s, dir) => LlmOps.qEmbeddingNearDupLsh(s, dir)),
    "q_semdedup" -> ((s, dir) => LlmOps.qSemDedup(s, dir)),
    "q_quality_classifier" -> ((s, dir) => LlmOps.qQualityClassifier(s, dir)),
    "q_calibration" -> ((s, dir) => LlmOps.qCalibration(s, dir)),
    "q_corpus_report" -> ((s, dir) => LlmOps.qCorpusReport(s, dir)),
    "q_corpus_report_incremental" -> ((s, dir) => LlmOps.qCorpusReportIncremental(s, dir)),
    "q_hard_negatives" -> ((s, dir) => LlmOps.qHardNegatives(s, dir)),
    "q_hard_negatives_lsh" -> ((s, dir) => LlmOps.qHardNegativesLsh(s, dir)),
    "q_corpus_diff" -> ((s, dir) => LlmOps.qCorpusDiff(s, dir)),
    "q_infer_batches" -> ((s, dir) => LlmOps.qInferBatches(s, dir)),
    "q_bpe_train" -> ((s, dir) => LlmOps.qBpeTrain(s, dir)),
    "q_bpe_encode" -> ((s, dir) => LlmOps.qBpeEncode(s, dir)),
    "q_bpe_fertility" -> ((s, dir) => LlmOps.qBpeFertility(s, dir)),
    "q_ann_topk" -> ((s, dir) => LlmOps.qAnnTopK(s, dir)),
    "q_ann_lsh" -> ((s, dir) => LlmOps.qAnnLsh(s, dir)),
    "q_ann_ivf" -> ((s, dir) => LlmOps.qAnnIvf(s, dir)),
    "q_pq_topk" -> ((s, dir) => LlmOps.qPqTopK(s, dir)),
    "q_pq_cascade" -> ((s, dir) => LlmOps.qPqCascade(s, dir)),
    "q_pq_ivf" -> ((s, dir) => LlmOps.qPqIvf(s, dir)),
    "q_doc_chunk" -> ((s, dir) => LlmOps.qDocChunk(s, dir)),
    "q_pack_sequences" -> ((s, dir) => LlmOps.qPackSequences(s, dir)),
    "q_quality_gate" -> ((s, dir) => LlmOps.qQualityGate(s, dir)),
    "q_gate_sweep" -> ((s, dir) => LlmOps.qGateSweep(s, dir)),
    "q_vocab" -> ((s, dir) => LlmOps.qVocab(s, dir)),
    "q_boilerplate" -> ((s, dir) => LlmOps.qBoilerplate(s, dir)),
    "q_pii_redact" -> ((s, dir) => LlmOps.qPiiRedact(s, dir)),
    "q_lang_id" -> ((s, dir) => LlmOps.qLangId(s, dir)),
    "q_quality_score" -> ((s, dir) => LlmOps.qQualityScore(s, dir)),
    "q_token_count" -> ((s, dir) => LlmOps.qTokenCount(s, dir)),
    "q_fingerprint" -> ((s, dir) => LlmOps.qFingerprint(s, dir)),
    "q_multimodal_meta" -> ((s, dir) => LlmOps.qMultimodalMeta(s, dir)),
    "q_image_meta" -> ((s, dir) => LlmOps.qImageMeta(s, dir)),
    "q_audio_meta" -> ((s, dir) => LlmOps.qAudioMeta(s, dir)),
    "q_image_phash" -> ((s, dir) => LlmOps.qImagePhash(s, dir)),
    "q_image_neardup" -> ((s, dir) => LlmOps.qImageNearDup(s, dir)),
    "q_image_dedup_apply" -> ((s, dir) => LlmOps.qImageDedupApply(s, dir)),
    "q_cdc_apply" -> ((s, dir) => Temporal.qCdcApply(s, dir)),
    "q_scd2" -> ((s, dir) => Temporal.qScd2(s, dir)),
    "q_fill_gaps" -> ((s, dir) => Temporal.qFillGaps(s, dir)),
    "q_pivot" -> ((s, dir) => Warehouse.qPivot(s, dir)),
    "q_histogram" -> ((s, dir) => Warehouse.qHistogram(s, dir)),
    "q_skew_join" -> ((s, dir) => Warehouse.qSkewJoin(s, dir)),
    "q_entropy" -> ((s, dir) => LlmOps.qEntropy(s, dir)),
    "q_text_normalize" -> ((s, dir) => LlmOps.qTextNormalize(s, dir)),
    "q_bigram_counts" -> ((s, dir) => LlmOps.qBigramCounts(s, dir)),
    "q_heavy_hitters" -> ((s, dir) => LlmOps.qHeavyHitters(s, dir)),
    "q_ntile" -> ((s, dir) => Warehouse.qNtile(s, dir)),
    "q_ntile_approx" -> ((s, dir) => Warehouse.qNtileApprox(s, dir)),
    "q_winsorize_approx" -> ((s, dir) => Warehouse.qWinsorizeApprox(s, dir)),
    "q_profile" -> ((s, dir) => Etl.qProfile(s, dir)),
    "q_window_topn_agg" -> ((s, dir) => Warehouse.qWindowTopNAgg(s, dir)),
    "q_cube" -> ((s, dir) => Warehouse.qCube(s, dir)),
    "q_retention" -> ((s, dir) => Warehouse.qRetention(s, dir)),
    "q_rolling_agg" -> ((s, dir) => Warehouse.qRollingAgg(s, dir)),
    "q_sliding_window" -> ((s, dir) => Warehouse.qSlidingWindow(s, dir)),
    "q_json_extract" -> ((s, dir) => Etl.qJsonExtract(s, dir)),
    "q_fuzzy_join" -> ((s, dir) => LlmOps.qFuzzyJoin(s, dir)),
    "q_group_centroid" -> ((s, dir) => LlmOps.qGroupCentroid(s, dir)),
    "q_moments" -> ((s, dir) => Warehouse.qMoments(s, dir)),
    "q_corr" -> ((s, dir) => Warehouse.qCorr(s, dir)),
    "q_abtest" -> ((s, dir) => Warehouse.qAbtest(s, dir)),
    "q_containment" -> ((s, dir) => LlmOps.qContainment(s, dir)),
    "q_containment_blocked" -> ((s, dir) => LlmOps.qContainmentBlocked(s, dir)),
    "q_cooccur_pmi" -> ((s, dir) => LlmOps.qCooccurPmi(s, dir)),
    "q_zscore" -> ((s, dir) => Warehouse.qZscore(s, dir)),
    "q_winsorize" -> ((s, dir) => Warehouse.qWinsorize(s, dir)),
    "q_tokenize" -> ((s, dir) => LlmOps.qTokenize(s, dir)),
    "q_ngram_lm" -> ((s, dir) => LlmOps.qNgramLm(s, dir)),
    "q_ppl_buckets" -> ((s, dir) => LlmOps.qPplBuckets(s, dir)),
    "q_ppl_buckets_approx" -> ((s, dir) => LlmOps.qPplBucketsApprox(s, dir)),
    "q_video_frames" -> ((s, dir) => LlmOps.qVideoFrames(s, dir)),
    "q_video_neardup" -> ((s, dir) => LlmOps.qVideoNearDup(s, dir)),
    "q_dedup_soft" -> ((s, dir) => LlmOps.qDedupSoft(s, dir)),
    "q_bm25" -> ((s, dir) => LlmOps.qBm25(s, dir)),
    "q_integrity" -> ((s, dir) => Etl.qIntegrity(s, dir)),
    "q_dedup_cross" -> ((s, dir) => LlmOps.qDedupCross(s, dir)),
    "q_sample_weighted" -> ((s, dir) => LlmOps.qSampleWeighted(s, dir)),
    "q_token_budget_sample" -> ((s, dir) => LlmOps.qTokenBudgetSample(s, dir)),
    "q_shard_manifest" -> ((s, dir) => LlmOps.qShardManifest(s, dir)),
    "q_length_histogram" -> ((s, dir) => LlmOps.qLengthHistogram(s, dir)),
    "q_curate_e2e" -> ((s, dir) => LlmOps.qCurateE2e(s, dir)),
    "q_unpivot" -> ((s, dir) => Warehouse.qUnpivot(s, dir)),
    "q_active_users" -> ((s, dir) => Warehouse.qActiveUsers(s, dir)),
    "q_new_vs_returning" -> ((s, dir) => Warehouse.qNewVsReturning(s, dir)),
    "q_embedding_drift" -> ((s, dir) => LlmOps.qEmbeddingDrift(s, dir)),
    "q_dedup_apply_lsh" -> ((s, dir) => LlmOps.qDedupApplyLsh(s, dir)),
    "q_global_shuffle" -> ((s, dir) => Mix.qGlobalShuffle(s, dir)),
    "q_epoch_plan" -> ((s, dir) => Mix.qEpochPlan(s, dir)),
    "q_domain_mix" -> ((s, dir) => Mix.qDomainMix(s, dir)),
    "q_domain_mix_approx" -> ((s, dir) => Mix.qDomainMixApprox(s, dir)),
    "q_rank_fusion" -> ((s, dir) => Retrieval.qRankFusion(s, dir)),
    "q_rank_fusion_indexed" -> ((s, dir) => Retrieval.qRankFusionIndexed(s, dir)),
    "q_mmr_diversify" -> ((s, dir) => Retrieval.qMmrDiversify(s, dir)),
    "q_ann_recall" -> ((s, dir) => Retrieval.qAnnRecall(s, dir)),
    "q_index_recall" -> ((s, dir) => Retrieval.qIndexRecall(s, dir)),
    "q_image_patches" -> ((s, dir) => LlmOps.qImagePatches(s, dir)),
    "q_asof_nearest" -> ((s, dir) => Warehouse.qAsofNearest(s, dir)),
    "q_loss_mask" -> ((s, dir) => LlmOps.qLossMask(s, dir)),
    "q_sketch_calibration" -> ((s, dir) => LlmOps.qSketchCalibration(s, dir)),
    "q_chunk_dedup" -> ((s, dir) => LlmOps.qChunkDedup(s, dir)),
    "q_chunk_dedup_apply" -> ((s, dir) => LlmOps.qChunkDedupApply(s, dir)),
    "q_ngram_novelty" -> ((s, dir) => LlmOps.qNgramNovelty(s, dir)),
    "q_compression_ratio" -> ((s, dir) => LlmOps.qCompressionRatio(s, dir)),
    "q_doc_keywords" -> ((s, dir) => LlmOps.qDocKeywords(s, dir)),
    "q_gopher_rules" -> ((s, dir) => LlmOps.qGopherRules(s, dir)),
    "q_script_mix" -> ((s, dir) => LlmOps.qScriptMix(s, dir)),
    "q_ttr" -> ((s, dir) => LlmOps.qTtr(s, dir)),
    "q_time_weighted_avg" -> ((s, dir) => Warehouse.qTimeWeightedAvg(s, dir)),
    "q_event_transitions" -> ((s, dir) => Warehouse.qEventTransitions(s, dir)),
    "q_audio_fingerprint" -> ((s, dir) => LlmOps.qAudioFingerprint(s, dir)),
    "q_audio_neardup" -> ((s, dir) => LlmOps.qAudioNearDup(s, dir)),
    "q_knn_classify" -> ((s, dir) => LlmOps.qKnnClassify(s, dir)),
    "q_schema_drift" -> ((s, dir) => Etl.qSchemaDrift(s, dir)),
    "q_active_users_trailing" -> ((s, dir) => Warehouse.qActiveUsersTrailing(s, dir)),
    "q_active_users_trailing_approx" ->
      ((s, dir) => Warehouse.qActiveUsersTrailingApprox(s, dir)),
    "q_outlier_mad" -> ((s, dir) => Warehouse.qOutlierMad(s, dir)),
    "q_cohort_value" -> ((s, dir) => Warehouse.qCohortValue(s, dir)),
    "q_attribution" -> ((s, dir) => Warehouse.qAttribution(s, dir)),
    "q_market_basket" -> ((s, dir) => Warehouse.qMarketBasket(s, dir)),
    "q_domain_cap" -> ((s, dir) => LlmOps.qDomainCap(s, dir)),
    "q_split_leakage" -> ((s, dir) => LlmOps.qSplitLeakage(s, dir)),
    "q_funnel_time" -> ((s, dir) => Warehouse.qFunnelTime(s, dir)),
    "q_snapshot_series" -> ((s, dir) => Temporal.qSnapshotSeries(s, dir)),
    "q_ann_filtered" -> ((s, dir) => LlmOps.qAnnFiltered(s, dir)),
    "q_scd2_asof" -> ((s, dir) => Temporal.qScd2Asof(s, dir)),
    "q_event_paths" -> ((s, dir) => Warehouse.qEventPaths(s, dir)),
    "q_pagerank" -> ((s, dir) => Warehouse.qPageRank(s, dir)),
    "q_jackknife_ci" -> ((s, dir) => Warehouse.qJackknifeCi(s, dir)),
    "q_seasonal_decompose" -> ((s, dir) => Warehouse.qSeasonalDecompose(s, dir)),
    "q_changepoint" -> ((s, dir) => Warehouse.qChangepoint(s, dir)),
    "q_triangle_count" -> ((s, dir) => Warehouse.qTriangleCount(s, dir)),
    "q_peak_concurrency" -> ((s, dir) => Warehouse.qPeakConcurrency(s, dir)),
    "q_percentile_approx" -> ((s, dir) => Warehouse.qPercentileApprox(s, dir)),
    "q_rfm_segments" -> ((s, dir) => Warehouse.qRfmSegments(s, dir)),
    "q_fd_profile" -> ((s, dir) => Etl.qFdProfile(s, dir)),
    "q_anomaly_days" -> ((s, dir) => Warehouse.qAnomalyDays(s, dir)),
    "q_graph_components" -> ((s, dir) => Warehouse.qGraphComponents(s, dir)),
    "q_changepoint_by_type" -> ((s, dir) => Warehouse.qChangepointByType(s, dir)),
    "q_late_arrivals" -> ((s, dir) => Warehouse.qLateArrivals(s, dir)),
    "q_replay_diff" -> ((s, dir) => Warehouse.qReplayDiff(s, dir)),
    "q_event_gaps" -> ((s, dir) => Warehouse.qEventGaps(s, dir)),
    "q_time_to_convert" -> ((s, dir) => Warehouse.qTimeToConvert(s, dir)),
    "q_funnel_windowed" -> ((s, dir) => Warehouse.qFunnelWindowed(s, dir)),
    "q_power_analysis" -> ((s, dir) => Warehouse.qPowerAnalysis(s, dir)),
    "q_embedding_norms" -> ((s, dir) => LlmOps.qEmbeddingNorms(s, dir)),
    "q_source_overlap" -> ((s, dir) => LlmOps.qSourceOverlap(s, dir)),
    "q_dedup_rate_by_source" -> ((s, dir) => LlmOps.qDedupRateBySource(s, dir)),
    "q_shuffle_quality" -> ((s, dir) => Mix.qShuffleQuality(s, dir)),
    "q_did" -> ((s, dir) => Warehouse.qDid(s, dir)),
    "q_skyline" -> ((s, dir) => Warehouse.qSkyline(s, dir)),
    "q_skyline_grid" -> ((s, dir) => Warehouse.qSkylineGrid(s, dir)),
    "q_bootstrap_ci" -> ((s, dir) => Warehouse.qBootstrapCi(s, dir)),
    "q_margin_mining" -> ((s, dir) => LlmOps.qMarginMining(s, dir)),
    "q_kcore" -> ((s, dir) => Warehouse.qKcore(s, dir)),
    "q_attribution_position" -> ((s, dir) => Warehouse.qAttributionPosition(s, dir)),
    "q_conversion_ci" -> ((s, dir) => Warehouse.qConversionCi(s, dir)),
    "q_gini" -> ((s, dir) => Warehouse.qGini(s, dir)),
    "q_benford" -> ((s, dir) => Warehouse.qBenford(s, dir)),
    "q_lorenz_deciles" -> ((s, dir) => Warehouse.qLorenzDeciles(s, dir)),
    "q_acf" -> ((s, dir) => Warehouse.qAcf(s, dir)),
    "q_mix_uniformity" -> ((s, dir) => Mix.qMixUniformity(s, dir)),
    "q_gini_approx" -> ((s, dir) => Warehouse.qGiniApprox(s, dir)),
    "q_lorenz_deciles_approx" -> ((s, dir) => Warehouse.qLorenzDecilesApprox(s, dir)),
    "q_rfm_segments_approx" -> ((s, dir) => Warehouse.qRfmSegmentsApprox(s, dir)),
    "q_decile_migration" -> ((s, dir) => Warehouse.qDecileMigration(s, dir)),
    "q_ewma_daily" -> ((s, dir) => Warehouse.qEwmaDaily(s, dir)),
    "q_cdc_compact" -> ((s, dir) => Temporal.qCdcCompact(s, dir)),
    "q_zipf_fit" -> ((s, dir) => LlmOps.qZipfFit(s, dir)),
    "q_curriculum_order" -> ((s, dir) => Mix.qCurriculumOrder(s, dir)),
    "q_pii_report" -> ((s, dir) => Etl.qPiiReport(s, dir)),
    "q_survival" -> ((s, dir) => Warehouse.qSurvival(s, dir)),
    "q_review_sample" -> ((s, dir) => LlmOps.qReviewSample(s, dir)),
    "q_forecast_backtest" -> ((s, dir) => Warehouse.qForecastBacktest(s, dir)),
    "q_fulfillment_lag" -> ((s, dir) => Warehouse.qFulfillmentLag(s, dir)),
    "q_discount_lift" -> ((s, dir) => Warehouse.qDiscountLift(s, dir)),
    "q_template_clusters" -> ((s, dir) => LlmOps.qTemplateClusters(s, dir)),
    "q_lang_confusion" -> ((s, dir) => LlmOps.qLangConfusion(s, dir)),
    "q_minhash_tuning" -> ((s, dir) => LlmOps.qMinhashTuning(s, dir)),
    "q_stickiness" -> ((s, dir) => Warehouse.qStickiness(s, dir)),
    "q_stickiness_approx" -> ((s, dir) => Warehouse.qStickinessApprox(s, dir)),
    "q_key_skew" -> ((s, dir) => Warehouse.qKeySkew(s, dir)),
    "q_oov_rate" -> ((s, dir) => LlmOps.qOovRate(s, dir)),
    "q_psi" -> ((s, dir) => Warehouse.qPsi(s, dir)),
    "q_readability" -> ((s, dir) => LlmOps.qReadability(s, dir)),
    "q_push_plan" -> ((s, dir) => Etl.qPushPlan(s, dir)),
    "q_domain_entropy" -> ((s, dir) => LlmOps.qDomainEntropy(s, dir)),
    "q_sample_fixed" -> ((s, dir) => Mix.qSampleFixed(s, dir)),
    "q_dsir_weights" -> ((s, dir) => Mix.qDsirWeights(s, dir)),
    "q_dsir_resample" -> ((s, dir) => Mix.qDsirResample(s, dir)),
    "q_dedup_simhash_apply" -> ((s, dir) => LlmOps.qDedupSimhashApply(s, dir)),
    "q_dedup_minhash_apply" -> ((s, dir) => LlmOps.qDedupMinhashApply(s, dir)),
    "q_centroid_margin" -> ((s, dir) =>
      graft.ann.Centroids.centroidMargins(
        sources.Tables.table(s, dir, "embeddings"), "label", "embedding",
        "vec_id").orderBy("label")),
    "q_embedding_dims" -> ((s, dir) =>
      graft.ann.Centroids.dimProfile(
        sources.Tables.table(s, dir, "embeddings"), "embedding")
        .orderBy("dim")),
    "q_group_diversity" -> ((s, dir) =>
      graft.ann.Centroids.diversity(
        sources.Tables.table(s, dir, "embeddings"), "label", "embedding")
        .orderBy("label")),
    "q_ann_int8" -> ((s, dir) => LlmOps.qAnnInt8(s, dir)),
    "q_ann_cascade" -> ((s, dir) => LlmOps.qAnnCascade(s, dir)),
    "q_dedup_best" -> ((s, dir) => LlmOps.qDedupBest(s, dir)),
    "q_ann_int8_recall" -> ((s, dir) => LlmOps.qAnnInt8Recall(s, dir)),
    "q_key_candidates" -> ((s, dir) => Etl.qKeyCandidates(s, dir)),
    "q_dedup_normalized" -> ((s, dir) => LlmOps.qDedupNormalized(s, dir)),
    "q_ngram_coverage" -> ((s, dir) => LlmOps.qNgramCoverage(s, dir)),
    "q_order_priority" -> ((s, dir) => Warehouse.qOrderPriority(s, dir)),
    "q_top_customers" -> ((s, dir) => Warehouse.qTopCustomers(s, dir)),
    "q_min_cost_supplier" -> ((s, dir) => Warehouse.qMinCostSupplier(s, dir)),
    "q_custorder_dist" -> ((s, dir) => Warehouse.qCustOrderDist(s, dir)),
    "q_linear_trend" -> ((s, dir) => Warehouse.qLinearTrend(s, dir)),
    "q_theil_sen" -> ((s, dir) => Warehouse.qTheilSen(s, dir)),
    "q_holt" -> ((s, dir) => Warehouse.qHolt(s, dir)),
    "q_holt_winters" -> ((s, dir) => Warehouse.qHoltWinters(s, dir)),
    "q_dedup_best_lsh" -> ((s, dir) => LlmOps.qDedupBestLsh(s, dir)),
    "q_volume_shipping" -> ((s, dir) => Warehouse.qVolumeShipping(s, dir)),
    "q_market_share" -> ((s, dir) => Warehouse.qMarketShare(s, dir)),
    "q_product_profit" -> ((s, dir) => Warehouse.qProductProfit(s, dir)),
    "q_revenue_concentration" -> ((s, dir) => Warehouse.qRevenueConcentration(s, dir)),
    "q_top_supplier" -> ((s, dir) => Warehouse.qTopSupplier(s, dir)),
    "q_small_qty_revenue" -> ((s, dir) => Warehouse.qSmallQtyRevenue(s, dir)),
    "q_laggard_suppliers" -> ((s, dir) => Warehouse.qLaggardSuppliers(s, dir)),
    "q_idle_customers" -> ((s, dir) => Warehouse.qIdleCustomers(s, dir)),
    "q_promo_revenue" -> ((s, dir) => Warehouse.qPromoRevenue(s, dir)),
    "q_xcorr" -> ((s, dir) => Warehouse.qXcorr(s, dir)),
    "q_graph_distances" -> ((s, dir) => Warehouse.qGraphDistances(s, dir)),
    "q_epoch_independence" -> ((s, dir) => Mix.qEpochIndependence(s, dir)),
    "q_supplier_diversity" -> ((s, dir) => Warehouse.qSupplierDiversity(s, dir)),
    "q_disjunctive_revenue" -> ((s, dir) => Warehouse.qDisjunctiveRevenue(s, dir)),
    "q_majority_supplier" -> ((s, dir) => Warehouse.qMajoritySupplier(s, dir)),
    "q_ann_pca" -> ((s, dir) => LlmOps.qAnnPca(s, dir)),
    "q_pca" -> ((s, dir) => LlmOps.qPca(s, dir)),
    "q_pca_project" -> ((s, dir) => LlmOps.qPcaProject(s, dir)),
  )

  /** H27 per-epoch order CTE: H14's hash→shard→rank→stride chain under
    * an `epoch<e>:` salt, emitting (doc_id, gp). */
  private def epochOrderCte(e: Int): String =
    s"""e$e AS (
      |  SELECT doc_id,
      |    CAST((row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1)
      |      * 64 + shard AS BIGINT) AS gp
      |  FROM (
      |    SELECT doc_id, h, CAST(h % 64 AS INTEGER) AS shard
      |    FROM (
      |      SELECT doc_id, (h0 * h0) % 2147483647 AS h
      |      FROM (
      |        SELECT doc_id,
      |          list_reduce(
      |            list_transform(range(1, length('epoch$e:' || CAST(doc_id AS VARCHAR)) + 1),
      |                           i -> CAST(ascii(substr('epoch$e:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
      |            (h, c) -> (h * 131 + c) % 2147483647) AS h0
      |        FROM documents))))""".stripMargin

  /** H27 pair block: Pearson of two epochs' positions, the same
    * decimal-exact sums → double tail as the Spark side. */
  private def epochPairSql(a: Int, b: Int): String =
    s"""SELECT CAST($a AS BIGINT) AS epoch_a, CAST($b AS BIGINT) AS epoch_b,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round((CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE)
      |      - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE) / count(*)) /
      |    sqrt((CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE)
      |        - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE) / count(*))
      |      * (CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE)
      |        - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE) / count(*))), 6)
      |    AS order_corr
      |FROM (SELECT a.gp AS x, b.gp AS y
      |      FROM e$a a JOIN e$b b USING (doc_id))""".stripMargin

  /** G3e/G3k shared CTE chain (hh → hs → hf): doc_id → the planted
    * 64-bit image dHash exactly as the image synthesizer builds it
    * (multiplicative mix, signed reinterpret, per-member bit flips). */
  private val imageHashCte: String =
      """hh AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 16 < 3 THEN
        |      ((2 * (doc_id // 16) + 1)::HUGEINT * 14029467366897019727)
        |        % 18446744073709551616
        |    ELSE
        |      ((doc_id + 1)::HUGEINT * 11400714819323198485)
        |        % 18446744073709551616
        |    END AS hu
        |  FROM documents),
        |hs AS (
        |  SELECT doc_id,
        |    CASE WHEN hu >= 9223372036854775808
        |         THEN (hu - 18446744073709551616)::BIGINT ELSE hu::BIGINT
        |    END AS h0,
        |    doc_id % 16 AS m, doc_id // 16 AS g
        |  FROM hh),
        |hf AS (
        |  SELECT doc_id,
        |    CASE WHEN m = 1 THEN xor(h0,
        |           CASE WHEN g % 64 = 63 THEN -9223372036854775808
        |                ELSE 1::BIGINT << (g % 64) END)
        |         WHEN m = 2 THEN xor(xor(h0,
        |           CASE WHEN (g+7) % 64 = 63 THEN -9223372036854775808
        |                ELSE 1::BIGINT << ((g+7) % 64) END),
        |           CASE WHEN (g+23) % 64 = 63 THEN -9223372036854775808
        |                ELSE 1::BIGINT << ((g+23) % 64) END)
        |         ELSE h0 END AS h
        |  FROM hs)""".stripMargin

  /** D28 + D28b shared oracle: mutation + pairs + recursive reach +
    * argmax join-back replay (the composed survivorship pipeline). */
  private val dedupBestSql: String =
      """WITH RECURSIVE mut AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 20 = 0 THEN
        |      concat_ws(CAST(doc_id // 100 AS VARCHAR) || ' ',
        |          'alpha', 'bravo', 'charlie', 'delta', 'echo',
        |          'foxtrot', 'golf', 'hotel', 'india', 'juliet')
        |        || CAST(doc_id // 100 AS VARCHAR)
        |        || repeat(' the', CAST((doc_id // 20) % 4 + 1 AS INT))
        |    ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |d AS (
        |  SELECT doc_id, source,
        |    list_transform(range(1, len(string_split(text, ' '))), i ->
        |      string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]) AS grams
        |  FROM mut WHERE doc_id % 5 = 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE (CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) = 0 THEN 0
        |    ELSE (1000 * len(list_intersect(list_distinct(a.grams), list_distinct(b.grams))))
        |      // len(list_distinct(list_concat(a.grams, b.grams))) END) >= 700),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
        |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
        |f AS (
        |  SELECT doc_id,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |    CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
        |      + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT) AS stop_hits
        |  FROM mut),
        |q AS (SELECT doc_id,
        |        least(1000, n_words * 5) + least(500, stop_hits * 20) AS qv
        |      FROM f),
        |j AS (SELECT comp.cluster_id, comp.id, q.qv
        |      FROM comp JOIN q ON comp.id = q.doc_id),
        |m AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
        |        max(qv) AS mq FROM j GROUP BY cluster_id)
        |SELECT m.cluster_id, m.n_docs, CAST(min(j.id) AS BIGINT) AS survivor_id,
        |  m.mq AS survivor_quality_x1000
        |FROM j JOIN m ON j.cluster_id = m.cluster_id AND j.qv = m.mq
        |GROUP BY m.cluster_id, m.n_docs, m.mq
        |ORDER BY m.cluster_id""".stripMargin

  /** H10's pinned-artifact score replay — shared by the H10b
    * calibration oracle so the scoring definition cannot drift. The
    * coefficients read DIRECTLY from the pinned quality_lr parquet
    * (round-14 advice fix: the previous inlined double literals could
    * silently diverge from a refit artifact; now a refit and its oracle
    * move together by construction). */
  private def qualityClassifierSql: String =
    s"""WITH coef AS (SELECT weights AS w, intercept AS b
        |          FROM read_parquet('${artifactGlob("quality_lr_r001_i100")}')),
        |f AS (
        |  SELECT doc_id, text,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS non_space,
        |    CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
        |      + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT) AS stop_hits
        |  FROM documents WHERE text IS NOT NULL),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |         FROM documents WHERE text IS NOT NULL),
        |rep AS (SELECT doc_id, len(t) AS rn, len(list_distinct(t)) AS nd FROM toks),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |        i -> t[i] || ' ' || t[i+1])) AS gram FROM toks),
        |top AS (SELECT doc_id, max(cnt) AS top_cnt FROM (
        |          SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
        |        GROUP BY doc_id),
        |ph AS (SELECT doc_id,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      list_reduce(
        |        list_transform(range(1, length(text) + 1),
        |                       i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |        (h, c) -> (h * 131 + c) % 2147483647)
        |    END AS h
        |  FROM documents WHERE text IS NOT NULL),
        |feat AS (
        |  SELECT f.doc_id,
        |    CAST(f.n_words AS DOUBLE) AS x1,
        |    CAST((f.non_space * 100) // f.n_words AS DOUBLE) AS x2,
        |    CAST(f.stop_hits AS DOUBLE) AS x3,
        |    CAST(1000 * (r.rn - r.nd) // r.rn AS DOUBLE) AS x4,
        |    CAST(CASE WHEN r.rn < 2 THEN 0
        |         ELSE 1000 * COALESCE(t.top_cnt, 0) // (r.rn - 1) END AS DOUBLE) AS x5,
        |    least(1000, f.n_words * 5) + least(500, f.stop_hits * 20) AS q,
        |    ph.h AS h
        |  FROM f JOIN rep r USING (doc_id) LEFT JOIN top t USING (doc_id)
        |    JOIN ph USING (doc_id))
        |SELECT doc_id,
        |  CASE WHEN h % 5 < 4 THEN 'train' ELSE 'eval' END AS split,
        |  CAST(CASE WHEN q >= 350 THEN 1 ELSE 0 END AS BIGINT) AS label,
        |  round(1.0 / (1.0 + exp(-(x1 * w[1]
        |    + x2 * w[2]
        |    + x3 * w[3]
        |    + x4 * w[4]
        |    + x5 * w[5]
        |    + b))), 6) AS quality_prob
        |FROM feat, coef ORDER BY doc_id""".stripMargin

  /** Shared oracle CTE replaying [[graft.functions.expressions.LshBucket]]
    * BIT-EXACTLY in DuckDB (the round-14 [R]→[O] promotions for the
    * hyperplane-LSH family): the splitmix64 plane components run on
    * HUGEINT with 64-bit wraparound emulated by a 32-bit-split mulmod
    * (z·c mod 2⁶⁴ = (z_lo·c + ((z_hi·c mod 2³²) << 32)) mod 2⁶⁴ — the
    * full product would overflow signed INT128), xor/shift on UBIGINT,
    * and the final component converts UBIGINT→BIGINT→DOUBLE exactly as
    * the JVM's Long→Double. Dot products fold SEQUENTIALLY via
    * list_reduce in the same d=0..n-1 order as the expression's loop, so
    * every sign bit — and therefore every bucket — is bit-identical.
    * Yields CTEs: emb(vec_id, v double[]), bkt(vec_id, b) — multi-probe
    * candidate sets then reduce to bit_count(xor(b_a, b_b)) <= probeBits
    * (probing with all ≤p-bit flips admits exactly the ≤p-hamming
    * buckets). */
  private val lshBucketCte: String =
    """WITH m0 AS (
      |  SELECT p, d,
      |    CAST((p*7919 + d + 11400714819323198485) % 18446744073709551616 AS HUGEINT) AS z
      |  FROM range(8) t(p), range(64) u(d)),
      |m1 AS (
      |  SELECT p, d, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) AS HUGEINT) AS z FROM m0),
      |m2 AS (
      |  SELECT p, d,
      |    ((z % 4294967296) * 13787848793156543929
      |     + ((((z // 4294967296) * (13787848793156543929 % 4294967296)) % 4294967296) * 4294967296)
      |    ) % 18446744073709551616 AS z FROM m1),
      |m3 AS (
      |  SELECT p, d, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) AS HUGEINT) AS z FROM m2),
      |m4 AS (
      |  SELECT p, d,
      |    ((z % 4294967296) * 10723151780598845931
      |     + ((((z // 4294967296) * (10723151780598845931 % 4294967296)) % 4294967296) * 4294967296)
      |    ) % 18446744073709551616 AS z FROM m3),
      |m5 AS (
      |  SELECT p, d, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS z FROM m4),
      |mat AS (
      |  SELECT p, d,
      |    CAST(CAST(CASE WHEN z >= 9223372036854775808 THEN CAST(z AS HUGEINT) - 18446744073709551616
      |              ELSE CAST(z AS HUGEINT) END AS BIGINT) AS DOUBLE)
      |      / 9.223372036854775807e18 AS comp
      |  FROM m5),
      |pv AS (SELECT p, list(comp ORDER BY d) AS pv FROM mat GROUP BY p),
      |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |dots AS (
      |  SELECT e.vec_id, pv.p,
      |    list_reduce(list_transform(range(1, len(e.v)+1), i -> e.v[i] * pv.pv[i]),
      |      (a,b) -> a + b) AS dot
      |  FROM emb e, pv),
      |bkt AS (
      |  SELECT vec_id, CAST(sum(CASE WHEN dot >= 0 THEN 1::BIGINT << p ELSE 0 END) AS BIGINT) AS b
      |  FROM dots GROUP BY vec_id)""".stripMargin

  /** The data dir the oracle dump is being produced FOR — set by
    * Verify.main before it serializes [[oracleSql]], so artifact reads
    * resolve to the CONCRETE [[graft.catalog.Artifacts.path]] the
    * queries just wrote (r15 ADVICE: the dir-hash glob matched every
    * sanitized dir containing the scale token, so a gate run with a
    * relative path and one with an absolute path left two artifact dirs
    * that BOTH matched — read_parquet unioned them and single-row model
    * CTEs silently became multi-row). */
  @volatile private[graft] var oracleDataDir: Option[String] = None

  /** Parquet path for a PINNED artifact frame (LlmOps.pinnedFrame) — the
    * round-14 oracle-pinning pattern: the face and the DuckDB oracle
    * read the SAME persisted frame, so the oracle can replay
    * hash-derived lanes (SimHash/MinHash signatures) that have no SQL
    * formulation. Resolved through the concrete Artifacts.path when
    * [[oracleDataDir]] is set (the Verify dump — same process, same dir
    * string, same hash as the write); the dir-hash glob remains only as
    * the fallback for ad-hoc dumps, baked to sf0.01 because that is the
    * driver's gate scale (every artifact oracle is gate-scale-specific
    * by construction — the artifact is trained on the gated corpus). */
  private def artifactGlob(name: String): String = oracleDataDir match {
    case Some(d) => s"${graft.catalog.Artifacts.path(d, name)}/*.parquet"
    case None => s"${graft.catalog.Artifacts.root}/*testdata_sf0.01_*/$name/*.parquet"
  }

  /** Shared oracle CTE replaying the IVF coarse quantizer from the PINNED
    * centroid artifact (round 14): squared-L2 per (vector, cell) via the
    * same sequential fold as Ivf.assign's codegen loop, argmin with the
    * (d2, cell_id) tie order of the struct min. Yields CTEs:
    * cent(cell_id, centroid), emb(vec_id, v), asg(vec_id, v, cell_id). */
  private def ivfAssignCte: String = s"""
    |WITH cent AS (SELECT cell_id, centroid
    |              FROM read_parquet('${artifactGlob("ivf_c16_s42")}')),
    |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    |d2c AS (SELECT e.vec_id, e.v, c.cell_id,
    |        list_reduce(list_prepend(0.0, list_transform(range(1, len(e.v)+1),
    |          i -> (e.v[i] - c.centroid[i]) * (e.v[i] - c.centroid[i]))),
    |          (a, b) -> a + b) AS dist2
    |       FROM emb e, cent c),
    |asg AS (SELECT vec_id, v, cell_id FROM (
    |          SELECT *, row_number() OVER (PARTITION BY vec_id
    |            ORDER BY dist2, cell_id) AS rn FROM d2c) WHERE rn = 1)""".stripMargin

  /** Shared oracle CTE replaying the PQ encoder from the PINNED codebook
    * artifact (round 14): per-subspace squared-L2 in the same d-order
    * fold as PqEncode's codegen loop, argmin with strict-< tie order
    * (lowest code wins — row_number ORDER BY d2, c), and the ADC
    * distance as the j-ordered fold of the query's own subspace
    * distances (≡ the dist-table lookups). Yields CTEs: cb(flat),
    * emb(vec_id, v), sub(vec_id, j, c, d2), codes(vec_id, j, c),
    * q(query_id, qvec). */
  private def pqCodesCte: String = s"""
    |WITH cb AS (SELECT flat FROM read_parquet('${artifactGlob("pq_m8_k32_s42")}')),
    |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    |sub AS (SELECT e.vec_id, j.j, c.c,
    |        list_reduce(list_prepend(0.0, list_transform(range(1, 9),
    |          d -> (e.v[CAST(j.j*8 + d AS INTEGER)] - cb.flat[CAST((j.j*32 + c.c)*8 + d AS INTEGER)])
    |             * (e.v[CAST(j.j*8 + d AS INTEGER)] - cb.flat[CAST((j.j*32 + c.c)*8 + d AS INTEGER)]))),
    |          (a, b) -> a + b) AS d2
    |        FROM emb e, cb, range(0, 8) j(j), range(0, 32) c(c)),
    |codes AS (SELECT vec_id, j, c FROM (
    |           SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
    |           FROM sub) WHERE rn = 1),
    |q AS (SELECT vec_id AS query_id, v AS qvec FROM emb WHERE vec_id % 50 = 0)""".stripMargin

  /** Shared oracle CTEs replaying the H31 DSIR importance weights from
    * the PINNED λ model (round 14 pattern): per-bigram polyhash + bucket
    * assignment, bucket counts that the pinned (ct, cr) must MATCH (the
    * non-circular half), and the order-free integer per-doc sums.
    * Yields CTEs: lam0 (the pinned model), b(doc_id, lang, bkt),
    * lam(bkt, lam_x1e6) count-verified, imp(doc_id, lang, n_feats,
    * importance_x1e6). */
  private def dsirImpCte: String = s"""
    |WITH lam0 AS (SELECT bkt, ct, cr, lam_x1e6
    |              FROM read_parquet('${artifactGlob("dsir_lam2_en_b4096")}')),
    |d AS (SELECT doc_id, lang, string_split(text, ' ') AS t
    |      FROM documents WHERE text IS NOT NULL),
    |g AS (SELECT doc_id, lang,
    |        unnest(list_transform(range(1, len(t)), i ->
    |          t[i] || ' ' || t[i+1])) AS gram
    |      FROM d),
    |b AS (SELECT doc_id, lang,
    |        list_reduce(list_transform(range(1, length(gram) + 1),
    |          i -> CAST(ascii(substr(gram, i, 1)) AS BIGINT)),
    |          (h, c) -> (h * 131 + c) % 2147483647) % 4096 AS bkt
    |      FROM g),
    |r AS (SELECT bkt, count(*) AS cr FROM b GROUP BY bkt),
    |tc AS (SELECT bkt, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY bkt),
    |lam AS (SELECT lam0.bkt, lam0.lam_x1e6 FROM lam0
    |        JOIN r ON r.bkt = lam0.bkt AND r.cr = lam0.cr
    |        LEFT JOIN tc ON tc.bkt = lam0.bkt
    |        WHERE coalesce(tc.ct, 0) = lam0.ct),
    |imp AS (SELECT b.doc_id, b.lang, count(*) AS n_feats,
    |          CAST(sum(lam.lam_x1e6) AS BIGINT) AS importance_x1e6
    |        FROM b JOIN lam USING (bkt)
    |        GROUP BY b.doc_id, b.lang)""".stripMargin

  /** DuckDB-equivalent ANSI SQL per query key (same column names/types).
    * q_index_recall composes at the end from the eight leg oracles —
    * every index the acceptance matrix reports is itself replayed, so
    * the matrix checks end to end (round 14). */
  def oracleSql: Map[String, String] =
    oracleBase + ("q_index_recall" -> indexRecallOracle)

  /** E11b [R]→[O] (round 14): the acceptance matrix as a UNION of the
    * eight leg replays (exact control + LSH/IVF/PQ/IVF-PQ + the three
    * exact-rescore cascades), each leg's full oracle nested as a
    * subquery; overlap counts and the integer recall lanes replay. */
  private def indexRecallOracle: String = {
    val legs = Seq(
      "exact" -> "q_ann_topk", "int8_cascade" -> "q_ann_cascade",
      "ivf" -> "q_ann_ivf", "ivf_pq" -> "q_pq_ivf", "lsh" -> "q_ann_lsh",
      "pca_cascade" -> "q_ann_pca", "pq" -> "q_pq_topk",
      "pq_cascade" -> "q_pq_cascade")
    val ex = oracleBase("q_ann_topk")
    legs.map { case (nm, qid) =>
      s"""(WITH __exact AS (SELECT query_id, neighbor_id FROM ($ex) __e),
         |__approx AS (SELECT query_id, neighbor_id FROM (${oracleBase(qid)}) __a),
         |__ov AS (SELECT e.query_id, count(*) AS n_overlap
         |         FROM __exact e JOIN __approx a
         |           ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
         |         GROUP BY e.query_id),
         |__ne AS (SELECT query_id, count(*) AS n_exact FROM __exact GROUP BY query_id),
         |__r AS (SELECT ne.query_id, ne.n_exact, coalesce(ov.n_overlap, 0) AS n_overlap,
         |          (coalesce(ov.n_overlap, 0) * 100) // ne.n_exact AS recall_x100
         |        FROM __ne ne LEFT JOIN __ov ov USING (query_id))
         |SELECT '$nm' AS index_name, count(*) AS n_queries,
         |  CAST(sum(recall_x100) // count(*) AS BIGINT) AS mean_recall_x100,
         |  CAST(min(recall_x100) AS BIGINT) AS min_recall_x100
         |FROM __r)""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY index_name"
  }

  /** Oracle expression replaying [[graft.text.Bpe.applyMerges]] over a
    * `word` column and a merges list `m.ms` (list of [left, right] in
    * rank order): the outer fold walks the merges, the inner fold is the
    * leftmost-greedy pass with the pend slot carried as the accumulator
    * list's LAST element (chr(1) = no pend; DuckDB 1.0 cannot carry
    * lists inside struct accumulators) and a chr(2) terminal token that
    * flushes the pend so the result is a fixed `[1:-3]` slice. */
  private val bpeApplySql: String =
    """list_reduce(
      |    list_prepend(list_append(list_filter(string_split(word, ''), c -> c <> ''), '</w>'), m.ms),
      |    (acc, mm) ->
      |      list_reduce(
      |        list_prepend([chr(1)], list_transform(list_append(acc, chr(2)), t -> [t])),
      |        (a, e) -> CASE
      |          WHEN a[len(a)] <> chr(1) AND e[1] = mm[2] THEN
      |            list_append(list_append(a[1:len(a)-1], mm[1] || mm[2]), chr(1))
      |          WHEN e[1] = mm[1] THEN
      |            list_append(CASE WHEN a[len(a)] <> chr(1) THEN a ELSE a[1:len(a)-1] END, e[1])
      |          ELSE
      |            list_append(list_append(CASE WHEN a[len(a)] <> chr(1) THEN a ELSE a[1:len(a)-1] END, e[1]), chr(1))
      |        END)[1:-3])""".stripMargin

  private lazy val oracleBase: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_window_topn" ->
      """SELECT user_id, event_id, ts, value, rn FROM (
        |  SELECT user_id, event_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events) t
        |WHERE rn <= 3
        |ORDER BY user_id, rn""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id, p.ts, c.click_event_id, c.click_ts
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY event_id""".stripMargin,
    // forward as-of has no native DuckDB ASOF form (ASOF is >= only);
    // the oracle replays the same tagged-union + forward-frame
    // first_value construction in SQL — pid/pts carry independently here
    // because both are non-null on exactly the right-side rows
    "q_asof_forward" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS p_ts, min(event_id) AS pid
        |      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |u AS (
        |  SELECT user_id, ts, 0 AS side, event_id,
        |         CAST(NULL AS BIGINT) AS pid, CAST(NULL AS TIMESTAMP) AS pts
        |  FROM c
        |  UNION ALL
        |  SELECT user_id, p_ts, 1, NULL, pid, p_ts FROM p),
        |w AS (
        |  SELECT user_id, ts, side, event_id,
        |    first_value(pid IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, side
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_id,
        |    first_value(pts IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, side
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_ts
        |  FROM u)
        |SELECT event_id, user_id, ts, next_purchase_id, next_purchase_ts
        |FROM w WHERE side = 0 ORDER BY event_id""".stripMargin,
    "q_range_join" ->
      """WITH p AS (SELECT event_id AS p_event_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_event_id, user_id, ts AS click_ts
        |      FROM events WHERE event_type = 'click')
        |SELECT p.p_event_id, p.user_id, p.p_ts, c.click_event_id, c.click_ts
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.click_ts >= p.p_ts - INTERVAL '1 hour' AND c.click_ts <= p.p_ts
        |ORDER BY p_event_id, click_event_id""".stripMargin,
    "q_event_debounce" ->
      """WITH lagged AS (
        |  SELECT event_id, user_id, ts, props,
        |    lag(ts) OVER (PARTITION BY user_id, props ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT event_id, user_id, ts, props FROM lagged
        |WHERE prev_ts IS NULL OR ts > prev_ts + INTERVAL '5 minutes'
        |ORDER BY event_id""".stripMargin,
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, ts, event_type FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |      GROUP BY e.user_id)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    // C62: same spine/lag-join/power-sum Pearson, rounded 6dp.
    "q_acf" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM daily),
        |series AS (
        |  SELECT s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (d)),
        |lags AS (SELECT unnest(range(1, 15)) AS lag),
        |p AS (
        |  SELECT l.lag, a.y AS x, b.y AS y
        |  FROM series a, lags l
        |  JOIN series b ON b.d = a.d + CAST(l.lag AS BIGINT) * INTERVAL 1 DAY)
        |SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |  round((sum(x * y) - sum(x) * sum(y) * 1.0 / count(*)) /
        |    sqrt((sum(x * x) - sum(x) * sum(x) * 1.0 / count(*))
        |      * (sum(y * y) - sum(y) * sum(y) * 1.0 / count(*))), 6) AS acf
        |FROM p GROUP BY lag ORDER BY lag""".stripMargin,
    // H27: cross-epoch order independence (Spearman of H14 orders
    // under per-epoch salts; decimal-exact sums, shared IEEE tail)
    "q_epoch_independence" ->
      (s"""WITH ${epochOrderCte(0)},
        |${epochOrderCte(1)},
        |${epochOrderCte(2)}
        |${epochPairSql(0, 1)}
        |UNION ALL
        |${epochPairSql(0, 2)}
        |UNION ALL
        |${epochPairSql(1, 2)}
        |ORDER BY epoch_a, epoch_b""".stripMargin),
    // C93: bounded BFS hop distances over the co-purchase graph; the
    // recursive walk dedups (id, hops) STATES (UNION, not UNION ALL) so
    // the oracle explores O(|V|*maxHops) states, not all paths
    "q_graph_distances" ->
      """WITH RECURSIVE d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (
        |  SELECT a.l_partkey AS a, b.l_partkey AS b
        |  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |edges AS (SELECT a AS src, b AS dst FROM e0
        |  UNION ALL SELECT b, a FROM e0),
        |walk(id, hops) AS (
        |  SELECT p_partkey, 0 FROM part WHERE p_brand = 'Brand#12'
        |  UNION
        |  SELECT e.dst, w.hops + 1
        |  FROM walk w JOIN edges e ON w.id = e.src WHERE w.hops < 3)
        |SELECT id AS p_partkey, CAST(min(hops) AS BIGINT) AS hops
        |FROM walk GROUP BY id ORDER BY p_partkey""".stripMargin,
    // C91: lead-lag cross-correlation between event-type daily series
    "q_xcorr" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM daily GROUP BY event_type),
        |series AS (
        |  SELECT s.event_type, s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (event_type, d)),
        |lags AS (SELECT unnest(range(0, 8)) AS lag),
        |p AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
        |    a.y AS x, b.y AS y
        |  FROM series a, lags l
        |  JOIN series b ON b.d = a.d + CAST(l.lag AS BIGINT) * INTERVAL 1 DAY
        |  WHERE a.event_type <> b.event_type)
        |SELECT type_a, type_b, lag, CAST(count(*) AS BIGINT) AS n,
        |  round((sum(x * y) - sum(x) * sum(y) * 1.0 / count(*)) /
        |    sqrt((sum(x * x) - sum(x) * sum(x) * 1.0 / count(*))
        |      * (sum(y * y) - sum(y) * sum(y) * 1.0 / count(*))), 6) AS xcorr
        |FROM p GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // C61: same cents/rank/decile/ppm lanes as C46/C59.
    "q_lorenz_deciles" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
        |r AS (SELECT cents,
        |        (10 * (row_number() OVER (ORDER BY cents, user_id) - 1))
        |          // n.n_users + 1 AS decile
        |      FROM u, n),
        |d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users_decile,
        |        CAST(sum(cents) AS BIGINT) AS cents_decile
        |      FROM r GROUP BY decile),
        |t AS (SELECT CAST(sum(cents_decile) AS BIGINT) AS t FROM d)
        |SELECT d.decile, d.n_users_decile, d.cents_decile,
        |  CAST((CAST(d.cents_decile AS HUGEINT) * 1000000) // t.t AS BIGINT)
        |    AS share_ppm,
        |  CAST((CAST(sum(d.cents_decile) OVER (ORDER BY d.decile
        |      ROWS UNBOUNDED PRECEDING) AS HUGEINT) * 1000000) // t.t
        |    AS BIGINT) AS cum_share_ppm
        |FROM d, t ORDER BY d.decile""".stripMargin,
    // C60: same CASE-ladder digit lane and ppm/chi2 arithmetic.
    "q_benford" ->
      """WITH d AS (
        |  SELECT CAST(CASE
        |    WHEN value >= 1000000000000 THEN NULL
        |    WHEN value >= 100000000000 THEN floor(value / 100000000000)
        |    WHEN value >= 10000000000 THEN floor(value / 10000000000)
        |    WHEN value >= 1000000000 THEN floor(value / 1000000000)
        |    WHEN value >= 100000000 THEN floor(value / 100000000)
        |    WHEN value >= 10000000 THEN floor(value / 10000000)
        |    WHEN value >= 1000000 THEN floor(value / 1000000)
        |    WHEN value >= 100000 THEN floor(value / 100000)
        |    WHEN value >= 10000 THEN floor(value / 10000)
        |    WHEN value >= 1000 THEN floor(value / 1000)
        |    WHEN value >= 100 THEN floor(value / 100)
        |    WHEN value >= 10 THEN floor(value / 10)
        |    WHEN value >= 1 THEN floor(value)
        |    WHEN value >= 0.1 THEN floor(value * 10)
        |    WHEN value >= 0.01 THEN floor(value * 100)
        |    WHEN value >= 0.001 THEN floor(value * 1000)
        |    WHEN value >= 0.0001 THEN floor(value * 10000)
        |    WHEN value >= 0.00001 THEN floor(value * 100000)
        |    WHEN value >= 0.000001 THEN floor(value * 1000000)
        |    ELSE NULL END AS BIGINT) AS first_digit
        |  FROM events WHERE value IS NOT NULL AND value > 0.0),
        |g AS (SELECT first_digit, CAST(count(*) AS BIGINT) AS n FROM d
        |      WHERE first_digit BETWEEN 1 AND 9 GROUP BY first_digit),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM g),
        |x AS (SELECT CAST(sum(CASE WHEN first_digit IS NULL THEN 1 ELSE 0 END)
        |        AS BIGINT) AS n_excluded FROM d)
        |SELECT g.first_digit, g.n,
        |  CAST((g.n * 1000000) // t.n_total AS BIGINT) AS observed_ppm,
        |  CAST(floor(log10(1.0 + 1.0 / g.first_digit) * 1000000.0) AS BIGINT)
        |    AS expected_ppm,
        |  CAST(round(pow(g.n - floor(log10(1.0 + 1.0 / g.first_digit)
        |        * 1000000.0) / 1000000.0 * t.n_total, 2)
        |      / (floor(log10(1.0 + 1.0 / g.first_digit) * 1000000.0)
        |        / 1000000.0 * t.n_total) * 1000.0, 0) AS BIGINT)
        |    AS chi2_x1000,
        |  x.n_excluded
        |FROM g, t, x ORDER BY g.first_digit""".stripMargin,
    // C58: same funnel counts + closed Wilson form at z=1.96.
    "q_conversion_ci" ->
      """WITH ev AS (SELECT user_id, ts, event_type FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |      GROUP BY e.user_id),
        |n AS (SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
        |        CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
        |        CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase),
        |st AS (
        |  SELECT 'view_to_click' AS step, n_view AS n, n_click AS k FROM n
        |  UNION ALL
        |  SELECT 'click_to_purchase', n_click, n_purchase FROM n)
        |SELECT step, n, k,
        |  round(k * 1.0 / n, 6) AS rate,
        |  round(((k * 1.0 / n) + 3.8416 / (2.0 * n)) / (1.0 + 3.8416 / n)
        |    - (1.96 * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n
        |        + 3.8416 / (4.0 * n * n))) / (1.0 + 3.8416 / n), 6) AS ci_lo,
        |  round(((k * 1.0 / n) + 3.8416 / (2.0 * n)) / (1.0 + 3.8416 / n)
        |    + (1.96 * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n
        |        + 3.8416 / (4.0 * n * n))) / (1.0 + 3.8416 / n), 6) AS ci_hi
        |FROM st ORDER BY step""".stripMargin,
    // C59: same cents-rank Gini; identical (cents, user_id) tie order.
    "q_gini" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |r AS (SELECT cents,
        |        CAST(row_number() OVER (ORDER BY cents, user_id) AS BIGINT) AS i
        |      FROM u)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(cents) AS BIGINT) AS total_cents,
        |  round(2.0 * CAST(sum(CAST(i AS HUGEINT) * cents) AS DOUBLE)
        |      / CAST(CAST(count(*) AS HUGEINT) * sum(cents) AS DOUBLE)
        |    - (count(*) + 1.0) / count(*), 6) AS gini
        |FROM r""".stripMargin,
    // C57: the oracle states dominance DIRECTLY (NOT EXISTS a strictly
    // better point) — strategy-independent of the sweep.
    "q_skyline" ->
      """SELECT p.p_partkey, p.p_retailprice, p.p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p.p_partkey""".stripMargin,
    // C97: the Poisson weights are ALL-INTEGER (mixed 31-bit draw vs
    // integer CDF thresholds), value mass rides integer cents, replica
    // means are single divisions of integers, and the CI is an order
    // statistic — every step replays exactly.
    "q_bootstrap_ci" ->
      """WITH e AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, event_id, cents,
        |        unnest(range(0, 100)) AS b FROM e),
        |h AS (SELECT event_type, b, cents,
        |    list_reduce(
        |      list_transform(
        |        range(1, length('boot:' || CAST(event_id AS VARCHAR) || ':'
        |                        || CAST(b AS VARCHAR)) + 1),
        |        i -> CAST(ascii(substr('boot:' || CAST(event_id AS VARCHAR)
        |                        || ':' || CAST(b AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h0
        |  FROM r),
        |d AS (SELECT event_type, b, cents,
        |    (((h0 * h0) % 2147483647) * ((h0 * h0) % 2147483647))
        |      % 2147483647 AS hm
        |  FROM h),
        |w AS (SELECT event_type, b, cents,
        |    CAST(len(list_filter([790015083, 1580030167, 1975037709,
        |      2106706890, 2139624185, 2146207644, 2147304887, 2147461637],
        |      t -> hm >= t)) AS BIGINT) AS w
        |  FROM d),
        |rep AS (SELECT event_type, b, sum(w * cents) AS s, sum(w) AS n
        |        FROM w GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(s AS DOUBLE) / n AS m
        |      FROM rep WHERE n > 0),
        |ms AS (SELECT event_type, list_sort(list(m)) AS ms
        |       FROM m GROUP BY event_type),
        |idx AS (SELECT event_type, ms, CAST(len(ms) AS BIGINT) AS n_replicas,
        |        len(ms) * 25 // 1000 + 1 AS lo_i,
        |        len(ms) - len(ms) * 25 // 1000 AS hi_i FROM ms),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        sum(cents) AS sc FROM e GROUP BY event_type)
        |SELECT t.event_type, t.n, idx.n_replicas,
        |  round(CAST(t.sc AS DOUBLE) / t.n / 100.0, 6) AS mean,
        |  round(ms[CAST(lo_i AS INT)] / 100.0, 6) AS ci_lo,
        |  round(ms[CAST(hi_i AS INT)] / 100.0, 6) AS ci_hi
        |FROM t JOIN idx USING (event_type) ORDER BY t.event_type""".stripMargin,
    // C57b: the grid prefilter is EXACT (only provably dominated points
    // drop), so the oracle is the same strategy-independent dominance SQL.
    "q_skyline_grid" ->
      """SELECT p.p_partkey, p.p_retailprice, p.p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p.p_partkey""".stripMargin,
    // C56: same four-cell power sums; DuckDB date_add via + INTERVAL.
    "q_did" ->
      """WITH b AS (
        |  SELECT CAST(min(ts) AS DATE)
        |      + CAST(CAST(date_diff('day', CAST(min(ts) AS DATE),
        |          CAST(max(ts) AS DATE)) // 2 AS INTEGER) AS BIGINT)
        |      * INTERVAL 1 DAY AS mid
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT event_type,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat,
        |    CASE WHEN CAST(ts AS DATE) >= (SELECT mid FROM b)
        |         THEN 1 ELSE 0 END AS post,
        |    CAST(count(*) AS BIGINT) AS n, sum(value) AS s,
        |    sum(value * value) AS s2
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |w AS (
        |  SELECT event_type,
        |    max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_t0,
        |    max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_t1,
        |    max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_c0,
        |    max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_c1,
        |    max(CASE WHEN treat = 1 AND post = 0 THEN s END) AS s_t0,
        |    max(CASE WHEN treat = 1 AND post = 1 THEN s END) AS s_t1,
        |    max(CASE WHEN treat = 0 AND post = 0 THEN s END) AS s_c0,
        |    max(CASE WHEN treat = 0 AND post = 1 THEN s END) AS s_c1,
        |    max(CASE WHEN treat = 1 AND post = 0 THEN s2 END) AS q_t0,
        |    max(CASE WHEN treat = 1 AND post = 1 THEN s2 END) AS q_t1,
        |    max(CASE WHEN treat = 0 AND post = 0 THEN s2 END) AS q_c0,
        |    max(CASE WHEN treat = 0 AND post = 1 THEN s2 END) AS q_c1
        |  FROM c GROUP BY event_type)
        |SELECT event_type,
        |  CAST(n_t0 + n_t1 + n_c0 + n_c1 AS BIGINT) AS n,
        |  round((s_t1 / n_t1 - s_t0 / n_t0) - (s_c1 / n_c1 - s_c0 / n_c0), 6)
        |    AS did,
        |  round(sqrt(
        |    (q_t1 / n_t1 - (s_t1 / n_t1) * (s_t1 / n_t1)) / n_t1
        |      + (q_t0 / n_t0 - (s_t0 / n_t0) * (s_t0 / n_t0)) / n_t0
        |      + (q_c1 / n_c1 - (s_c1 / n_c1) * (s_c1 / n_c1)) / n_c1
        |      + (q_c0 / n_c0 - (s_c0 / n_c0) * (s_c0 / n_c0)) / n_c0), 6)
        |    AS se
        |FROM w ORDER BY event_type""".stripMargin,
    // H14b: H14's hash/shard/pos chain + one lag + histogram lanes.
    "q_shuffle_quality" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    list_reduce(
        |      list_transform(range(1, length('shuf42:' || CAST(doc_id AS VARCHAR)) + 1),
        |                     i -> CAST(ascii(substr('shuf42:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h
        |  FROM documents),
        |sq AS (SELECT doc_id, source, (h * h) % 2147483647 AS h FROM h),
        |s AS (SELECT doc_id, source, h, CAST(h % 64 AS INTEGER) AS shard FROM sq),
        |r AS (SELECT source, shard,
        |        row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
        |      FROM s),
        |pr AS (SELECT source,
        |         lag(source) OVER (PARTITION BY shard ORDER BY pos) AS prev
        |       FROM r),
        |o AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |        CAST(sum(CASE WHEN source = prev THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_same
        |      FROM pr WHERE prev IS NOT NULL),
        |e AS (SELECT sum(CAST(ns AS HUGEINT) * ns) AS sq,
        |        CAST(sum(ns) AS BIGINT) AS nt
        |      FROM (SELECT count(*) AS ns FROM documents GROUP BY source))
        |SELECT o.n_pairs, o.n_same,
        |  CAST((o.n_same * 1000000) // o.n_pairs AS BIGINT) AS same_ppm,
        |  CAST((e.sq * 1000000) // (CAST(e.nt AS HUGEINT) * e.nt) AS BIGINT)
        |    AS expected_ppm
        |FROM o, e""".stripMargin,
    // D21: same canonical-min + per-source rollup.
    "q_dedup_rate_by_source" ->
      """WITH d AS (
        |  SELECT doc_id, source, md5(text) AS h
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT h, min(doc_id) AS canonical_id FROM d GROUP BY h)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN d.doc_id <> c.canonical_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dups,
        |  CAST(count(DISTINCT d.h) AS BIGINT) AS n_distinct,
        |  CAST((CAST(sum(CASE WHEN d.doc_id <> c.canonical_id THEN 1 ELSE 0 END)
        |    AS HUGEINT) * 1000000) // count(*) AS BIGINT) AS dup_ppm
        |FROM d JOIN c USING (h)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // D20: the oracle states the pair semantics as a plain self-join —
    // strategy-independent; the Spark side uses the bounded collect_set
    // explosion to avoid the shuffle self-join.
    "q_source_overlap" ->
      """WITH d AS (
        |  SELECT DISTINCT source, md5(text) AS h
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (
        |  SELECT a.h, a.source AS src_a, b.source AS src_b
        |  FROM d a JOIN d b ON a.h = b.h AND a.source < b.source)
        |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_shared
        |FROM p GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,
    // E12: same fold/bucket arithmetic; DOUBLE accumulation over the
    // float lanes on both engines, integer bucket keys.
    "q_embedding_norms" ->
      """WITH n AS (
        |  SELECT vec_id,
        |    sqrt(list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nr
        |  FROM embeddings)
        |SELECT CAST(floor(nr * 10.0) AS BIGINT) AS norm_bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN nr = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  round(min(nr), 4) AS min_norm, round(max(nr), 4) AS max_norm
        |FROM n GROUP BY 1 ORDER BY norm_bucket""".stripMargin,
    // C25b: same power-sum scalar arithmetic, rounded 6dp/1dp.
    "q_power_analysis" ->
      """WITH a AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(value) AS s, sum(value * value) AS s2
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n,
        |  round(s / n, 6) AS mean,
        |  round(sqrt(s2 / n - (s / n) * (s / n)), 6) AS sd,
        |  round(2.8016 * sqrt(s2 / n - (s / n) * (s / n))
        |    * sqrt(4.0 / n), 6) AS mde_abs,
        |  round(2.8016 * sqrt(s2 / n - (s / n) * (s / n))
        |    * sqrt(4.0 / n) / (s / n) * 10000.0, 1) AS mde_bps,
        |  round(2.0 * pow(2.8016 * sqrt(s2 / n - (s / n) * (s / n))
        |    / (0.01 * s / n), 2), 1) AS n_per_arm_1pct
        |FROM a ORDER BY event_type""".stripMargin,
    // C13b: C13 with each step deadline-bounded to 24h of the previous.
    "q_funnel_windowed" ->
      """WITH ev AS (SELECT user_id, ts, event_type FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |        AND e.ts <= v.t_view + INTERVAL '24 hours'
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |        AND e.ts <= c.t_click + INTERVAL '24 hours'
        |      GROUP BY e.user_id)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    // H28: all-integer sweep over the proven F2 quality lane.
    "q_gate_sweep" ->
      """WITH f AS (
        |  SELECT CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |    CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
        |      + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT) AS stop_hits
        |  FROM documents WHERE text IS NOT NULL),
        |q AS (SELECT n_words,
        |        least(1000, n_words * 5) + least(500, stop_hits * 20) AS qv
        |      FROM f),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |        CAST(sum(n_words) AS BIGINT) AS nt FROM q),
        |s AS (SELECT CAST(th * 100 AS BIGINT) AS threshold,
        |        CAST(sum(CASE WHEN qv >= th * 100 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS docs_kept,
        |        CAST(sum(CASE WHEN qv >= th * 100 THEN n_words ELSE 0 END) AS BIGINT)
        |          AS tokens_kept
        |      FROM q CROSS JOIN (SELECT unnest(range(0, 11)) AS th)
        |      GROUP BY th)
        |SELECT threshold, docs_kept, tokens_kept,
        |  CAST((1000000 * docs_kept) // (SELECT nd FROM t) AS BIGINT) AS docs_kept_ppm,
        |  CAST((1000000 * tokens_kept) // (SELECT nt FROM t) AS BIGINT) AS tokens_kept_ppm
        |FROM s ORDER BY threshold""".stripMargin,
    "q_quality_gate" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |    CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
        |      + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT) AS stop_hits
        |  FROM documents),
        |q AS (SELECT doc_id, lang,
        |        least(1000, n_words * 5) + least(500, stop_hits * 20) AS quality_x1000
        |      FROM f),
        |cut AS (SELECT lang, quantile_cont(quality_x1000, 0.25) AS q25
        |        FROM q GROUP BY lang)
        |SELECT q.doc_id, q.lang, q.quality_x1000
        |FROM q JOIN cut ON q.lang = cut.lang
        |WHERE q.quality_x1000 > cut.q25
        |ORDER BY q.doc_id""".stripMargin,
    // H21: F2's quality lane + H3's cut, the rev: mixed draw, and the
    // per-stratum rank-k replayed as a window (the Spark side is the
    // bounded-heap aggregate)
    "q_review_sample" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |    CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
        |      + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT) AS stop_hits
        |  FROM documents),
        |q AS (SELECT doc_id, lang,
        |        least(1000, n_words * 5) + least(500, stop_hits * 20) AS quality_x1000
        |      FROM f),
        |cut AS (SELECT lang, quantile_cont(quality_x1000, 0.25) AS q25
        |        FROM q GROUP BY lang),
        |hr AS (SELECT doc_id, list_reduce(
        |    list_transform(range(1, length('rev:' || CAST(doc_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr('rev:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |    (h, c) -> (h * 131 + c) % 2147483647) AS hraw FROM documents),
        |h1 AS (SELECT doc_id, (hraw * hraw) % 2147483647 AS hm FROM hr),
        |h2 AS (SELECT doc_id, (hm * hm) % 2147483647 AS hm FROM h1),
        |fl AS (SELECT q.doc_id, q.lang, q.quality_x1000 > cut.q25 AS kept, h2.hm
        |       FROM q JOIN cut ON q.lang = cut.lang
        |       JOIN h2 ON q.doc_id = h2.doc_id),
        |sz AS (SELECT lang, kept, CAST(count(*) AS BIGINT) AS stratum_size
        |       FROM fl GROUP BY lang, kept),
        |r AS (SELECT lang, kept, doc_id,
        |        CAST(row_number() OVER (PARTITION BY lang, kept
        |          ORDER BY hm, doc_id) AS BIGINT) AS review_rank
        |      FROM fl)
        |SELECT r.lang, r.kept, sz.stratum_size, r.review_rank, r.doc_id
        |FROM r JOIN sz ON r.lang = sz.lang AND r.kept = sz.kept
        |WHERE r.review_rank <= 3
        |ORDER BY r.lang, r.kept, r.review_rank""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,
    "q_percentile" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // C12b REGIME-BOUNDED oracle (r9 verdict item 8): with every group
    // at or below accuracy=10000, Spark's GK summary compresses nothing
    // and returns the exact discrete-rank element — which is DuckDB's
    // quantile_disc. This pins the below-accuracy regime [O]; above it
    // the GK summary is engine-specific and the contract lives in the
    // paired WarehouseSpec rank-error band (see SURVEY C12b row).
    "q_percentile_approx" ->
      """SELECT event_type, count(*) AS n,
        |  round(quantile_disc(value, 0.5), 4) AS p50,
        |  round(quantile_disc(value, 0.9), 4) AS p90,
        |  round(quantile_disc(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_bloom_sync" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
        |ORDER BY o_orderkey""".stripMargin,
    // A22 [R]→[O] (round 15): the Bloom bit layout has no SQL replay, so
    // the per-distinct-key VERDICT pins (the filter's whole observable
    // behavior on this probe stream); activity, every count, FN = 0 and
    // the ppm arithmetic all replay — a filter that dropped an active
    // key now fails the gate as a hash mismatch, not just a spec.
    "q_bloom_fpr" -> s"""
        |WITH v AS (SELECT o_custkey, pass
        |           FROM read_parquet('${artifactGlob("bloom_verdicts_acct5000_i0_f30000")}')),
        |a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0),
        |p AS (SELECT o.o_custkey, v.pass,
        |        CASE WHEN a.c_custkey IS NULL THEN 0 ELSE 1 END AS is_active
        |      FROM orders o JOIN v ON v.o_custkey = o.o_custkey
        |      LEFT JOIN a ON a.c_custkey = o.o_custkey),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_probes,
        |        CAST(sum(CASE WHEN is_active = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_negative_probes,
        |        CAST(sum(CASE WHEN is_active = 0 AND pass = 1 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_false_positives,
        |        CAST(sum(CASE WHEN is_active = 1 AND pass = 0 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_false_negatives
        |      FROM p)
        |SELECT n_probes, n_negative_probes, n_false_positives, n_false_negatives,
        |  CAST(CASE WHEN n_negative_probes = 0 THEN 0
        |       ELSE (CAST(n_false_positives AS HUGEINT) * 1000000)
        |            // n_negative_probes END AS BIGINT) AS observed_fpp_ppm,
        |  CAST(30000 AS BIGINT) AS configured_fpp_ppm
        |FROM t""".stripMargin,
    "q_doc_chunk" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, t, unnest(range(0, len(t), 24)) AS start FROM toks)
        |SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_id,
        |  CAST(len(list_slice(t, start + 1, start + 32)) AS BIGINT) AS n_tokens,
        |  array_to_string(list_slice(t, start + 1, start + 32), ' ') AS chunk_text
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "q_vocab" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |cnt AS (SELECT term, count(*) AS n FROM w GROUP BY term),
        |top AS (SELECT term, n FROM cnt ORDER BY n DESC, term LIMIT 1000)
        |SELECT term, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, term) - 1 AS BIGINT) AS vocab_id
        |FROM top ORDER BY vocab_id""".stripMargin,
    "q_pack_sequences" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |c AS (SELECT doc_id, t, unnest(range(0, len(t), 32)) AS start FROM toks),
        |ch AS (SELECT doc_id, CAST(start // 32 AS BIGINT) AS chunk_id,
        |         CAST(len(list_slice(t, start + 1, start + 32)) AS BIGINT) AS n_tokens,
        |         array_to_string(list_slice(t, start + 1, start + 32), ' ') AS chunk_text
        |       FROM c),
        |cum AS (SELECT doc_id, chunk_id, n_tokens,
        |          CAST(sum(n_tokens) OVER (
        |            ORDER BY md5(chunk_text), doc_id, chunk_id
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_incl
        |        FROM ch)
        |SELECT doc_id, chunk_id, n_tokens,
        |  (cum_incl - n_tokens) // 256 AS seq_id
        |FROM cum ORDER BY doc_id, chunk_id""".stripMargin,
    "q_boilerplate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |u AS (SELECT doc_id, CAST(start // 2 AS BIGINT) AS chunk_id,
        |        array_to_string(list_slice(t, start + 1, start + 2), ' ') AS chunk_text
        |      FROM (SELECT doc_id, t, unnest(range(0, len(t), 2)) AS start FROM toks)),
        |freq AS (SELECT chunk_text, count(DISTINCT doc_id) AS doc_freq
        |         FROM u GROUP BY chunk_text),
        |j AS (SELECT u.doc_id, u.chunk_id, u.chunk_text, f.doc_freq <= 50 AS keep
        |      FROM u JOIN freq f USING (chunk_text))
        |SELECT doc_id, count(*) AS n_units,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  COALESCE(array_to_string(
        |    list(chunk_text ORDER BY chunk_id) FILTER (WHERE keep), ' '), '')
        |    AS cleaned_text
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_pii_redact" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      text || ' reach user' || CAST(doc_id AS VARCHAR) || '@' || source
        |        || '.example.org from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |        || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        |        || ' card 4111111111111111'
        |    ELSE text END AS t0
        |  FROM documents),
        |e AS (SELECT doc_id,
        |        CAST(len(regexp_extract_all(t0, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |        regexp_replace(t0, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS t1
        |      FROM base),
        |i AS (SELECT doc_id, n_emails,
        |        CAST(len(regexp_extract_all(t1, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b')) AS BIGINT) AS n_ips,
        |        regexp_replace(t1, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b', '<IP>', 'g') AS t2
        |      FROM e)
        |SELECT doc_id, n_emails, n_ips,
        |  CAST(len(regexp_extract_all(t2, '[0-9]{13,}')) AS BIGINT) AS n_longnums,
        |  regexp_replace(t2, '[0-9]{13,}', '<NUM>', 'g') AS redacted_text
        |FROM i ORDER BY doc_id""".stripMargin,
    "q_sessionize" ->
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM lagged),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sess
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_stream_window_agg" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "q_discover_catalog" ->
      """SELECT table_name, CAST(ordinal AS BIGINT) AS ordinal, column_name, sql_type,
        |  json_type, format, inclusion, is_replication_key,
        |  CASE sql_type WHEN 'int' THEN CAST(-2147483648 AS BIGINT)
        |    WHEN 'bigint' THEN CAST(-9223372036854775807 AS BIGINT) - 1 END AS minimum,
        |  CASE sql_type WHEN 'int' THEN CAST(2147483647 AS BIGINT)
        |    WHEN 'bigint' THEN CAST(9223372036854775807 AS BIGINT) END AS maximum,
        |  CAST(NULL AS BIGINT) AS max_length,
        |  CASE WHEN table_name = 'v_active_customer' THEN true ELSE false END AS is_view
        |FROM (VALUES
        |  ('region', 1, 'r_regionkey', 'int', 'integer', '', 'automatic', false),
        |  ('region', 2, 'r_name', 'string', 'string', '', 'available', false),
        |  ('nation', 1, 'n_nationkey', 'int', 'integer', '', 'automatic', false),
        |  ('nation', 2, 'n_name', 'string', 'string', '', 'available', false),
        |  ('nation', 3, 'n_regionkey', 'int', 'integer', '', 'available', false),
        |  ('customer', 1, 'c_custkey', 'bigint', 'integer', '', 'automatic', false),
        |  ('customer', 2, 'c_name', 'string', 'string', '', 'available', false),
        |  ('customer', 3, 'c_nationkey', 'int', 'integer', '', 'available', false),
        |  ('customer', 4, 'c_acctbal', 'double', 'number', '', 'available', false),
        |  ('customer', 5, 'c_mktsegment', 'string', 'string', '', 'available', false),
        |  ('supplier', 1, 's_suppkey', 'bigint', 'integer', '', 'automatic', false),
        |  ('supplier', 2, 's_name', 'string', 'string', '', 'available', false),
        |  ('supplier', 3, 's_nationkey', 'int', 'integer', '', 'available', false),
        |  ('supplier', 4, 's_acctbal', 'double', 'number', '', 'available', false),
        |  ('part', 1, 'p_partkey', 'bigint', 'integer', '', 'automatic', false),
        |  ('part', 2, 'p_name', 'string', 'string', '', 'available', false),
        |  ('part', 3, 'p_brand', 'string', 'string', '', 'available', false),
        |  ('part', 4, 'p_type', 'string', 'string', '', 'available', false),
        |  ('part', 5, 'p_size', 'int', 'integer', '', 'available', false),
        |  ('part', 6, 'p_retailprice', 'double', 'number', '', 'available', false),
        |  ('orders', 1, 'o_orderkey', 'bigint', 'integer', '', 'automatic', false),
        |  ('orders', 2, 'o_custkey', 'bigint', 'integer', '', 'available', false),
        |  ('orders', 3, 'o_orderstatus', 'string', 'string', '', 'available', false),
        |  ('orders', 4, 'o_totalprice', 'double', 'number', '', 'available', false),
        |  ('orders', 5, 'o_orderdate', 'timestamp', 'string', 'date-time', 'available', true),
        |  ('orders', 6, 'o_orderpriority', 'string', 'string', '', 'available', false),
        |  ('lineitem', 1, 'l_orderkey', 'bigint', 'integer', '', 'automatic', false),
        |  ('lineitem', 2, 'l_partkey', 'bigint', 'integer', '', 'available', false),
        |  ('lineitem', 3, 'l_suppkey', 'bigint', 'integer', '', 'available', false),
        |  ('lineitem', 4, 'l_linenumber', 'int', 'integer', '', 'available', false),
        |  ('lineitem', 5, 'l_quantity', 'double', 'number', '', 'available', false),
        |  ('lineitem', 6, 'l_extendedprice', 'double', 'number', '', 'available', false),
        |  ('lineitem', 7, 'l_discount', 'double', 'number', '', 'available', false),
        |  ('lineitem', 8, 'l_tax', 'double', 'number', '', 'available', false),
        |  ('lineitem', 9, 'l_returnflag', 'string', 'string', '', 'available', false),
        |  ('lineitem', 10, 'l_linestatus', 'string', 'string', '', 'available', false),
        |  ('lineitem', 11, 'l_shipdate', 'timestamp', 'string', 'date-time', 'available', true),
        |  ('events', 1, 'event_id', 'bigint', 'integer', '', 'automatic', false),
        |  ('events', 2, 'ts', 'timestamp', 'string', 'date-time', 'available', true),
        |  ('events', 3, 'user_id', 'bigint', 'integer', '', 'available', false),
        |  ('events', 4, 'event_type', 'string', 'string', '', 'available', false),
        |  ('events', 5, 'value', 'double', 'number', '', 'available', false),
        |  ('events', 6, 'props', 'string', 'string', '', 'available', false),
        |  ('documents', 1, 'doc_id', 'bigint', 'integer', '', 'automatic', false),
        |  ('documents', 2, 'text', 'string', 'string', '', 'available', false),
        |  ('documents', 3, 'lang', 'string', 'string', '', 'available', false),
        |  ('documents', 4, 'source', 'string', 'string', '', 'available', false),
        |  ('documents', 5, 'n_chars', 'bigint', 'integer', '', 'available', false),
        |  ('embeddings', 1, 'vec_id', 'bigint', 'integer', '', 'automatic', false),
        |  ('embeddings', 2, 'embedding', 'array<float>', 'unsupported', '', 'unsupported', false),
        |  ('embeddings', 3, 'label', 'int', 'integer', '', 'available', false),
        |  ('v_active_customer', 1, 'c_custkey', 'bigint', 'integer', '', 'available', false),
        |  ('v_active_customer', 2, 'c_name', 'string', 'string', '', 'available', false),
        |  ('v_active_customer', 3, 'c_acctbal', 'double', 'number', '', 'available', false)
        |) AS t(table_name, ordinal, column_name, sql_type, json_type, format, inclusion, is_replication_key)
        |ORDER BY table_name, ordinal""".stripMargin,
    "q_select_columns" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_full_table_sync" ->
      """SELECT c_custkey AS "accountId", c_name AS account_name,
        |  c_nationkey AS nation_key, c_acctbal AS account_balance,
        |  c_mktsegment AS market_segment,
        |  'warehouse_account' AS stream, CAST(1 AS BIGINT) AS version
        |FROM customer ORDER BY "accountId"""".stripMargin,
    "q_incremental_sync" ->
      """SELECT o_orderkey AS "visitorId", o_custkey AS customer_key,
        |  o_orderstatus AS order_status, o_totalprice AS total_price,
        |  o_orderpriority AS order_priority
        |FROM orders
        |WHERE o_orderdate > TIMESTAMP '1998-01-01'
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0)
        |ORDER BY o_orderdate, o_orderkey
        |LIMIT 1000""".stripMargin,
    "q_uuid_filter" ->
      """SELECT c_custkey,
        |  substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) || '-' ||
        |  substr(md5(CAST(c_custkey AS VARCHAR)), 9, 4) || '-' ||
        |  substr(md5(CAST(c_custkey AS VARCHAR)), 13, 4) || '-' ||
        |  substr(md5(CAST(c_custkey AS VARCHAR)), 17, 4) || '-' ||
        |  substr(md5(CAST(c_custkey AS VARCHAR)), 21, 12) AS uuid
        |FROM customer
        |WHERE c_custkey % 7 <> 0
        |ORDER BY c_custkey""".stripMargin,
    "q_volume_counts" ->
      """SELECT * FROM (
        |  SELECT 'warehouse_account' AS stream, count(*) AS record_count FROM customer
        |  UNION ALL
        |  SELECT 'warehouse_visitor' AS stream, count(*) AS record_count FROM orders
        |) ORDER BY stream""".stripMargin,
    "q_bookmark_state" ->
      """SELECT * FROM (
        |  SELECT 'warehouse_visitor' AS stream, 'o_orderdate' AS replication_key,
        |    strftime(max(o_orderdate), '%Y-%m-%dT%H:%M:%S.%f') AS replication_key_value
        |  FROM orders
        |  UNION ALL
        |  SELECT 'warehouse_event' AS stream, 'ts' AS replication_key,
        |    strftime(max(ts), '%Y-%m-%dT%H:%M:%S.%f') AS replication_key_value
        |  FROM events
        |) ORDER BY stream""".stripMargin,
    "q_row_to_record" ->
      """SELECT to_json(struct_pack(
        |    type := 'RECORD',
        |    stream := 'warehouse_account',
        |    record := struct_pack(
        |      "accountId" := CAST(c_custkey AS VARCHAR),
        |      account_name := c_name,
        |      account_balance := printf('%.2f', c_acctbal)),
        |    version := CAST(1 AS BIGINT),
        |    time_extracted := '2026-01-01T00:00:00Z'))::VARCHAR AS message
        |FROM customer ORDER BY message""".stripMargin,
    "q_parse_messages" ->
      """SELECT 'warehouse_account' AS stream, CAST(1 AS BIGINT) AS version,
        |  CAST(c_custkey AS VARCHAR) AS "accountId", c_name AS account_name,
        |  printf('%.2f', c_acctbal) AS account_balance
        |FROM customer ORDER BY "accountId"""".stripMargin,
    "q_flatten" ->
      """SELECT event_id, user_id AS user__id, event_type AS user__kind__name, value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_field_mapping" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS "accountId", c_name AS account_name,
        |  c_nationkey AS nation_key, c_acctbal AS account_balance,
        |  c_mktsegment AS market_segment
        |FROM customer ORDER BY "accountId"""".stripMargin,
    "q_payload_shape" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS "accountId",
        |  to_json(struct_pack(
        |    "accountId" := CAST(c_custkey AS VARCHAR),
        |    "values" := struct_pack(
        |      account_name := c_name,
        |      nation_key := CAST(c_nationkey AS VARCHAR),
        |      account_balance := printf('%.2f', c_acctbal),
        |      market_segment := c_mktsegment)))::VARCHAR AS payload
        |FROM customer ORDER BY "accountId"""".stripMargin,
    "q_batch_assign" ->
      """WITH p AS (
        |  SELECT CAST(c_custkey AS VARCHAR) AS "accountId",
        |    to_json(struct_pack(
        |      "accountId" := CAST(c_custkey AS VARCHAR),
        |      "values" := struct_pack(
        |        account_name := c_name,
        |        nation_key := CAST(c_nationkey AS VARCHAR),
        |        account_balance := printf('%.2f', c_acctbal),
        |        market_segment := c_mktsegment)))::VARCHAR AS payload
        |  FROM customer),
        |b AS (
        |  SELECT payload,
        |    (row_number() OVER (ORDER BY "accountId") - 1) // 500 AS batch_id
        |  FROM p)
        |SELECT batch_id, count(*) AS n_records,
        |  CAST(sum(strlen(payload)) AS BIGINT) AS batch_bytes
        |FROM b GROUP BY batch_id ORDER BY batch_id""".stripMargin,
    "q_schema_validate" ->
      """SELECT * FROM (
        |  SELECT 'customer.c_custkey.not_null' AS check_name,
        |    (SELECT count(*) FROM customer WHERE c_custkey IS NULL) AS violations
        |  UNION ALL
        |  SELECT 'customer.c_acctbal.min_0',
        |    (SELECT count(*) FROM customer WHERE c_acctbal < 0)
        |  UNION ALL
        |  SELECT 'customer.c_name.max_length_25',
        |    (SELECT count(*) FROM customer WHERE length(c_name) > 25)
        |  UNION ALL
        |  SELECT 'orders.o_orderstatus.enum_OFP',
        |    (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
        |) ORDER BY check_name""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(props) AS content_hash, min(event_id) AS canonical_id,
        |  count(*) AS n_copies
        |FROM events GROUP BY 1 ORDER BY content_hash""".stripMargin,
    // span hash = fold of per-token polyhashes (same char fold as
    // q_fingerprint) with the same (·131 mod 2³¹−1) combiner — both
    // engines evaluate identical integer arithmetic; range(0, n-7) is
    // empty for docs under 8 tokens, matching Spark's guarded sequence
    "q_span_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |th AS (SELECT doc_id, len(toks) AS n,
        |        list_transform(toks, tk ->
        |          CASE WHEN length(tk) = 0 THEN 0 ELSE list_reduce(
        |            list_transform(range(1, length(tk) + 1),
        |                           i -> CAST(ascii(substr(tk, i, 1)) AS BIGINT)),
        |            (h, c) -> (h * 131 + c) % 2147483647) END) AS hs
        |       FROM t),
        |s0 AS (SELECT doc_id,
        |        unnest(list_transform(range(0, greatest(n - 7, 0)), pos ->
        |          {'pos': pos,
        |           'h': list_reduce(hs[pos + 1:pos + 8],
        |                            (a, x) -> (a * 131 + x) % 2147483647)})) AS sp
        |       FROM th),
        |s AS (SELECT doc_id, sp.pos AS pos, sp.h AS h FROM s0),
        |d AS (SELECT h FROM s GROUP BY h HAVING count(*) >= 2),
        |ds AS (SELECT s.doc_id, s.pos FROM s JOIN d USING (h)),
        |dp0 AS (SELECT doc_id, unnest(list_transform(range(0, 8), o -> pos + o)) AS p
        |        FROM ds),
        |dp AS (SELECT DISTINCT doc_id, p FROM dp0),
        |m AS (SELECT doc_id, count(*) AS n_dup_tokens FROM dp GROUP BY doc_id),
        |sp2 AS (SELECT doc_id, count(*) AS n_dup_spans FROM ds GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |  COALESCE(sp2.n_dup_spans, 0) AS n_dup_spans,
        |  COALESCE(m.n_dup_tokens, 0) AS n_dup_tokens,
        |  CAST(1000 * COALESCE(m.n_dup_tokens, 0) // len(t.toks) AS BIGINT)
        |    AS dup_frac_x1000
        |FROM t LEFT JOIN m USING (doc_id) LEFT JOIN sp2 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // same span stream; canonical = min packed (doc·2²⁴+pos); DuckDB's
    // array_to_string(NULL-on-empty) needs the COALESCE to match Spark's
    // array_join('' on empty); list_filter's index is 1-based vs Spark's 0
    "q_span_dedup_apply" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |th AS (SELECT doc_id, len(toks) AS n,
        |        list_transform(toks, tk ->
        |          CASE WHEN length(tk) = 0 THEN 0 ELSE list_reduce(
        |            list_transform(range(1, length(tk) + 1),
        |                           i -> CAST(ascii(substr(tk, i, 1)) AS BIGINT)),
        |            (h, c) -> (h * 131 + c) % 2147483647) END) AS hs
        |       FROM t),
        |s0 AS (SELECT doc_id,
        |        unnest(list_transform(range(0, greatest(n - 7, 0)), pos ->
        |          {'pos': pos,
        |           'h': list_reduce(hs[pos + 1:pos + 8],
        |                            (a, x) -> (a * 131 + x) % 2147483647)})) AS sp
        |       FROM th),
        |s AS (SELECT doc_id, sp.pos AS pos, sp.h AS h FROM s0),
        |occ AS (SELECT h, count(*) AS n_occ, min(doc_id * 16777216 + pos) AS canon
        |        FROM s GROUP BY h),
        |mk AS (SELECT s.doc_id, s.pos FROM s JOIN occ USING (h)
        |       WHERE occ.n_occ >= 2 AND s.doc_id * 16777216 + s.pos <> occ.canon),
        |mp0 AS (SELECT doc_id, unnest(list_transform(range(0, 8), o -> pos + o)) AS p
        |        FROM mk),
        |ml AS (SELECT doc_id, list(DISTINCT p) AS mask FROM mp0 GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |  CAST(len(t.toks) - COALESCE(len(ml.mask), 0) AS BIGINT) AS n_kept,
        |  COALESCE(array_to_string(list_filter(t.toks, (x, i) ->
        |    NOT list_contains(COALESCE(ml.mask, []), i - 1)), ' '), '') AS clean_text
        |FROM t LEFT JOIN ml USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // NOT EXISTS, not NOT IN: a NULL text in the corpus set would NULL
    // out a NOT IN entirely, while Spark's left_anti (null keys never
    // match) keeps the normal result
    "q_dedup_incremental" ->
      """SELECT n.doc_id FROM documents n
        |WHERE n.doc_id % 2 = 1
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents c
        |    WHERE c.doc_id % 2 = 0 AND md5(c.text) = md5(n.text))
        |ORDER BY n.doc_id""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_transform(range(1, len(string_split(text, ' '))), i ->
        |      string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]) AS grams
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) = 0 THEN 0
        |       ELSE (1000 * len(list_intersect(list_distinct(a.grams), list_distinct(b.grams))))
        |              // len(list_distinct(list_concat(a.grams, b.grams))) END AS jaccard_x1000
        |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    // D2 [R]→[O] (round 14): the banded MinHash plan's OUTPUT equals the
    // exact unigram-Jaccard pair set in the PINNED REGIME this face runs
    // (τ=0.7 with 16 bands × 4 lanes ⇒ per-pair miss ≤ (1−J⁴)¹⁶ ≈ 1.2%
    // at J=τ, and the sf0.01 slice's 482 pairs were verified EQUAL —
    // banding lost none); the verify stage makes precision exact and
    // scores are exact hashed-shingle Jaccard ≡ string-shingle Jaccard
    // (xxhash64 collisions absent at this scale). The oracle states the
    // exact set; a banding regression that drops ANY pair now fails the
    // gate instead of hiding in a rows-only count.
    "q_dedup_minhash" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents WHERE doc_id % 10 = 0),
        |j AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    (1000 * len(list_intersect(a.toks, b.toks)))
        |      // len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard_x1000
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id)
        |SELECT * FROM j WHERE jaccard_x1000 >= 700
        |ORDER BY id_a, id_b""".stripMargin,
    // D2c: D2's pair set collapsed to the per-doc deployment verdict —
    // recursive transitive closure over the SAME pinned-regime exact
    // pair statement (banded ≡ exact at the gate scale, the r14 D2
    // promotion), singletons self-cluster, canonical = min member.
    // NULL-text docs have NULL Jaccard to everything (never pair) and
    // stay their own singletons on both sides.
    "q_dedup_minhash_apply" ->
      """WITH RECURSIVE dd AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |d AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM dd),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id
        |  WHERE (1000 * len(list_intersect(a.toks, b.toks)))
        |      // len(list_distinct(list_concat(a.toks, b.toks))) >= 700),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
        |cl AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT dd.doc_id,
        |  coalesce(cl.cluster_id, dd.doc_id) AS cluster_id,
        |  (dd.doc_id = coalesce(cl.cluster_id, dd.doc_id)) AS kept
        |FROM dd LEFT JOIN cl ON cl.id = dd.doc_id
        |ORDER BY dd.doc_id""".stripMargin,
    // D11 [R]→[O] (round 14): same pinned-regime promotion as D2 for the
    // cross-corpus join — τ=0.5 word-trigram Jaccard across odd (new) ×
    // even (corpus) ids; the banded A⋈B candidates were verified to
    // contain every exact pair at sf0.01 (12/12, scores equal).
    // H13 [R]→[O] (round 14): the regime-bounded KMV promotion (the
    // C33b/C69b precedent) — distinct content (≤ corpus size) and langs
    // both sit UNDER the k=1024 sketch capacity at the gate scale, where
    // the KMV estimate IS the exact distinct count and the exact-merge
    // property makes standing+increment ≡ one full-corpus state; every
    // other field is plainly mergeable arithmetic.
    "q_corpus_report_incremental" ->
      """WITH per AS (
        |  SELECT lang,
        |    CASE WHEN text IS NOT NULL
        |         THEN CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) END AS toks,
        |    CASE WHEN text IS NOT NULL THEN md5(text) END AS h
        |  FROM documents),
        |s AS (SELECT count(*) AS n_docs, count(h) AS n_text_docs,
        |    coalesce(sum(toks), 0) AS total_tokens,
        |    coalesce(min(toks), 9223372036854775807) AS min_tokens,
        |    coalesce(max(toks), -9223372036854775808) AS max_tokens,
        |    count(DISTINCT h) AS distinct_content_est,
        |    count(DISTINCT lang) AS distinct_lang_est
        |  FROM per)
        |SELECT metric, CAST(value AS BIGINT) AS value FROM (
        |  SELECT 'n_docs' AS metric, n_docs AS value FROM s
        |  UNION ALL SELECT 'n_text_docs', n_text_docs FROM s
        |  UNION ALL SELECT 'total_tokens', total_tokens FROM s
        |  UNION ALL SELECT 'min_tokens', min_tokens FROM s
        |  UNION ALL SELECT 'max_tokens', max_tokens FROM s
        |  UNION ALL SELECT 'distinct_content_est', distinct_content_est FROM s
        |  UNION ALL SELECT 'distinct_lang_est', distinct_lang_est FROM s) t
        |ORDER BY metric""".stripMargin,
    // F22 [R]→[O] (round 14): the TRAINING LOOP replays — the pinned
    // merges provide only the prefix sequence; each rank's winning pair
    // (max corpus-weighted count, (left, right)-ascending ties) is
    // recomputed from the corpus after applying merges 0..rank−1, so a
    // trainer drift fails the gate. 40 encode passes over the ≤50k-type
    // histogram — vocabulary-bounded, never corpus-sized.
    "q_bpe_train" -> s"""
        |WITH m AS (SELECT list(["left", "right"] ORDER BY rank) AS ms
        |           FROM read_parquet('${artifactGlob("bpe_m40_t50000")}')),
        |h AS (SELECT word, count(*) AS n FROM (
        |        SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |        WHERE text IS NOT NULL) t
        |      WHERE word <> '' GROUP BY word
        |      ORDER BY n DESC, word LIMIT 50000),
        |mr AS (SELECT r0.r AS r, m.ms[1:CAST(r0.r AS INTEGER)] AS ms
        |       FROM m, range(0, 40) r0(r)),
        |enc AS (SELECT m.r, h.word, h.n, $bpeApplySql AS sym
        |  FROM h, mr m),
        |pairs0 AS (SELECT r, n,
        |  unnest(list_transform(range(1, len(sym)), i -> {'l': sym[i], 'rr': sym[i+1]})) AS pr
        |  FROM enc),
        |pairs AS (SELECT r, pr.l AS l, pr.rr AS rr, CAST(sum(n) AS BIGINT) AS cnt
        |          FROM pairs0 GROUP BY 1, 2, 3)
        |SELECT r AS rank, l AS "left", rr AS "right", cnt AS count FROM (
        |  SELECT *, row_number() OVER (PARTITION BY r ORDER BY cnt DESC, l, rr) AS rn
        |  FROM pairs) z
        |WHERE rn = 1 ORDER BY rank""".stripMargin,
    // F22b [R]→[O] (round 14): segmentation replays the pinned merge
    // chain per vocabulary type (see bpeApplySql).
    "q_bpe_encode" -> s"""
        |WITH m AS (SELECT list(["left", "right"] ORDER BY rank) AS ms
        |           FROM read_parquet('${artifactGlob("bpe_m40_t50000")}')),
        |h AS (SELECT word, count(*) AS n FROM (
        |        SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |        WHERE text IS NOT NULL) t
        |      WHERE word <> '' GROUP BY word
        |      ORDER BY n DESC, word LIMIT 50000)
        |SELECT word, n, array_to_string($bpeApplySql, ' ') AS subwords
        |FROM h, m ORDER BY word""".stripMargin,
    // F22c [R]→[O] (round 14): fertility composes the replayed merge
    // chain with integer mass-weighted roll-ups.
    "q_bpe_fertility" -> s"""
        |WITH m AS (SELECT list(["left", "right"] ORDER BY rank) AS ms
        |           FROM read_parquet('${artifactGlob("bpe_m40_t50000")}')),
        |lw AS (SELECT lang, word, count(*) AS n FROM (
        |        SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
        |        WHERE text IS NOT NULL) t
        |      WHERE length(word) > 0 GROUP BY lang, word),
        |p AS (SELECT lang, n, len($bpeApplySql)::BIGINT AS pieces FROM lw, m),
        |r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_words,
        |        CAST(sum(n * pieces) AS BIGINT) AS n_pieces
        |      FROM p GROUP BY lang)
        |SELECT lang, n_words, n_pieces, (n_pieces * 1000) // n_words AS fertility_x1000
        |FROM r ORDER BY lang""".stripMargin,
    // D3 [R]→[O] (round 14): the 3-of-6 block pigeonhole is candidate-
    // COMPLETE for hamming ≤ 3, so the face's output is exactly the
    // ≤3-hamming pair set of the PINNED signature artifact — restated
    // here as bit_count(xor) over the same parquet. Signature
    // computation is spec-pinned (SimHashSpec).
    "q_dedup_simhash" -> s"""
        |WITH s AS (SELECT doc_id, simhash
        |           FROM read_parquet('${artifactGlob("simhash_sigs_w1")}'))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // D3b: D3's pair set collapsed to the per-doc deployment verdict —
    // recursive transitive closure over the replayed ≤3-hamming pairs of
    // the SAME pinned signatures (the q_dedup_apply_lsh shape);
    // singletons cluster to themselves, canonical = min member.
    "q_dedup_simhash_apply" -> s"""
        |WITH RECURSIVE s AS (SELECT doc_id, simhash
        |           FROM read_parquet('${artifactGlob("simhash_sigs_w1")}')),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
        |cl AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT s.doc_id,
        |  coalesce(cl.cluster_id, s.doc_id) AS cluster_id,
        |  (s.doc_id = coalesce(cl.cluster_id, s.doc_id)) AS kept
        |FROM s LEFT JOIN cl ON cl.id = s.doc_id
        |ORDER BY doc_id""".stripMargin,
    // D2-fast [R]→[O] (round 14): decisions are the pinned-regime exact
    // pair set (as q_dedup_minhash); scores replay the fast path's
    // published contract from the PINNED signatures — lane-agreement
    // estimate when est clears τ+margin (700+230 at k=64, z=4), exact
    // Jaccard inside the uncertainty band.
    "q_dedup_minhash_fast" -> s"""
        |WITH s AS (SELECT doc_id, sig
        |           FROM read_parquet('${artifactGlob("minhash_sigs_w1_k64_m10")}')),
        |d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |      FROM documents WHERE doc_id % 10 = 0),
        |j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |        (1000 * len(list_intersect(a.toks, b.toks)))
        |          // len(list_distinct(list_concat(a.toks, b.toks))) AS exact
        |      FROM d a JOIN d b ON a.doc_id < b.doc_id),
        |e AS (SELECT j.id_a, j.id_b, j.exact,
        |        (len(list_filter(range(1,65), i -> sa.sig[i] = sb.sig[i])) * 1000) // 64 AS est
        |      FROM j JOIN s sa ON sa.doc_id = j.id_a JOIN s sb ON sb.doc_id = j.id_b)
        |SELECT id_a, id_b,
        |  CAST(CASE WHEN est >= 930 THEN est ELSE exact END AS BIGINT) AS jaccard_x1000
        |FROM e WHERE exact >= 700 ORDER BY id_a, id_b""".stripMargin,
    // D15 [R]→[O] (round 14): the banded candidate PAIRS pin (band hashes
    // have no SQL replay); the per-pair estimate (lane agreement over the
    // pinned signatures), the exact Jaccard lane, and the decile rollup
    // all replay live.
    "q_sketch_calibration" -> s"""
        |WITH s AS (SELECT doc_id, sig
        |           FROM read_parquet('${artifactGlob("minhash_sigs_w1_k64_m10")}')),
        |c AS (SELECT id_a, id_b
        |      FROM read_parquet('${artifactGlob("minhash_cands_w1_k64_b16_m10")}')),
        |d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |      FROM documents WHERE doc_id % 10 = 0),
        |pp AS (SELECT
        |        (len(list_filter(range(1,65), i -> sa.sig[i] = sb.sig[i])) * 1000) // 64 AS est,
        |        (1000 * len(list_intersect(da.toks, db.toks)))
        |          // len(list_distinct(list_concat(da.toks, db.toks))) AS exact
        |      FROM c JOIN s sa ON sa.doc_id = c.id_a JOIN s sb ON sb.doc_id = c.id_b
        |        JOIN d da ON da.doc_id = c.id_a JOIN d db ON db.doc_id = c.id_b)
        |SELECT CAST(least(exact // 100, 9) AS INTEGER) AS exact_decile,
        |  count(*) AS n_pairs,
        |  CAST(sum(est) // count(*) AS BIGINT) AS mean_est_x1000,
        |  CAST(sum(exact) // count(*) AS BIGINT) AS mean_exact_x1000,
        |  CAST(sum(abs(est - exact)) // count(*) AS BIGINT) AS mean_abs_err_x1000,
        |  CAST(max(abs(est - exact)) AS BIGINT) AS max_abs_err_x1000
        |FROM pp GROUP BY 1 ORDER BY exact_decile""".stripMargin,
    "q_dedup_cross" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1), i ->
        |      string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
        |      string_split(text,' ')[i+2])) AS grams
        |  FROM documents),
        |j AS (
        |  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
        |    (1000 * len(list_intersect(a.grams, b.grams)))
        |      // len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard_x1000
        |  FROM d a JOIN d b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0)
        |SELECT * FROM j WHERE jaccard_x1000 >= 500
        |ORDER BY new_id, corpus_id""".stripMargin,
    "q_embedding_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
        |ORDER BY id_a, id_b""".stripMargin,
    // D5b: FULL replay of the LSH plan — lshBucketCte reproduces every
    // bucket bit-exactly, and single-bit multi-probing (probeBits=1)
    // admits exactly the hamming<=1 bucket pairs; τ-verify is the same
    // cosine as the exact face. No over-cap bucket exists at sf0.01
    // (500 vectors << maxBucketSize), so the star/bridge degrades are
    // provably inactive here (they're spec-covered in AnnSpec).
    "q_embedding_neardup_lsh" -> (lshBucketCte +
      """
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM bkt a JOIN bkt b ON a.vec_id < b.vec_id
        |  AND bit_count(xor(a.b::UBIGINT, b.b::UBIGINT)) <= 1
        |JOIN emb ea ON ea.vec_id = a.vec_id
        |JOIN emb eb ON eb.vec_id = b.vec_id
        |WHERE list_cosine_similarity(ea.v, eb.v) > 0.35
        |ORDER BY id_a, id_b""".stripMargin),
    // D6c: q_dedup_apply's recursive transitive closure over the REPLAYED
    // LSH pair set (bit-exact buckets from lshBucketCte) — the keep set
    // is now oracle-checked end to end, not just proven a superset.
    "q_dedup_apply_lsh" -> (lshBucketCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bkt a JOIN bkt b ON a.vec_id < b.vec_id
        |    AND bit_count(xor(a.b::UBIGINT, b.b::UBIGINT)) <= 1
        |  JOIN emb ea ON ea.vec_id = a.vec_id
        |  JOIN emb eb ON eb.vec_id = b.vec_id
        |  WHERE list_cosine_similarity(ea.v, eb.v) > 0.35),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
        |losers AS (
        |  SELECT id FROM (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
        |  WHERE id <> cluster_id)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM losers)
        |ORDER BY vec_id""".stripMargin),
    // E7b: hard negatives over the replayed buckets — probeBits=1
    // candidates (hamming<=1), label disqualifier on the join, exact
    // cosine top-3 with the row_number tiebreak of the exact E7 oracle.
    "q_hard_negatives_lsh" -> (lshBucketCte +
      """,
        |q AS (SELECT e.vec_id AS query_id, e.v AS qvec, x.label AS qlabel, b.b AS qb
        |      FROM emb e JOIN embeddings x ON x.vec_id = e.vec_id
        |      JOIN bkt b ON b.vec_id = e.vec_id
        |      WHERE e.vec_id % 50 = 0)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qvec, e.v) DESC, e.vec_id) AS "rank"
        |  FROM q JOIN emb e ON e.vec_id <> q.query_id
        |  JOIN embeddings x ON x.vec_id = e.vec_id AND x.label <> q.qlabel
        |  JOIN bkt nb ON nb.vec_id = e.vec_id
        |  WHERE bit_count(xor(q.qb::UBIGINT, nb.b::UBIGINT)) <= 1) t
        |WHERE "rank" <= 3 ORDER BY query_id, "rank"""".stripMargin),
    // E3 [R]→[O] (round 14): the k-means fit pins as the centroid
    // artifact (it already persisted — the train-once contract); cell
    // assignment, nprobe=4 probe selection and the exact-cosine top-10
    // all replay from it.
    "q_ann_ivf" -> (ivfAssignCte +
      """,
        |q AS (SELECT vec_id AS query_id, v AS qvec FROM emb WHERE vec_id % 50 = 0),
        |pc AS (SELECT query_id, cell_id FROM (
        |        SELECT q.query_id, c.cell_id,
        |          row_number() OVER (PARTITION BY q.query_id
        |            ORDER BY list_cosine_similarity(q.qvec, c.centroid) DESC, c.cell_id) AS rn
        |        FROM q, cent c) WHERE rn <= 4)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT q.query_id, a.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qvec, a.v) DESC, a.vec_id) AS "rank"
        |  FROM q JOIN pc ON pc.query_id = q.query_id
        |  JOIN asg a ON a.cell_id = pc.cell_id AND a.vec_id <> q.query_id) t
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin),
    // D13 [R]→[O] (round 14): SemDeDup over the same pinned quantizer —
    // within-cell τ-pairs drop the higher id; assignment and pair logic
    // replay entirely.
    "q_semdedup" -> (ivfAssignCte +
      """,
        |dropped AS (SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
        |  ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.35)
        |SELECT asg.vec_id, asg.cell_id,
        |  asg.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
        |FROM asg ORDER BY vec_id""".stripMargin),
    // E9b [R]→[O] (round 14): the indexed fusion differs from E9 only
    // in the sparse leg's candidate generation — the inverted index
    // admits exactly the pairs with quantized Jaccard > 0, so the
    // oracle is E9's statement with that predicate on the sparse leg
    // (posting-join mechanics are candidate-complete for J > 0 by
    // construction: sharing a token is necessary for a positive score).
    "q_rank_fusion_indexed" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |dense AS (
        |  SELECT query_id, neighbor_id, r FROM (
        |    SELECT q.query_id, e.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.qvec, e.embedding::DOUBLE[]) DESC,
        |                 e.vec_id) AS r
        |    FROM q JOIN embeddings e ON e.vec_id <> q.query_id) t
        |  WHERE r <= 20),
        |toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
        |         FROM documents WHERE text IS NOT NULL),
        |qt AS (SELECT doc_id AS query_id, t AS qtok FROM toks WHERE doc_id % 50 = 0),
        |sparse AS (
        |  SELECT query_id, neighbor_id, r FROM (
        |    SELECT qt.query_id, d.doc_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY qt.query_id
        |        ORDER BY (1000 * len(list_intersect(qt.qtok, d.t)))
        |                   // len(list_distinct(qt.qtok || d.t)) DESC,
        |                 d.doc_id) AS r
        |    FROM qt JOIN toks d ON d.doc_id <> qt.query_id
        |    WHERE (1000 * len(list_intersect(qt.qtok, d.t)))
        |            // len(list_distinct(qt.qtok || d.t)) > 0) t
        |  WHERE r <= 20),
        |fused AS (
        |  SELECT coalesce(d.query_id, s.query_id) AS query_id,
        |    coalesce(d.neighbor_id, s.neighbor_id) AS doc_id,
        |    CAST(coalesce(1000000000 // (60 + d.r), 0)
        |       + coalesce(1000000000 // (60 + s.r), 0) AS BIGINT) AS rrf_ppb,
        |    CAST(coalesce(d.r, 0) AS BIGINT) AS dense_rank,
        |    CAST(coalesce(s.r, 0) AS BIGINT) AS sparse_rank
        |  FROM dense d FULL OUTER JOIN sparse s
        |    ON d.query_id = s.query_id AND d.neighbor_id = s.neighbor_id)
        |SELECT query_id, doc_id, rrf_ppb, dense_rank, sparse_rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_ppb DESC, doc_id) AS fr FROM fused) z
        |WHERE fr <= 10 ORDER BY query_id, doc_id""".stripMargin,
    // E23 [R]→[O] (round 14): the unit-geometry PCA fit pins
    // (pca_unit_d64); normalization, projection (with the driver-side
    // per-component offsets), stage-1 `2·q·x − ‖x‖²` ranking and the
    // exact-cosine rescore all replay. The sampled admission cutoff is
    // result-neutral by design and verified so on the gated corpus —
    // the oracle states the no-cutoff plan.
    "q_ann_pca" -> s"""
        |WITH art AS (SELECT idx, vec FROM read_parquet('${artifactGlob("pca_unit_d64")}')),
        |mu AS (SELECT vec AS mv FROM art WHERE idx = 0),
        |comps AS (SELECT idx, vec AS w FROM art WHERE idx BETWEEN 1 AND 16),
        |offs AS (SELECT c.idx,
        |          list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |            i -> c.w[i] * mu.mv[i])), (a, b) -> a + b) AS off
        |         FROM comps c, mu),
        |e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_reduce(list_prepend(0.0, list_transform(v, x -> x * x)),
        |          (a, b) -> a + b)) AS nrm
        |      FROM e0),
        |u AS (SELECT vec_id, v, list_transform(v, x -> x / nrm) AS nv
        |      FROM n WHERE nrm > 0),
        |pv AS (SELECT u.vec_id, c.idx,
        |        list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |          i -> u.nv[i] * c.w[i])), (a, b) -> a + b) - o.off AS coord
        |       FROM u, comps c JOIN offs o ON o.idx = c.idx),
        |pvec AS (SELECT vec_id, list(coord ORDER BY idx) AS pv FROM pv GROUP BY vec_id),
        |pn AS (SELECT vec_id, pv,
        |        list_reduce(list_prepend(0.0, list_transform(pv, x -> x * x)),
        |          (a, b) -> a + b) AS pnorm2
        |       FROM pvec),
        |q AS (SELECT u.vec_id AS query_id, u.v AS qvec, pn.pv AS qp
        |      FROM u JOIN pn ON pn.vec_id = u.vec_id WHERE u.vec_id % 50 = 0),
        |s1 AS (SELECT q.query_id, c.vec_id AS neighbor_id,
        |        list_reduce(list_prepend(0.0, list_transform(range(1, 17),
        |          i -> c.pv[i] * q.qp[i])), (a, b) -> a + b) * 2.0 - c.pnorm2 AS sim
        |       FROM q JOIN pn c ON c.vec_id <> q.query_id),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |          SELECT query_id, neighbor_id,
        |            row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |          FROM s1) WHERE rn <= 200)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT c.query_id, c.neighbor_id,
        |    row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY list_cosine_similarity(q.qvec, e.v) DESC, c.neighbor_id) AS "rank"
        |  FROM cand c JOIN q ON q.query_id = c.query_id
        |  JOIN e0 e ON e.vec_id = c.neighbor_id) t
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,
    // E11 [R]→[O] (round 14): recall report composes the exact and the
    // (now fully replayed) IVF legs — overlap counts and the integer
    // recall lane replay end to end.
    "q_ann_recall" -> (ivfAssignCte + """,
        |q AS (SELECT vec_id AS query_id, v AS qvec FROM emb WHERE vec_id % 50 = 0),
        |exact AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qvec, e.v) DESC, e.vec_id) AS rn
        |  FROM q JOIN emb e ON e.vec_id <> q.query_id) t WHERE rn <= 10),
        |pc AS (SELECT query_id, cell_id FROM (
        |        SELECT q.query_id, c.cell_id,
        |          row_number() OVER (PARTITION BY q.query_id
        |            ORDER BY list_cosine_similarity(q.qvec, c.centroid) DESC, c.cell_id) AS rn
        |        FROM q, cent c) WHERE rn <= 4),
        |approx AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.query_id, a.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qvec, a.v) DESC, a.vec_id) AS rn
        |  FROM q JOIN pc ON pc.query_id = q.query_id
        |  JOIN asg a ON a.cell_id = pc.cell_id AND a.vec_id <> q.query_id) t
        |  WHERE rn <= 10),
        |ov AS (SELECT e.query_id, count(*) AS n_overlap
        |       FROM exact e JOIN approx a
        |         ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
        |       GROUP BY e.query_id),
        |ne AS (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY query_id)
        |SELECT ne.query_id, ne.n_exact,
        |  coalesce(ov.n_overlap, 0) AS n_overlap,
        |  (coalesce(ov.n_overlap, 0) * 100) // ne.n_exact AS recall_x100
        |FROM ne LEFT JOIN ov USING (query_id)
        |ORDER BY query_id""".stripMargin),
    // E8 [R]→[O] (round 14): ADC top-10 replayed from the pinned
    // codebooks — encode, dist table and the j-ordered ADC fold all
    // replay; rank ties (−dist desc, id asc) state as (dist asc, id).
    "q_pq_topk" -> (pqCodesCte + """,
        |adc AS (SELECT s.query_id, s.neighbor_id,
        |          list_reduce(list_prepend(0.0, list(s.d2 ORDER BY s.j)), (a, b) -> a + b) AS dist
        |        FROM (SELECT q.query_id, co.vec_id AS neighbor_id, qs.j, qs.d2
        |              FROM q JOIN sub qs ON qs.vec_id = q.query_id
        |              JOIN codes co ON co.j = qs.j AND co.c = qs.c
        |              WHERE co.vec_id <> q.query_id) s
        |        GROUP BY s.query_id, s.neighbor_id)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS "rank"
        |  FROM adc) t
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin),
    // E25 [R]→[O] (round 14): the PQ cascade — stage 1 is the ADC
    // top-200 (the sampled admission cutoff is result-neutral by design
    // and verified so on the gated corpus: the oracle states the
    // no-cutoff plan), stage 2 the exact-cosine re-rank of those
    // candidates only.
    "q_pq_cascade" -> (pqCodesCte + """,
        |adc AS (SELECT s.query_id, s.neighbor_id,
        |          list_reduce(list_prepend(0.0, list(s.d2 ORDER BY s.j)), (a, b) -> a + b) AS dist
        |        FROM (SELECT q.query_id, co.vec_id AS neighbor_id, qs.j, qs.d2
        |              FROM q JOIN sub qs ON qs.vec_id = q.query_id
        |              JOIN codes co ON co.j = qs.j AND co.c = qs.c
        |              WHERE co.vec_id <> q.query_id) s
        |        GROUP BY s.query_id, s.neighbor_id),
        |cand AS (SELECT query_id, neighbor_id FROM (
        |          SELECT query_id, neighbor_id,
        |            row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rn
        |          FROM adc) WHERE rn <= 200)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT c.query_id, c.neighbor_id,
        |    row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY list_cosine_similarity(q.qvec, e.v) DESC, c.neighbor_id) AS "rank"
        |  FROM cand c JOIN q ON q.query_id = c.query_id
        |  JOIN emb e ON e.vec_id = c.neighbor_id) t
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin),
    // E8b [R]→[O] (round 14): IVF-PQ — both pinned artifacts compose
    // (centroid assignment prunes to nprobe=4 cells, ADC scores the
    // survivors); the full plan replays.
    "q_pq_ivf" -> (s"""
        |WITH cent AS (SELECT cell_id, centroid
        |              FROM read_parquet('${artifactGlob("ivf_c16_s42")}')),
        |cb AS (SELECT flat FROM read_parquet('${artifactGlob("pq_m8_k32_s42")}')),
        |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |d2c AS (SELECT e.vec_id, e.v, c.cell_id,
        |        list_reduce(list_prepend(0.0, list_transform(range(1, len(e.v)+1),
        |          i -> (e.v[i] - c.centroid[i]) * (e.v[i] - c.centroid[i]))),
        |          (a, b) -> a + b) AS dist2
        |       FROM emb e, cent c),
        |asg AS (SELECT vec_id, v, cell_id FROM (
        |          SELECT *, row_number() OVER (PARTITION BY vec_id
        |            ORDER BY dist2, cell_id) AS rn FROM d2c) WHERE rn = 1),
        |sub AS (SELECT e.vec_id, j.j, c.c,
        |        list_reduce(list_prepend(0.0, list_transform(range(1, 9),
        |          d -> (e.v[CAST(j.j*8 + d AS INTEGER)] - cb.flat[CAST((j.j*32 + c.c)*8 + d AS INTEGER)])
        |             * (e.v[CAST(j.j*8 + d AS INTEGER)] - cb.flat[CAST((j.j*32 + c.c)*8 + d AS INTEGER)]))),
        |          (a, b) -> a + b) AS d2
        |        FROM emb e, cb, range(0, 8) j(j), range(0, 32) c(c)),
        |codes AS (SELECT vec_id, j, c FROM (
        |           SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
        |           FROM sub) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, v AS qvec FROM emb WHERE vec_id % 50 = 0),
        |pc AS (SELECT query_id, cell_id FROM (
        |        SELECT q.query_id, c.cell_id,
        |          row_number() OVER (PARTITION BY q.query_id
        |            ORDER BY list_cosine_similarity(q.qvec, c.centroid) DESC, c.cell_id) AS rn
        |        FROM q, cent c) WHERE rn <= 4),
        |adc AS (SELECT s.query_id, s.neighbor_id,
        |          list_reduce(list_prepend(0.0, list(s.d2 ORDER BY s.j)), (a, b) -> a + b) AS dist
        |        FROM (SELECT pc.query_id, a.vec_id AS neighbor_id, qs.j, qs.d2
        |              FROM pc JOIN asg a ON a.cell_id = pc.cell_id
        |              JOIN sub qs ON qs.vec_id = pc.query_id
        |              JOIN codes co ON co.vec_id = a.vec_id AND co.j = qs.j AND co.c = qs.c
        |              WHERE a.vec_id <> pc.query_id) s
        |        GROUP BY s.query_id, s.neighbor_id)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS "rank"
        |  FROM adc) t
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin),
    // E2: LSH top-10 over the replayed buckets — probeBits=2 candidates
    // (hamming<=2), exact cosine ranking inside the candidate set.
    "q_ann_lsh" -> (lshBucketCte +
      """,
        |q AS (SELECT e.vec_id AS query_id, e.v AS qvec, b.b AS qb
        |      FROM emb e JOIN bkt b ON b.vec_id = e.vec_id
        |      WHERE e.vec_id % 50 = 0)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qvec, e.v) DESC, e.vec_id) AS "rank"
        |  FROM q JOIN emb e ON e.vec_id <> q.query_id
        |  JOIN bkt nb ON nb.vec_id = e.vec_id
        |  WHERE bit_count(xor(q.qb::UBIGINT, nb.b::UBIGINT)) <= 2) t
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin),
    // connected components as a recursive transitive closure: reach(id, r)
    // accumulates every vertex r reachable from id (UNION dedups → the
    // fixpoint terminates); the min reachable vertex is the cluster id —
    // identical semantics to the Spark min-label propagation
    "q_dedup_clusters" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id)
        |SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
        |ORDER BY id, cluster_id""".stripMargin,
    "q_dedup_apply" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
        |losers AS (
        |  SELECT id FROM (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
        |  WHERE id <> cluster_id)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM losers)
        |ORDER BY vec_id""".stripMargin,
    // E22 [R]→[O] (round 14): spectrum from the PINNED PCA model — the
    // eigen fit (driver Jacobi) pins; the ppm shares and the sequential
    // cumulative sum replay (prefix list_reduce ≡ the driver's
    // left-to-right fold).
    "q_pca" -> s"""
        |WITH m AS (SELECT idx, eigenvalue
        |           FROM read_parquet('${artifactGlob("pca_raw_d64")}') WHERE idx >= 1),
        |l AS (SELECT list(eigenvalue ORDER BY idx) AS evs FROM m),
        |t AS (SELECT evs, list_reduce(list_prepend(0.0, evs), (a, b) -> a + b) AS tot FROM l)
        |SELECT i AS component,
        |  CAST(floor(evs[CAST(i AS INTEGER)] / tot * 1e6) AS BIGINT) AS var_ppm,
        |  CAST(floor(list_reduce(list_prepend(0.0, evs[1:CAST(i AS INTEGER)]),
        |    (a, b) -> a + b) / tot * 1e6) AS BIGINT) AS cum_var_ppm
        |FROM t, range(1, 17) r(i) ORDER BY component""".stripMargin,
    // E22b [R]→[O] (round 14): projection replay from the pinned mean +
    // top-2 component rows, centered dots in the same fold order.
    "q_pca_project" -> s"""
        |WITH a AS (SELECT idx, vec FROM read_parquet('${artifactGlob("pca_raw_d64")}')),
        |mu AS (SELECT vec AS mv FROM a WHERE idx = 0),
        |w1 AS (SELECT vec AS wv1 FROM a WHERE idx = 1),
        |w2 AS (SELECT vec AS wv2 FROM a WHERE idx = 2),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |      WHERE embedding IS NOT NULL)
        |SELECT vec_id,
        |  CAST(floor(list_reduce(list_prepend(0.0, list_transform(range(1, len(v)+1),
        |    i -> (v[i] - mv[i]) * wv1[i])), (acc, x) -> acc + x) * 1000) AS BIGINT) AS pc1_x1000,
        |  CAST(floor(list_reduce(list_prepend(0.0, list_transform(range(1, len(v)+1),
        |    i -> (v[i] - mv[i]) * wv2[i])), (acc, x) -> acc + x) * 1000) AS BIGINT) AS pc2_x1000
        |FROM e, mu, w1, w2 ORDER BY vec_id""".stripMargin,
    // C30 [R]→[O] (round 14): the per-side stats are PINNED catalog
    // artifacts (the ANALYZE shape); the oracle replays the estimator
    // from the stored sketches — (k−1)/θ, the theta-intersection rule,
    // the uniform-multiplicity model — in the same double arithmetic.
    "q_join_estimate" -> s"""
        |WITH a AS (SELECT n AS n_a, sk AS sk_a
        |           FROM read_parquet('${artifactGlob("kmv_orders_okey_k8192")}')),
        |b AS (SELECT n AS n_b, sk AS sk_b
        |      FROM read_parquet('${artifactGlob("kmv_lineitem_okey_k8192")}')),
        |s AS (SELECT n_a, n_b, sk_a, sk_b,
        |        list_sort(list_distinct(list_concat(sk_a, sk_b))) AS u FROM a, b),
        |t AS (SELECT *, u[1:8192] AS uk,
        |        CASE WHEN len(sk_a) < 8192 THEN len(sk_a)::DOUBLE
        |             ELSE 8191.0 / (sk_a[8192]::DOUBLE / 1.8446744073709552e19 + 0.5) END AS da,
        |        CASE WHEN len(sk_b) < 8192 THEN len(sk_b)::DOUBLE
        |             ELSE 8191.0 / (sk_b[8192]::DOUBLE / 1.8446744073709552e19 + 0.5) END AS db
        |      FROM s),
        |w AS (SELECT *,
        |        CASE WHEN len(u) < 8192 THEN len(u)::DOUBLE
        |             WHEN len(uk) < 8192 THEN len(uk)::DOUBLE
        |             ELSE 8191.0 / (uk[8192]::DOUBLE / 1.8446744073709552e19 + 0.5) END AS du,
        |        CASE WHEN len(uk) = 0 THEN 0.0
        |             ELSE len(list_intersect(uk, list_intersect(sk_a, sk_b)))::DOUBLE / len(uk) END AS ifrac
        |      FROM t)
        |SELECT n_a, n_b,
        |  CAST(round(da) AS BIGINT) AS est_distinct_a,
        |  CAST(round(db) AS BIGINT) AS est_distinct_b,
        |  CAST(round(ifrac * du) AS BIGINT) AS est_common_keys,
        |  CAST(round(ifrac * du * (n_a::DOUBLE / da) * (n_b::DOUBLE / db)) AS BIGINT) AS est_join_rows
        |FROM w""".stripMargin,
    // C30b [R]→[O] (round 14): same pinned stats plus the Misra–Gries
    // heavy-hitter map — the both-sides-over-noise-floor filter, exact
    // hh products, and the residual uniform model all replay (integer
    // counts < 2⁵³ make the double folds order-exact).
    "q_join_estimate_skew" -> s"""
        |WITH st AS (SELECT n, sk, hh
        |            FROM read_parquet('${artifactGlob("kmvhh_events_user_k8192_h256")}')),
        |s AS (SELECT a.n AS n_a, a.sk AS sk_a, a.hh AS hh_a,
        |             b.n AS n_b, b.sk AS sk_b, b.hh AS hh_b,
        |        list_sort(list_distinct(list_concat(a.sk, b.sk))) AS u
        |      FROM st a, st b),
        |t AS (SELECT *, u[1:8192] AS uk,
        |        CASE WHEN len(sk_a) < 8192 THEN len(sk_a)::DOUBLE
        |             ELSE 8191.0 / (sk_a[8192]::DOUBLE / 1.8446744073709552e19 + 0.5) END AS da,
        |        CASE WHEN len(sk_b) < 8192 THEN len(sk_b)::DOUBLE
        |             ELSE 8191.0 / (sk_b[8192]::DOUBLE / 1.8446744073709552e19 + 0.5) END AS db
        |      FROM s),
        |w AS (SELECT *,
        |        CASE WHEN len(u) < 8192 THEN len(u)::DOUBLE
        |             WHEN len(uk) < 8192 THEN len(uk)::DOUBLE
        |             ELSE 8191.0 / (uk[8192]::DOUBLE / 1.8446744073709552e19 + 0.5) END AS du,
        |        CASE WHEN len(uk) = 0 THEN 0.0
        |             ELSE len(list_intersect(uk, list_intersect(sk_a, sk_b)))::DOUBLE / len(uk) END AS ifrac,
        |        list_filter(map_entries(hh_a), e ->
        |          e.value::DOUBLE >= n_a::DOUBLE / 257
        |          AND coalesce(map_extract(hh_b, e.key)[1], 0)::DOUBLE >= n_b::DOUBLE / 257) AS bh
        |      FROM t),
        |x AS (SELECT *,
        |        ifrac * du AS common,
        |        list_reduce(list_prepend(0.0, list_transform(bh, e ->
        |          e.value::DOUBLE * coalesce(map_extract(hh_b, e.key)[1], 0)::DOUBLE)),
        |          (acc, v) -> acc + v) AS hh_rows,
        |        len(bh)::DOUBLE AS hh_keys,
        |        list_reduce(list_prepend(0::BIGINT, list_transform(bh, e -> e.value)),
        |          (a2, v) -> a2 + v)::DOUBLE AS hh_mass_a,
        |        list_reduce(list_prepend(0::BIGINT, list_transform(bh, e ->
        |          coalesce(map_extract(hh_b, e.key)[1], 0))),
        |          (a2, v) -> a2 + v)::DOUBLE AS hh_mass_b
        |      FROM w)
        |SELECT n_a, n_b,
        |  CAST(round(da) AS BIGINT) AS est_distinct_a,
        |  CAST(round(db) AS BIGINT) AS est_distinct_b,
        |  CAST(round(common) AS BIGINT) AS est_common_keys,
        |  CAST(hh_keys AS BIGINT) AS hh_common_keys,
        |  CAST(round(hh_rows + CASE WHEN da - hh_keys > 0 AND db - hh_keys > 0
        |    THEN greatest(common - hh_keys, 0.0)
        |      * (greatest(n_a::DOUBLE - hh_mass_a, 0.0) / (da - hh_keys))
        |      * (greatest(n_b::DOUBLE - hh_mass_b, 0.0) / (db - hh_keys))
        |    ELSE 0.0 END) AS BIGINT) AS est_join_rows
        |FROM x""".stripMargin,
    "q_ann_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
        |  FROM embeddings WHERE vec_id % 50 = 0)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qvec, e.embedding::DOUBLE[]) DESC,
        |               e.vec_id) AS "rank"
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id) t
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,
    // E10: the greedy MMR selection replayed exactly — selection state
    // (the picked-so-far id list) rides a recursive CTE, the per-step
    // argmax is a row_number over λ·rel − (1−λ)·max-sim-to-selected with
    // the same id-asc tiebreak, and pairwise candidate cosines are
    // precomputed once as per-candidate (id, sim) struct lists so the
    // recursive term stays pure expressions (no aggregates over the
    // recursive relation).
    "q_mmr_diversify" ->
      """WITH RECURSIVE
        |q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |cand AS (
        |  SELECT query_id, neighbor_id, sim FROM (
        |    SELECT q.query_id, e.vec_id AS neighbor_id,
        |      list_cosine_similarity(q.qvec, e.embedding::DOUBLE[]) AS sim,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.qvec, e.embedding::DOUBLE[]) DESC,
        |                 e.vec_id) AS r
        |    FROM q JOIN embeddings e ON e.vec_id <> q.query_id) t
        |  WHERE r <= 20),
        |cvec AS (
        |  SELECT c.query_id, c.neighbor_id, c.sim, e.embedding::DOUBLE[] AS nvec
        |  FROM cand c JOIN embeddings e ON e.vec_id = c.neighbor_id),
        |psim AS (
        |  SELECT a.query_id, a.neighbor_id, a.sim,
        |    list(struct_pack(ib := b.neighbor_id,
        |                     s := list_cosine_similarity(a.nvec, b.nvec))) AS sims
        |  FROM cvec a JOIN cvec b
        |    ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
        |  GROUP BY a.query_id, a.neighbor_id, a.sim),
        |sel AS (
        |  SELECT query_id, 1 AS mmr_rank, neighbor_id AS doc_id,
        |    0.7 * sim AS score, [neighbor_id] AS selected
        |  FROM (
        |    SELECT query_id, neighbor_id, sim,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rn
        |    FROM psim) t
        |  WHERE rn = 1
        |  UNION ALL
        |  SELECT query_id, mmr_rank, doc_id, score, list_append(selected, doc_id) FROM (
        |    SELECT s.query_id, s.mmr_rank + 1 AS mmr_rank, c.neighbor_id AS doc_id,
        |      0.7 * c.sim - 0.3 * list_max(list_transform(
        |        list_filter(c.sims, x -> list_contains(s.selected, x.ib)),
        |        x -> x.s)) AS score,
        |      s.selected,
        |      row_number() OVER (PARTITION BY s.query_id
        |        ORDER BY 0.7 * c.sim - 0.3 * list_max(list_transform(
        |          list_filter(c.sims, x -> list_contains(s.selected, x.ib)),
        |          x -> x.s)) DESC, c.neighbor_id) AS rn
        |    FROM sel s JOIN psim c
        |      ON c.query_id = s.query_id AND NOT list_contains(s.selected, c.neighbor_id)
        |    WHERE s.mmr_rank < 10) t
        |  WHERE rn = 1)
        |SELECT query_id, CAST(mmr_rank AS BIGINT) AS mmr_rank, doc_id,
        |  CAST(round(score * 1e6) AS BIGINT) AS mmr_score_x1e6
        |FROM sel
        |ORDER BY query_id, mmr_rank""".stripMargin,
    "q_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec, label AS qlabel
        |  FROM embeddings WHERE vec_id % 50 = 0)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qvec, e.embedding::DOUBLE[]) DESC,
        |               e.vec_id) AS "rank"
        |  FROM q JOIN embeddings e
        |    ON e.vec_id <> q.query_id AND e.label <> q.qlabel) t
        |WHERE "rank" <= 3 ORDER BY query_id, "rank"""".stripMargin,
    "q_lang_id" ->
      """WITH p AS (SELECT doc_id, ' ' || text || ' ' AS padded FROM documents),
        |hits AS (
        |  SELECT doc_id,
        |    CAST((length(padded) - length(replace(padded, ' the ', ''))) / 5 AS BIGINT) AS en_hits,
        |    CAST((length(padded) - length(replace(padded, ' der ', ''))) / 5 AS BIGINT) AS de_hits,
        |    CAST((length(padded) - length(replace(padded, ' le ', ''))) / 4 AS BIGINT) AS fr_hits,
        |    CAST((length(padded) - length(replace(padded, ' el ', ''))) / 4 AS BIGINT) AS es_hits
        |  FROM p)
        |SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
        |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
        |       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
        |       WHEN fr_hits >= es_hits THEN 'fr'
        |       ELSE 'es' END AS predicted_lang
        |FROM hits ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars_text,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS non_space,
        |    CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
        |      + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT) AS stop_hits
        |  FROM documents)
        |SELECT doc_id, n_chars_text, n_words, stop_hits,
        |  (non_space * 100) // n_words AS avg_word_len_x100,
        |  least(1000, n_words * 5) + least(500, stop_hits * 20) AS quality_x1000
        |FROM f ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len,
        |  'application/octet-stream' AS mime, length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the Spark side REALLY encodes and decodes a PNG per id; the oracle
    // computes what lossless round-trip of the solid color must yield —
    // hash parity proves the codec path exact (see LlmOps.qImageMeta)
    "q_image_meta" ->
      """SELECT doc_id,
        |  16 AS width, 8 AS height, 3 AS channels,
        |  CAST((doc_id * 37) % 256 AS DOUBLE) AS mean_r,
        |  CAST((doc_id * 101) % 256 AS DOUBLE) AS mean_g,
        |  CAST((doc_id * 211) % 256 AS DOUBLE) AS mean_b
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the planted corpus encodes ImageDedup.plantedHash(id) into the 9×8
    // luminance staircase (row starts at 128, steps ±5 per bit), so the
    // real decode's dHash equals this wrapping-Long arithmetic bit for
    // bit: background ids scatter by (id+1)·K mod 2^64, planted members
    // (id%16<3) share (2g+1)·K2 with 0/1/2 group-determined bit flips.
    // HUGEINT carries the mod-2^64 product; the signed-BIGINT rendering
    // makes bin() emit the same 64 two's-complement bits Java sees.
    "q_image_phash" ->
      s"""WITH hh AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 16 < 3 THEN
        |      ((2 * (doc_id // 16) + 1)::HUGEINT * 14029467366897019727)
        |        % 18446744073709551616
        |    ELSE
        |      ((doc_id + 1)::HUGEINT * 11400714819323198485)
        |        % 18446744073709551616
        |    END AS hu
        |  FROM documents),
        |hs AS (
        |  SELECT doc_id,
        |    CASE WHEN hu >= 9223372036854775808
        |         THEN (hu - 18446744073709551616)::BIGINT ELSE hu::BIGINT
        |    END AS h0,
        |    doc_id % 16 AS m, doc_id // 16 AS g
        |  FROM hh),
        |hf AS (
        |  SELECT doc_id,
        |    CASE WHEN m = 1 THEN xor(h0,
        |           CASE WHEN g % 64 = 63 THEN -9223372036854775808
        |                ELSE 1::BIGINT << (g % 64) END)
        |         WHEN m = 2 THEN xor(xor(h0,
        |           CASE WHEN (g+7) % 64 = 63 THEN -9223372036854775808
        |                ELSE 1::BIGINT << ((g+7) % 64) END),
        |           CASE WHEN (g+23) % 64 = 63 THEN -9223372036854775808
        |                ELSE 1::BIGINT << ((g+23) % 64) END)
        |         ELSE h0 END AS h
        |  FROM hs)
        |SELECT doc_id, reverse(lpad(bin(h), 64, '0')) AS phash_bits
        |FROM hf ORDER BY doc_id""".stripMargin,
    // the banded Spark plan is COMPLETE for hamming <= 3 (3-of-6
    // pigeonhole), so the definitional all-pairs answer is the oracle;
    // bit_count(xor(...)) over the same signed-BIGINT hashes is the
    // 64-bit hamming distance
    "q_image_neardup" ->
      s"""WITH $imageHashCte
        |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
        |  CAST(bit_count(xor(a.h, c.h)) AS INTEGER) AS hamming
        |FROM hf a JOIN hf c ON a.doc_id < c.doc_id
        |WHERE bit_count(xor(a.h, c.h)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // G3k: the same planted-hash pair set -> recursive components ->
    // keep min-id canonical per cluster, untouched rows pass through
    "q_image_dedup_apply" ->
      s"""WITH RECURSIVE $imageHashCte,
        |pairs AS (
        |  SELECT a.doc_id AS id_a, c.doc_id AS id_b
        |  FROM hf a JOIN hf c ON a.doc_id < c.doc_id
        |  WHERE bit_count(xor(a.h, c.h)) <= 3),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id),
        |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> cluster_id)
        |ORDER BY doc_id""".stripMargin,
    // constant-amplitude PCM ⇒ RMS = amplitude exactly; duration divides
    // by 8 (a power of two) so the double is exact on both engines
    "q_audio_meta" ->
      """SELECT doc_id,
        |  CAST(8000 AS DOUBLE) AS sample_rate, 1 AS channels,
        |  CAST(4000 + (doc_id * 13) % 1000 AS BIGINT) AS n_frames,
        |  CAST(4000 + (doc_id * 13) % 1000 AS DOUBLE) / 8 AS duration_ms,
        |  CAST((doc_id * 73) % 16384 + 1000 AS DOUBLE) AS rms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_skew_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sample_per_group" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang ORDER BY md5(text), doc_id) AS rank
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 20
        |ORDER BY lang, rank""".stripMargin,
    "q_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        |s AS (SELECT vec_id, emb,
        |        list_max(list_transform(emb, x -> abs(x))) AS amax FROM e),
        |sc AS (SELECT vec_id, emb,
        |         CASE WHEN amax = 0 THEN 1.0 ELSE 127.0 / amax END AS scale FROM s)
        |SELECT vec_id,
        |  CAST(floor(scale * 1000000 + 0.5) AS BIGINT) AS scale_x1e6,
        |  array_to_string(list_transform(emb,
        |    x -> CAST(floor(x * scale + 0.5) AS BIGINT)), ',') AS q_csv
        |FROM sc ORDER BY vec_id""".stripMargin,
    // valid while per-group cardinality < k (8192): KMV is exact below
    // capacity; the estimate path is spec-checked, not oracle-checked
    "q_distinct_sketch" ->
      """SELECT event_type,
        |  count(DISTINCT props) AS distinct_props,
        |  count(DISTINCT user_id) AS distinct_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // exact while |union of any two prop sets| ≤ k=8192 (generator emits
    // ~100 distinct props — ample margin); NULL props excluded to match
    // the sketch's null-skipping
    "q_sketch_jaccard" ->
      """WITH s AS (SELECT DISTINCT event_type, props FROM events
        |           WHERE props IS NOT NULL),
        |sizes AS (SELECT event_type, count(*) AS n FROM s GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b
        |  FROM sizes a JOIN sizes b ON a.event_type < b.event_type),
        |inter AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS i
        |  FROM s x JOIN s y ON x.props = y.props AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b,
        |  1000 * COALESCE(i.i, 0) // (na.n + nb.n - COALESCE(i.i, 0)) AS jaccard_x1000
        |FROM pairs p
        |LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
        |JOIN sizes na ON na.event_type = p.type_a
        |JOIN sizes nb ON nb.event_type = p.type_b
        |ORDER BY p.type_a, p.type_b""".stripMargin,
    "q_top_terms" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df, 1000000 * t.tf // d.df AS score
        |  FROM tf t JOIN df d USING (term)),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rank FROM scored)
        |SELECT doc_id, term, tf, df, score, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |base AS (SELECT doc_id, len(t) AS n_words,
        |                len(list_distinct(t)) AS n_distinct_words FROM toks),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |        i -> t[i] || ' ' || t[i+1])) AS gram FROM toks),
        |top AS (SELECT doc_id, max(cnt) AS top_cnt FROM (
        |          SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
        |        GROUP BY doc_id)
        |SELECT b.doc_id, b.n_words, b.n_distinct_words,
        |  1000 * (b.n_words - b.n_distinct_words) // b.n_words AS dup_word_frac_x1000,
        |  COALESCE(t.top_cnt, 0) AS top_bigram_count,
        |  CASE WHEN b.n_words < 2 THEN 0
        |       ELSE 1000 * COALESCE(t.top_cnt, 0) // (b.n_words - 1) END
        |    AS top_bigram_frac_x1000
        |FROM base b LEFT JOIN top t USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2), i ->
        |  t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS gram FROM toks),
        |hold AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        |bad AS (SELECT DISTINCT g.doc_id FROM g JOIN hold USING(gram))
        |SELECT doc_id FROM documents
        |WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,
    // the audit twin of q_decontaminate: same 4-gram stream, distinct
    // per-holdout grams vs the corpus's distinct gram set; integer
    // x1000 fraction so the hash compare is exact
    "q_contamination_report" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2), i ->
        |  t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS gram FROM toks),
        |hg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 97 = 0),
        |cg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 <> 0),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM hg GROUP BY doc_id),
        |mt AS (SELECT hg.doc_id, count(*) AS n_matched
        |       FROM hg JOIN cg USING (gram) GROUP BY hg.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(tot.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(COALESCE(mt.n_matched, 0) AS BIGINT) AS n_matched,
        |  CAST(CASE WHEN COALESCE(tot.n_grams, 0) = 0 THEN 0
        |       ELSE 1000 * COALESCE(mt.n_matched, 0) // tot.n_grams END
        |    AS BIGINT) AS contamination_x1000
        |FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN mt USING (doc_id)
        |WHERE d.doc_id % 97 = 0
        |ORDER BY d.doc_id""".stripMargin,
    "q_split_assign" ->
      """WITH ph AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      list_reduce(
        |        list_transform(range(1, length(text) + 1),
        |                       i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |        (h, c) -> (h * 131 + c) % 2147483647)
        |    END AS h
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN h % 10 < 8 THEN 'train'
        |       WHEN h % 10 < 9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM ph ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """WITH ph AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      list_reduce(
        |        list_transform(range(1, length(text) + 1),
        |                       i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |        (h, c) -> (h * 131 + c) % 2147483647)
        |    END AS fingerprint,
        |    CASE WHEN length(substr(text, 1, 64)) = 0 THEN 0 ELSE
        |      list_reduce(
        |        list_transform(range(1, length(substr(text, 1, 64)) + 1),
        |                       i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |        (h, c) -> (h * 131 + c) % 2147483647)
        |    END AS prefix_fingerprint
        |  FROM documents)
        |SELECT doc_id, fingerprint, prefix_fingerprint FROM ph ORDER BY doc_id""".stripMargin,
    "q_cdc_apply" ->
      """WITH log AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    value, props
        |  FROM events),
        |ranked AS (
        |  SELECT user_id, ts, op, value, props,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM log)
        |SELECT user_id, ts AS last_ts, round(value, 2) AS value, props
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY user_id""".stripMargin,
    "q_scd2" ->
      """WITH changes AS (
        |  SELECT user_id, ts, event_id, props,
        |    lag(props) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |episodes AS (
        |  SELECT user_id, props, ts, event_id FROM changes
        |  WHERE rn = 1 OR props IS DISTINCT FROM prev)
        |SELECT user_id, props, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM episodes
        |ORDER BY user_id, valid_from""".stripMargin,
    "q_fill_gaps" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h,
        |    count(*) AS n, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY event_type, date_trunc('hour', ts)),
        |spans AS (
        |  SELECT event_type, min(h) AS lo, max(h) AS hi
        |  FROM hourly GROUP BY event_type),
        |cal AS (
        |  SELECT event_type,
        |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM spans)
        |SELECT cal.event_type, cal.h,
        |  CAST(coalesce(hourly.n, 0) AS BIGINT) AS n,
        |  hourly.sum_value AS sum_value,
        |  last_value(hourly.sum_value IGNORE NULLS) OVER (
        |    PARTITION BY cal.event_type ORDER BY cal.h
        |    ROWS UNBOUNDED PRECEDING) AS locf_value
        |FROM cal LEFT JOIN hourly
        |  ON cal.event_type = hourly.event_type AND cal.h = hourly.h
        |ORDER BY cal.event_type, cal.h""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_histogram" ->
      """WITH binned AS (
        |  SELECT event_type,
        |    least(19, greatest(0, CAST(floor(value / 25.0) AS BIGINT))) AS bin,
        |    value
        |  FROM events)
        |SELECT event_type, bin, round(bin * 25.0, 2) AS bin_lo,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM binned GROUP BY event_type, bin
        |ORDER BY event_type, bin""".stripMargin,
    "q_skew_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type AS d_type,
        |    CAST(length(event_type) AS BIGINT) AS weight
        |  FROM events)
        |SELECT e.event_type, count(*) AS n,
        |  round(sum(e.value * d.weight), 2) AS weighted_value
        |FROM events e JOIN dim d ON e.event_type = d.d_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |cnt AS (
        |  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types, sum(c * ln(c)) AS clnc
        |  FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_types,
        |  CAST(floor((ln(n_tokens) - clnc / n_tokens) * 1000.0 + 0.5) AS BIGINT)
        |    AS entropy_x1000
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q_text_normalize" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |      '  +', ' ', 'g')) AS norm_text
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, norm_text,
        |  CAST(length(norm_text) AS BIGINT) AS n_chars
        |FROM norm ORDER BY doc_id""".stripMargin,
    "q_bigram_counts" ->
      """WITH toks AS (
        |  SELECT string_split(text, ' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |grams AS (
        |  SELECT unnest(list_transform(range(1, len(t)),
        |                               i -> t[i] || ' ' || t[i + 1])) AS bigram
        |  FROM toks)
        |SELECT bigram, count(*) AS n
        |FROM grams GROUP BY bigram
        |ORDER BY n DESC, bigram
        |LIMIT 100""".stripMargin,
    "q_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT term, count(*) AS est_count
        |FROM toks GROUP BY term
        |ORDER BY est_count DESC, term
        |LIMIT 20""".stripMargin,
    "q_ntile" ->
      """WITH tiled AS (
        |  SELECT event_type, value,
        |    CAST(ntile(10) OVER (PARTITION BY event_type
        |                         ORDER BY value, event_id) AS BIGINT) AS decile
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, decile, count(*) AS n,
        |  round(min(value), 2) AS lo, round(max(value), 2) AS hi
        |FROM tiled GROUP BY event_type, decile
        |ORDER BY event_type, decile""".stripMargin,
    // H10 PINNED-ARTIFACT oracle (round 12, the r11 item-8 promotion):
    // scoring is sigmoid(w·x+b) over INTEGER-valued features (every
    // lane already oracle-proven under q_quality_score/q_repetition/
    // q_split_assign), so with the coefficients pinned to the persisted
    // train-once artifact (artifacts/.../quality_lr_r001_i100 — the
    // deterministic L-BFGS fit at this corpus) the replay is exact:
    // same left-assoc dot-product order, both engines' exp within 1 ulp
    // (≫ the 6dp rounding grid). The FIT stays non-SQL ([T] coverage);
    // this pins the score path end to end.
    "q_quality_classifier" -> qualityClassifierSql,
    // H10b: the calibration table is integer arithmetic over the SAME
    // pinned score replay (ppm lanes, DIV bins) - one shared definition.
    "q_calibration" ->
      ("WITH base AS (" + qualityClassifierSql + ")\n" +
        """SELECT least(9, ppm // 100000) AS bin,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(ppm) // count(*) AS BIGINT) AS mean_conf_ppm,
          |  CAST((1000000 * sum(label)) // count(*) AS BIGINT) AS frac_pos_ppm
          |FROM (SELECT label,
          |        CAST(round(quality_prob * 1000000) AS BIGINT) AS ppm
          |      FROM base)
          |GROUP BY 1 ORDER BY bin""".stripMargin),
    // H4b REGIME-BOUNDED oracle: below-accuracy GK ≡ quantile_disc
    // (the C12b/C18b regime; groups ~2000 « accuracy=10000 at sf0.01).
    "q_winsorize_approx" ->
      """WITH cuts AS (
        |  SELECT event_type, quantile_disc(value, 0.05) AS lo,
        |    quantile_disc(value, 0.95) AS hi
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        |  round(least(greatest(e.value, c.lo), c.hi), 2) AS value_clipped,
        |  (e.value < c.lo OR e.value > c.hi) AS was_clipped
        |FROM events e JOIN cuts c ON e.event_type = c.event_type
        |WHERE e.value IS NOT NULL
        |ORDER BY e.event_id""".stripMargin,
    // C18b REGIME-BOUNDED oracle (the C12b precedent): every sf0.01
    // group is below accuracy=10000, so Spark's GK cutoffs are the
    // exact discrete-rank elements = DuckDB quantile_disc; assignment
    // (1 + cuts strictly below; tie -> lower bucket) replays exactly.
    "q_ntile_approx" ->
      """WITH cuts AS (
        |  SELECT event_type,
        |    quantile_disc(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cs
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
        |d AS (
        |  SELECT e.event_type, e.value,
        |    CAST(1 + len(list_filter(c.cs, x -> e.value > x)) AS BIGINT) AS decile
        |  FROM events e JOIN cuts c ON e.event_type = c.event_type
        |  WHERE e.value IS NOT NULL)
        |SELECT event_type, decile, count(*) AS n,
        |  round(min(value), 2) AS lo, round(max(value), 2) AS hi
        |FROM d GROUP BY event_type, decile
        |ORDER BY event_type, decile""".stripMargin,
    "q_profile" ->
      """WITH p AS (
        |  SELECT 'doc_id' AS column_name, count(*) AS n,
        |    count(*) - count(doc_id) AS n_nulls,
        |    count(DISTINCT doc_id) AS n_distinct FROM documents
        |  UNION ALL SELECT 'text', count(*), count(*) - count(text),
        |    count(DISTINCT text) FROM documents
        |  UNION ALL SELECT 'lang', count(*), count(*) - count(lang),
        |    count(DISTINCT lang) FROM documents
        |  UNION ALL SELECT 'source', count(*), count(*) - count(source),
        |    count(DISTINCT source) FROM documents
        |  UNION ALL SELECT 'n_chars', count(*), count(*) - count(n_chars),
        |    count(DISTINCT n_chars) FROM documents)
        |SELECT column_name, n, n_nulls, n_distinct
        |FROM p ORDER BY column_name""".stripMargin,
    "q_window_topn_agg" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |                            ORDER BY value DESC, event_id) AS BIGINT) AS rn
        |  FROM events)
        |SELECT user_id, rn, event_id, value
        |FROM ranked WHERE rn <= 3
        |ORDER BY user_id, rn""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        |  round(avg(l_discount), 4) AS avg_disc
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,
    // both engines truncate to Monday-start weeks; DuckDB's DATE result
    // casts to TIMESTAMP to match Spark's date_trunc type
    "q_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS event_week
        |  FROM events),
        |c AS (SELECT user_id, min(event_week) AS cohort_week
        |      FROM e GROUP BY user_id)
        |SELECT c.cohort_week,
        |  CAST(date_diff('day', c.cohort_week, e.event_week) // 7 AS BIGINT)
        |    AS week_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // the Spark side anchors its range frame on unix_micros, which equals
    // this INTERVAL frame exactly (naive timestamps, no DST)
    "q_rolling_agg" ->
      """SELECT event_id, user_id, ts, value,
        |  count(*) OVER w AS roll_n,
        |  round(avg(value) OVER w, 4) AS roll_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // every event lands in exactly size/hop = 2 hopping windows: the
    // hop-aligned bucket and the one before it
    "q_sliding_window" ->
      """WITH w AS (
        |  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
        |                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'])
        |    AS window_start,
        |    event_type, value
        |  FROM events)
        |SELECT window_start, event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM w GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,
    // the json_type guard makes the oracle degrade exactly like Spark's
    // typed from_json: a quoted numeric ({"k":"7"}), a float, or
    // malformed JSON all yield NULL on both engines (a bare TRY_CAST of
    // json_extract_string would parse "7" to 7 where Spark yields NULL)
    "q_json_extract" ->
      """WITH x AS (
        |  SELECT event_type,
        |    CASE WHEN json_valid(props)
        |           AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
        |         THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
        |    END AS k
        |  FROM events)
        |SELECT event_type, count(*) AS n, count(k) AS n_valid,
        |  CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k), 4) AS avg_k
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_fuzzy_join" ->
      """WITH n AS (
        |  SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,
    // moments/corr/abtest derive every statistic from the SAME power-sum
    // expressions on both engines — no sample-vs-population dialect traps
    "q_moments" ->
      """WITH s AS (
        |  SELECT event_type, count(*) AS n, sum(value) AS s1,
        |    sum(value*value) AS s2, sum(value*value*value) AS s3,
        |    sum(value*value*value*value) AS s4
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n,
        |  round(s1/n, 4) AS mean,
        |  round(sqrt(s2/n - (s1/n)*(s1/n)), 4) AS stddev,
        |  round((s3/n - 3.0*(s1/n)*(s2/n) + 2.0*pow(s1/n, 3))
        |        / pow(s2/n - (s1/n)*(s1/n), 1.5), 4) AS skewness,
        |  round((s4/n - 4.0*(s1/n)*(s3/n) + 6.0*pow(s1/n, 2)*(s2/n)
        |         - 3.0*pow(s1/n, 4))
        |        / pow(s2/n - (s1/n)*(s1/n), 2) - 3.0, 4) AS kurtosis
        |FROM s ORDER BY event_type""".stripMargin,
    "q_corr" ->
      """WITH e AS (
        |  SELECT event_type, value AS x,
        |    CAST(CASE WHEN json_valid(props)
        |                AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
        |              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
        |         END AS DOUBLE) AS y
        |  FROM events),
        |f AS (SELECT * FROM e WHERE x IS NOT NULL AND y IS NOT NULL),
        |s AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x*y) AS sxy, sum(x*x) AS sx2, sum(y*y) AS sy2
        |      FROM f GROUP BY event_type)
        |SELECT event_type, n,
        |  round(sxy/n - (sx/n)*(sy/n), 4) AS covar,
        |  round((n*sxy - sx*sy) /
        |    (sqrt(n*sx2 - sx*sx) * sqrt(n*sy2 - sy*sy)), 4) AS corr
        |FROM s ORDER BY event_type""".stripMargin,
    "q_abtest" ->
      """WITH f AS (
        |  SELECT event_type, user_id, value FROM events WHERE value IS NOT NULL),
        |s AS (SELECT event_type,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value ELSE 0.0 END) AS sa,
        |    sum(CASE WHEN user_id % 2 <> 0 THEN value ELSE 0.0 END) AS sb,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value*value ELSE 0.0 END) AS sa2,
        |    sum(CASE WHEN user_id % 2 <> 0 THEN value*value ELSE 0.0 END) AS sb2
        |  FROM f GROUP BY event_type)
        |SELECT event_type, n_a, n_b,
        |  round(sa/n_a, 4) AS mean_a, round(sb/n_b, 4) AS mean_b,
        |  round((sa/n_a - sb/n_b) /
        |    sqrt((sa2/n_a - pow(sa/n_a, 2))/n_a
        |       + (sb2/n_b - pow(sb/n_b, 2))/n_b), 4) AS z
        |FROM s ORDER BY event_type""".stripMargin,
    // D10 (round 14): the registered face is the BLOCKED report; its
    // oracle is the EXACT grid form thresholded at the same report
    // class, so the oracle passes only while rarest-m blocking recalls
    // every exact report-class pair on the gated corpus (verified equal
    // 4/4 at sf0.01). String-gram set math matches the engine's hashed
    // grams bar xxhash64 collisions (same as q_ngram_jaccard).
    "q_containment" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' '))), i ->
        |      string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS grams
        |  FROM documents WHERE doc_id % 5 = 0),
        |v AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CASE WHEN least(len(a.grams), len(b.grams)) = 0 THEN 0
        |         ELSE (1000 * len(list_intersect(a.grams, b.grams)))
        |                // least(len(a.grams), len(b.grams))
        |    END AS containment_x1000
        |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, containment_x1000 FROM v
        |WHERE containment_x1000 >= 300
        |ORDER BY id_a, id_b""".stripMargin,
    // D10b (round 14): FULL replay of the rarest-m blocking plan — the
    // hash-free ties-inclusive selection makes candidate generation
    // itself SQL-expressible: in-block df counts, the pair-capable
    // [2, maxDf] band, the per-doc m-th-order-statistic cutoff,
    // semi-pairs against the full pair-capable posting, exact verify.
    "q_containment_blocked" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' '))), i ->
        |      string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS grams
        |  FROM documents WHERE doc_id % 5 = 0),
        |p AS (SELECT source, doc_id, unnest(grams) AS g FROM d),
        |f AS (SELECT source, g, count(*) AS df FROM p GROUP BY 1, 2
        |      HAVING count(*) BETWEEN 2 AND 100),
        |cap AS (SELECT p.source, p.doc_id, p.g, f.df
        |        FROM p JOIN f ON p.source = f.source AND p.g = f.g),
        |cut AS (SELECT doc_id, l[least(10, len(l))] AS cut
        |        FROM (SELECT doc_id, list_sort(list(df)) AS l FROM cap GROUP BY doc_id)),
        |r AS (SELECT cap.source, cap.doc_id, cap.g
        |      FROM cap JOIN cut USING (doc_id) WHERE cap.df <= cut.cut),
        |c AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS id_a,
        |        greatest(x.doc_id, y.doc_id) AS id_b
        |      FROM r x JOIN cap y ON x.g = y.g AND x.source = y.source
        |        AND x.doc_id <> y.doc_id),
        |v AS (SELECT c.id_a, c.id_b,
        |        CASE WHEN least(len(a.grams), len(b.grams)) = 0 THEN 0
        |        ELSE (1000 * len(list_intersect(a.grams, b.grams)))
        |               // least(len(a.grams), len(b.grams)) END AS containment_x1000
        |      FROM c JOIN d a ON a.doc_id = c.id_a
        |        JOIN d b ON b.doc_id = c.id_b)
        |SELECT id_a, id_b, containment_x1000 FROM v
        |WHERE containment_x1000 >= 300
        |ORDER BY id_a, id_b""".stripMargin,
    "q_cooccur_pmi" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs),
        |top AS (SELECT term FROM (
        |  SELECT term, count(*) AS cnt FROM tok GROUP BY term
        |  ORDER BY cnt DESC, term LIMIT 50)),
        |dt AS (SELECT DISTINCT doc_id, term FROM tok
        |       WHERE term IN (SELECT term FROM top)),
        |tdf AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
        |nd AS (SELECT count(*) AS n_docs FROM docs),
        |pc AS (SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
        |       FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
        |       GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT pc.term_a, pc.term_b, pc.n_ab,
        |  round(ln((pc.n_ab * nd.n_docs)::DOUBLE / (ta.df * tb.df)::DOUBLE), 3)
        |    AS pmi
        |FROM pc JOIN tdf ta ON pc.term_a = ta.term
        |        JOIN tdf tb ON pc.term_b = tb.term, nd
        |ORDER BY term_a, term_b""".stripMargin,
    "q_unpivot" ->
      """WITH p AS (
        |  SELECT user_id,
        |    count(*) FILTER (WHERE event_type = 'view') AS n_view,
        |    count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |    count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |    count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |    count(*) FILTER (WHERE event_type = 'error') AS n_error
        |  FROM events GROUP BY user_id)
        |SELECT user_id, t.event_type, t.n FROM p,
        |  LATERAL (VALUES ('view', n_view), ('click', n_click),
        |                  ('purchase', n_purchase), ('signup', n_signup),
        |                  ('error', n_error)) AS t(event_type, n)
        |ORDER BY user_id, event_type""".stripMargin,
    "q_active_users" ->
      """SELECT * FROM (
        |  SELECT 'day' AS period, date_trunc('day', ts)::TIMESTAMP AS period_start,
        |    count(DISTINCT user_id) AS active_users
        |  FROM events GROUP BY 2
        |  UNION ALL
        |  SELECT 'week', date_trunc('week', ts)::TIMESTAMP,
        |    count(DISTINCT user_id)
        |  FROM events GROUP BY 2
        |  UNION ALL
        |  SELECT 'month', date_trunc('month', ts)::TIMESTAMP,
        |    count(DISTINCT user_id)
        |  FROM events GROUP BY 2)
        |ORDER BY period, period_start""".stripMargin,
    "q_new_vs_returning" ->
      """WITH du AS (
        |  SELECT DISTINCT date_trunc('day', ts)::TIMESTAMP AS day, user_id
        |  FROM events),
        |fd AS (SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id)
        |SELECT du.day,
        |  count(*) FILTER (WHERE du.day = fd.first_day) AS n_new,
        |  count(*) FILTER (WHERE du.day <> fd.first_day) AS n_returning
        |FROM du JOIN fd ON du.user_id = fd.user_id
        |GROUP BY du.day ORDER BY du.day""".stripMargin,
    // content-hash weighted draw: keep iff polyhash(text) mod 1500 < quality
    "q_sample_weighted" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |    CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
        |      + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT) AS stop_hits
        |  FROM documents WHERE text IS NOT NULL),
        |q AS (SELECT doc_id, text,
        |        least(1000, n_words * 5) + least(500, stop_hits * 20) AS quality_x1000
        |      FROM f),
        |ph AS (SELECT doc_id, quality_x1000,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      list_reduce(
        |        list_transform(range(1, length(text) + 1),
        |                       i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |        (h, c) -> (h * 131 + c) % 2147483647)
        |    END AS h
        |  FROM q)
        |SELECT doc_id, quality_x1000 FROM ph
        |WHERE h % 1500 < quality_x1000
        |ORDER BY doc_id""".stripMargin,
    // temperature sampling: all arithmetic integer by design (isqrt via
    // floor(sqrt(double)) is exact below 2^52; ppm thresholds via
    // integer division) so the two engines can't diverge on a float ulp
    "q_token_budget_sample" ->
      """WITH t AS (
        |  SELECT doc_id, lang, text,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ws_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |l AS (SELECT lang, CAST(sum(ws_tokens) AS BIGINT) AS t_l,
        |    CAST(floor(sqrt(CAST(sum(ws_tokens) AS DOUBLE))) AS BIGINT) AS w_l
        |  FROM t GROUP BY lang),
        |s AS (SELECT lang, t_l,
        |    CAST(least(1000000,
        |      ((15000 * w_l) // (SELECT CAST(sum(w_l) AS BIGINT) FROM l))
        |        * 1000000 // t_l) AS BIGINT) AS keep_ppm
        |  FROM l),
        |ph AS (SELECT doc_id, t.lang AS lang, ws_tokens, keep_ppm,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      list_reduce(
        |        list_transform(range(1, length(text) + 1),
        |                       i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |        (h, c) -> (h * 131 + c) % 2147483647)
        |    END AS h
        |  FROM t JOIN s ON t.lang = s.lang)
        |SELECT doc_id, lang, ws_tokens, keep_ppm FROM ph
        |WHERE h % 1000000 < keep_ppm
        |ORDER BY doc_id""".stripMargin,
    // bit_xor is commutative/associative → the checksum is partition- and
    // order-independent on both engines; polyhash values are positive so
    // pmod ≡ %
    "q_shard_manifest" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ws_tokens,
        |    CASE WHEN length(text) = 0 THEN 0 ELSE
        |      list_reduce(
        |        list_transform(range(1, length(text) + 1),
        |                       i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
        |        (h, c) -> (h * 131 + c) % 2147483647)
        |    END AS fp
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT fp % 16 AS shard, count(*) AS n_docs,
        |  CAST(sum(ws_tokens) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
        |  bit_xor(fp) AS checksum
        |FROM t GROUP BY shard ORDER BY shard""".stripMargin,
    // bucket k = floor(log2(tokens)) via binary-string length — exact
    // integer arithmetic on both engines (log2 doubles can straddle
    // powers of two)
    "q_length_histogram" ->
      """WITH t AS (
        |  SELECT CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ws_tokens
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT CAST(length(bin(ws_tokens)) - 1 AS BIGINT) AS len_bucket,
        |  count(*) AS n_docs, CAST(sum(ws_tokens) AS BIGINT) AS n_tokens,
        |  min(ws_tokens) AS min_tokens, max(ws_tokens) AS max_tokens
        |FROM t GROUP BY len_bucket ORDER BY len_bucket""".stripMargin,
    // the composed pipeline: quality gate (raw text) -> normalize ->
    // exact dedup (min id per normalized md5) -> deterministic split —
    // each stage's SQL is its own proven oracle, chained
    "q_curate_e2e" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |    CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
        |      + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT) AS stop_hits
        |  FROM documents WHERE text IS NOT NULL),
        |q AS (SELECT doc_id, text,
        |        least(1000, n_words * 5) + least(500, stop_hits * 20) AS quality_x1000
        |      FROM f
        |      WHERE least(1000, n_words * 5) + least(500, stop_hits * 20) >= 300),
        |n AS (SELECT doc_id, quality_x1000,
        |    trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |      '  +', ' ', 'g')) AS nt
        |  FROM q),
        |hashed AS (SELECT doc_id, quality_x1000, md5(nt) AS h,
        |    (CASE WHEN length(nt) = 0 THEN 0 ELSE
        |      list_reduce(
        |        list_transform(range(1, length(nt) + 1),
        |                       i -> CAST(ascii(substr(nt, i, 1)) AS BIGINT)),
        |        (h, c) -> (h * 131 + c) % 2147483647)
        |    END) % 10 AS ph
        |  FROM n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        |      FROM hashed)
        |SELECT doc_id,
        |  CASE WHEN ph < 8 THEN 'train'
        |       WHEN ph < 9 THEN 'val'
        |       ELSE 'test' END AS split,
        |  quality_x1000
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_integrity" ->
      """SELECT * FROM (
        |  SELECT 'customer.c_nationkey->nation' AS relation,
        |    (SELECT count(*) FROM customer WHERE NOT EXISTS (
        |       SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)) AS n_orphans
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey->orders',
        |    (SELECT count(*) FROM lineitem WHERE NOT EXISTS (
        |       SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part',
        |    (SELECT count(*) FROM lineitem WHERE NOT EXISTS (
        |       SELECT 1 FROM part WHERE p_partkey = l_partkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier',
        |    (SELECT count(*) FROM lineitem WHERE NOT EXISTS (
        |       SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey))
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer',
        |    (SELECT count(*) FROM orders WHERE NOT EXISTS (
        |       SELECT 1 FROM customer WHERE c_custkey = o_custkey))
        |) ORDER BY relation""".stripMargin,
    // vocabulary CTE = the q_vocab oracle inlined; OOV encodes as -1
    "q_tokenize" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |cnt AS (SELECT term, count(*) AS n FROM w GROUP BY term),
        |top AS (SELECT term, n FROM cnt ORDER BY n DESC, term LIMIT 1000),
        |v AS (SELECT term,
        |        CAST(row_number() OVER (ORDER BY n DESC, term) - 1 AS BIGINT)
        |          AS vocab_id
        |      FROM top),
        |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term,
        |        generate_subscripts(string_split(text, ' '), 1) AS pos
        |      FROM documents WHERE text IS NOT NULL),
        |j AS (SELECT t.doc_id, t.pos, COALESCE(v.vocab_id, -1) AS id
        |      FROM t LEFT JOIN v USING (term))
        |SELECT doc_id,
        |  array_to_string(list(CAST(id AS VARCHAR) ORDER BY pos), ' ')
        |    AS token_ids,
        |  count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_ngram_lm" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(t)),
        |                              i -> t[i] || ' ' || t[i + 1])) AS gram
        |      FROM toks),
        |cg AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
        |cw AS (SELECT string_split(gram, ' ')[1] AS w1, count(*) AS c1
        |       FROM g GROUP BY 1),
        |s AS (SELECT g.doc_id, ln(cg.c::DOUBLE / cw.c1::DOUBLE) AS lp
        |      FROM g JOIN cg USING (gram)
        |             JOIN cw ON string_split(g.gram, ' ')[1] = cw.w1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(lp), 3) AS avg_logp
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // F19b: the F19 CTE + per-source exact-tercile window; rank on the
    // ROUNDED score (both engines round identically — F19's proven
    // parity) with doc_id tiebreak, so bucket assignment is exact
    "q_ppl_buckets" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(t)),
        |                              i -> t[i] || ' ' || t[i + 1])) AS gram
        |      FROM toks),
        |cg AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
        |cw AS (SELECT string_split(gram, ' ')[1] AS w1, count(*) AS c1
        |       FROM g GROUP BY 1),
        |s AS (SELECT g.doc_id, ln(cg.c::DOUBLE / cw.c1::DOUBLE) AS lp
        |      FROM g JOIN cg USING (gram)
        |             JOIN cw ON string_split(g.gram, ' ')[1] = cw.w1),
        |lm AS (SELECT doc_id, round(avg(lp), 3) AS avg_logp
        |       FROM s GROUP BY doc_id),
        |j AS (SELECT lm.doc_id, d.source, lm.avg_logp FROM lm
        |      JOIN documents d ON lm.doc_id = d.doc_id),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY avg_logp DESC, doc_id) AS rk,
        |        count(*) OVER (PARTITION BY source) AS n_s
        |      FROM j)
        |SELECT doc_id, source, avg_logp,
        |  (3 * (rk - 1)) // n_s AS bucket_id,
        |  CASE (3 * (rk - 1)) // n_s WHEN 0 THEN 'head'
        |    WHEN 1 THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    // G3g: the oracle rebuilds every sampled frame's mean intensity from
    // the GVID generative formula (polyhash-derived bytes) — the
    // q_image_patches rebuild pattern; sampling indices and timestamps
    // are pure integer arithmetic on the header fields
    "q_video_frames" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 16 AS n_frames FROM documents),
        |s AS (SELECT doc_id, n_frames, unnest(range(0, 4)) AS j FROM d),
        |f AS (SELECT doc_id, (j * n_frames) // 4 AS frame_idx FROM s),
        |px AS (SELECT doc_id, frame_idx, unnest(range(0, 48)) AS p FROM f),
        |hv AS (SELECT doc_id, frame_idx,
        |    list_reduce(
        |      list_transform(range(1, length('vid:' || CAST(doc_id AS VARCHAR) || ':'
        |          || CAST(frame_idx AS VARCHAR) || ':' || CAST(p AS VARCHAR)) + 1),
        |        i -> CAST(ascii(substr('vid:' || CAST(doc_id AS VARCHAR) || ':'
        |          || CAST(frame_idx AS VARCHAR) || ':' || CAST(p AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) % 256 AS v
        |  FROM px),
        |m AS (SELECT doc_id, frame_idx, sum(v) // 48 AS mean_intensity
        |      FROM hv GROUP BY doc_id, frame_idx)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(frame_idx * 100 AS BIGINT) AS ts_ms,
        |  CAST(mean_intensity AS BIGINT) AS mean_intensity, true AS ok
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin,
    // G3i: full first-principles replay — group-keyed pixel bytes
    // (':edit' salt on member 7's re-rendered frame), per-sampled-frame
    // polyhash fold over the 48 pixel VALUES (list_reduce's
    // first-element init ≡ initial-0 fold because byte < modulus), then
    // the same (slot, hash) band join + matched-slot count.
    "q_video_neardup" ->
      """WITH d AS (SELECT doc_id, doc_id // 8 AS g FROM documents),
        |n AS (SELECT doc_id, g, 8 + g % 16 AS n_frames FROM d),
        |s AS (SELECT doc_id, g, n_frames, unnest(range(0, 4)) AS j FROM n),
        |f AS (SELECT doc_id, g, n_frames, j,
        |        (j * n_frames) // 4 AS frame_idx FROM s),
        |px AS (SELECT doc_id, g, n_frames, j, frame_idx,
        |         unnest(range(0, 48)) AS p FROM f),
        |k AS (SELECT doc_id, j, p,
        |       'vidg:' || CAST(g AS VARCHAR) || ':'
        |         || CAST(frame_idx AS VARCHAR) || ':' || CAST(p AS VARCHAR)
        |         || CASE WHEN doc_id % 8 = 7 AND frame_idx = g % n_frames
        |                 THEN ':edit' ELSE '' END AS key
        |      FROM px),
        |hv AS (SELECT doc_id, j, p,
        |    list_reduce(
        |      list_transform(range(1, length(key) + 1),
        |        i -> CAST(ascii(substr(key, i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS hraw
        |  FROM k),
        |sq AS (SELECT doc_id, j, p,
        |    (hraw * hraw) % 2147483647 % 256 AS v FROM hv),
        |fh AS (SELECT doc_id, j,
        |    list_reduce(list(v ORDER BY p),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS frame_hash
        |  FROM sq GROUP BY doc_id, j)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(count(*) AS BIGINT) AS n_match
        |FROM fh a JOIN fh b ON a.j = b.j AND a.frame_hash = b.frame_hash
        |  AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING count(*) >= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // F19b approx twin: the H16b estimator on the tercile boundaries —
    // conditional hash-sample (tiny sources contribute everything),
    // sorted score list, (k*(m+1)) DIV 3 order-stat cutoffs, map-side
    // CASE bucketing; left-join fallback buckets a sample-less source
    // to head on both engines identically
    "q_ppl_buckets_approx" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |              FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(t)),
        |                              i -> t[i] || ' ' || t[i + 1])) AS gram
        |      FROM toks),
        |cg AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
        |cw AS (SELECT string_split(gram, ' ')[1] AS w1, count(*) AS c1
        |       FROM g GROUP BY 1),
        |s AS (SELECT g.doc_id, ln(cg.c::DOUBLE / cw.c1::DOUBLE) AS lp
        |      FROM g JOIN cg USING (gram)
        |             JOIN cw ON string_split(g.gram, ' ')[1] = cw.w1),
        |lm AS (SELECT doc_id, round(avg(lp), 3) AS avg_logp
        |       FROM s GROUP BY doc_id),
        |j AS (SELECT lm.doc_id, d.source, lm.avg_logp FROM lm
        |      JOIN documents d ON lm.doc_id = d.doc_id),
        |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM j GROUP BY source),
        |hrw AS (SELECT j.doc_id, j.source, j.avg_logp, n.n_s,
        |        list_reduce(
        |          list_transform(range(1, length('pplsmp:' || CAST(j.doc_id AS VARCHAR)) + 1),
        |            i -> CAST(ascii(substr('pplsmp:' || CAST(j.doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |          (h, c) -> (h * 131 + c) % 2147483647) AS h2
        |       FROM j JOIN n ON j.source = n.source),
        |h1 AS (SELECT doc_id, source, avg_logp, n_s,
        |         (h2 * h2) % 2147483647 AS h2 FROM hrw),
        |hh AS (SELECT doc_id, source, avg_logp, n_s,
        |         (h2 * h2) % 2147483647 AS h2 FROM h1),
        |smp AS (SELECT source, list_sort(list(avg_logp)) AS smp FROM hh
        |        WHERE h2 * 4 < 2147483647 OR n_s <= 32 GROUP BY source),
        |cu AS (SELECT source,
        |        smp[CAST(greatest(1, least(len(smp), (2 * (len(smp) + 1)) // 3)) AS INT)] AS c_head,
        |        smp[CAST(greatest(1, least(len(smp), (1 * (len(smp) + 1)) // 3)) AS INT)] AS c_mid
        |       FROM smp)
        |SELECT j.doc_id, j.source, j.avg_logp,
        |  CAST(CASE WHEN cu.c_head IS NULL THEN 0
        |    WHEN j.avg_logp >= cu.c_head THEN 0
        |    WHEN j.avg_logp >= cu.c_mid THEN 1 ELSE 2 END AS BIGINT) AS bucket_id,
        |  CASE WHEN cu.c_head IS NULL THEN 'head'
        |    WHEN j.avg_logp >= cu.c_head THEN 'head'
        |    WHEN j.avg_logp >= cu.c_mid THEN 'middle' ELSE 'tail' END AS ppl_bucket
        |FROM j LEFT JOIN cu ON j.source = cu.source ORDER BY doc_id""".stripMargin,
    // D1b: keep-at-most-c exact dedup; the c smallest ids per hash
    "q_dedup_soft" ->
      """WITH h AS (SELECT doc_id, md5(text) AS content_hash
        |           FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT doc_id, content_hash,
        |        row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rk,
        |        count(*) OVER (PARTITION BY content_hash) AS n_copies
        |      FROM h)
        |SELECT doc_id, content_hash, CAST(n_copies AS BIGINT) AS n_copies,
        |  rk <= 2 AS kept
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_infer_batches" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ws_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |o AS (SELECT doc_id, ws_tokens,
        |    CAST(length(bin(ws_tokens)) - 1 AS BIGINT) AS octave FROM t),
        |r AS (SELECT *, CAST((row_number() OVER (PARTITION BY octave
        |    ORDER BY ws_tokens, doc_id) - 1) // 32 AS BIGINT) AS batch_idx FROM o)
        |SELECT octave, batch_idx,
        |  count(*) AS n_docs,
        |  CAST(sum(ws_tokens) AS BIGINT) AS batch_tokens,
        |  CAST(max(ws_tokens) * count(*) AS BIGINT) AS padded_tokens,
        |  (CAST(max(ws_tokens) * count(*) AS BIGINT) - CAST(sum(ws_tokens) AS BIGINT))
        |    * 1000000 // CAST(max(ws_tokens) * count(*) AS BIGINT) AS waste_ppm
        |FROM r GROUP BY octave, batch_idx
        |ORDER BY octave, batch_idx""".stripMargin,
    "q_corpus_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, true AS p1, md5(text) AS h1
        |  FROM documents WHERE doc_id % 10 <> 0),
        |v2 AS (
        |  SELECT doc_id, true AS p2,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS h2
        |  FROM documents WHERE doc_id % 9 <> 1)
        |SELECT doc_id,
        |  CASE WHEN p1 IS NULL THEN 'added'
        |       WHEN p2 IS NULL THEN 'removed'
        |       WHEN h1 IS DISTINCT FROM h2 THEN 'changed' END AS status
        |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
        |WHERE CASE WHEN p1 IS NULL THEN 'added'
        |           WHEN p2 IS NULL THEN 'removed'
        |           WHEN h1 IS DISTINCT FROM h2 THEN 'changed' END IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "q_corpus_report" ->
      """WITH per AS (
        |  SELECT lang, text,
        |    CASE WHEN text IS NOT NULL
        |         THEN CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) END AS toks,
        |    CASE WHEN text IS NOT NULL
        |         THEN least(1000, CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) * 5)
        |            + least(500, (CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) / 5 AS BIGINT)
        |                        + CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) / 3 AS BIGINT)) * 20) END AS q,
        |    CASE WHEN text IS NOT NULL THEN md5(text) END AS h
        |  FROM documents),
        |s AS (SELECT count(*) AS n_docs, count(text) AS n_text_docs,
        |    coalesce(sum(toks), 0) AS total_tokens,
        |    count(DISTINCT lang) AS n_langs,
        |    count(h) - count(DISTINCT h) AS exact_dup_docs,
        |    coalesce(sum(CASE WHEN q >= 350 THEN 1 ELSE 0 END), 0) AS quality_pass_docs,
        |    coalesce(max(toks), 0) AS max_doc_tokens,
        |    coalesce(min(toks), 0) AS min_doc_tokens
        |  FROM per)
        |SELECT metric, CAST(value AS BIGINT) AS value FROM (
        |  SELECT 'n_docs' AS metric, n_docs AS value FROM s
        |  UNION ALL SELECT 'n_text_docs', n_text_docs FROM s
        |  UNION ALL SELECT 'total_tokens', total_tokens FROM s
        |  UNION ALL SELECT 'n_langs', n_langs FROM s
        |  UNION ALL SELECT 'exact_dup_docs', exact_dup_docs FROM s
        |  UNION ALL SELECT 'quality_pass_docs', quality_pass_docs FROM s
        |  UNION ALL SELECT 'max_doc_tokens', max_doc_tokens FROM s
        |  UNION ALL SELECT 'min_doc_tokens', min_doc_tokens FROM s
        |  UNION ALL SELECT 'mean_doc_tokens_x100',
        |    CASE WHEN n_text_docs > 0 THEN total_tokens * 100 // n_text_docs ELSE 0 END FROM s)
        |ORDER BY metric""".stripMargin,
    "q_bm25" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |      FROM documents WHERE text IS NOT NULL),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl,
        |    sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END) AS df_0,
        |    sum(CASE WHEN list_contains(t, 'vector') THEN 1 ELSE 0 END) AS df_1,
        |    sum(CASE WHEN list_contains(t, 'the') THEN 1 ELSE 0 END) AS df_2
        |  FROM toks),
        |tf AS (SELECT doc_id, dl,
        |    CAST(len(list_filter(t, x -> x = 'spark')) AS DOUBLE) AS tf_0,
        |    CAST(len(list_filter(t, x -> x = 'vector')) AS DOUBLE) AS tf_1,
        |    CAST(len(list_filter(t, x -> x = 'the')) AS DOUBLE) AS tf_2
        |  FROM toks)
        |SELECT doc_id, dl, round(
        |    ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_0 AS DOUBLE) + 0.5)
        |             / (CAST(df_0 AS DOUBLE) + 0.5))
        |      * (tf_0 * 2.5) / (tf_0 + 1.5 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |  + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_1 AS DOUBLE) + 0.5)
        |             / (CAST(df_1 AS DOUBLE) + 0.5))
        |      * (tf_1 * 2.5) / (tf_1 + 1.5 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
        |  + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_2 AS DOUBLE) + 0.5)
        |             / (CAST(df_2 AS DOUBLE) + 0.5))
        |      * (tf_2 * 2.5) / (tf_2 + 1.5 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)),
        |  4) AS bm25
        |FROM tf CROSS JOIN stats ORDER BY doc_id""".stripMargin,
    "q_zscore" ->
      """WITH s AS (
        |  SELECT event_type, count(*) AS n, sum(value) AS s1,
        |    sum(value*value) AS s2
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        |  round((e.value - s.s1/s.n) /
        |    sqrt(s.s2/s.n - (s.s1/s.n)*(s.s1/s.n)), 4) AS z
        |FROM events e JOIN s USING (event_type)
        |WHERE e.value IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q_winsorize" ->
      """WITH c AS (
        |  SELECT event_type, quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT e.event_id, e.event_type,
        |  round(least(greatest(e.value, c.lo), c.hi), 2) AS value_clipped,
        |  (e.value < c.lo OR e.value > c.hi) AS was_clipped
        |FROM events e JOIN c USING (event_type)
        |WHERE e.value IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q_embedding_drift" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
        |    vec_id % 2 = 0 AS isa
        |  FROM embeddings),
        |e AS (SELECT label, isa, unnest(v) AS x, generate_subscripts(v, 1) AS i
        |      FROM v),
        |m AS (SELECT label, isa, i, avg(x) AS s FROM e GROUP BY 1, 2, 3),
        |c AS (SELECT label, isa, list(s ORDER BY i) AS centroid
        |      FROM m GROUP BY 1, 2),
        |n AS (SELECT label, isa, count(*) AS cnt FROM v GROUP BY 1, 2)
        |SELECT a.label, na.cnt AS n_a, nb.cnt AS n_b,
        |  round(list_cosine_similarity(a.centroid, b.centroid), 4) AS cos_ab
        |FROM c a JOIN c b ON a.label = b.label AND a.isa AND NOT b.isa
        |  JOIN n na ON na.label = a.label AND na.isa
        |  JOIN n nb ON nb.label = a.label AND NOT nb.isa
        |ORDER BY a.label""".stripMargin,
    // centroid = per-position mean (unnest zips with its subscripts);
    // list_cosine_similarity matches the codegen CosineSimilarity formula
    "q_group_centroid" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |e AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS i
        |      FROM v),
        |m AS (SELECT label, i, avg(x) AS s FROM e GROUP BY label, i),
        |c AS (SELECT label, list(s ORDER BY i) AS centroid FROM m GROUP BY label)
        |SELECT v.vec_id, v.label,
        |  round(list_cosine_similarity(v.v, c.centroid), 4) AS cos_centroid
        |FROM v JOIN c ON v.label = c.label
        |ORDER BY vec_id""".stripMargin,
    // the polyhash CTE reproduces graft.functions.polyhash (fold of
    // UTF-8 codepoints, h*131+c mod 2^31-1; list_reduce seeds with the
    // first element, which equals Java's 0-seeded fold since c0 < M)
    "q_global_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_transform(range(1, length('shuf42:' || CAST(doc_id AS VARCHAR)) + 1),
        |                     i -> CAST(ascii(substr('shuf42:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h
        |  FROM documents),
        |sq AS (SELECT doc_id, (h * h) % 2147483647 AS h FROM h),
        |s AS (SELECT doc_id, h, CAST(h % 64 AS INTEGER) AS shard FROM sq),
        |r AS (SELECT doc_id, shard,
        |        CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INTEGER) AS pos
        |      FROM s)
        |SELECT doc_id, shard, pos,
        |  CAST((pos - 1) * 64 + shard AS BIGINT) AS global_pos
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_epoch_plan" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS ws_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT source, CAST(sum(ws_tokens) AS BIGINT) AS corpus_tokens,
        |        CAST(floor(sqrt(CAST(sum(ws_tokens) AS DOUBLE))) AS BIGINT) AS weight
        |      FROM t GROUP BY source),
        |tot AS (SELECT CAST(sum(corpus_tokens) * 4 AS BIGINT) AS t_budget,
        |          CAST(sum(weight) AS BIGINT) AS w_sum FROM w),
        |a AS (SELECT source, corpus_tokens, weight,
        |        weight * (t_budget // w_sum)
        |          + (weight * (t_budget % w_sum)) // w_sum AS target_tokens
        |      FROM w CROSS JOIN tot)
        |SELECT source, corpus_tokens, weight, target_tokens,
        |  target_tokens // corpus_tokens AS full_epochs,
        |  ((target_tokens % corpus_tokens) * 1000000) // corpus_tokens AS partial_ppm
        |FROM a ORDER BY source""".stripMargin,
    "q_domain_mix" ->
      """WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |           FROM documents GROUP BY source),
        |w AS (SELECT source, n_s,
        |        CAST(CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
        |             THEN 3 ELSE 1 END AS BIGINT) AS w_s
        |      FROM n),
        |tot AS (SELECT CAST(sum(w_s) AS BIGINT) AS w_sum FROM w),
        |q AS (SELECT source, n_s, w_s, w_sum, (n_s * w_sum) // w_s AS n_cap
        |      FROM w CROSS JOIN tot),
        |nm AS (SELECT min(n_cap) AS n_max FROM q),
        |k AS (SELECT source, (w_s * n_max) // w_sum AS k_s FROM q CROSS JOIN nm),
        |hr AS (
        |  SELECT doc_id, source,
        |    list_reduce(
        |      list_transform(range(1, length('mix:' || CAST(doc_id AS VARCHAR)) + 1),
        |                     i -> CAST(ascii(substr('mix:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h
        |  FROM documents),
        |h1 AS (SELECT doc_id, source, (h * h) % 2147483647 AS h FROM hr),
        |hh AS (SELECT doc_id, source, (h * h) % 2147483647 AS h FROM h1),
        |r AS (SELECT doc_id, hh.source, k.k_s,
        |        CAST(row_number() OVER (PARTITION BY hh.source ORDER BY h, doc_id) AS INTEGER) AS mix_rank
        |      FROM hh JOIN k ON hh.source = k.source)
        |SELECT doc_id, source, mix_rank FROM r
        |WHERE mix_rank <= k_s ORDER BY doc_id""".stripMargin,
    // the approx twin is deterministic integer math end-to-end (sampled-
    // quantile hash threshold), so unlike C18's approx twin it carries a
    // full oracle: both polyhash lanes re-derived, the per-source sorted
    // hash sample, the clamped quantile pick, the h <= thr filter
    "q_domain_mix_approx" ->
      """WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |           FROM documents GROUP BY source),
        |w AS (SELECT source, n_s,
        |        CAST(CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
        |             THEN 3 ELSE 1 END AS BIGINT) AS w_s
        |      FROM n),
        |tot AS (SELECT CAST(sum(w_s) AS BIGINT) AS w_sum FROM w),
        |q AS (SELECT source, n_s, w_s, w_sum, (n_s * w_sum) // w_s AS n_cap
        |      FROM w CROSS JOIN tot),
        |nm AS (SELECT min(n_cap) AS n_max FROM q),
        |k AS (SELECT source, n_s, (w_s * n_max) // w_sum AS k_s FROM q CROSS JOIN nm),
        |hr AS (
        |  SELECT doc_id, source,
        |    list_reduce(
        |      list_transform(range(1, length('mix:' || CAST(doc_id AS VARCHAR)) + 1),
        |                     i -> CAST(ascii(substr('mix:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h,
        |    list_reduce(
        |      list_transform(range(1, length('mixsmp:' || CAST(doc_id AS VARCHAR)) + 1),
        |                     i -> CAST(ascii(substr('mixsmp:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h2
        |  FROM documents),
        |h1 AS (SELECT doc_id, source, (h * h) % 2147483647 AS h,
        |         (h2 * h2) % 2147483647 AS h2 FROM hr),
        |hh AS (SELECT doc_id, source, (h * h) % 2147483647 AS h,
        |         (h2 * h2) % 2147483647 AS h2 FROM h1),
        |s AS (SELECT source, list_sort(list(h)) AS smp FROM hh
        |      WHERE h2 * 16 < 2147483647 GROUP BY source),
        |t AS (SELECT k.source,
        |        CASE WHEN s.smp IS NULL OR len(s.smp) < 8
        |          THEN (k.k_s * 2147483646) // k.n_s
        |          ELSE s.smp[CAST(greatest(1, least(len(s.smp), (k.k_s * (len(s.smp) + 1)) // k.n_s)) AS INT)]
        |        END AS h_thr
        |      FROM k LEFT JOIN s ON k.source = s.source)
        |SELECT hh.doc_id, hh.source FROM hh JOIN t ON hh.source = t.source
        |WHERE hh.h <= t.h_thr ORDER BY doc_id""".stripMargin,
    // H16c selection-lane uniformity audit: all three draw lanes
    // re-derived (square-mixed polyhash), keep flag via the same
    // per-source rank, id-ordered lag for adjacency pairs, HUGEINT
    // expectation lanes
    "q_mix_uniformity" ->
      """WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |           FROM documents GROUP BY source),
        |w AS (SELECT source, n_s,
        |        CAST(CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
        |             THEN 3 ELSE 1 END AS BIGINT) AS w_s
        |      FROM n),
        |tot AS (SELECT CAST(sum(w_s) AS BIGINT) AS w_sum FROM w),
        |q AS (SELECT source, n_s, w_s, w_sum, (n_s * w_sum) // w_s AS n_cap
        |      FROM w CROSS JOIN tot),
        |nm AS (SELECT min(n_cap) AS n_max FROM q),
        |k AS (SELECT source, n_s, (w_s * n_max) // w_sum AS k_s FROM q CROSS JOIN nm),
        |hr AS (
        |  SELECT doc_id, source,
        |    list_reduce(
        |      list_transform(range(1, length('mix:' || CAST(doc_id AS VARCHAR)) + 1),
        |                     i -> CAST(ascii(substr('mix:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h,
        |    list_reduce(
        |      list_transform(range(1, length('mixsmp:' || CAST(doc_id AS VARCHAR)) + 1),
        |                     i -> CAST(ascii(substr('mixsmp:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h2,
        |    list_reduce(
        |      list_transform(range(1, length('pplsmp:' || CAST(doc_id AS VARCHAR)) + 1),
        |                     i -> CAST(ascii(substr('pplsmp:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h2p,
        |    list_reduce(
        |      list_transform(range(1, length('cursmp:' || CAST(doc_id AS VARCHAR)) + 1),
        |                     i -> CAST(ascii(substr('cursmp:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h2c,
        |    list_reduce(
        |      list_transform(range(1, length('dsir:' || CAST(doc_id AS VARCHAR)) + 1),
        |                     i -> CAST(ascii(substr('dsir:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS h2d
        |  FROM documents),
        |h1 AS (SELECT doc_id, source, (h * h) % 2147483647 AS h,
        |         (h2 * h2) % 2147483647 AS h2,
        |         (h2p * h2p) % 2147483647 AS h2p,
        |         (h2c * h2c) % 2147483647 AS h2c,
        |         (h2d * h2d) % 2147483647 AS h2d FROM hr),
        |hh AS (SELECT doc_id, source, (h * h) % 2147483647 AS h,
        |         (h2 * h2) % 2147483647 AS h2,
        |         (h2p * h2p) % 2147483647 AS h2p,
        |         (h2c * h2c) % 2147483647 AS h2c,
        |         (h2d * h2d) % 2147483647 AS h2d FROM h1),
        |f AS (SELECT hh.doc_id, hh.source, k.n_s, k.k_s,
        |        CASE WHEN row_number() OVER (PARTITION BY hh.source ORDER BY h, doc_id)
        |          <= k.k_s THEN 1 ELSE 0 END AS keep,
        |        CASE WHEN h2 * 16 < 2147483647 THEN 1 ELSE 0 END AS smp,
        |        CASE WHEN h2p * 4 < 2147483647 THEN 1 ELSE 0 END AS psmp,
        |        CASE WHEN h2c * 4 < 2147483647 THEN 1 ELSE 0 END AS csmp,
        |        CASE WHEN h2d * 16 < 2147483647 THEN 1 ELSE 0 END AS dsmp
        |      FROM hh JOIN k ON hh.source = k.source),
        |p AS (SELECT source, n_s, k_s, keep, smp, psmp, csmp, dsmp,
        |        lag(keep) OVER (PARTITION BY source ORDER BY doc_id) AS keep_p,
        |        lag(smp) OVER (PARTITION BY source ORDER BY doc_id) AS smp_p,
        |        lag(psmp) OVER (PARTITION BY source ORDER BY doc_id) AS psmp_p,
        |        lag(csmp) OVER (PARTITION BY source ORDER BY doc_id) AS csmp_p,
        |        lag(dsmp) OVER (PARTITION BY source ORDER BY doc_id) AS dsmp_p
        |      FROM f),
        |ps AS (SELECT source, n_s, k_s, CAST(count(*) AS BIGINT) AS pairs_s,
        |         CAST(sum(keep * keep_p) AS BIGINT) AS bk,
        |         CAST(sum(smp * smp_p) AS BIGINT) AS bs,
        |         CAST(sum(psmp * psmp_p) AS BIGINT) AS bp,
        |         CAST(sum(csmp * csmp_p) AS BIGINT) AS bc,
        |         CAST(sum(dsmp * dsmp_p) AS BIGINT) AS bd
        |       FROM p WHERE keep_p IS NOT NULL GROUP BY source, n_s, k_s),
        |t AS (SELECT CAST(sum(pairs_s) AS BIGINT) AS n_pairs,
        |        CAST(sum(bk) AS BIGINT) AS both_keep,
        |        CAST(sum(bs) AS BIGINT) AS both_smp,
        |        CAST(sum(bp) AS BIGINT) AS both_psmp,
        |        CAST(sum(bc) AS BIGINT) AS both_csmp,
        |        CAST(sum(bd) AS BIGINT) AS both_dsmp,
        |        sum((CAST(pairs_s AS HUGEINT) * k_s * k_s * 1000000)
        |            // (CAST(n_s AS HUGEINT) * n_s)) AS exp_keep_num
        |      FROM ps)
        |SELECT 'mix_keep' AS lane, n_pairs, both_keep AS n_both,
        |  CAST((CAST(both_keep AS HUGEINT) * 1000000) // n_pairs AS BIGINT) AS observed_ppm,
        |  CAST(exp_keep_num // n_pairs AS BIGINT) AS expected_ppm FROM t
        |UNION ALL SELECT 'mix_sample', n_pairs, both_smp,
        |  CAST((CAST(both_smp AS HUGEINT) * 1000000) // n_pairs AS BIGINT), 3906 FROM t
        |UNION ALL SELECT 'ppl_sample', n_pairs, both_psmp,
        |  CAST((CAST(both_psmp AS HUGEINT) * 1000000) // n_pairs AS BIGINT), 62500 FROM t
        |UNION ALL SELECT 'cur_sample', n_pairs, both_csmp,
        |  CAST((CAST(both_csmp AS HUGEINT) * 1000000) // n_pairs AS BIGINT), 62500 FROM t
        |UNION ALL SELECT 'dsir_sample', n_pairs, both_dsmp,
        |  CAST((CAST(both_dsmp AS HUGEINT) * 1000000) // n_pairs AS BIGINT), 3906 FROM t
        |ORDER BY lane""".stripMargin,
    // hybrid RRF: integer ppb scores; dense rank parity rests on the
    // same bit-identical DOUBLE cosine the q_ann_topk oracle proves
    "q_rank_fusion" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |dense AS (
        |  SELECT query_id, neighbor_id, r FROM (
        |    SELECT q.query_id, e.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.qvec, e.embedding::DOUBLE[]) DESC,
        |                 e.vec_id) AS r
        |    FROM q JOIN embeddings e ON e.vec_id <> q.query_id) t
        |  WHERE r <= 20),
        |toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
        |         FROM documents WHERE text IS NOT NULL),
        |qt AS (SELECT doc_id AS query_id, t AS qtok FROM toks WHERE doc_id % 50 = 0),
        |sparse AS (
        |  SELECT query_id, neighbor_id, r FROM (
        |    SELECT qt.query_id, d.doc_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY qt.query_id
        |        ORDER BY (1000 * len(list_intersect(qt.qtok, d.t)))
        |                   // len(list_distinct(qt.qtok || d.t)) DESC,
        |                 d.doc_id) AS r
        |    FROM qt JOIN toks d ON d.doc_id <> qt.query_id) t
        |  WHERE r <= 20),
        |fused AS (
        |  SELECT coalesce(d.query_id, s.query_id) AS query_id,
        |    coalesce(d.neighbor_id, s.neighbor_id) AS doc_id,
        |    CAST(coalesce(1000000000 // (60 + d.r), 0)
        |       + coalesce(1000000000 // (60 + s.r), 0) AS BIGINT) AS rrf_ppb,
        |    CAST(coalesce(d.r, 0) AS BIGINT) AS dense_rank,
        |    CAST(coalesce(s.r, 0) AS BIGINT) AS sparse_rank
        |  FROM dense d FULL OUTER JOIN sparse s
        |    ON d.query_id = s.query_id AND d.neighbor_id = s.neighbor_id)
        |SELECT query_id, doc_id, rrf_ppb, dense_rank, sparse_rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_ppb DESC, doc_id) AS fr FROM fused) z
        |WHERE fr <= 10 ORDER BY query_id, doc_id""".stripMargin,
    // every pixel of the planted staircase corpus is hash-bit
    // arithmetic: lum(x,y) = 128 + 5·Σ_{i<x} (bit(y·8+i) ? +1 : −1) —
    // the oracle rebuilds all 72 pixels per image from the planted
    // hash (same hh/hs/hf derivation as q_image_phash) and
    // re-aggregates the 3×4 tiles
    "q_image_patches" ->
      s"""WITH hh AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 16 < 3 THEN
        |      ((2 * (doc_id // 16) + 1)::HUGEINT * 14029467366897019727)
        |        % 18446744073709551616
        |    ELSE
        |      ((doc_id + 1)::HUGEINT * 11400714819323198485)
        |        % 18446744073709551616
        |    END AS hu
        |  FROM documents),
        |hs AS (
        |  SELECT doc_id,
        |    CASE WHEN hu >= 9223372036854775808
        |         THEN (hu - 18446744073709551616)::BIGINT ELSE hu::BIGINT
        |    END AS h0,
        |    doc_id % 16 AS m, doc_id // 16 AS g
        |  FROM hh),
        |hf AS (
        |  SELECT doc_id,
        |    CASE WHEN m = 1 THEN xor(h0,
        |           CASE WHEN g % 64 = 63 THEN -9223372036854775808
        |                ELSE 1::BIGINT << (g % 64) END)
        |         WHEN m = 2 THEN xor(xor(h0,
        |           CASE WHEN (g+7) % 64 = 63 THEN -9223372036854775808
        |                ELSE 1::BIGINT << ((g+7) % 64) END),
        |           CASE WHEN (g+23) % 64 = 63 THEN -9223372036854775808
        |                ELSE 1::BIGINT << ((g+23) % 64) END)
        |         ELSE h0 END AS h
        |  FROM hs),
        |b AS (SELECT doc_id, reverse(lpad(bin(h), 64, '0')) AS bits FROM hf),
        |lum AS (
        |  SELECT doc_id, x, y,
        |    128 + 5 * CAST(coalesce(list_sum(list_transform(range(1, x + 1),
        |        i -> CASE WHEN substr(bits, y*8 + i, 1) = '1' THEN 1 ELSE -1 END)), 0) AS BIGINT) AS l
        |  FROM b, range(9) tx(x), range(8) ty(y))
        |SELECT doc_id, CAST((y//4)*3 + (x//3) AS INTEGER) AS patch_id,
        |  CAST(sum(l) AS BIGINT) AS sum_lum, CAST(min(l) AS INTEGER) AS min_lum,
        |  CAST(max(l) AS INTEGER) AS max_lum
        |FROM lum GROUP BY doc_id, (y//4)*3 + (x//3)
        |ORDER BY doc_id, patch_id""".stripMargin,
    // nearest = pick the closer of the two directional inclusive
    // carries (same tagged-union construction as q_asof_forward, both
    // sort directions); cid/cts carry independently — both non-null on
    // exactly the right-side rows; tie at equal distance goes backward
    "q_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS c_ts, max(event_id) AS cid
        |      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |u AS (
        |  SELECT user_id, ts, 0 AS side, event_id,
        |         CAST(NULL AS BIGINT) AS cid, CAST(NULL AS TIMESTAMP) AS cts
        |  FROM p
        |  UNION ALL
        |  SELECT user_id, c_ts, -1, NULL, cid, c_ts FROM c),
        |w AS (
        |  SELECT user_id, ts, side, event_id,
        |    last_value(cid IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, side ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bid,
        |    last_value(cts IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, side ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bts,
        |    last_value(cid IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, side ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fid,
        |    last_value(cts IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, side ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fts
        |  FROM u)
        |SELECT event_id, user_id, ts,
        |  CASE WHEN fts IS NULL OR (bts IS NOT NULL AND
        |         epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts))
        |       THEN bid ELSE fid END AS click_event_id,
        |  CASE WHEN fts IS NULL OR (bts IS NOT NULL AND
        |         epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts))
        |       THEN bts ELSE fts END AS click_ts
        |FROM w WHERE side = 0 ORDER BY event_id""".stripMargin,
    // token-contains semantics: regexp_matches (DuckDB) and rlike
    // (Spark) are both find-anywhere; patterns are the Java/RE2-parity
    // set from Redact
    "q_loss_mask" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      text || ' reach user' || CAST(doc_id AS VARCHAR) || '@' || source
        |        || '.example.org from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |        || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        |        || ' card 4111111111111111'
        |    ELSE text END AS t0
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id, string_split(t0, ' ') AS toks,
        |    list_transform(string_split(t0, ' '), s ->
        |      CASE WHEN regexp_matches(s,
        |        '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}|\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b|[0-9]{13,}')
        |      THEN '1' ELSE '0' END) AS marks
        |  FROM base)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(marks, x -> x = '1')) AS BIGINT) AS n_masked,
        |  array_to_string(marks, '') AS mask_bits
        |FROM m ORDER BY doc_id""".stripMargin,
    // F8's chunk construction (parity proven by q_doc_chunk) + D1's
    // keep-min canonical on the packed doc*2^24+chunk long
    "q_chunk_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, t, unnest(range(0, len(t), 16)) AS start FROM toks),
        |ch AS (SELECT doc_id, CAST(start // 16 AS BIGINT) AS chunk_id,
        |         md5(array_to_string(list_slice(t, start + 1, start + 16), ' ')) AS h,
        |         doc_id * 16777216 + (start // 16) AS packed
        |       FROM s),
        |c AS (SELECT h, min(packed) AS canon FROM ch GROUP BY h)
        |SELECT doc_id, chunk_id, packed = canon AS kept
        |FROM ch JOIN c USING (h)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // D16b rebuild: same canonical rule, then per-doc reassembly of the
    // kept chunks in chunk order (list ORDER BY + FILTER mirrors the
    // Spark sort_array(collect_list(when(...))) null-skip semantics)
    "q_chunk_dedup_apply" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, t, unnest(range(0, len(t), 16)) AS start FROM toks),
        |ch AS (SELECT doc_id, CAST(start // 16 AS BIGINT) AS chunk_id,
        |         array_to_string(list_slice(t, start + 1, start + 16), ' ') AS chunk_text,
        |         md5(array_to_string(list_slice(t, start + 1, start + 16), ' ')) AS h,
        |         doc_id * 16777216 + (start // 16) AS packed
        |       FROM s),
        |c AS (SELECT h, min(packed) AS canon FROM ch GROUP BY h),
        |k AS (SELECT doc_id, chunk_id, chunk_text, packed = canon AS kept
        |      FROM ch JOIN c USING (h))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  COALESCE(array_to_string(list(chunk_text ORDER BY chunk_id)
        |    FILTER (WHERE kept), ' '), '') AS clean_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |        list_transform(range(1, len(tk) - 1), i ->
        |          tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS gram
        |      FROM t),
        |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  (CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |    // CAST(count(*) AS BIGINT) AS novelty_ppm
        |FROM g JOIN f USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_doc_keywords" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM terms GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |r AS (SELECT doc_id, term, tf, df,
        |        (tf * 1000000) // df AS score_ppm,
        |        CAST(row_number() OVER (PARTITION BY doc_id
        |          ORDER BY (tf * 1000000) // df DESC, term) AS INTEGER) AS term_rank
        |      FROM tf JOIN df USING (term))
        |SELECT doc_id, term_rank, term, tf, df, score_ppm
        |FROM r WHERE term_rank <= 3
        |ORDER BY doc_id, term_rank""".stripMargin,
    // F25 [R]→[O] (round 15): DuckDB has no zlib, so the deflate pass
    // (the "fit") pins per doc; the oracle replays the doc set, demands
    // the pinned n_bytes EQUAL the recomputed UTF-8 octet length (the
    // non-circular half), and replays the integer ratio arithmetic.
    "q_compression_ratio" -> s"""
        |WITH z AS (SELECT doc_id, n_bytes, n_compressed
        |           FROM read_parquet('${artifactGlob("deflate6_lens")}')),
        |d AS (SELECT doc_id, octet_length(encode(text)) AS nb
        |      FROM documents WHERE text IS NOT NULL)
        |SELECT z.doc_id, z.n_bytes, z.n_compressed,
        |  CAST(CASE WHEN z.n_bytes = 0 THEN 0
        |       ELSE z.n_compressed * 1000 // z.n_bytes END AS BIGINT)
        |    AS ratio_x1000
        |FROM z JOIN d ON d.doc_id = z.doc_id AND d.nb = z.n_bytes
        |ORDER BY z.doc_id""".stripMargin,
    // F27/F28 share the deterministic branch-exercising mutation of
    // LlmOps.ruleEnriched; chr(10) mirrors the Scala "\n" literals
    "q_gopher_rules" ->
      """WITH enr AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 1 THEN text || ' ### ... ### #'
        |         WHEN doc_id % 7 = 2 THEN '- intro' || chr(10) || '- ' || text
        |           || chr(10) || '- one' || chr(10) || '- two' || chr(10) || '- three'
        |         WHEN doc_id % 7 = 3 THEN 'tiny doc'
        |         WHEN doc_id % 7 = 4 THEN text
        |           || ' 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15'
        |         ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (
        |  SELECT doc_id, text,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |    CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT) AS n_lines,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS nonspace,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
        |      + CAST((length(text) - length(replace(text, '...', ''))) AS BIGINT) // 3
        |      AS symbols,
        |    CAST((length(text) - length(replace(text, chr(10) || '- ', ''))) AS BIGINT) // 3
        |      + CASE WHEN text LIKE '- %' THEN 1 ELSE 0 END AS bullets,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
        |    CAST((CASE WHEN ' ' || text || ' ' LIKE '% the %' THEN 1 ELSE 0 END)
        |      + (CASE WHEN ' ' || text || ' ' LIKE '% be %' THEN 1 ELSE 0 END)
        |      + (CASE WHEN ' ' || text || ' ' LIKE '% to %' THEN 1 ELSE 0 END)
        |      + (CASE WHEN ' ' || text || ' ' LIKE '% of %' THEN 1 ELSE 0 END)
        |      + (CASE WHEN ' ' || text || ' ' LIKE '% and %' THEN 1 ELSE 0 END)
        |      + (CASE WHEN ' ' || text || ' ' LIKE '% that %' THEN 1 ELSE 0 END)
        |      + (CASE WHEN ' ' || text || ' ' LIKE '% have %' THEN 1 ELSE 0 END)
        |      + (CASE WHEN ' ' || text || ' ' LIKE '% with %' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS stop_hits
        |  FROM enr),
        |r AS (
        |  SELECT doc_id, n_words, n_lines,
        |    (nonspace * 100) // n_words AS mean_word_len_x100,
        |    (symbols * 1000000) // n_words AS symbol_word_ppm,
        |    (bullets * 1000000) // n_lines AS bullet_line_ppm,
        |    (alpha_words * 1000000) // n_words AS alpha_word_ppm,
        |    stop_hits
        |  FROM f)
        |SELECT doc_id, n_words, n_lines, mean_word_len_x100, symbol_word_ppm,
        |  bullet_line_ppm, alpha_word_ppm, stop_hits,
        |  (n_words BETWEEN 10 AND 100000)
        |    AND (mean_word_len_x100 BETWEEN 300 AND 1000)
        |    AND symbol_word_ppm < 100000 AND bullet_line_ppm < 900000
        |    AND alpha_word_ppm >= 800000 AND stop_hits >= 1 AS gopher_pass
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_script_mix" ->
      """WITH enr AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 1 THEN text || ' ### ... ### #'
        |         WHEN doc_id % 7 = 2 THEN '- intro' || chr(10) || '- ' || text
        |           || chr(10) || '- one' || chr(10) || '- two' || chr(10) || '- three'
        |         WHEN doc_id % 7 = 3 THEN 'tiny doc'
        |         WHEN doc_id % 7 = 4 THEN text
        |           || ' 0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15'
        |         ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_total,
        |    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS a,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS d,
        |    CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS BIGINT) AS s
        |  FROM enr WHERE length(text) > 0),
        |r AS (
        |  SELECT doc_id, n_chars_total,
        |    (a * 1000000) // n_chars_total AS alpha_ppm,
        |    (d * 1000000) // n_chars_total AS digit_ppm,
        |    (s * 1000000) // n_chars_total AS space_ppm
        |  FROM f)
        |SELECT doc_id, n_chars_total, alpha_ppm, digit_ppm, space_ppm,
        |  1000000 - alpha_ppm - digit_ppm - space_ppm AS other_ppm,
        |  CASE WHEN alpha_ppm >= digit_ppm AND alpha_ppm >= space_ppm
        |         AND alpha_ppm >= (1000000 - alpha_ppm - digit_ppm - space_ppm)
        |       THEN 'alpha'
        |       WHEN digit_ppm >= space_ppm
        |         AND digit_ppm >= (1000000 - alpha_ppm - digit_ppm - space_ppm)
        |       THEN 'digit'
        |       WHEN space_ppm >= (1000000 - alpha_ppm - digit_ppm - space_ppm)
        |       THEN 'space'
        |       ELSE 'other' END AS dominant
        |FROM r ORDER BY doc_id""".stripMargin,
    // F29's oracle runs the unnest+groupBy formulation the Spark side
    // deliberately avoids (sorted-neighbor HOF, no token shuffle) —
    // agreement proves the rewrite exact
    "q_ttr" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |per AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |        FROM words GROUP BY doc_id, w),
        |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |          CAST(count(*) AS BIGINT) AS n_types,
        |          CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax
        |        FROM per GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_types, n_hapax,
        |  (n_types * 1000000) // n_tokens AS ttr_ppm,
        |  (n_hapax * 1000000) // n_types AS hapax_ppm
        |FROM agg ORDER BY doc_id""".stripMargin,
    "q_time_weighted_avg" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        |l AS (SELECT user_id, event_id, us, value,
        |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dt_us
        |      FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(dt_us) AS BIGINT) AS dur_us,
        |  round(sum(value * dt_us) / sum(dt_us), 4) AS twa
        |FROM l WHERE dt_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_event_transitions" ->
      """WITH l AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS from_type
        |  FROM events),
        |p AS (SELECT from_type, event_type AS to_type, CAST(count(*) AS BIGINT) AS n
        |      FROM l WHERE from_type IS NOT NULL GROUP BY from_type, event_type),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM p GROUP BY from_type)
        |SELECT p.from_type, p.to_type, p.n, t.n_from,
        |  CAST((CAST(p.n AS HUGEINT) * 1000000) // t.n_from AS BIGINT) AS prob_ppm
        |FROM p JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    // G3h: the Spark side REALLY encodes each doc as a 16-segment PCM
    // WAV and decodes it back through the RIFF parser; the oracle
    // recomputes the expected envelope-contour hash from the planted
    // amplitude arithmetic with NO audio codec — hash parity proves the
    // encode→decode→envelope pipeline bit-exact (the G3b/G3c proof
    // shape). 63 bits: bit i (0..62) set iff window i is louder than
    // window i+1; windows align 4-per-segment by construction.
    "q_audio_fingerprint" ->
      """WITH d AS (SELECT doc_id, doc_id // 8 AS g,
        |             (doc_id % 8 = 7) AS pert FROM documents),
        |sx AS (SELECT doc_id, g, pert, unnest(range(0, 64)) AS s FROM d),
        |seg AS (SELECT doc_id, s,
        |    (xor(((g * 2654435761) % 2147483647) * (10007 + 74 * s) % 2147483647,
        |         ((g * 2654435761) % 2147483647) * (10007 + 74 * s) % 2147483647
        |           // 65536) % 97) * 120
        |      + CASE WHEN pert AND s = g % 64 THEN 13000 ELSE 1000 END AS amp
        |  FROM sx)
        |SELECT a.doc_id, CAST(coalesce(sum(CASE WHEN a.amp > b.amp
        |    THEN CAST(1 AS BIGINT) << CAST(a.s AS INTEGER)
        |    ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS ehash
        |FROM seg a JOIN seg b ON a.doc_id = b.doc_id AND b.s = a.s + 1
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,
    // G3h near-dup: banding is COMPLETE for hamming <= 3, so the Spark
    // output must equal this ALL-PAIRS answer exactly (the G3e proof)
    "q_audio_neardup" ->
      """WITH d AS (SELECT doc_id, doc_id // 8 AS g,
        |             (doc_id % 8 = 7) AS pert FROM documents),
        |sx AS (SELECT doc_id, g, pert, unnest(range(0, 64)) AS s FROM d),
        |seg AS (SELECT doc_id, s,
        |    (xor(((g * 2654435761) % 2147483647) * (10007 + 74 * s) % 2147483647,
        |         ((g * 2654435761) % 2147483647) * (10007 + 74 * s) % 2147483647
        |           // 65536) % 97) * 120
        |      + CASE WHEN pert AND s = g % 64 THEN 13000 ELSE 1000 END AS amp
        |  FROM sx),
        |h AS (SELECT a.doc_id, CAST(coalesce(sum(CASE WHEN a.amp > b.amp
        |        THEN CAST(1 AS BIGINT) << CAST(a.s AS INTEGER)
        |        ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS ehash
        |      FROM seg a JOIN seg b ON a.doc_id = b.doc_id AND b.s = a.s + 1
        |      GROUP BY a.doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.ehash, b.ehash)) AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ehash, b.ehash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "q_knn_classify" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
        |  FROM embeddings WHERE vec_id % 50 = 0),
        |topk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.query_id, e.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.qvec, e.embedding::DOUBLE[]) DESC,
        |                 e.vec_id) AS r
        |    FROM q JOIN embeddings e ON e.vec_id <> q.query_id) t
        |  WHERE r <= 10),
        |v AS (SELECT t.query_id, CAST(e.label AS BIGINT) AS label,
        |        CAST(count(*) AS BIGINT) AS votes
        |      FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
        |      GROUP BY t.query_id, e.label),
        |p AS (SELECT query_id, label AS predicted_label, votes,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY votes DESC, label) AS rn
        |      FROM v)
        |SELECT p.query_id, CAST(e.label AS BIGINT) AS true_label,
        |  p.predicted_label, p.votes,
        |  CAST(e.label AS BIGINT) = p.predicted_label AS correct
        |FROM p JOIN embeddings e ON e.vec_id = p.query_id
        |WHERE rn = 1 ORDER BY query_id""".stripMargin,
    // A18: the same live-catalog VALUES as q_discover_catalog, trimmed
    // to (table, column, type), with the baseline mutation applied in
    // SQL — the full-outer classification must match exactly
    "q_schema_drift" ->
      """WITH cur AS (SELECT * FROM (VALUES
        |  ('region', 'r_regionkey', 'int'), ('region', 'r_name', 'string'),
        |  ('nation', 'n_nationkey', 'int'), ('nation', 'n_name', 'string'),
        |  ('nation', 'n_regionkey', 'int'),
        |  ('customer', 'c_custkey', 'bigint'), ('customer', 'c_name', 'string'),
        |  ('customer', 'c_nationkey', 'int'), ('customer', 'c_acctbal', 'double'),
        |  ('customer', 'c_mktsegment', 'string'),
        |  ('supplier', 's_suppkey', 'bigint'), ('supplier', 's_name', 'string'),
        |  ('supplier', 's_nationkey', 'int'), ('supplier', 's_acctbal', 'double'),
        |  ('part', 'p_partkey', 'bigint'), ('part', 'p_name', 'string'),
        |  ('part', 'p_brand', 'string'), ('part', 'p_type', 'string'),
        |  ('part', 'p_size', 'int'), ('part', 'p_retailprice', 'double'),
        |  ('orders', 'o_orderkey', 'bigint'), ('orders', 'o_custkey', 'bigint'),
        |  ('orders', 'o_orderstatus', 'string'), ('orders', 'o_totalprice', 'double'),
        |  ('orders', 'o_orderdate', 'timestamp'),
        |  ('orders', 'o_orderpriority', 'string'),
        |  ('lineitem', 'l_orderkey', 'bigint'), ('lineitem', 'l_partkey', 'bigint'),
        |  ('lineitem', 'l_suppkey', 'bigint'), ('lineitem', 'l_linenumber', 'int'),
        |  ('lineitem', 'l_quantity', 'double'),
        |  ('lineitem', 'l_extendedprice', 'double'),
        |  ('lineitem', 'l_discount', 'double'), ('lineitem', 'l_tax', 'double'),
        |  ('lineitem', 'l_returnflag', 'string'),
        |  ('lineitem', 'l_linestatus', 'string'),
        |  ('lineitem', 'l_shipdate', 'timestamp'),
        |  ('events', 'event_id', 'bigint'), ('events', 'ts', 'timestamp'),
        |  ('events', 'user_id', 'bigint'), ('events', 'event_type', 'string'),
        |  ('events', 'value', 'double'), ('events', 'props', 'string'),
        |  ('documents', 'doc_id', 'bigint'), ('documents', 'text', 'string'),
        |  ('documents', 'lang', 'string'), ('documents', 'source', 'string'),
        |  ('documents', 'n_chars', 'bigint'),
        |  ('embeddings', 'vec_id', 'bigint'),
        |  ('embeddings', 'embedding', 'array<float>'),
        |  ('embeddings', 'label', 'int'),
        |  ('v_active_customer', 'c_custkey', 'bigint'),
        |  ('v_active_customer', 'c_name', 'string'),
        |  ('v_active_customer', 'c_acctbal', 'double')
        |) AS t(table_name, column_name, sql_type)),
        |base AS (
        |  SELECT table_name, column_name,
        |    CASE WHEN column_name = 'p_size' THEN 'bigint' ELSE sql_type END
        |      AS sql_type
        |  FROM cur WHERE column_name NOT IN ('c_mktsegment', 'l_tax')
        |  UNION ALL SELECT 'events', 'legacy_ip', 'string')
        |SELECT coalesce(c.table_name, b.table_name) AS table_name,
        |  coalesce(c.column_name, b.column_name) AS column_name,
        |  CASE WHEN b.sql_type IS NULL THEN 'added'
        |       WHEN c.sql_type IS NULL THEN 'removed'
        |       ELSE 'type_changed' END AS change,
        |  b.sql_type AS baseline_type, c.sql_type AS current_type
        |FROM cur c FULL OUTER JOIN base b
        |  ON c.table_name = b.table_name AND c.column_name = b.column_name
        |WHERE b.sql_type IS NULL OR c.sql_type IS NULL OR c.sql_type <> b.sql_type
        |ORDER BY table_name, column_name""".stripMargin,
    "q_active_users_trailing" ->
      """WITH grid AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM grid),
        |c AS (SELECT DISTINCT d.day AS window_day, g.user_id
        |      FROM days d JOIN grid g ON g.day BETWEEN d.day - 6 AND d.day)
        |SELECT window_day, CAST(count(*) AS BIGINT) AS active_users_7d
        |FROM c GROUP BY window_day ORDER BY window_day""".stripMargin,
    // C33b REGIME-BOUNDED oracle (round 12, the r11-verdict item-8
    // promotion): the sf0.01 corpus has 150 distinct users < k=1024, so
    // the KMV sketch never saturates — it IS the distinct hash set and
    // the estimate is the exact distinct count. Above saturation the
    // sketch is engine-specific and WarehouseSpec's error band governs.
    "q_active_users_trailing_approx" ->
      """WITH grid AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM grid),
        |c AS (SELECT DISTINCT d.day AS window_day, g.user_id
        |      FROM days d JOIN grid g ON g.day BETWEEN d.day - 6 AND d.day)
        |SELECT window_day, CAST(count(*) AS BIGINT) AS active_users_7d_est
        |FROM c GROUP BY window_day ORDER BY window_day""".stripMargin,
    // C34: DuckDB median() IS quantile_cont(0.5) — the same linear
    // interpolation at h=(n-1)/2 as Spark's exact `percentile`; the
    // outlier predicate uses the UNROUNDED med/mad on both sides
    "q_outlier_mad" ->
      """WITH m AS (SELECT event_type, median(value) AS med
        |           FROM events GROUP BY event_type),
        |d AS (SELECT e.event_type, e.value, m.med
        |      FROM events e JOIN m USING (event_type)),
        |s AS (SELECT event_type, median(abs(value - med)) AS mad
        |      FROM d GROUP BY event_type)
        |SELECT d.event_type, round(any_value(d.med), 4) AS med,
        |  round(any_value(s.mad), 4) AS mad,
        |  CAST(sum(CASE WHEN abs(d.value - d.med) > 3.0 * 1.4826 * s.mad
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM d JOIN s USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    "q_cohort_value" ->
      """WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |           FROM events GROUP BY user_id),
        |sz AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_users
        |       FROM f GROUP BY cohort_day),
        |cells AS (
        |  SELECT f.cohort_day,
        |    CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT)
        |      AS day_idx,
        |    CAST(count(*) AS BIGINT) AS n_purchases, sum(e.value) AS v
        |  FROM events e JOIN f USING (user_id)
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY f.cohort_day, day_idx)
        |SELECT c.cohort_day, c.day_idx, sz.n_users, c.n_purchases,
        |  round(c.v, 4) AS day_value,
        |  round(sum(c.v) OVER (PARTITION BY c.cohort_day ORDER BY c.day_idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_value
        |FROM cells c JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, day_idx""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |           FROM events WHERE user_id IS NOT NULL),
        |w AS (SELECT *,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS click_us
        |  FROM e)
        |SELECT event_id AS purchase_id, user_id, us AS purchase_us,
        |  CASE WHEN click_id IS NOT NULL
        |            AND us - click_us <= CAST(604800000000 AS BIGINT)
        |       THEN click_id END AS attributed_click_id,
        |  CASE WHEN click_id IS NOT NULL
        |            AND us - click_us <= CAST(604800000000 AS BIGINT)
        |       THEN us - click_us END AS lag_us,
        |  (click_id IS NOT NULL
        |    AND us - click_us <= CAST(604800000000 AS BIGINT)) AS attributed
        |FROM w WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin,
    "q_market_basket" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM d a JOIN d b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY part_a, part_b HAVING n_ab >= 2),
        |c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders
        |      FROM d GROUP BY l_partkey),
        |t AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_total FROM d)
        |SELECT p.part_a, p.part_b, p.n_ab,
        |  ca.n_orders AS n_a, cb.n_orders AS n_b,
        |  CAST((CAST(p.n_ab AS HUGEINT) * t.n_total * 1000000)
        |    // (CAST(ca.n_orders AS HUGEINT) * cb.n_orders) AS BIGINT)
        |    AS lift_ppm
        |FROM pairs p
        |JOIN c ca ON ca.l_partkey = p.part_a
        |JOIN c cb ON cb.l_partkey = p.part_b
        |CROSS JOIN t
        |ORDER BY part_a, part_b""".stripMargin,
    "q_domain_cap" ->
      """WITH r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_source
        |  FROM documents)
        |SELECT doc_id, source, n_source, rn <= 10 AS kept
        |FROM r ORDER BY doc_id""".stripMargin,
    // H18: same 16-token/16-stride chunking + md5 as q_chunk_dedup's
    // oracle, with the naive id-hash split applied in SQL
    "q_split_leakage" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |s AS (SELECT doc_id, t, unnest(range(0, len(t), 16)) AS start FROM toks),
        |ch AS (SELECT DISTINCT doc_id,
        |         md5(array_to_string(list_slice(t, start + 1, start + 16), ' '))
        |           AS h
        |       FROM s),
        |sp AS (SELECT h, doc_id,
        |         CASE WHEN doc_id % 10 < 8 THEN 'train'
        |              WHEN doc_id % 10 < 9 THEN 'val'
        |              ELSE 'test' END AS split
        |       FROM ch)
        |SELECT h, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
        |  array_to_string(list_sort(list(DISTINCT split)), ',') AS splits
        |FROM sp GROUP BY h HAVING n_splits > 1 ORDER BY h""".stripMargin,
    // C38: DuckDB quantile_cont == Spark exact percentile (both linear
    // interpolation at h=(n-1)p); latencies are exact integer micros
    "q_funnel_time" ->
      """WITH ev AS (SELECT user_id, ts, event_type FROM events),
        |v AS (SELECT user_id, min(ts) AS t_view FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts >= v.t_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
        |      GROUP BY e.user_id),
        |lat AS (
        |  SELECT 'view_to_click' AS step,
        |    epoch_us(c.t_click) - epoch_us(v.t_view) AS lat_us
        |  FROM v JOIN c ON v.user_id = c.user_id
        |  UNION ALL
        |  SELECT 'click_to_purchase' AS step,
        |    epoch_us(p.t_purchase) - epoch_us(c.t_click) AS lat_us
        |  FROM c JOIN p ON c.user_id = p.user_id)
        |SELECT step, CAST(count(*) AS BIGINT) AS n_converted,
        |  round(quantile_cont(lat_us, 0.5), 1) AS median_lat_us,
        |  round(quantile_cont(lat_us, 0.9), 1) AS p90_lat_us
        |FROM lat GROUP BY step ORDER BY step""".stripMargin,
    // I4: the I1 latest-change rule replayed at each checkpoint — the
    // oracle states the window row_number form of the same selection
    "q_snapshot_series" ->
      """WITH cps AS (SELECT unnest(ARRAY[
        |    TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-15',
        |    TIMESTAMP '2024-01-22', TIMESTAMP '2024-01-29']) AS cp),
        |log AS (SELECT user_id, ts, event_id,
        |          CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |          value
        |        FROM events),
        |lasts AS (
        |  SELECT cp, user_id, op, value,
        |    row_number() OVER (PARTITION BY cp, user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM log JOIN cps ON ts < cp)
        |SELECT CAST(cp AS DATE) AS checkpoint,
        |  CAST(count(*) AS BIGINT) AS live_users,
        |  round(sum(value), 2) AS total_value
        |FROM lasts WHERE rn = 1 AND op <> 'D'
        |GROUP BY cp ORDER BY checkpoint""".stripMargin,
    // E15: E1's oracle with the predicate applied to the corpus side
    "q_ann_filtered" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec
        |  FROM embeddings WHERE vec_id % 50 = 0)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_cosine_similarity(q.qvec, e.embedding::DOUBLE[]) DESC,
        |               e.vec_id) AS "rank"
        |  FROM q JOIN embeddings e
        |    ON e.vec_id <> q.query_id AND e.label = 1) t
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,
    // I5: the I2 episode CTE joined on [valid_from, valid_to) containment
    "q_scd2_asof" ->
      """WITH cps AS (SELECT unnest(ARRAY[
        |    TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-15',
        |    TIMESTAMP '2024-01-22', TIMESTAMP '2024-01-29']) AS cp),
        |changes AS (
        |  SELECT user_id, ts, event_id, props,
        |    lag(props) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |episodes AS (
        |  SELECT user_id, props, ts, event_id FROM changes
        |  WHERE rn = 1 OR props IS DISTINCT FROM prev),
        |hist AS (
        |  SELECT user_id, props, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS valid_to
        |  FROM episodes)
        |SELECT CAST(cp AS DATE) AS checkpoint, user_id, props, valid_from
        |FROM hist JOIN cps
        |  ON valid_from <= cp AND (valid_to IS NULL OR cp < valid_to)
        |ORDER BY checkpoint, user_id""".stripMargin,
    "q_event_paths" ->
      """WITH w AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS t3
        |  FROM events)
        |SELECT event_type || '>' || t2 || '>' || t3 AS path,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM w WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin,
    // C40: ten unrolled integer-ppb iterations -- the engines replay
    // the identical DIV arithmetic, so ranks compare bit-for-bit
    "q_pagerank" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(count(*) AS BIGINT) AS n
        |  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY pa, pb HAVING n >= 2),
        |edges AS (SELECT pa AS src, pb AS dst FROM pairs
        |          UNION ALL SELECT pb AS src, pa AS dst FROM pairs),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nodes),
        |r0 AS (SELECT node, 1000000000 // cnt AS r FROM nodes CROSS JOIN nn),
        |r1 AS (
        |  SELECT nd.node,
        |    (150000000 // nn.cnt) + (850 * coalesce(c.s, 0)) // 1000 AS r
        |  FROM nodes nd CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT) AS s
        |    FROM edges e JOIN r0 p ON p.node = e.src
        |                 JOIN deg dg ON dg.src = e.src
        |    GROUP BY e.dst) c ON c.node = nd.node),
        |r2 AS (
        |  SELECT nd.node,
        |    (150000000 // nn.cnt) + (850 * coalesce(c.s, 0)) // 1000 AS r
        |  FROM nodes nd CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT) AS s
        |    FROM edges e JOIN r1 p ON p.node = e.src
        |                 JOIN deg dg ON dg.src = e.src
        |    GROUP BY e.dst) c ON c.node = nd.node),
        |r3 AS (
        |  SELECT nd.node,
        |    (150000000 // nn.cnt) + (850 * coalesce(c.s, 0)) // 1000 AS r
        |  FROM nodes nd CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT) AS s
        |    FROM edges e JOIN r2 p ON p.node = e.src
        |                 JOIN deg dg ON dg.src = e.src
        |    GROUP BY e.dst) c ON c.node = nd.node),
        |r4 AS (
        |  SELECT nd.node,
        |    (150000000 // nn.cnt) + (850 * coalesce(c.s, 0)) // 1000 AS r
        |  FROM nodes nd CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT) AS s
        |    FROM edges e JOIN r3 p ON p.node = e.src
        |                 JOIN deg dg ON dg.src = e.src
        |    GROUP BY e.dst) c ON c.node = nd.node),
        |r5 AS (
        |  SELECT nd.node,
        |    (150000000 // nn.cnt) + (850 * coalesce(c.s, 0)) // 1000 AS r
        |  FROM nodes nd CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT) AS s
        |    FROM edges e JOIN r4 p ON p.node = e.src
        |                 JOIN deg dg ON dg.src = e.src
        |    GROUP BY e.dst) c ON c.node = nd.node),
        |r6 AS (
        |  SELECT nd.node,
        |    (150000000 // nn.cnt) + (850 * coalesce(c.s, 0)) // 1000 AS r
        |  FROM nodes nd CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT) AS s
        |    FROM edges e JOIN r5 p ON p.node = e.src
        |                 JOIN deg dg ON dg.src = e.src
        |    GROUP BY e.dst) c ON c.node = nd.node),
        |r7 AS (
        |  SELECT nd.node,
        |    (150000000 // nn.cnt) + (850 * coalesce(c.s, 0)) // 1000 AS r
        |  FROM nodes nd CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT) AS s
        |    FROM edges e JOIN r6 p ON p.node = e.src
        |                 JOIN deg dg ON dg.src = e.src
        |    GROUP BY e.dst) c ON c.node = nd.node),
        |r8 AS (
        |  SELECT nd.node,
        |    (150000000 // nn.cnt) + (850 * coalesce(c.s, 0)) // 1000 AS r
        |  FROM nodes nd CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT) AS s
        |    FROM edges e JOIN r7 p ON p.node = e.src
        |                 JOIN deg dg ON dg.src = e.src
        |    GROUP BY e.dst) c ON c.node = nd.node),
        |r9 AS (
        |  SELECT nd.node,
        |    (150000000 // nn.cnt) + (850 * coalesce(c.s, 0)) // 1000 AS r
        |  FROM nodes nd CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT) AS s
        |    FROM edges e JOIN r8 p ON p.node = e.src
        |                 JOIN deg dg ON dg.src = e.src
        |    GROUP BY e.dst) c ON c.node = nd.node),
        |r10 AS (
        |  SELECT nd.node,
        |    (150000000 // nn.cnt) + (850 * coalesce(c.s, 0)) // 1000 AS r
        |  FROM nodes nd CROSS JOIN nn
        |  LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.r // dg.outdeg) AS BIGINT) AS s
        |    FROM edges e JOIN r9 p ON p.node = e.src
        |                 JOIN deg dg ON dg.src = e.src
        |    GROUP BY e.dst) c ON c.node = nd.node)
        |SELECT node AS part, CAST(r AS BIGINT) AS rank_ppb FROM r10 ORDER BY part""".stripMargin,
    // C41: replica means from bucket sums; identical double arithmetic
    // ((s-s_b)/(n-n_b), squared deviations, 1.96 band) on both engines
    "q_jackknife_ci" ->
      """WITH b AS (
        |  SELECT event_type, event_id % 50 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_b, sum(value) AS s_b
        |  FROM events GROUP BY event_type, bucket),
        |t AS (SELECT event_type, CAST(sum(n_b) AS BIGINT) AS n, sum(s_b) AS s
        |      FROM b GROUP BY event_type),
        |r AS (SELECT b.event_type, (t.s - b.s_b) / (t.n - b.n_b) AS mean_b
        |      FROM b JOIN t USING (event_type)),
        |m AS (SELECT event_type, avg(mean_b) AS md,
        |        CAST(count(*) AS BIGINT) AS nb
        |      FROM r GROUP BY event_type),
        |j AS (SELECT r.event_type,
        |        sqrt((m.nb - 1.0) / m.nb *
        |             sum((r.mean_b - m.md) * (r.mean_b - m.md))) AS se_raw
        |      FROM r JOIN m USING (event_type)
        |      GROUP BY r.event_type, m.nb)
        |SELECT t.event_type, t.n, round(t.s / t.n, 6) AS mean,
        |  round(j.se_raw, 6) AS se,
        |  round(t.s / t.n - 1.96 * j.se_raw, 6) AS ci_lo,
        |  round(t.s / t.n + 1.96 * j.se_raw, 6) AS ci_hi
        |FROM t JOIN j USING (event_type) ORDER BY event_type""".stripMargin,
    // C42: integer lanes; seasonal uses explicit FLOOR division (a − amod)
    // // n with amod = ((a % n) + n) % n ∈ [0, n) — Spark's pmod — because
    // detrended sums go negative, and negative-operand `//`↔DIV rounding
    // is version-fragile across engines (this DuckDB truncates like DIV
    // today); the exactly-divisible numerator makes both modes agree.
    // isodow−1 ≡ Spark weekday (0 = Monday).
    "q_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM daily),
        |series AS (
        |  SELECT s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (d)),
        |t AS (
        |  SELECT d, y, count(*) OVER w AS n7,
        |    CAST(sum(y) OVER w AS BIGINT) AS trend_x7
        |  FROM series
        |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |wt AS (
        |  SELECT d, CAST(isodow(d) - 1 AS BIGINT) AS dow, y, trend_x7,
        |    7 * y - trend_x7 AS detr_x7
        |  FROM t WHERE n7 = 7),
        |seas AS (
        |  SELECT dow, CAST((1000 * sum(detr_x7)
        |      - ((1000 * sum(detr_x7) % count(*)) + count(*)) % count(*))
        |      // count(*) AS BIGINT) AS seas_x7000
        |  FROM wt GROUP BY dow)
        |SELECT wt.d, wt.dow, wt.y, wt.trend_x7, seas.seas_x7000,
        |  CAST(7000 * wt.y - 1000 * wt.trend_x7 - seas.seas_x7000 AS BIGINT)
        |    AS resid_x7000
        |FROM wt JOIN seas USING (dow) ORDER BY wt.d""".stripMargin,
    // C45: S_d = max(0, S_{d−1} + x_d) replayed as prefix − min(0,
    // running-min of prefix); μ and k divisions have positive operands,
    // where every integer-division rounding mode agrees.
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM daily),
        |series AS (
        |  SELECT s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (d)),
        |m AS (SELECT CAST((1000 * sum(y)) // count(*) AS BIGINT) AS mu_x1000
        |      FROM series),
        |u AS (
        |  SELECT d, y, mu_x1000,
        |    1000 * y - mu_x1000 - mu_x1000 // 4 AS uu,
        |    mu_x1000 - 1000 * y - mu_x1000 // 4 AS vv
        |  FROM series, m),
        |c AS (
        |  SELECT d, y, mu_x1000,
        |    CAST(sum(uu) OVER w AS BIGINT) AS pu,
        |    CAST(sum(vv) OVER w AS BIGINT) AS pv
        |  FROM u
        |  WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)),
        |r AS (
        |  SELECT d, y, mu_x1000, pu, pv,
        |    least(0, CAST(min(pu) OVER w2 AS BIGINT)) AS mrun_u,
        |    least(0, CAST(min(pv) OVER w2 AS BIGINT)) AS mrun_v
        |  FROM c
        |  WINDOW w2 AS (ORDER BY d ROWS UNBOUNDED PRECEDING))
        |SELECT d, y,
        |  pu - mrun_u AS s_pos_x1000, pv - mrun_v AS s_neg_x1000,
        |  CAST(pu - mrun_u > 2 * mu_x1000 AS INTEGER) AS alarm_up,
        |  CAST(pv - mrun_v > 2 * mu_x1000 AS INTEGER) AS alarm_down
        |FROM r ORDER BY d""".stripMargin,
    // C42b: C42's decomposition chain + C34's median/MAD flag on the
    // residual; med/mad are interpolated doubles computed from identical
    // integer inputs on both engines (the C34 parity pattern).
    "q_anomaly_days" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM daily),
        |series AS (
        |  SELECT s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (d)),
        |t AS (
        |  SELECT d, y, count(*) OVER w AS n7,
        |    CAST(sum(y) OVER w AS BIGINT) AS trend_x7
        |  FROM series
        |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |wt AS (
        |  SELECT d, CAST(isodow(d) - 1 AS BIGINT) AS dow, y, trend_x7,
        |    7 * y - trend_x7 AS detr_x7
        |  FROM t WHERE n7 = 7),
        |seas AS (
        |  SELECT dow, CAST((1000 * sum(detr_x7)
        |      - ((1000 * sum(detr_x7) % count(*)) + count(*)) % count(*))
        |      // count(*) AS BIGINT) AS seas_x7000
        |  FROM wt GROUP BY dow),
        |dec AS (
        |  SELECT wt.d, wt.y,
        |    CAST(7000 * wt.y - 1000 * wt.trend_x7 - seas.seas_x7000 AS BIGINT)
        |      AS resid_x7000
        |  FROM wt JOIN seas USING (dow)),
        |m AS (SELECT median(resid_x7000) AS med FROM dec),
        |wm AS (SELECT dec.*, m.med FROM dec, m),
        |s AS (SELECT median(abs(resid_x7000 - med)) AS mad FROM wm)
        |SELECT wm.d, wm.y, wm.resid_x7000,
        |  round(wm.med, 4) AS med, round(s.mad, 4) AS mad,
        |  CAST(CASE WHEN abs(wm.resid_x7000 - wm.med) > 3.0 * 1.4826 * s.mad
        |       THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
        |FROM wm, s ORDER BY wm.d""".stripMargin,
    // I6: arrival order = event_id within each user; running-max event
    // time over the strictly-preceding frame, microsecond lanes, ppm DIV.
    "q_late_arrivals" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(epoch_us(ts) AS BIGINT) AS us
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id, ts, us,
        |    max(us) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen
        |  FROM e),
        |l AS (
        |  SELECT ts,
        |    CASE WHEN seen IS NOT NULL AND us < seen THEN seen - us
        |         ELSE 0 END AS late_us
        |  FROM w),
        |h AS (
        |  SELECT date_trunc('hour', ts) AS hour,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_late,
        |    CAST(max(late_us) AS BIGINT) AS max_late_us,
        |    CAST(sum(late_us) AS BIGINT) AS sum_late
        |  FROM l GROUP BY 1)
        |SELECT hour, n, n_late,
        |  CAST((CAST(n_late AS HUGEINT) * 1000000) // n AS BIGINT) AS late_ppm,
        |  max_late_us,
        |  CAST(sum_late // nullif(n_late, 0) AS BIGINT) AS mean_late_us
        |FROM h ORDER BY hour""".stripMargin,
    // C96: first-view -> first-subsequent-purchase latency histogram
    "q_time_to_convert" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us
        |  FROM events),
        |tf AS (
        |  SELECT user_id, CAST(min(us) AS BIGINT) AS t_from
        |  FROM e WHERE event_type = 'view' GROUP BY 1),
        |dl AS (
        |  SELECT e.user_id,
        |    CAST(min(e.us) - min(tf.t_from) AS BIGINT) AS delta_us
        |  FROM e JOIN tf USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us >= tf.t_from
        |  GROUP BY e.user_id),
        |h AS (
        |  SELECT CASE WHEN delta_us = 0 THEN CAST(-1 AS BIGINT)
        |    ELSE CAST(length(bin(delta_us)) - 1 AS BIGINT) END AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(min(delta_us) AS BIGINT) AS min_delta_us,
        |    CAST(max(delta_us) AS BIGINT) AS max_delta_us
        |  FROM dl GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS n_viewers FROM tf)
        |SELECT bucket, n_users, min_delta_us, max_delta_us,
        |  CAST((CAST(sum(n_users) OVER (ORDER BY bucket
        |    ROWS UNBOUNDED PRECEDING) AS HUGEINT) * 1000000)
        |    // v.n_viewers AS BIGINT) AS cum_converted_ppm
        |FROM h, v ORDER BY bucket""".stripMargin,
    // I9: which (day, type) published counts the backfill corrected;
    // stragglers planted (id % 37 -> ts - 2 days), replayed here
    "q_replay_diff" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CASE WHEN event_id % 37 = 0 THEN ts - INTERVAL 2 DAY
        |         ELSE ts END AS ts,
        |    CAST(epoch_us(CASE WHEN event_id % 37 = 0
        |      THEN ts - INTERVAL 2 DAY ELSE ts END) AS BIGINT) AS us
        |  FROM events),
        |w AS (
        |  SELECT event_type, ts, us,
        |    max(us) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen
        |  FROM e),
        |g AS (
        |  SELECT CAST(ts AS DATE) AS d, event_type,
        |    CAST(count(*) AS BIGINT) AS n_corrected,
        |    CAST(sum(CASE WHEN seen IS NOT NULL AND us < seen THEN 0
        |      ELSE 1 END) AS BIGINT) AS n_published
        |  FROM w GROUP BY 1, 2)
        |SELECT d, event_type, n_published, n_corrected,
        |  CAST((CAST(n_corrected - n_published AS HUGEINT) * 1000000)
        |    // n_corrected AS BIGINT) AS correction_ppm
        |FROM g WHERE n_corrected <> n_published
        |ORDER BY d, event_type""".stripMargin,
    // I7: F20's floor-log2 buckets over per-user consecutive gaps;
    // gap=0 double-fires get the dedicated -1 bucket.
    "q_event_gaps" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, CAST(epoch_us(ts) AS BIGINT) AS us
        |  FROM events),
        |g AS (
        |  SELECT us - lag(us) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS gap_us
        |  FROM e),
        |gg AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL),
        |h AS (
        |  SELECT CASE WHEN gap_us = 0 THEN CAST(-1 AS BIGINT)
        |    ELSE CAST(length(bin(gap_us)) - 1 AS BIGINT) END AS gap_bucket,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(min(gap_us) AS BIGINT) AS min_gap_us,
        |    CAST(max(gap_us) AS BIGINT) AS max_gap_us
        |  FROM gg GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM h)
        |SELECT gap_bucket, n, min_gap_us, max_gap_us,
        |  CAST((CAST(sum(n) OVER (ORDER BY gap_bucket
        |    ROWS UNBOUNDED PRECEDING) AS HUGEINT) * 1000000)
        |    // t.n_total AS BIGINT) AS cum_ppm
        |FROM h, t ORDER BY gap_bucket""".stripMargin,
    // C45b: C45's window identity, keyed — every window PARTITION BY
    // event_type; per-key spine and μ.
    "q_changepoint_by_type" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |spans AS (
        |  SELECT event_type, min(d) AS lo, max(d) AS hi
        |  FROM daily GROUP BY event_type),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(
        |    CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM spans),
        |series AS (
        |  SELECT s.event_type, s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (event_type, d)),
        |m AS (SELECT event_type,
        |        CAST((1000 * sum(y)) // count(*) AS BIGINT) AS mu_x1000
        |      FROM series GROUP BY event_type),
        |u AS (
        |  SELECT s.event_type, s.d, s.y, m.mu_x1000,
        |    1000 * s.y - m.mu_x1000 - m.mu_x1000 // 4 AS uu,
        |    m.mu_x1000 - 1000 * s.y - m.mu_x1000 // 4 AS vv
        |  FROM series s JOIN m USING (event_type)),
        |c AS (
        |  SELECT event_type, d, y, mu_x1000,
        |    CAST(sum(uu) OVER w AS BIGINT) AS pu,
        |    CAST(sum(vv) OVER w AS BIGINT) AS pv
        |  FROM u
        |  WINDOW w AS (PARTITION BY event_type ORDER BY d
        |               ROWS UNBOUNDED PRECEDING)),
        |r AS (
        |  SELECT event_type, d, y, mu_x1000, pu, pv,
        |    least(0, CAST(min(pu) OVER w2 AS BIGINT)) AS mrun_u,
        |    least(0, CAST(min(pv) OVER w2 AS BIGINT)) AS mrun_v
        |  FROM c
        |  WINDOW w2 AS (PARTITION BY event_type ORDER BY d
        |                ROWS UNBOUNDED PRECEDING))
        |SELECT event_type, d, y,
        |  pu - mrun_u AS s_pos_x1000, pv - mrun_v AS s_neg_x1000,
        |  CAST(pu - mrun_u > 2 * mu_x1000 AS INTEGER) AS alarm_up,
        |  CAST(pv - mrun_v > 2 * mu_x1000 AS INTEGER) AS alarm_down
        |FROM r ORDER BY event_type, d""".stripMargin,
    // C47: same strategy-independent count as C43 — the recursive reach
    // CTE enumerates Σ|component|² pairs, fine at the sf0.01 gate scale.
    "q_graph_components" ->
      """WITH RECURSIVE d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS n_ab
        |      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2),
        |e AS (SELECT a, b FROM p WHERE n_ab >= 2),
        |edges AS (SELECT a AS src, b AS dst FROM e
        |          UNION ALL SELECT b, a FROM e),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e2.src, rr.r FROM edges e2 JOIN reach rr ON e2.dst = rr.id),
        |comp AS (SELECT id, MIN(r) AS component_id FROM reach GROUP BY id),
        |sz AS (SELECT component_id, CAST(count(*) AS BIGINT) AS component_size
        |       FROM comp GROUP BY component_id)
        |SELECT comp.id AS part, comp.component_id, sz.component_size
        |FROM comp JOIN sz USING (component_id) ORDER BY part""".stripMargin,
    // C43: the oracle needs no orientation trick (DuckDB handles the
    // sf0.01 wedge mass) — the count is strategy-independent; HUGEINT
    // mirrors the Spark DECIMAL(38) clustering lane, nullif guards the
    // edgeless corpus on both sides.
    // C36b: the oracle states the touch set DIRECTLY as the range join
    // (strategy-independent of the window-collect the engine runs);
    // weights are exact integer ppm with the remainder on rank 2.
    "q_attribution_position" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS us
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS us
        |      FROM events WHERE event_type = 'click'),
        |t AS (SELECT p.purchase_id, c.click_id, c.us AS cus
        |      FROM p JOIN c ON p.user_id = c.user_id
        |        AND c.us < p.us AND p.us - c.us <= 604800000000),
        |r AS (SELECT purchase_id, click_id,
        |        CAST(row_number() OVER (PARTITION BY purchase_id
        |          ORDER BY cus, click_id) AS BIGINT) AS touch_rank,
        |        CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches
        |      FROM t)
        |SELECT purchase_id, click_id, touch_rank, n_touches,
        |  CAST(CASE WHEN n_touches = 1 THEN 1000000
        |       WHEN n_touches = 2 THEN 500000
        |       WHEN touch_rank = 1 OR touch_rank = n_touches THEN 400000
        |       ELSE 200000 // (n_touches - 2)
        |         + CASE WHEN touch_rank = 2 THEN 200000 % (n_touches - 2)
        |                ELSE 0 END END AS BIGINT) AS weight_ppm
        |FROM r ORDER BY purchase_id, touch_rank""".stripMargin,
    // C98: the fixed-round peel replays round for round — each round is
    // a degree census + two IN-filters, generated for the same `rounds`
    // constant as the Spark face (the C40 fixed-iteration parity rule).
    "q_kcore" -> {
      val rounds = 8
      val peels = (0 until rounds).map { i =>
        s"""k$i AS MATERIALIZED (SELECT n FROM (SELECT a AS n FROM e$i
           |          UNION ALL SELECT b AS n FROM e$i)
           |        GROUP BY n HAVING count(*) >= 3),
           |e${i + 1} AS MATERIALIZED (SELECT a, b FROM e$i
           |  WHERE a IN (SELECT n FROM k$i) AND b IN (SELECT n FROM k$i))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |p AS (SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS n_ab
         |      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
         |        AND a.l_partkey < b.l_partkey
         |      GROUP BY 1, 2),
         |e0 AS MATERIALIZED (SELECT a, b FROM p WHERE n_ab >= 2),
         |$peels
         |SELECT n AS p_partkey, CAST(count(*) AS BIGINT) AS core_degree
         |FROM (SELECT a AS n FROM e$rounds UNION ALL SELECT b AS n FROM e$rounds)
         |GROUP BY n ORDER BY n""".stripMargin
    },
    "q_triangle_count" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS n_ab
        |      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
        |        AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2),
        |e AS (SELECT a, b FROM p WHERE n_ab >= 2),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM
        |          (SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        |        GROUP BY n),
        |tri AS (SELECT count(*) AS t
        |        FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        |          JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
        |w AS (SELECT CAST(coalesce(sum(deg * (deg - 1) // 2), 0) AS BIGINT)
        |        AS n_wedges FROM deg)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
        |  w.n_wedges,
        |  CAST(tri.t AS BIGINT) AS n_triangles,
        |  CAST((CAST(3000000 AS HUGEINT) * tri.t)
        |    // nullif(w.n_wedges, 0) AS BIGINT) AS clustering_ppm
        |FROM tri, w""".stripMargin,
    // C44: C5's session episodes → ±1 boundary points → per-hour prefix
    // sums + cross-hour carry. Starts sort before ends at one instant
    // (delta DESC); within equal (ts, delta) the prefix is a same-sign
    // run, so the hourly max is tie-order independent in both engines.
    "q_peak_concurrency" ->
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM lagged),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged),
        |se AS (
        |  SELECT user_id, session_id,
        |    min(ts) AS session_start, max(ts) AS session_end
        |  FROM sess GROUP BY user_id, session_id),
        |pts AS (
        |  SELECT session_start AS ts, 1 AS delta FROM se
        |  UNION ALL SELECT session_end AS ts, -1 AS delta FROM se),
        |hp AS (SELECT date_trunc('hour', ts) AS h, ts, delta FROM pts),
        |runs AS (
        |  SELECT h, delta,
        |    CAST(sum(delta) OVER (PARTITION BY h ORDER BY ts, delta DESC
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |  FROM hp),
        |hourly AS (
        |  SELECT h, max(run) AS intra_max, sum(delta) AS net,
        |    CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_starts
        |  FROM runs GROUP BY h),
        |c AS (
        |  SELECT h, n_starts, intra_max,
        |    coalesce(sum(net) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS carry
        |  FROM hourly)
        |SELECT h AS hour, n_starts,
        |  CAST(carry + greatest(intra_max, 0) AS BIGINT) AS peak_concurrency
        |FROM c ORDER BY hour""".stripMargin,
    // C46: integer-cents monetary (both engines round the same float64
    // bits then sum exactly) and exact quintile ranks with user_id
    // tiebreaks — ranking never compares raw double sums.
    "q_rfm_segments" ->
      """WITH p AS (
        |  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(CAST(ts AS DATE)) AS hd FROM p),
        |u AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', max(CAST(ts AS DATE)), (SELECT hd FROM h))
        |      AS BIGINT) AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(cents) AS BIGINT) AS monetary_cents
        |  FROM p GROUP BY user_id),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
        |r AS (
        |  SELECT u.*, n.n_users,
        |    row_number() OVER (ORDER BY recency_days, user_id) AS rn_r,
        |    row_number() OVER (ORDER BY frequency DESC, user_id) AS rn_f,
        |    row_number() OVER (ORDER BY monetary_cents DESC, user_id) AS rn_m
        |  FROM u, n)
        |SELECT user_id, recency_days, frequency, monetary_cents,
        |  CAST(5 - (5 * (rn_r - 1)) // n_users AS BIGINT) AS r_score,
        |  CAST(5 - (5 * (rn_f - 1)) // n_users AS BIGINT) AS f_score,
        |  CAST(5 - (5 * (rn_m - 1)) // n_users AS BIGINT) AS m_score,
        |  CAST(100 * (5 - (5 * (rn_r - 1)) // n_users)
        |    + 10 * (5 - (5 * (rn_f - 1)) // n_users)
        |    + (5 - (5 * (rn_m - 1)) // n_users) AS BIGINT) AS segment
        |FROM r ORDER BY user_id""".stripMargin,
    // C59b: sampled-Gini twin — the usmp: draw (double-squared polyhash,
    // high-bit threshold), row_number stands in for the Spark-side
    // index fold (Σi·x is tie-permutation-invariant), HUGEINT lanes
    "q_gini_approx" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
        |uh AS (SELECT user_id, list_reduce(
        |    list_transform(range(1, length('usmp:' || CAST(user_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr('usmp:' || CAST(user_id AS VARCHAR), i, 1)) AS BIGINT)),
        |    (h, c) -> (h * 131 + c) % 2147483647) AS hr FROM u),
        |u1 AS (SELECT user_id, (hr * hr) % 2147483647 AS d FROM uh),
        |ud AS (SELECT user_id, (d * d) % 2147483647 AS d FROM u1),
        |s AS (SELECT u.cents FROM u JOIN ud ON u.user_id = ud.user_id
        |      CROSS JOIN n WHERE ud.d * 4 < 2147483647 OR n.n_users <= 32),
        |r AS (SELECT cents,
        |        CAST(row_number() OVER (ORDER BY cents) AS BIGINT) AS i FROM s),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |        sum(CAST(i AS HUGEINT) * cents) AS six,
        |        CAST(sum(cents) AS HUGEINT) AS t
        |      FROM r HAVING count(*) > 0)
        |SELECT n.n_users, a.m AS n_sample,
        |  round(2.0 * CAST(a.six AS DOUBLE)
        |      / CAST(CAST(a.m AS HUGEINT) * a.t AS DOUBLE)
        |    - (a.m + 1.0) / a.m, 6) AS gini
        |FROM a CROSS JOIN n""".stripMargin,
    // C61b: sampled decile cutoffs, map-side bucket count, self-join
    // cumulative — replayed with list_sort/list_transform/list_filter
    "q_lorenz_deciles_approx" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
        |uh AS (SELECT user_id, list_reduce(
        |    list_transform(range(1, length('usmp:' || CAST(user_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr('usmp:' || CAST(user_id AS VARCHAR), i, 1)) AS BIGINT)),
        |    (h, c) -> (h * 131 + c) % 2147483647) AS hr FROM u),
        |u1 AS (SELECT user_id, (hr * hr) % 2147483647 AS d FROM uh),
        |ud AS (SELECT user_id, (d * d) % 2147483647 AS d FROM u1),
        |s AS (SELECT u.cents FROM u JOIN ud ON u.user_id = ud.user_id
        |      CROSS JOIN n WHERE ud.d * 4 < 2147483647 OR n.n_users <= 32),
        |sm AS (SELECT list_sort(list(cents)) AS smp FROM s),
        |c AS (SELECT CASE WHEN len(smp) = 0 THEN []
        |        ELSE list_transform(range(1, 10), j -> smp[CAST(greatest(1,
        |          least(len(smp), (j * (len(smp) + 1)) // 10)) AS INT)]) END AS cuts
        |      FROM sm),
        |d AS (SELECT CAST(1 + len(list_filter(c.cuts, x -> u.cents > x)) AS BIGINT)
        |        AS decile, u.cents
        |      FROM u CROSS JOIN c),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users_decile,
        |        CAST(sum(cents) AS BIGINT) AS cents_decile
        |      FROM d GROUP BY decile),
        |t AS (SELECT CAST(sum(cents_decile) AS BIGINT) AS t FROM g)
        |SELECT g.decile, g.n_users_decile, g.cents_decile,
        |  CAST((CAST(g.cents_decile AS HUGEINT) * 1000000) // t.t AS BIGINT)
        |    AS share_ppm,
        |  CAST((CAST((SELECT sum(g2.cents_decile) FROM g g2
        |              WHERE g2.decile <= g.decile) AS HUGEINT) * 1000000) // t.t
        |    AS BIGINT) AS cum_share_ppm
        |FROM g, t ORDER BY g.decile""".stripMargin,
    // F31: the q_lang_id marker CTE + row-normalized confusion cells
    "q_lang_confusion" ->
      """WITH p AS (SELECT lang, ' ' || text || ' ' AS padded FROM documents),
        |hits AS (
        |  SELECT lang AS declared_lang,
        |    CAST((length(padded) - length(replace(padded, ' the ', ''))) / 5 AS BIGINT) AS en_hits,
        |    CAST((length(padded) - length(replace(padded, ' der ', ''))) / 5 AS BIGINT) AS de_hits,
        |    CAST((length(padded) - length(replace(padded, ' le ', ''))) / 4 AS BIGINT) AS fr_hits,
        |    CAST((length(padded) - length(replace(padded, ' el ', ''))) / 4 AS BIGINT) AS es_hits
        |  FROM p),
        |pred AS (
        |  SELECT declared_lang,
        |    CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
        |         WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
        |         WHEN fr_hits >= es_hits THEN 'fr'
        |         ELSE 'es' END AS predicted_lang
        |  FROM hits),
        |c AS (SELECT declared_lang, predicted_lang,
        |        CAST(count(*) AS BIGINT) AS n_docs
        |      FROM pred GROUP BY 1, 2),
        |t AS (SELECT declared_lang, CAST(sum(n_docs) AS BIGINT) AS nd
        |      FROM c GROUP BY declared_lang)
        |SELECT c.declared_lang, c.predicted_lang, c.n_docs,
        |  CAST((CAST(c.n_docs AS HUGEINT) * 1000000) // t.nd AS BIGINT)
        |    AS share_ppm
        |FROM c JOIN t USING (declared_lang)
        |ORDER BY c.declared_lang, c.predicted_lang""".stripMargin,
    // D25: closed-form S-curve grid — no table scan on either engine
    "q_minhash_tuning" ->
      """WITH combos(bands, rows_per_band) AS (
        |  VALUES (64, 1), (32, 2), (16, 4), (8, 8), (4, 16), (2, 32), (1, 64)),
        |g AS (SELECT CAST(bands AS BIGINT) AS bands,
        |        CAST(rows_per_band AS BIGINT) AS rows_per_band,
        |        CAST(s AS BIGINT) AS s_x10
        |      FROM combos CROSS JOIN (SELECT unnest(range(1, 10)) AS s))
        |SELECT bands, rows_per_band, s_x10,
        |  round(1.0 - pow(1.0 - pow(s_x10 / 10.0, rows_per_band), bands), 6)
        |    AS collide_prob,
        |  round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS s_threshold
        |FROM g ORDER BY rows_per_band, s_x10""".stripMargin,
    // C69: the C33 grid at window 28 joined with the daily distinct leg
    "q_stickiness" ->
      """WITH grid AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM grid),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
        |        FROM grid GROUP BY day),
        |c AS (SELECT DISTINCT d.day AS day, g.user_id
        |      FROM days d JOIN grid g ON g.day BETWEEN d.day - 27 AND d.day),
        |mau AS (SELECT day, CAST(count(*) AS BIGINT) AS mau_28d
        |        FROM c GROUP BY day)
        |SELECT dau.day, dau.dau, mau.mau_28d,
        |  CAST((CAST(dau.dau AS HUGEINT) * 1000000) // mau.mau_28d AS BIGINT)
        |    AS stickiness_ppm
        |FROM dau JOIN mau USING (day) ORDER BY dau.day""".stripMargin,
    // C69b REGIME-BOUNDED oracle (round 12): 150 users < k=1024 means
    // the sketch MAU leg is exact at the gate scale (C33b's regime), so
    // the twin replays as the exact stickiness with its _est names.
    "q_stickiness_approx" ->
      """WITH grid AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM grid),
        |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
        |        FROM grid GROUP BY day),
        |c AS (SELECT DISTINCT d.day AS day, g.user_id
        |      FROM days d JOIN grid g ON g.day BETWEEN d.day - 27 AND d.day),
        |mau AS (SELECT day, CAST(count(*) AS BIGINT) AS mau_28d_est
        |        FROM c GROUP BY day)
        |SELECT dau.day, dau.dau, mau.mau_28d_est,
        |  CAST((CAST(dau.dau AS HUGEINT) * 1000000) // mau.mau_28d_est AS BIGINT)
        |    AS stickiness_ppm_est
        |FROM dau JOIN mau USING (day) ORDER BY dau.day""".stripMargin,
    // C67: quantile_cont ≡ Spark exact percentile (the C12 parity)
    "q_fulfillment_lag" ->
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
        |  round(quantile_cont(CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
        |    CAST(l.l_shipdate AS DATE)) AS BIGINT), 0.5), 4) AS p50_days,
        |  round(quantile_cont(CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
        |    CAST(l.l_shipdate AS DATE)) AS BIGINT), 0.9), 4) AS p90_days,
        |  CAST(max(date_diff('day', CAST(o.o_orderdate AS DATE),
        |    CAST(l.l_shipdate AS DATE))) AS BIGINT) AS max_days
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    // C68: integer avg-qty lanes and HUGEINT lift ppm
    "q_discount_lift" ->
      """WITH d AS (
        |  SELECT CAST(round(l_discount * 100) AS BIGINT) AS discount_pct,
        |    CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem GROUP BY 1),
        |a AS (SELECT discount_pct, n_lines,
        |        CAST((CAST(sq AS HUGEINT) * 100) // n_lines AS BIGINT)
        |          AS avg_qty_x100
        |      FROM d),
        |b AS (SELECT avg_qty_x100 AS base FROM a WHERE discount_pct = 0)
        |SELECT a.discount_pct, a.n_lines, a.avg_qty_x100,
        |  CAST(((CAST(a.avg_qty_x100 AS HUGEINT) - b.base) * 1000000) // b.base
        |    AS BIGINT) AS lift_ppm
        |FROM a, b ORDER BY a.discount_pct""".stripMargin,
    // D24: same digit/whitespace normalization chain; \s and \d parity
    // between Java regex and DuckDB RE2 holds for these classes
    "q_template_clusters" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN
        |      'invoice #' || CAST(doc_id AS VARCHAR) || ' total '
        |        || CAST(doc_id % 97 AS VARCHAR) || ' usd thanks'
        |    WHEN doc_id % 5 = 1 THEN
        |      'build ' || CAST(doc_id AS VARCHAR) || ' failed after '
        |        || CAST(doc_id % 13 AS VARCHAR) || ' retries'
        |    ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |t AS (
        |  SELECT doc_id, text,
        |    md5(regexp_replace(regexp_replace(lower(text), '[0-9]+', '0', 'g'),
        |      '\s+', ' ', 'g')) AS template_hash
        |  FROM base)
        |SELECT template_hash, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_raw,
        |  CAST(min(doc_id) AS BIGINT) AS sample_doc_id
        |FROM t GROUP BY template_hash
        |HAVING count(*) >= 2 ORDER BY template_hash""".stripMargin,
    // C66: the C45 spine self-joined at +1/+7 day shifts
    "q_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM daily),
        |series AS (
        |  SELECT s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (d))
        |SELECT a.d, a.y, b.y AS naive_y, c.y AS snaive_y,
        |  abs(a.y - b.y) AS ae_naive, abs(a.y - c.y) AS ae_snaive
        |FROM series a
        |JOIN series b ON a.d = b.d + INTERVAL 1 DAY
        |JOIN series c ON a.d = c.d + INTERVAL 7 DAY
        |ORDER BY a.d""".stripMargin,
    // B9: ceil-div batch/second plan, all integer
    "q_push_plan" ->
      """SELECT event_type AS kind, CAST(count(*) AS BIGINT) AS n_records,
        |  (count(*) + 499) // 500 AS n_batches,
        |  ((count(*) + 499) // 500 + 9) // 10 AS est_seconds,
        |  CAST(sum(strlen(props)) AS BIGINT)
        |    // ((count(*) + 499) // 500) AS avg_batch_bytes
        |FROM events GROUP BY event_type ORDER BY kind""".stripMargin,
    // F35: identical regex/whitespace counts; DuckDB regexp parity for
    // the [.!?]+ and [aeiou]+ classes matches Java (F10 precedent)
    "q_readability" ->
      """SELECT doc_id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |    AS n_words,
        |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
        |    AS n_sentences,
        |  CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
        |    AS n_syllables,
        |  round(206.835
        |    - 1.015 * CAST(length(text) - length(replace(text, ' ', '')) + 1
        |        AS DOUBLE)
        |      / greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |    - 84.6 * CAST(len(regexp_extract_all(text, '[aeiou]+')) AS DOUBLE)
        |      / (length(text) - length(replace(text, ' ', '')) + 1), 2)
        |    AS flesch
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,
    // H25: entropy over the source histogram; exp of the 6dp-rounded
    // entropy keeps parity independent of sum order
    "q_domain_entropy" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c),
        |e AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |        round(-sum((CAST(n AS DOUBLE) / t.t)
        |          * ln(CAST(n AS DOUBLE) / t.t)), 6) AS entropy_nats
        |      FROM c, t GROUP BY ())
        |SELECT n_sources, entropy_nats,
        |  round(exp(entropy_nats), 6) AS effective_domains
        |FROM e""".stripMargin,
    // C71: midpoint split, psi: mixed draw for reference-period decile
    // cutoffs, epsilon-floored shares, Σ(s1−s0)·ln(s1/s0)
    "q_psi" ->
      """WITH ev AS (SELECT event_type, event_id, value, ts FROM events
        |            WHERE value IS NOT NULL),
        |b AS (SELECT CAST(min(ts) AS DATE)
        |    + CAST(CAST(date_diff('day', CAST(min(ts) AS DATE),
        |        CAST(max(ts) AS DATE)) // 2 AS INTEGER) AS BIGINT)
        |    * INTERVAL 1 DAY AS mid FROM ev),
        |base AS (SELECT event_type,
        |           CASE WHEN CAST(ts AS DATE) >= (SELECT mid FROM b)
        |             THEN 1 ELSE 0 END AS period, value, event_id
        |         FROM ev),
        |n0 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
        |       FROM base WHERE period = 0 GROUP BY event_type),
        |hr AS (SELECT event_id, list_reduce(
        |    list_transform(range(1, length('psi:' || CAST(event_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr('psi:' || CAST(event_id AS VARCHAR), i, 1)) AS BIGINT)),
        |    (h, c) -> (h * 131 + c) % 2147483647) AS h
        |  FROM base WHERE period = 0),
        |h1 AS (SELECT event_id, (h * h) % 2147483647 AS h FROM hr),
        |h2 AS (SELECT event_id, (h * h) % 2147483647 AS h FROM h1),
        |s AS (SELECT base.event_type, base.value
        |      FROM base JOIN h2 ON base.event_id = h2.event_id
        |      JOIN n0 ON base.event_type = n0.event_type
        |      WHERE base.period = 0
        |        AND (h2.h * 4 < 2147483647 OR n0.n_t <= 32)),
        |sm AS (SELECT event_type, list_sort(list(value)) AS smp
        |       FROM s GROUP BY event_type),
        |c AS (SELECT event_type, CASE WHEN len(smp) = 0 THEN []
        |        ELSE list_transform(range(1, 10), j -> smp[CAST(greatest(1,
        |          least(len(smp), (j * (len(smp) + 1)) // 10)) AS INT)]) END AS cuts
        |      FROM sm),
        |bin AS (SELECT base.event_type,
        |          CAST(1 + len(list_filter(c.cuts, x -> base.value > x)) AS BIGINT)
        |            AS bin,
        |          CAST(sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |          CAST(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |        FROM base JOIN c ON base.event_type = c.event_type
        |        GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(c0) AS BIGINT) AS t0,
        |        CAST(sum(c1) AS BIGINT) AS t1
        |      FROM bin GROUP BY event_type)
        |SELECT bin.event_type, t.t0 AS n_ref, t.t1 AS n_cur,
        |  round(sum((greatest(CAST(c1 AS DOUBLE) / t.t1, 0.000001)
        |      - greatest(CAST(c0 AS DOUBLE) / t.t0, 0.000001))
        |    * ln(greatest(CAST(c1 AS DOUBLE) / t.t1, 0.000001)
        |      / greatest(CAST(c0 AS DOUBLE) / t.t0, 0.000001))), 6) AS psi
        |FROM bin JOIN t USING (event_type)
        |GROUP BY bin.event_type, t.t0, t.t1
        |ORDER BY bin.event_type""".stripMargin,
    // F34: even/odd split, distinct train vocab, left-join OOV counts
    "q_oov_rate" ->
      """WITH v AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0),
        |h AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 1),
        |j AS (
        |  SELECT h.doc_id, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM h LEFT JOIN v ON h.term = v.term)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  CAST((CAST(sum(oov) AS HUGEINT) * 1000000) // count(*) AS BIGINT)
        |    AS oov_ppm
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // C70: per-key counts → floor-log2 buckets (bin(x) length parity
    // with conv(x,10,2), the F20 convention)
    "q_key_skew" ->
      """WITH k AS (SELECT user_id, CAST(count(*) AS BIGINT) AS rows_per_key
        |           FROM events GROUP BY user_id),
        |b AS (SELECT CAST(length(bin(rows_per_key)) - 1 AS BIGINT) AS bucket,
        |        CAST(count(*) AS BIGINT) AS n_keys,
        |        CAST(sum(rows_per_key) AS BIGINT) AS n_rows,
        |        CAST(max(rows_per_key) AS BIGINT) AS max_rows_per_key
        |      FROM k GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t FROM b)
        |SELECT b.bucket, b.n_keys, b.n_rows, b.max_rows_per_key,
        |  CAST((CAST(b.n_rows AS HUGEINT) * 1000000) // t.t AS BIGINT)
        |    AS rows_share_ppm
        |FROM b, t ORDER BY b.bucket""".stripMargin,
    // H22: the fix: mixed draw + rank-k replayed as a window
    // H31: the hashed-n-gram model replays around the PINNED λ table
    // (JVM/DuckDB round sub-micro-nat ln tails differently, so the
    // micro-nat λ pins like every model artifact): polyhash per bigram
    // (the H10 codepoint-fold replay), bucket assignment, the bucket
    // counts the pinned (ct, cr) must match, and the order-free
    // per-doc INTEGER sums all replay live (shared CTEs: dsirImpCte).
    "q_dsir_weights" -> (dsirImpCte + """
        |SELECT doc_id, lang, n_feats, importance_x1e6 FROM imp
        |ORDER BY doc_id""".stripMargin),
    // H32: Gumbel-top-k resampling replays around the PINNED per-doc
    // key table: importance from the pinned λ model (the full H31
    // replay), the u draw bit-exact (drawMix integer lanes), the key as
    // integer addition, and the Gumbel micro-nat BRACKETED within ±1 of
    // DuckDB's own −ln(−ln(u)) (ln tails differ across engines — the
    // H31 lesson; ±1 tolerates the last ulp, any formula error blows
    // past it and the dropped doc shifts every rank below it).
    "q_dsir_resample" -> (dsirImpCte + s""",
        |ky AS (SELECT doc_id, importance_x1e6, u_draw, gumbel_x1e6, key_x1e6
        |       FROM read_parquet('${artifactGlob("dsir_key_en_b4096")}')),
        |dh AS (SELECT doc_id, list_reduce(
        |        list_transform(range(1, length('dsir:' || CAST(doc_id AS VARCHAR)) + 1),
        |          i -> CAST(ascii(substr('dsir:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |        (h, c) -> (h * 131 + c) % 2147483647) AS h FROM documents),
        |dm1 AS (SELECT doc_id, (h * h) % 2147483647 AS h FROM dh),
        |dm2 AS (SELECT doc_id, (h * h) % 2147483647 AS u FROM dm1),
        |chk AS (SELECT ky.doc_id, ky.importance_x1e6, ky.key_x1e6
        |        FROM ky
        |        JOIN imp ON imp.doc_id = ky.doc_id
        |          AND imp.importance_x1e6 = ky.importance_x1e6
        |        JOIN dm2 ON dm2.doc_id = ky.doc_id AND dm2.u = ky.u_draw
        |        WHERE ky.key_x1e6 = ky.importance_x1e6 + ky.gumbel_x1e6
        |          AND abs(ky.gumbel_x1e6
        |            - round(-ln(-ln((ky.u_draw + 1) / 2147483648.0)) * 1e6, 0)) <= 1),
        |rk AS (SELECT doc_id, importance_x1e6, key_x1e6,
        |         CAST(row_number() OVER (ORDER BY key_x1e6 DESC, doc_id) AS BIGINT)
        |           AS sample_rank
        |       FROM chk)
        |SELECT sample_rank, doc_id, importance_x1e6, key_x1e6 FROM rk
        |WHERE sample_rank <= 200 ORDER BY sample_rank""".stripMargin),
    "q_sample_fixed" ->
      """WITH hr AS (SELECT doc_id, list_reduce(
        |    list_transform(range(1, length('fix:' || CAST(doc_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr('fix:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |    (h, c) -> (h * 131 + c) % 2147483647) AS h FROM documents),
        |h1 AS (SELECT doc_id, (h * h) % 2147483647 AS h FROM hr),
        |h2 AS (SELECT doc_id, (h * h) % 2147483647 AS h FROM h1),
        |r AS (SELECT doc_id,
        |        CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT)
        |          AS sample_rank
        |      FROM h2)
        |SELECT sample_rank, doc_id FROM r
        |WHERE sample_rank <= 100 ORDER BY sample_rank""".stripMargin,
    // E18: centroids via per-dimension avg, |labels| cosines per
    // vector, conditional own/other max — the q_ann_topk cosine parity
    "q_centroid_margin" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |e AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS i
        |      FROM v),
        |m AS (SELECT label, i, avg(x) AS s FROM e GROUP BY label, i),
        |c AS (SELECT label AS clabel, list(s ORDER BY i) AS centroid
        |      FROM m GROUP BY label),
        |sc AS (SELECT v.vec_id, v.label,
        |         max(CASE WHEN v.label = c.clabel
        |           THEN list_cosine_similarity(v.v, c.centroid) END) AS own,
        |         max(CASE WHEN v.label <> c.clabel
        |           THEN list_cosine_similarity(v.v, c.centroid) END) AS other
        |       FROM v CROSS JOIN c GROUP BY v.vec_id, v.label)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
        |  round(avg(own - other), 6) AS mean_margin,
        |  CAST(sum(CASE WHEN own - other < -0.000000001 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_confused
        |FROM sc GROUP BY label ORDER BY label""".stripMargin,
    // E17: per-dimension unnest moments
    "q_embedding_dims" ->
      """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (SELECT unnest(v) AS xv, generate_subscripts(v, 1) AS i FROM e)
        |SELECT CAST(i AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n_vectors,
        |  round(sum(xv) / count(*), 6) AS mean,
        |  round(sum(xv * xv) / count(*) - pow(sum(xv) / count(*), 2), 6)
        |    AS variance
        |FROM x GROUP BY i ORDER BY dim""".stripMargin,
    // E16: the pairless diversity identity replayed via per-dimension
    // unnest sums and list_dot_product self-dots
    "q_group_diversity" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (SELECT label, unnest(v) AS xv, generate_subscripts(v, 1) AS i
        |      FROM e),
        |s AS (SELECT label, i, sum(xv) AS sv FROM x GROUP BY label, i),
        |s2 AS (SELECT label, sum(sv * sv) AS ssq FROM s GROUP BY label),
        |sd AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
        |         sum(list_dot_product(v, v)) AS selfdot
        |       FROM e GROUP BY label)
        |SELECT sd.label, sd.n_vectors,
        |  round((s2.ssq - sd.selfdot)
        |    / (CAST(sd.n_vectors AS DOUBLE) * (sd.n_vectors - 1)), 6)
        |    AS mean_pair_dot,
        |  round(sd.selfdot / sd.n_vectors, 6) AS mean_self_dot
        |FROM sd JOIN s2 USING (label)
        |WHERE sd.n_vectors > 1 ORDER BY sd.label""".stripMargin,
    // C65: per-user lifetimes, bounded triangular at-risk join, and the
    // KM product chain replayed as a recursive CTE (identical multiply
    // order → identical doubles before the 6dp round)
    "q_survival" ->
      """WITH RECURSIVE h AS (SELECT CAST(max(ts) AS DATE) AS hd FROM events),
        |u AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
        |      AS BIGINT) AS t,
        |    CASE WHEN date_diff('day', CAST(max(ts) AS DATE),
        |      (SELECT hd FROM h)) >= 7 THEN 1 ELSE 0 END AS churned
        |  FROM events GROUP BY user_id),
        |pd AS (SELECT t, CAST(count(*) AS BIGINT) AS n_ending,
        |         CAST(sum(churned) AS BIGINT) AS n_churned
        |       FROM u GROUP BY t),
        |ar AS (SELECT a.t, CAST(sum(b.n_ending) AS BIGINT) AS n_at_risk
        |       FROM pd a JOIN pd b ON b.t >= a.t GROUP BY a.t),
        |d AS (SELECT pd.t, pd.n_churned, ar.n_at_risk,
        |        CAST(row_number() OVER (ORDER BY pd.t) AS BIGINT) AS i
        |      FROM pd JOIN ar ON pd.t = ar.t),
        |km AS (
        |  SELECT t, n_churned, n_at_risk, i,
        |    1.0 * (1.0 - CAST(n_churned AS DOUBLE) / CAST(n_at_risk AS DOUBLE)) AS s
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.t, d.n_churned, d.n_at_risk, d.i,
        |    km.s * (1.0 - CAST(d.n_churned AS DOUBLE) / CAST(d.n_at_risk AS DOUBLE))
        |  FROM d JOIN km ON d.i = km.i + 1)
        |SELECT t AS t_days, n_at_risk, n_churned, round(s, 6) AS survival
        |FROM km ORDER BY t_days""".stripMargin,
    // A20: per-table aggregated hit counts unpivoted by UNION ALL;
    // regex classes are the F10 Java/RE2-parity set
    "q_pii_report" ->
      """WITH __region AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(coalesce(sum(CASE WHEN regexp_matches(r_name, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_r_name, CAST(coalesce(sum(CASE WHEN regexp_matches(r_name, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_r_name, CAST(coalesce(sum(CASE WHEN regexp_matches(r_name, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_r_name FROM region),
        |__nation AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(coalesce(sum(CASE WHEN regexp_matches(n_name, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_n_name, CAST(coalesce(sum(CASE WHEN regexp_matches(n_name, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_n_name, CAST(coalesce(sum(CASE WHEN regexp_matches(n_name, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_n_name FROM nation),
        |__customer AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(coalesce(sum(CASE WHEN regexp_matches(c_name, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_c_name, CAST(coalesce(sum(CASE WHEN regexp_matches(c_name, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_c_name, CAST(coalesce(sum(CASE WHEN regexp_matches(c_name, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_c_name, CAST(coalesce(sum(CASE WHEN regexp_matches(c_mktsegment, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_c_mktsegment, CAST(coalesce(sum(CASE WHEN regexp_matches(c_mktsegment, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_c_mktsegment, CAST(coalesce(sum(CASE WHEN regexp_matches(c_mktsegment, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_c_mktsegment FROM customer),
        |__supplier AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(coalesce(sum(CASE WHEN regexp_matches(s_name, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_s_name, CAST(coalesce(sum(CASE WHEN regexp_matches(s_name, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_s_name, CAST(coalesce(sum(CASE WHEN regexp_matches(s_name, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_s_name FROM supplier),
        |__part AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(coalesce(sum(CASE WHEN regexp_matches(p_name, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_p_name, CAST(coalesce(sum(CASE WHEN regexp_matches(p_name, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_p_name, CAST(coalesce(sum(CASE WHEN regexp_matches(p_name, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_p_name, CAST(coalesce(sum(CASE WHEN regexp_matches(p_brand, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_p_brand, CAST(coalesce(sum(CASE WHEN regexp_matches(p_brand, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_p_brand, CAST(coalesce(sum(CASE WHEN regexp_matches(p_brand, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_p_brand, CAST(coalesce(sum(CASE WHEN regexp_matches(p_type, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_p_type, CAST(coalesce(sum(CASE WHEN regexp_matches(p_type, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_p_type, CAST(coalesce(sum(CASE WHEN regexp_matches(p_type, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_p_type FROM part),
        |__orders AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(coalesce(sum(CASE WHEN regexp_matches(o_orderstatus, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_o_orderstatus, CAST(coalesce(sum(CASE WHEN regexp_matches(o_orderstatus, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_o_orderstatus, CAST(coalesce(sum(CASE WHEN regexp_matches(o_orderstatus, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_o_orderstatus, CAST(coalesce(sum(CASE WHEN regexp_matches(o_orderpriority, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_o_orderpriority, CAST(coalesce(sum(CASE WHEN regexp_matches(o_orderpriority, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_o_orderpriority, CAST(coalesce(sum(CASE WHEN regexp_matches(o_orderpriority, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_o_orderpriority FROM orders),
        |__lineitem AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(coalesce(sum(CASE WHEN regexp_matches(l_returnflag, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_l_returnflag, CAST(coalesce(sum(CASE WHEN regexp_matches(l_returnflag, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_l_returnflag, CAST(coalesce(sum(CASE WHEN regexp_matches(l_returnflag, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_l_returnflag, CAST(coalesce(sum(CASE WHEN regexp_matches(l_linestatus, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_l_linestatus, CAST(coalesce(sum(CASE WHEN regexp_matches(l_linestatus, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_l_linestatus, CAST(coalesce(sum(CASE WHEN regexp_matches(l_linestatus, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_l_linestatus FROM lineitem),
        |__events AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(coalesce(sum(CASE WHEN regexp_matches(event_type, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_event_type, CAST(coalesce(sum(CASE WHEN regexp_matches(event_type, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_event_type, CAST(coalesce(sum(CASE WHEN regexp_matches(event_type, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_event_type, CAST(coalesce(sum(CASE WHEN regexp_matches(props, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_props, CAST(coalesce(sum(CASE WHEN regexp_matches(props, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_props, CAST(coalesce(sum(CASE WHEN regexp_matches(props, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_props FROM events),
        |__documents AS (SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(coalesce(sum(CASE WHEN regexp_matches(text, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_text, CAST(coalesce(sum(CASE WHEN regexp_matches(text, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_text, CAST(coalesce(sum(CASE WHEN regexp_matches(text, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_text, CAST(coalesce(sum(CASE WHEN regexp_matches(lang, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_lang, CAST(coalesce(sum(CASE WHEN regexp_matches(lang, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_lang, CAST(coalesce(sum(CASE WHEN regexp_matches(lang, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_lang, CAST(coalesce(sum(CASE WHEN regexp_matches(source, '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_email_source, CAST(coalesce(sum(CASE WHEN regexp_matches(source, '\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_ipv4_source, CAST(coalesce(sum(CASE WHEN regexp_matches(source, '[0-9]{13,}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_longnum_source FROM documents)
        |SELECT 'region' AS table_name, 'r_name' AS column_name, 'email' AS kind, n_rows, h_email_r_name AS n_hits FROM __region
        |UNION ALL SELECT 'region' AS table_name, 'r_name' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_r_name AS n_hits FROM __region
        |UNION ALL SELECT 'region' AS table_name, 'r_name' AS column_name, 'longnum' AS kind, n_rows, h_longnum_r_name AS n_hits FROM __region
        |UNION ALL SELECT 'nation' AS table_name, 'n_name' AS column_name, 'email' AS kind, n_rows, h_email_n_name AS n_hits FROM __nation
        |UNION ALL SELECT 'nation' AS table_name, 'n_name' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_n_name AS n_hits FROM __nation
        |UNION ALL SELECT 'nation' AS table_name, 'n_name' AS column_name, 'longnum' AS kind, n_rows, h_longnum_n_name AS n_hits FROM __nation
        |UNION ALL SELECT 'customer' AS table_name, 'c_name' AS column_name, 'email' AS kind, n_rows, h_email_c_name AS n_hits FROM __customer
        |UNION ALL SELECT 'customer' AS table_name, 'c_name' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_c_name AS n_hits FROM __customer
        |UNION ALL SELECT 'customer' AS table_name, 'c_name' AS column_name, 'longnum' AS kind, n_rows, h_longnum_c_name AS n_hits FROM __customer
        |UNION ALL SELECT 'customer' AS table_name, 'c_mktsegment' AS column_name, 'email' AS kind, n_rows, h_email_c_mktsegment AS n_hits FROM __customer
        |UNION ALL SELECT 'customer' AS table_name, 'c_mktsegment' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_c_mktsegment AS n_hits FROM __customer
        |UNION ALL SELECT 'customer' AS table_name, 'c_mktsegment' AS column_name, 'longnum' AS kind, n_rows, h_longnum_c_mktsegment AS n_hits FROM __customer
        |UNION ALL SELECT 'supplier' AS table_name, 's_name' AS column_name, 'email' AS kind, n_rows, h_email_s_name AS n_hits FROM __supplier
        |UNION ALL SELECT 'supplier' AS table_name, 's_name' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_s_name AS n_hits FROM __supplier
        |UNION ALL SELECT 'supplier' AS table_name, 's_name' AS column_name, 'longnum' AS kind, n_rows, h_longnum_s_name AS n_hits FROM __supplier
        |UNION ALL SELECT 'part' AS table_name, 'p_name' AS column_name, 'email' AS kind, n_rows, h_email_p_name AS n_hits FROM __part
        |UNION ALL SELECT 'part' AS table_name, 'p_name' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_p_name AS n_hits FROM __part
        |UNION ALL SELECT 'part' AS table_name, 'p_name' AS column_name, 'longnum' AS kind, n_rows, h_longnum_p_name AS n_hits FROM __part
        |UNION ALL SELECT 'part' AS table_name, 'p_brand' AS column_name, 'email' AS kind, n_rows, h_email_p_brand AS n_hits FROM __part
        |UNION ALL SELECT 'part' AS table_name, 'p_brand' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_p_brand AS n_hits FROM __part
        |UNION ALL SELECT 'part' AS table_name, 'p_brand' AS column_name, 'longnum' AS kind, n_rows, h_longnum_p_brand AS n_hits FROM __part
        |UNION ALL SELECT 'part' AS table_name, 'p_type' AS column_name, 'email' AS kind, n_rows, h_email_p_type AS n_hits FROM __part
        |UNION ALL SELECT 'part' AS table_name, 'p_type' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_p_type AS n_hits FROM __part
        |UNION ALL SELECT 'part' AS table_name, 'p_type' AS column_name, 'longnum' AS kind, n_rows, h_longnum_p_type AS n_hits FROM __part
        |UNION ALL SELECT 'orders' AS table_name, 'o_orderstatus' AS column_name, 'email' AS kind, n_rows, h_email_o_orderstatus AS n_hits FROM __orders
        |UNION ALL SELECT 'orders' AS table_name, 'o_orderstatus' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_o_orderstatus AS n_hits FROM __orders
        |UNION ALL SELECT 'orders' AS table_name, 'o_orderstatus' AS column_name, 'longnum' AS kind, n_rows, h_longnum_o_orderstatus AS n_hits FROM __orders
        |UNION ALL SELECT 'orders' AS table_name, 'o_orderpriority' AS column_name, 'email' AS kind, n_rows, h_email_o_orderpriority AS n_hits FROM __orders
        |UNION ALL SELECT 'orders' AS table_name, 'o_orderpriority' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_o_orderpriority AS n_hits FROM __orders
        |UNION ALL SELECT 'orders' AS table_name, 'o_orderpriority' AS column_name, 'longnum' AS kind, n_rows, h_longnum_o_orderpriority AS n_hits FROM __orders
        |UNION ALL SELECT 'lineitem' AS table_name, 'l_returnflag' AS column_name, 'email' AS kind, n_rows, h_email_l_returnflag AS n_hits FROM __lineitem
        |UNION ALL SELECT 'lineitem' AS table_name, 'l_returnflag' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_l_returnflag AS n_hits FROM __lineitem
        |UNION ALL SELECT 'lineitem' AS table_name, 'l_returnflag' AS column_name, 'longnum' AS kind, n_rows, h_longnum_l_returnflag AS n_hits FROM __lineitem
        |UNION ALL SELECT 'lineitem' AS table_name, 'l_linestatus' AS column_name, 'email' AS kind, n_rows, h_email_l_linestatus AS n_hits FROM __lineitem
        |UNION ALL SELECT 'lineitem' AS table_name, 'l_linestatus' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_l_linestatus AS n_hits FROM __lineitem
        |UNION ALL SELECT 'lineitem' AS table_name, 'l_linestatus' AS column_name, 'longnum' AS kind, n_rows, h_longnum_l_linestatus AS n_hits FROM __lineitem
        |UNION ALL SELECT 'events' AS table_name, 'event_type' AS column_name, 'email' AS kind, n_rows, h_email_event_type AS n_hits FROM __events
        |UNION ALL SELECT 'events' AS table_name, 'event_type' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_event_type AS n_hits FROM __events
        |UNION ALL SELECT 'events' AS table_name, 'event_type' AS column_name, 'longnum' AS kind, n_rows, h_longnum_event_type AS n_hits FROM __events
        |UNION ALL SELECT 'events' AS table_name, 'props' AS column_name, 'email' AS kind, n_rows, h_email_props AS n_hits FROM __events
        |UNION ALL SELECT 'events' AS table_name, 'props' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_props AS n_hits FROM __events
        |UNION ALL SELECT 'events' AS table_name, 'props' AS column_name, 'longnum' AS kind, n_rows, h_longnum_props AS n_hits FROM __events
        |UNION ALL SELECT 'documents' AS table_name, 'text' AS column_name, 'email' AS kind, n_rows, h_email_text AS n_hits FROM __documents
        |UNION ALL SELECT 'documents' AS table_name, 'text' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_text AS n_hits FROM __documents
        |UNION ALL SELECT 'documents' AS table_name, 'text' AS column_name, 'longnum' AS kind, n_rows, h_longnum_text AS n_hits FROM __documents
        |UNION ALL SELECT 'documents' AS table_name, 'lang' AS column_name, 'email' AS kind, n_rows, h_email_lang AS n_hits FROM __documents
        |UNION ALL SELECT 'documents' AS table_name, 'lang' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_lang AS n_hits FROM __documents
        |UNION ALL SELECT 'documents' AS table_name, 'lang' AS column_name, 'longnum' AS kind, n_rows, h_longnum_lang AS n_hits FROM __documents
        |UNION ALL SELECT 'documents' AS table_name, 'source' AS column_name, 'email' AS kind, n_rows, h_email_source AS n_hits FROM __documents
        |UNION ALL SELECT 'documents' AS table_name, 'source' AS column_name, 'ipv4' AS kind, n_rows, h_ipv4_source AS n_hits FROM __documents
        |UNION ALL SELECT 'documents' AS table_name, 'source' AS column_name, 'longnum' AS kind, n_rows, h_longnum_source AS n_hits FROM __documents
        |ORDER BY table_name, column_name, kind""".stripMargin,
    // H19: sampled quartile cutoffs + the H14 shard chain per stage +
    // span-offset concatenation, all integer
    "q_curriculum_order" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |      AS ws_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM toks),
        |hr AS (SELECT doc_id, ws_tokens,
        |    list_reduce(
        |      list_transform(range(1, length('cursmp:' || CAST(doc_id AS VARCHAR)) + 1),
        |        i -> CAST(ascii(substr('cursmp:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS hs,
        |    list_reduce(
        |      list_transform(range(1, length('cur:' || CAST(doc_id AS VARCHAR)) + 1),
        |        i -> CAST(ascii(substr('cur:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT)),
        |      (h, c) -> (h * 131 + c) % 2147483647) AS hc
        |  FROM toks),
        |m1 AS (SELECT doc_id, ws_tokens, (hs * hs) % 2147483647 AS hs,
        |         (hc * hc) % 2147483647 AS hc FROM hr),
        |m2 AS (SELECT doc_id, ws_tokens, (hs * hs) % 2147483647 AS hs,
        |         (hc * hc) % 2147483647 AS hc FROM m1),
        |s AS (SELECT ws_tokens FROM m2 CROSS JOIN n
        |      WHERE hs * 4 < 2147483647 OR n_docs <= 32),
        |sm AS (SELECT list_sort(list(ws_tokens)) AS smp FROM s),
        |c AS (SELECT CASE WHEN len(smp) = 0 THEN []
        |        ELSE list_transform(range(1, 4), j -> smp[CAST(greatest(1,
        |          least(len(smp), (j * (len(smp) + 1)) // 4)) AS INT)]) END AS cuts
        |      FROM sm),
        |st AS (SELECT m2.doc_id, m2.ws_tokens,
        |         CAST(1 + len(list_filter(c.cuts, x -> m2.ws_tokens > x)) AS BIGINT)
        |           AS stage,
        |         m2.hc AS h, CAST(m2.hc % 64 AS INTEGER) AS shard
        |       FROM m2 CROSS JOIN c),
        |p AS (SELECT doc_id, ws_tokens, stage, shard,
        |        CAST(row_number() OVER (PARTITION BY stage, shard
        |          ORDER BY h, doc_id) AS BIGINT) AS pos
        |      FROM st),
        |p2 AS (SELECT doc_id, ws_tokens, stage,
        |         (pos - 1) * 64 + shard AS stage_pos FROM p),
        |sp AS (SELECT stage, max(stage_pos) + 1 AS span FROM p2 GROUP BY stage),
        |o AS (SELECT a.stage, CAST(coalesce(sum(b.span), 0) AS BIGINT) AS off
        |      FROM sp a LEFT JOIN sp b ON b.stage < a.stage GROUP BY a.stage)
        |SELECT p2.doc_id, p2.ws_tokens, p2.stage,
        |  CAST(o.off + p2.stage_pos AS BIGINT) AS curriculum_pos
        |FROM p2 JOIN o USING (stage) ORDER BY doc_id""".stripMargin,
    // F30: identical OLS formulas over the same top-K ranked vocab;
    // tie ranks share y so the fit is tie-order-independent
    "q_zipf_fit" ->
      """WITH c AS (
        |  SELECT unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |g AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY term
        |      ORDER BY n DESC, term LIMIT 500),
        |r AS (SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, term)
        |        AS DOUBLE)) AS x, ln(CAST(n AS DOUBLE)) AS y FROM g),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |        sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |        sum(x * x) AS sxx, sum(y * y) AS syy FROM r)
        |SELECT n_terms,
        |  round((n_terms * sxy - sx * sy)
        |    / nullif(n_terms * sxx - sx * sx, 0.0), 6) AS slope,
        |  round((sy - (n_terms * sxy - sx * sy)
        |    / nullif(n_terms * sxx - sx * sx, 0.0) * sx) / n_terms, 6)
        |    AS intercept,
        |  round(pow(n_terms * sxy - sx * sy, 2)
        |    / nullif((n_terms * sxx - sx * sx)
        |      * (n_terms * syy - sy * sy), 0.0), 6) AS r2
        |FROM a""".stripMargin,
    // I8: first/last op per key via rank windows (the oracle may
    // window; the Spark side is one min_by/max_by aggregate)
    "q_cdc_compact" ->
      """WITH log AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'signup' THEN 'I'
        |         WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    value, props
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, op, value, props,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rf,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rl,
        |    count(*) OVER (PARTITION BY user_id) AS n_ops
        |  FROM log),
        |fi AS (SELECT user_id, op AS first_op FROM f WHERE rf = 1),
        |la AS (SELECT user_id, op AS last_op, ts, value, props, n_ops
        |       FROM f WHERE rl = 1),
        |j AS (
        |  SELECT la.user_id,
        |    CASE WHEN fi.first_op = 'I' AND la.last_op = 'D' THEN 'NONE'
        |         WHEN fi.first_op = 'I' THEN 'I'
        |         WHEN la.last_op = 'D' THEN 'D' ELSE 'U' END AS net_op,
        |    CAST(la.n_ops AS BIGINT) AS n_ops, la.ts AS last_ts,
        |    la.value, la.props
        |  FROM la JOIN fi USING (user_id))
        |SELECT user_id, net_op, n_ops, last_ts,
        |  CASE WHEN net_op = 'D' THEN NULL ELSE round(value, 2) END AS value,
        |  CASE WHEN net_op = 'D' THEN NULL ELSE props END AS props
        |FROM j WHERE net_op <> 'NONE' ORDER BY user_id""".stripMargin,
    // C64: the same gap-complete spine as C45, then the integer EWMA
    // recurrence replayed as a recursive CTE (Spark folds it over the
    // day array — identical floor halving both ways)
    "q_ewma_daily" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM daily),
        |series AS (
        |  SELECT s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (d)),
        |i AS (SELECT d, y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |      FROM series),
        |r AS (
        |  SELECT d, y, i, CAST(1000 * y AS BIGINT) AS s FROM i WHERE i = 1
        |  UNION ALL
        |  SELECT t.d, t.y, t.i, (1000 * t.y + r.s) // 2
        |  FROM i t JOIN r ON t.i = r.i + 1)
        |SELECT r.d, r.y, r.s AS ewma_x1000,
        |  CAST(CASE WHEN r.i = 1 THEN 0 ELSE 1000 * r.y - p.s END AS BIGINT)
        |    AS dev_x1000
        |FROM r LEFT JOIN r p ON p.i = r.i - 1
        |ORDER BY r.d""".stripMargin,
    // C63: midpoint split (C56's boundary form), per-period sampled
    // decile cutoffs (C61b machinery), transition join
    "q_decile_migration" ->
      """WITH p AS (
        |  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT CAST(min(ts) AS DATE)
        |    + CAST(CAST(date_diff('day', CAST(min(ts) AS DATE),
        |        CAST(max(ts) AS DATE)) // 2 AS INTEGER) AS BIGINT)
        |    * INTERVAL 1 DAY AS mid FROM p),
        |u AS (SELECT user_id,
        |        CASE WHEN CAST(ts AS DATE) >= (SELECT mid FROM b)
        |          THEN 1 ELSE 0 END AS period,
        |        CAST(sum(cents) AS BIGINT) AS cents
        |      FROM p GROUP BY 1, 2),
        |n AS (SELECT period, CAST(count(*) AS BIGINT) AS n_users
        |      FROM u GROUP BY period),
        |uh AS (SELECT DISTINCT user_id, list_reduce(
        |    list_transform(range(1, length('usmp:' || CAST(user_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr('usmp:' || CAST(user_id AS VARCHAR), i, 1)) AS BIGINT)),
        |    (h, c) -> (h * 131 + c) % 2147483647) AS hr FROM u),
        |u1 AS (SELECT user_id, (hr * hr) % 2147483647 AS d FROM uh),
        |ud AS (SELECT user_id, (d * d) % 2147483647 AS d FROM u1),
        |s AS (SELECT u.period, u.cents FROM u
        |      JOIN ud ON u.user_id = ud.user_id
        |      JOIN n ON u.period = n.period
        |      WHERE ud.d * 4 < 2147483647 OR n.n_users <= 32),
        |sm AS (SELECT period, list_sort(list(cents)) AS smp FROM s GROUP BY period),
        |c AS (SELECT period, CASE WHEN len(smp) = 0 THEN []
        |        ELSE list_transform(range(1, 10), j -> smp[CAST(greatest(1,
        |          least(len(smp), (j * (len(smp) + 1)) // 10)) AS INT)]) END AS cuts
        |      FROM sm),
        |d AS (SELECT u.user_id, u.period,
        |        CAST(1 + len(list_filter(c.cuts, x -> u.cents > x)) AS BIGINT)
        |          AS decile
        |      FROM u JOIN c ON u.period = c.period)
        |SELECT d0.decile AS decile_from, d1.decile AS decile_to,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM d d0 JOIN d d1 ON d0.user_id = d1.user_id
        |  AND d0.period = 0 AND d1.period = 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // C46b: sampled quintile cutoffs per RFM dimension, map-side scores
    "q_rfm_segments_approx" ->
      """WITH p AS (
        |  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT max(CAST(ts AS DATE)) AS hd FROM p),
        |u AS (
        |  SELECT user_id,
        |    CAST(date_diff('day', max(CAST(ts AS DATE)), (SELECT hd FROM h))
        |      AS BIGINT) AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(cents) AS BIGINT) AS monetary_cents
        |  FROM p GROUP BY user_id),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM u),
        |uh AS (SELECT user_id, list_reduce(
        |    list_transform(range(1, length('usmp:' || CAST(user_id AS VARCHAR)) + 1),
        |      i -> CAST(ascii(substr('usmp:' || CAST(user_id AS VARCHAR), i, 1)) AS BIGINT)),
        |    (h, c) -> (h * 131 + c) % 2147483647) AS hr FROM u),
        |u1 AS (SELECT user_id, (hr * hr) % 2147483647 AS d FROM uh),
        |ud AS (SELECT user_id, (d * d) % 2147483647 AS d FROM u1),
        |s AS (SELECT u.* FROM u JOIN ud ON u.user_id = ud.user_id
        |      CROSS JOIN n WHERE ud.d * 4 < 2147483647 OR n.n_users <= 32),
        |sm AS (SELECT list_sort(list(recency_days)) AS rs,
        |         list_sort(list(frequency)) AS fs,
        |         list_sort(list(monetary_cents)) AS ms FROM s),
        |c AS (SELECT
        |  CASE WHEN len(rs) = 0 THEN [] ELSE list_transform(range(1, 5),
        |    j -> rs[CAST(greatest(1, least(len(rs), (j * (len(rs) + 1)) // 5)) AS INT)]) END AS r_cuts,
        |  CASE WHEN len(fs) = 0 THEN [] ELSE list_transform(range(1, 5),
        |    j -> fs[CAST(greatest(1, least(len(fs), (j * (len(fs) + 1)) // 5)) AS INT)]) END AS f_cuts,
        |  CASE WHEN len(ms) = 0 THEN [] ELSE list_transform(range(1, 5),
        |    j -> ms[CAST(greatest(1, least(len(ms), (j * (len(ms) + 1)) // 5)) AS INT)]) END AS m_cuts
        |  FROM sm)
        |SELECT u.user_id, u.recency_days, u.frequency, u.monetary_cents,
        |  CAST(5 - len(list_filter(c.r_cuts, x -> u.recency_days > x)) AS BIGINT) AS r_score,
        |  CAST(1 + len(list_filter(c.f_cuts, x -> u.frequency > x)) AS BIGINT) AS f_score,
        |  CAST(1 + len(list_filter(c.m_cuts, x -> u.monetary_cents > x)) AS BIGINT) AS m_score,
        |  CAST(100 * (5 - len(list_filter(c.r_cuts, x -> u.recency_days > x)))
        |    + 10 * (1 + len(list_filter(c.f_cuts, x -> u.frequency > x)))
        |    + (1 + len(list_filter(c.m_cuts, x -> u.monetary_cents > x))) AS BIGINT)
        |    AS segment
        |FROM u CROSS JOIN c ORDER BY u.user_id""".stripMargin,
    "q_fd_profile" ->
      """WITH
        |p1 AS (SELECT count(DISTINCT o_custkey) AS k FROM orders GROUP BY o_orderkey),
        |p2 AS (SELECT count(DISTINCT o_orderstatus) AS k FROM orders GROUP BY o_custkey),
        |p3 AS (SELECT count(DISTINCT l_linestatus) AS k FROM lineitem GROUP BY l_orderkey),
        |p4 AS (SELECT count(DISTINCT l_suppkey) AS k FROM lineitem GROUP BY l_partkey),
        |p5 AS (SELECT count(DISTINCT c_nationkey) AS k FROM customer GROUP BY c_custkey),
        |p6 AS (SELECT count(DISTINCT n_regionkey) AS k FROM nation GROUP BY n_nationkey)
        |SELECT * FROM (
        |  SELECT 'orders' AS rel, 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
        |    CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |    CAST(max(k) AS BIGINT) AS max_rhs_per_group,
        |    CAST(CASE WHEN sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0
        |      THEN 1 ELSE 0 END AS INTEGER) AS fd_holds FROM p1
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey', 'o_orderstatus',
        |    CAST(count(*) AS BIGINT), CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(max(k) AS BIGINT),
        |    CAST(CASE WHEN sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0
        |      THEN 1 ELSE 0 END AS INTEGER) FROM p2
        |  UNION ALL
        |  SELECT 'lineitem', 'l_orderkey', 'l_linestatus',
        |    CAST(count(*) AS BIGINT), CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(max(k) AS BIGINT),
        |    CAST(CASE WHEN sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0
        |      THEN 1 ELSE 0 END AS INTEGER) FROM p3
        |  UNION ALL
        |  SELECT 'lineitem', 'l_partkey', 'l_suppkey',
        |    CAST(count(*) AS BIGINT), CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(max(k) AS BIGINT),
        |    CAST(CASE WHEN sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0
        |      THEN 1 ELSE 0 END AS INTEGER) FROM p4
        |  UNION ALL
        |  SELECT 'customer', 'c_custkey', 'c_nationkey',
        |    CAST(count(*) AS BIGINT), CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(max(k) AS BIGINT),
        |    CAST(CASE WHEN sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0
        |      THEN 1 ELSE 0 END AS INTEGER) FROM p5
        |  UNION ALL
        |  SELECT 'nation', 'n_nationkey', 'n_regionkey',
        |    CAST(count(*) AS BIGINT), CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(max(k) AS BIGINT),
        |    CAST(CASE WHEN sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0
        |      THEN 1 ELSE 0 END AS INTEGER) FROM p6)
        |ORDER BY rel, lhs, rhs""".stripMargin,
    // E19: unit-norm fold parity (IEEE 0+y = y ⇒ left-fold ≡ list_reduce
    // over squares); integer dot via list_dot_product on double-exact
    // int lanes; rank replays the heap's (score DESC, id ASC) order
    "q_ann_int8" ->
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
        |      (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |q8 AS (
        |  SELECT vec_id,
        |    CASE WHEN nrm = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |    ELSE list_transform(v, x -> CAST(floor(x * 127.0 / nrm + 0.5)
        |      AS BIGINT)) END AS q
        |  FROM n),
        |s AS (
        |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(list_dot_product(
        |      list_transform(p.q, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.q, x -> CAST(x AS DOUBLE))) AS BIGINT) AS score_i
        |  FROM q8 p JOIN q8 c ON p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id),
        |r AS (
        |  SELECT query_id, neighbor_id, score_i,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_i DESC, neighbor_id) AS BIGINT) AS "rank"
        |  FROM s)
        |SELECT query_id, neighbor_id, "rank", score_i FROM r
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,
    // E26: everything integer (int8 dots, top-k sums, exact-floor ppm
    // margin), so the mining criterion replays bit-for-bit. The src side
    // carries the registered BATCHED default (srcEvery=25, i.e. even ids
    // with (id/2) % 25 = 0 ⟺ id % 50 = 0 — the scale-survivable shape).
    // This oracle covers ONLY that registered default; callers using a
    // non-default srcEvery (incl. the srcEvery=1 opt-in full-corpus
    // baseline, whose exactness lives in AnnSpec's planted test) have no
    // oracle here by design.
    "q_margin_mining" ->
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
        |      (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |q8 AS (
        |  SELECT vec_id,
        |    CASE WHEN nrm = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |    ELSE list_transform(v, x -> CAST(floor(x * 127.0 / nrm + 0.5)
        |      AS BIGINT)) END AS q
        |  FROM n),
        |s AS (
        |  SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
        |    CAST(list_dot_product(
        |      list_transform(a.q, x -> CAST(x AS DOUBLE)),
        |      list_transform(b.q, x -> CAST(x AS DOUBLE))) AS BIGINT) AS d
        |  FROM q8 a JOIN q8 b ON a.vec_id % 50 = 0 AND b.vec_id % 2 = 1),
        |f AS (SELECT src_id, tgt_id, d,
        |    CAST(row_number() OVER (PARTITION BY src_id
        |      ORDER BY d DESC, tgt_id) AS BIGINT) AS rank_st FROM s),
        |g AS (SELECT src_id, tgt_id, d,
        |    CAST(row_number() OVER (PARTITION BY tgt_id
        |      ORDER BY d DESC, src_id) AS BIGINT) AS rank_ts FROM s),
        |sa AS (SELECT src_id, CAST(sum(d) AS BIGINT) AS sa,
        |         CAST(count(*) AS BIGINT) AS na
        |       FROM f WHERE rank_st <= 10 GROUP BY src_id),
        |sb AS (SELECT tgt_id, CAST(sum(d) AS BIGINT) AS sb,
        |         CAST(count(*) AS BIGINT) AS nb
        |       FROM g WHERE rank_ts <= 10 GROUP BY tgt_id)
        |SELECT f.src_id, f.tgt_id, f.d AS score_i,
        |  CAST((2 * f.d * na * nb * 1000000)
        |    // greatest(sa * nb + sb * na, 1) AS BIGINT) AS margin_ppm
        |FROM f JOIN g ON f.src_id = g.src_id AND f.tgt_id = g.tgt_id
        |JOIN sa ON sa.src_id = f.src_id
        |JOIN sb ON sb.tgt_id = f.tgt_id
        |WHERE f.rank_st = 1 AND g.rank_ts = 1
        |ORDER BY f.src_id""".stripMargin,
    // E21: stage-1 int8 rank ≤ 100, float cosine re-rank of those only
    "q_ann_cascade" ->
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
        |      (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |q8 AS (
        |  SELECT vec_id,
        |    CASE WHEN nrm = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |    ELSE list_transform(v, x -> CAST(floor(x * 127.0 / nrm + 0.5)
        |      AS BIGINT)) END AS q
        |  FROM n),
        |cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY p.vec_id
        |        ORDER BY CAST(list_dot_product(
        |          list_transform(p.q, x -> CAST(x AS DOUBLE)),
        |          list_transform(c.q, x -> CAST(x AS DOUBLE))) AS BIGINT) DESC,
        |        c.vec_id) AS r
        |    FROM q8 p JOIN q8 c ON p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id) t
        |  WHERE r <= 100)
        |SELECT query_id, neighbor_id, "rank" FROM (
        |  SELECT cand.query_id, cand.neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY cand.query_id
        |      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
        |        e.embedding::DOUBLE[]) DESC, cand.neighbor_id) AS BIGINT) AS "rank"
        |  FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
        |    JOIN embeddings e ON e.vec_id = cand.neighbor_id) t
        |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,
    // D28: D4 pairs ≥ τ → D6 recursive components → F2 quality argmax
    // (max + min-id-on-ties join-back ≡ Spark's min(struct(−q, id)))
    "q_dedup_best" -> dedupBestSql,
    // D28b: the LSH-candidate twin is gated against D28's OWN semantics —
    // at sf0.01 the banded candidate set provably covers every τ-pair
    // (plants J≥0.9 escape all 16 bands with p≈4e-8; organic same-source
    // pairs peak far below τ), the C12b regime-bounded-oracle precedent
    "q_dedup_best_lsh" -> dedupBestSql,
    // E20: both legs replay in SQL — the recall itself is oracle-checked
    "q_ann_int8_recall" ->
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
        |      (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |q8 AS (
        |  SELECT vec_id,
        |    CASE WHEN nrm = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |    ELSE list_transform(v, x -> CAST(floor(x * 127.0 / nrm + 0.5)
        |      AS BIGINT)) END AS q
        |  FROM n),
        |i8 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY p.vec_id
        |        ORDER BY CAST(list_dot_product(
        |          list_transform(p.q, x -> CAST(x AS DOUBLE)),
        |          list_transform(c.q, x -> CAST(x AS DOUBLE))) AS BIGINT) DESC,
        |        c.vec_id) AS r
        |    FROM q8 p JOIN q8 c ON p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id) t
        |  WHERE r <= 10),
        |ex AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id
        |        ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
        |          e.embedding::DOUBLE[]) DESC, e.vec_id) AS r
        |    FROM embeddings q JOIN embeddings e
        |      ON q.vec_id % 50 = 0 AND e.vec_id <> q.vec_id) t
        |  WHERE r <= 10),
        |j AS (
        |  SELECT ex.query_id,
        |    CASE WHEN i8.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
        |  FROM ex LEFT JOIN i8 ON ex.query_id = i8.query_id
        |    AND ex.neighbor_id = i8.neighbor_id)
        |SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact,
        |  CAST(sum(hit) AS BIGINT) AS n_overlap,
        |  CAST((CAST(sum(hit) AS HUGEINT) * 1000000) // count(*) AS BIGINT)
        |    AS recall_ppm
        |FROM j GROUP BY query_id ORDER BY query_id""".stripMargin,
    // A21: per-column stats via scalar subqueries; the verdict column
    // derives in the outer SELECT
    "q_key_candidates" -> {
      def one(c: String): String =
        s"""SELECT '$c' AS column_name,
           |  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows,
           |  (SELECT CAST(count(*) - count($c) AS BIGINT) FROM orders) AS n_nulls,
           |  (SELECT CAST(count(DISTINCT $c) AS BIGINT) FROM orders) AS n_distinct,
           |  coalesce((SELECT CAST(max(c2) AS BIGINT) FROM (
           |    SELECT count(*) AS c2 FROM orders WHERE $c IS NOT NULL
           |    GROUP BY $c) t), CAST(0 AS BIGINT)) AS top_freq""".stripMargin
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      s"""WITH u AS (
         |${cols.map(one).mkString("\n  UNION ALL\n")})
         |SELECT column_name, n_rows, n_nulls, n_distinct, top_freq,
         |  CAST(CASE WHEN n_nulls = 0 AND n_distinct = n_rows
         |    THEN 1 ELSE 0 END AS INTEGER) AS is_key
         |FROM u ORDER BY column_name""".stripMargin
    },
    // D26: raw vs normalized hash distincts from one scan
    "q_dedup_normalized" ->
      """WITH b AS (
        |  SELECT source, md5(text) AS hr,
        |    md5(trim(regexp_replace(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |      '  +', ' ', 'g'))) AS hn
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(count(DISTINCT hr) AS BIGINT) AS ndr,
        |        CAST(count(DISTINCT hn) AS BIGINT) AS ndn
        |      FROM b GROUP BY source)
        |SELECT source, n_docs, n_docs - ndr AS dup_raw,
        |  n_docs - ndn AS dup_norm,
        |  CAST((CAST(ndr - ndn AS HUGEINT) * 1000000) // n_docs AS BIGINT)
        |    AS norm_only_ppm
        |FROM r ORDER BY source""".stripMargin,
    // F37: the F34 even/odd split at bigram granularity, distinct both
    // legs before the probe join
    "q_ngram_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t
        |  FROM documents WHERE text IS NOT NULL),
        |tr AS (
        |  SELECT DISTINCT unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i + 1])) AS g
        |  FROM toks WHERE doc_id % 2 = 0),
        |te AS (
        |  SELECT DISTINCT lang, unnest(list_transform(range(1, len(t)),
        |    i -> t[i] || ' ' || t[i + 1])) AS g
        |  FROM toks WHERE doc_id % 2 = 1),
        |j AS (
        |  SELECT te.lang, CASE WHEN tr.g IS NULL THEN 0 ELSE 1 END AS hit
        |  FROM te LEFT JOIN tr ON te.g = tr.g)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_test_bigrams,
        |  CAST(sum(hit) AS BIGINT) AS n_covered,
        |  CAST((CAST(sum(hit) AS HUGEINT) * 1000000) // count(*) AS BIGINT)
        |    AS coverage_ppm
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    // C73: the EXISTS form of the left-semi + cross-side predicate
    "q_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // C74: integer-cents returned revenue, top 20 with custkey tiebreak
    "q_top_customers" ->
      """WITH r AS (
        |  SELECT l_orderkey,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |      AS BIGINT) AS cents
        |  FROM lineitem WHERE l_returnflag = 'R'),
        |pc AS (
        |  SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS revenue_cents,
        |    CAST(count(*) AS BIGINT) AS n_return_items
        |  FROM r JOIN orders ON l_orderkey = o_orderkey GROUP BY o_custkey)
        |SELECT c_custkey, c_name, n_name, revenue_cents, n_return_items
        |FROM pc JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue_cents DESC, c_custkey LIMIT 20""".stripMargin,
    // C75: min + join-back + min-suppkey-tie ≡ Spark's min(struct) argmin
    "q_min_cost_supplier" ->
      """WITH offer AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5) AS BIGINT))
        |      AS best_cents
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT l_partkey, min(best_cents) AS mc FROM offer GROUP BY 1),
        |w AS (SELECT o.l_partkey AS p_partkey,
        |        CAST(min(o.l_suppkey) AS BIGINT) AS sk, m.mc AS unit_cents
        |      FROM offer o JOIN m ON o.l_partkey = m.l_partkey
        |        AND o.best_cents = m.mc
        |      GROUP BY o.l_partkey, m.mc)
        |SELECT w.p_partkey, w.sk AS s_suppkey, s.s_name, w.unit_cents
        |FROM w JOIN supplier s ON s.s_suppkey = w.sk
        |ORDER BY p_partkey""".stripMargin,
    // C77: zero-order customers arrive via the LEFT JOIN + coalesce
    "q_custorder_dist" ->
      """WITH pc AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1)
        |SELECT coalesce(n, 0) AS n_orders, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY n_orders DESC""".stripMargin,
    // C83: HUGEINT power sums; floor-div spelled (a − pmod(a,b)) // b so
    // negative slopes floor identically (after the pmod subtraction the
    // dividend is exactly divisible — trunc == floor in every engine)
    "q_linear_trend" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM daily),
        |series AS (
        |  SELECT s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (d)),
        |xy AS (
        |  SELECT CAST(date_diff('day', (SELECT min(d) FROM series), d)
        |    AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y FROM series),
        |s AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx,
        |        sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx FROM xy),
        |t AS (SELECT n, 1000000 * (n * sxy - sx * sy) AS num,
        |        n * sxx - sx * sx AS den,
        |        1000 * (sy * sxx - sx * sxy) AS inum FROM s)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |  CAST((num - (((num % den) + den) % den)) // den AS BIGINT)
        |    AS slope_ppm,
        |  CAST((inum - (((inum % den) + den) % den)) // den AS BIGINT)
        |    AS intercept_x1000
        |FROM t""".stripMargin,
    // C99: median of pairwise slopes, all-integer lanes; the doubled
    // medians (×2) keep the even-count average integer-exact, and
    // quantile_cont ≡ Spark percentile at p=0.5 on exact-integer doubles
    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM daily),
        |series AS (
        |  SELECT s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (d)),
        |xy AS (
        |  SELECT CAST(date_diff('day', (SELECT min(d) FROM series), d)
        |    AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y FROM series),
        |slopes AS (
        |  SELECT CAST((num - (((num % den) + den) % den)) // den AS BIGINT) AS s
        |  FROM (SELECT 1000000 * (b.y - a.y) AS num, b.x - a.x AS den
        |        FROM xy a JOIN xy b ON a.x < b.x)),
        |sl AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(2 * quantile_cont(s, 0.5) AS BIGINT) AS slope_ppm_x2
        |  FROM slopes),
        |res AS (
        |  SELECT sl.n_pairs, sl.slope_ppm_x2,
        |    CAST(2000000 * xy.y - CAST(sl.slope_ppm_x2 AS HUGEINT) * xy.x
        |      AS BIGINT) AS r
        |  FROM xy CROSS JOIN sl)
        |SELECT CAST(count(*) AS BIGINT) AS n_days, n_pairs, slope_ppm_x2,
        |  CAST(2 * quantile_cont(r, 0.5) AS BIGINT) AS intercept_x4e6
        |FROM res GROUP BY n_pairs, slope_ppm_x2""".stripMargin,
    // C72: two-state recursive CTE; every halving spelled
    // (x − pmod(x,2)) // 2 — the trend lane goes negative
    "q_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM daily),
        |series AS (
        |  SELECT s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (d)),
        |i AS (SELECT d, y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |      FROM series),
        |r AS (
        |  SELECT d, y, i, CAST(1000 * y AS BIGINT) AS l,
        |    CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS dev
        |  FROM i WHERE i = 1
        |  UNION ALL
        |  SELECT t.d, t.y, t.i,
        |    ((1000 * t.y + r.l + r.b)
        |      - ((((1000 * t.y + r.l + r.b) % 2) + 2) % 2)) // 2,
        |    ((r.b + ((1000 * t.y + r.l + r.b)
        |        - ((((1000 * t.y + r.l + r.b) % 2) + 2) % 2)) // 2 - r.l)
        |      - (((((r.b + ((1000 * t.y + r.l + r.b)
        |        - ((((1000 * t.y + r.l + r.b) % 2) + 2) % 2)) // 2 - r.l))
        |        % 2) + 2) % 2)) // 2,
        |    1000 * t.y - (r.l + r.b)
        |  FROM i t JOIN r ON t.i = r.i + 1)
        |SELECT d, y, l AS level_x1000, b AS trend_x1000, dev AS dev_x1000
        |FROM r ORDER BY d""".stripMargin,
    // C95: Holt-Winters additive weekly seasonality; the recursive term
    // names lnew in a derived table, seasonal list updated by 1-based
    // indexed list_transform (Spark's transform lambda is 0-based)
    "q_holt_winters" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |    CAST(min(d) AS TIMESTAMP), CAST(max(d) AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM daily),
        |series AS (
        |  SELECT s.d, CAST(coalesce(daily.y, 0) AS BIGINT) AS y
        |  FROM spine s LEFT JOIN daily USING (d)),
        |i AS (SELECT d, y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |      FROM series),
        |r AS (
        |  SELECT d, y, i, CAST(1000 * y AS BIGINT) AS l,
        |    CAST(0 AS BIGINT) AS b,
        |    [CAST(0 AS BIGINT), 0, 0, 0, 0, 0, 0] AS s,
        |    CAST(0 AS BIGINT) AS sx, CAST(0 AS BIGINT) AS dev
        |  FROM i WHERE i = 1
        |  UNION ALL
        |  SELECT d, y, i, lnew AS l,
        |    ((b + lnew - l) - ((((b + lnew - l) % 2) + 2) % 2)) // 2 AS b,
        |    list_transform(s, (v, j) -> CASE WHEN j = w + 1 THEN
        |      ((v + (1000 * y - lnew))
        |        - ((((v + (1000 * y - lnew)) % 2) + 2) % 2)) // 2
        |      ELSE v END) AS s,
        |    ((s[w + 1] + (1000 * y - lnew))
        |      - ((((s[w + 1] + (1000 * y - lnew)) % 2) + 2) % 2)) // 2 AS sx,
        |    1000 * y - (l + b + s[w + 1]) AS dev
        |  FROM (
        |    SELECT t.d, t.y, t.i, r.l, r.b, r.s,
        |      CAST(isodow(t.d) - 1 AS BIGINT) AS w,
        |      ((1000 * t.y - r.s[CAST(isodow(t.d) AS INT)] + r.l + r.b)
        |        - ((((1000 * t.y - r.s[CAST(isodow(t.d) AS INT)] + r.l + r.b)
        |          % 2) + 2) % 2)) // 2 AS lnew
        |    FROM i t JOIN r ON t.i = r.i + 1) z)
        |SELECT d, y, l AS level_x1000, b AS trend_x1000,
        |  sx AS seasonal_x1000, dev AS dev_x1000
        |FROM r ORDER BY d""".stripMargin,
    // C78: Q7 shape — directed nation trade lanes per ship year
    "q_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE sn.n_name <> cn.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // C79: Q8 shape — supplier-nation share of each customer-region-year
    "q_market_share" ->
      """WITH rev AS (
        |  SELECT cn.n_regionkey AS cust_regionkey,
        |    CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |    sn.n_name AS supp_nation,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  GROUP BY 1, 2, 3),
        |tot AS (
        |  SELECT cust_regionkey, ship_year, CAST(sum(cents) AS BIGINT) AS total_cents
        |  FROM rev GROUP BY 1, 2)
        |SELECT rev.cust_regionkey, rev.ship_year, rev.supp_nation,
        |  rev.cents AS revenue_cents,
        |  CAST((CAST(rev.cents AS HUGEINT) * 1000000) // tot.total_cents
        |    AS BIGINT) AS share_ppm
        |FROM rev JOIN tot USING (cust_regionkey, ship_year)
        |ORDER BY 1, 2, 3""".stripMargin,
    // C80: Q9 shape — profit per supplier nation/year with the declared
    // 60%-of-retail unit-cost proxy (no partsupp in this schema)
    "q_product_profit" ->
      """SELECT sn.n_name AS supp_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |      AS BIGINT)
        |    - CAST(floor(p_retailprice * 60 + 0.5) AS BIGINT)
        |      * CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // C81: Q11 shape — parts above a ppm threshold of global revenue
    "q_revenue_concentration" ->
      """WITH pp AS (
        |  SELECT l_partkey AS p_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total_cents FROM pp)
        |SELECT p_partkey, revenue_cents,
        |  CAST((CAST(revenue_cents AS HUGEINT) * 1000000) // total_cents
        |    AS BIGINT) AS share_ppm
        |FROM pp, tot
        |WHERE (CAST(revenue_cents AS HUGEINT) * 1000000) // total_cents
        |  >= 500
        |ORDER BY share_ppm DESC, p_partkey""".stripMargin,
    // C82: Q15 shape — max-revenue supplier per quarter (min-suppkey tie)
    "q_top_supplier" ->
      """WITH ps AS (
        |  SELECT CAST(year(l_shipdate) * 10 + quarter(l_shipdate) AS BIGINT)
        |      AS year_q,
        |    l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem GROUP BY 1, 2),
        |mx AS (SELECT year_q, max(revenue_cents) AS best FROM ps GROUP BY 1),
        |w AS (
        |  SELECT ps.year_q, CAST(min(ps.l_suppkey) AS BIGINT) AS s_suppkey,
        |    mx.best AS revenue_cents
        |  FROM ps JOIN mx ON ps.year_q = mx.year_q
        |    AND ps.revenue_cents = mx.best
        |  GROUP BY ps.year_q, mx.best)
        |SELECT w.year_q, w.s_suppkey, s.s_name, w.revenue_cents
        |FROM w JOIN supplier s ON w.s_suppkey = s.s_suppkey
        |ORDER BY w.year_q""".stripMargin,
    // C84: Q17 shape — sub-half-average-quantity revenue per brand, with
    // the correlated AVG as exact integer math (2·qty·n < Σqty)
    "q_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(floor(l_quantity) AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |pp AS (
        |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty, count(*) AS n
        |  FROM li GROUP BY 1)
        |SELECT p_brand, CAST(sum(li.cents) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_small_items
        |FROM li JOIN pp USING (l_partkey)
        |JOIN part ON li.l_partkey = p_partkey
        |WHERE li.qty * pp.n * 2 < pp.sum_qty
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // C85: Q21 shape — late supplier on a finalized order where every
    // OTHER supplier shipped on time (EXISTS / NOT EXISTS pair)
    "q_laggard_suppliers" ->
      """WITH f AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
        |      THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name,
        |  count(*) AS n_waiting_orders
        |FROM f c JOIN supplier ON c.l_suppkey = s_suppkey
        |WHERE c.late = 1
        |  AND EXISTS (SELECT 1 FROM f o WHERE o.l_orderkey = c.l_orderkey
        |    AND o.l_suppkey <> c.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM f o WHERE o.l_orderkey = c.l_orderkey
        |    AND o.l_suppkey <> c.l_suppkey AND o.late = 1)
        |GROUP BY 1, 2
        |ORDER BY n_waiting_orders DESC, s_suppkey""".stripMargin,
    // C86: Q22 shape — above-average positive balance, zero orders,
    // rolled up per market segment (integer bal·n > Σbal compare)
    "q_idle_customers" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |  FROM customer),
        |avp AS (
        |  SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_bal, count(*) AS n_bal
        |  FROM c WHERE bal_cents > 0)
        |SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
        |FROM c, avp
        |WHERE bal_cents * n_bal > sum_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-08-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // C87: Q14 shape — promo-type share of monthly revenue in exact ppm
    "q_promo_revenue" ->
      """SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
        |    AS ship_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |      AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS total_cents,
        |  CAST((CAST(sum(CASE WHEN p_type = 'PROMO' THEN
        |      CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |        AS BIGINT) ELSE 0 END) AS HUGEINT) * 1000000)
        |    // sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS promo_ppm
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // C88: Q16 shape — distinct suppliers per part attribute, excluding
    // one brand and the derived high-late-rate supplier set
    "q_supplier_diversity" ->
      """WITH bad AS (
        |  SELECT l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1
        |  HAVING sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
        |      THEN 1 ELSE 0 END) * 1000000 > count(*) * 520000)
        |SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size <= 25
        |  AND l_suppkey NOT IN (SELECT l_suppkey FROM bad)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // C89: Q19 shape — OR of three brand/size/quantity conjunctions,
    // mutually exclusive by brand, one conditional-tag pass
    "q_disjunctive_revenue" ->
      """WITH f AS (
        |  SELECT CASE
        |      WHEN p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |        AND floor(l_quantity) BETWEEN 1 AND 11 THEN 1
        |      WHEN p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |        AND floor(l_quantity) BETWEEN 10 AND 20 THEN 2
        |      ELSE 3 END AS branch,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |      AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |      AND floor(l_quantity) BETWEEN 1 AND 11)
        |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |      AND floor(l_quantity) BETWEEN 10 AND 20)
        |    OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 50
        |      AND floor(l_quantity) BETWEEN 20 AND 30))
        |SELECT CAST(branch AS BIGINT) AS branch, count(*) AS n_items,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // C90: Q20 shape — suppliers shipping a dominant share (>= 12%) of a
    // token-family part's total quantity (exact integer ppm compare)
    "q_majority_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%gear%'
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty
        |  FROM ps GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name AS nation,
        |  count(*) AS n_dominated_parts,
        |  CAST(sum(ps.qty) AS BIGINT) AS qty_shipped
        |FROM ps
        |JOIN tot ON ps.l_partkey = tot.l_partkey
        |JOIN supplier ON ps.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE ps.qty * 1000000 >= tot.total_qty * 120000
        |GROUP BY 1, 2, 3
        |ORDER BY n_dominated_parts DESC, s_suppkey""".stripMargin,
  )
}
