package graft

import graft.SparkSpec

/** Plan-shape regression tests: the properties that make these operators
  * scale are assertions, not hopes. If a refactor drops a pushed filter,
  * breaks the broadcast semi-join, or de-prunes a scan, these fail. */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("incremental sync: pushed bookmark filter + broadcast left-semi join") {
    val plan = planOf(queries.Etl.qIncrementalSync(spark, sfDir))
    assert(plan.contains("LeftSemi"), "active-key join must be left-semi")
    assert(plan.contains("BroadcastHashJoin"), "active-key join must broadcast")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThan(o_orderdate"),
      "bookmark predicate must reach the parquet scan")
  }

  test("q1: filter pushed down and scan pruned to needed columns") {
    val plan = planOf(queries.Warehouse.q1PricingSummary(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!plan.contains("l_orderkey"), "unused columns must be pruned from the scan")
  }

  test("q5: dimension tables broadcast, selective filters pushed") {
    val plan = planOf(queries.Warehouse.q5LocalSupplier(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      "star joins must broadcast the small sides")
    assert(plan.contains("EqualTo(r_name,ASIA)"), "region filter must be pushed")
  }

  test("column selection prunes the scan schema") {
    val plan = planOf(queries.Etl.qSelectColumns(spark, sfDir))
    assert(plan.contains("c_custkey") && !plan.contains("c_mktsegment"),
      "unselected columns must not be read")
  }

  test("batch assignment plans no global window (no single-partition stage)") {
    val df = queries.Etl.qBatchAssign(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Window"),
      "batch assignment must not use a window (global windows single-task)")
  }

  test("ann top-k aggregates with map-side partial (no full-width window shuffle)") {
    val plan = planOf(queries.LlmOps.qAnnTopK(spark, sfDir))
    assert(!plan.contains("Window"), "top-k must be the bounded-heap aggregate")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "TopKByScore must run partial (map-side) + final")
  }

  test("anti join broadcasts the reduced key set (left-anti, no shuffle of customers)") {
    val plan = planOf(queries.Warehouse.qAntiJoin(spark, sfDir))
    assert(plan.contains("LeftAnti"), "NOT EXISTS must plan as a left-anti join")
    assert(plan.contains("BroadcastHashJoin"),
      "the distinct filtered key set must broadcast")
    assert(plan.contains("GreaterThan(o_totalprice"),
      "the price filter must be pushed to the orders scan")
  }

  test("date-partitioned facts prune partitions AND push the row filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = graft.sources.Tables.table(spark, sfDir, "events")
    graft.sources.Partitioned.writeDatePartitioned(events, "ts", dir)
    val nParts = new java.io.File(dir).listFiles().count(_.getName.startsWith("p_date="))
    assert(nParts > 1, "testdata must span multiple dates for this check")
    val read = graft.sources.Partitioned.readSince(spark, dir, "ts", "1998-07-01")
    val plan = planOf(read)
    assert(plan.contains("PartitionFilters:") && plan.contains("p_date"),
      "date predicate must prune at the partition level")
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts"),
      "timestamp predicate must also reach the row-group scan")
    // correctness: same rows as filtering the unpartitioned table
    val expected = events.filter(events("ts") >
      org.apache.spark.sql.functions.lit("1998-07-01")).count()
    assert(read.count() == expected && expected > 0)
  }

  test("embedding near-dup broadcasts one side (no cartesian shuffle)") {
    val plan = planOf(queries.LlmOps.qEmbeddingNearDup(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }

  test("as-of join plans exactly one key window, never a pair-explosion join") {
    val plan = planOf(queries.Warehouse.qAsofJoin(spark, sfDir))
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      "as-of must not theta-join left×right")
    assert("RunningWindowFunction|Window".r.findAllIn(plan).nonEmpty,
      "as-of carries the right payload with a running window")
  }

  test("ann lsh reads the memoized bucket index from cache, not a rescan") {
    queries.LlmOps.annLshIndex(spark, sfDir) // ensure built
    val plan = planOf(queries.LlmOps.qAnnLsh(spark, sfDir))
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      "query plan must consume the cached index")
  }

  test("split assignment is one map-side projection (no shuffle, no join)") {
    import org.apache.spark.sql.functions.col
    // the registered query adds a presentation orderBy; the operator
    // itself must plan as a bare projection over the scan
    val proj = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), graft.curation.Curation.assignSplit(
        "text", Seq("train" -> 8, "val" -> 1, "test" -> 1)).as("split"))
    val plan = planOf(proj)
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      "content-hash split must stay embarrassingly parallel")
  }

  test("dead-letter sink plan is a parquet write over mapPartitions (no driver collect)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1 to 10).map(i => (i, s"""{"x":$i}""")).toDF("pk", "payload")
    val (rejects, _) = target.ApiSink.sink(
      df, new target.ApiSink.RecordingPoster(), target.ApiSink.SinkConfig(
        target.ApiSink.Endpoint("https://example.invalid", "account")))
    val plan = planOf(rejects.toDF())
    assert(plan.contains("MapPartitions"),
      "rejects must flow from the executor-side sink stage")
    assert(!plan.contains("CollectLimit") && !plan.contains("Exchange"),
      "failure capture must not funnel through the driver or reshuffle")
  }

  test("chunking and redaction are map-side projections (no shuffle, no join)") {
    import org.apache.spark.sql.functions.col
    val chunks = graft.text.Chunking.chunk(
      graft.sources.Tables.table(spark, sfDir, "documents"),
      "text", "doc_id", size = 32, stride = 24)
    val cplan = planOf(chunks)
    assert(!cplan.contains("Exchange") && !cplan.contains("Join"),
      "chunking must stay embarrassingly parallel")
    val redacted = graft.text.Redact.pii(
      graft.sources.Tables.table(spark, sfDir, "documents"), "text", "doc_id")
    val rplan = planOf(redacted)
    assert(!rplan.contains("Exchange") && !rplan.contains("Join"),
      "redaction must stay embarrassingly parallel")
  }

  test("rollup plans one Expand + one aggregate pass, not a union of aggregates") {
    val plan = planOf(queries.Warehouse.qRollup(spark, sfDir))
    assert(plan.contains("Expand"), "rollup must use the grouping-sets Expand plan")
    assert(!plan.contains("Union"), "rollup must not union separate aggregates")
  }

  test("bloom sync prefilters at the scan side before the residual semi-join") {
    val plan = planOf(queries.Etl.qBloomSync(spark, sfDir))
    assert(plan.contains("bloommightcontain"),
      "the Bloom probe must appear in the fact-side filter")
    assert(plan.contains("LeftSemi"), "the residual join keeps exactness")
    // the probe must sit BELOW the join (filter the scan, not the result):
    // in the tree string children print after their parent
    val probeAt = plan.indexOfSlice("bloommightcontain")
    val joinAt = plan.indexOfSlice("LeftSemi")
    assert(joinAt >= 0 && probeAt > joinAt, "prefilter must be on the join's input side")
  }

  test("cdc apply aggregates with map-side partials, never a global sort of the changelog") {
    val plan = planOf(queries.Temporal.qCdcApply(spark, sfDir))
    assert("partial_max_by".r.findAllIn(plan).nonEmpty,
      "latest-per-key must reduce map-side (SortAggregate partial — " +
        "struct buffers don't hash-aggregate; see Temporal.qCdcApply doc)")
    assert(!plan.contains("Window"), "cdc apply must not sort every change in a window")
  }

  test("scd2 plans BOTH window passes over one key exchange") {
    val plan = planOf(queries.Temporal.scd2(
      graft.sources.Tables.table(spark, sfDir, "events"),
      "user_id", "ts", "event_id", "props"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"change detection and interval close must share one shuffle:\n$plan")
  }

  test("loss mask is one map-side projection (no shuffle, no join)") {
    import org.apache.spark.sql.functions.col
    val masked = graft.text.Redact.lossMask(
      graft.sources.Tables.table(spark, sfDir, "documents"), "text", "doc_id")
    val plan = planOf(masked)
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      "token masking must stay embarrassingly parallel")
  }

  test("global shuffle: shard routing is map-side; positions cost one hash exchange") {
    import org.apache.spark.sql.functions.{col, row_number}
    val assigned = graft.queries.Mix.assignShard(
      graft.sources.Tables.table(spark, sfDir, "documents").select("doc_id"), "doc_id")
    assert(!planOf(assigned).contains("Exchange"), "shard assignment is map-side")
    // the position window (the operator minus the presentation orderBy)
    // partitions by shard — one hash exchange, NO range partitioning
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("h", "doc_id")
    val positions = assigned.withColumn("pos", row_number().over(w))
    val plan = planOf(positions)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, s"one shard shuffle:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      "a global training order must never cost a global sort")
    col("pos") // silence unused-import lint paths
  }

  test("domain mix broadcasts the quota dim onto the corpus (no shuffle join)") {
    val plan = planOf(graft.queries.Mix.qDomainMix(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"),
      "per-source quotas must broadcast, not shuffle-join the corpus")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join expected:\n$plan")
  }

  test("rank fusion legs broadcast the query batch; fuse never re-shuffles wide rows") {
    val plan = planOf(queries.Retrieval.qRankFusion(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "query batch must broadcast against the streamed corpus")
    assert(!plan.contains("CartesianProduct"), "no unbroadcast cross product")
  }

  test("indexed sparse leg plans only equi-joins (no Q×N product anywhere)") {
    // the 100 TB contract of E9b: candidate generation is a posting-list
    // equi-join, so the whole plan must be hash/sort-merge joins — any
    // NestedLoop or CartesianProduct means the Q×N product crept back
    val plan = planOf(queries.Retrieval.sparseTopKIndexed(spark, sfDir, k = 20))
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"inverted-index candidates must never pair-explode:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      "the query-batch score join must broadcast on the equi key")
  }

  test("nearest as-of plans both window passes over one key exchange") {
    // the final orderBy adds a rangepartitioning exchange; the JOIN
    // machinery itself must contribute exactly one hash exchange for
    // both directional window sorts
    val plan = planOf(queries.Warehouse.qAsofNearest(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"both directional carries must share the tagged-union shuffle:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 2, "two window passes expected")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "nearest as-of must never pair-explode")
  }

  test("entropy and normalization are map-side projections (no shuffle)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val eplan = planOf(graft.text.TextAnalysis.tokenEntropy(docs, "text", "doc_id"))
    assert(!eplan.contains("Exchange") && !eplan.contains("Generate"),
      "entropy must fold per row — no explode, no shuffle")
    val nplan = planOf(graft.text.TextAnalysis.normalize(docs, "text", "doc_id"))
    assert(!nplan.contains("Exchange"), "normalization must stay embarrassingly parallel")
  }

  test("grouped top-N aggregate plans partial+final ObjectHashAggregate, no window sort") {
    val plan = planOf(queries.Warehouse.qWindowTopNAgg(spark, sfDir))
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "bounded-heap top-N must reduce map-side before the exchange")
    assert(!plan.contains("Window"), "the aggregate form must not plan a window sort")
  }

  test("bigram top-K plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(queries.LlmOps.qBigramCounts(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"),
      "bounded top-K must not materialize a total sort")
  }

  test("cube plans one Expand + one aggregate pass, not a union of aggregates") {
    val plan = planOf(queries.Warehouse.qCube(spark, sfDir))
    assert(plan.contains("Expand"), "grouping sets must plan through Expand")
    assert(!plan.contains("Union"), "cube must not union per-set aggregates")
  }

  test("fuzzy join never plans a cross product; the exchange carries hashed keys") {
    val plan = planOf(queries.LlmOps.qFuzzyJoin(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "symmetric-delete blocking must plan as an equi-join")
    assert(plan.contains("xxhash64"), "join key must be the variant hash, not variant text")
  }

  test("group centroid: partial+final vector aggregate, centroids broadcast back") {
    val plan = planOf(queries.LlmOps.qGroupCentroid(spark, sfDir))
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "VectorSum must reduce map-side before the exchange")
    assert(plan.contains("BroadcastHashJoin"),
      "tiny centroid dimension must broadcast onto the vector scan")
  }

  test("rolling agg plans one user-keyed window, never a global partition") {
    val df = queries.Warehouse.qRollingAgg(spark, sfDir)
    val win = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(win.nonEmpty && win.forall(_.partitionSpec.nonEmpty),
      "range frame must be keyed on user_id (a global window single-tasks)")
  }

  test("sliding window plans map-side window-set expansion feeding ONE aggregate") {
    val plan = planOf(queries.Warehouse.qSlidingWindow(spark, sfDir))
    assert(plan.contains("Expand") || plan.contains("Generate"),
      "hopping windows must expand map-side")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "the overlap aggregate still runs with map-side partials")
  }

  test("moments/corr/abtest are one partial+final aggregate, no join, no window") {
    for (df <- Seq(queries.Warehouse.qMoments(spark, sfDir),
        queries.Warehouse.qCorr(spark, sfDir),
        queries.Warehouse.qAbtest(spark, sfDir))) {
      val plan = planOf(df)
      assert("HashAggregate".r.findAllIn(plan).size >= 2, "map-side partials required")
      assert(!plan.contains("Join") && !plan.contains("Window"),
        "power-sum statistics need no join and no window")
    }
  }

  test("zscore and winsorize broadcast the group-stats dimension onto the fact scan") {
    for (df <- Seq(queries.Warehouse.qZscore(spark, sfDir),
        queries.Warehouse.qWinsorize(spark, sfDir))) {
      val plan = planOf(df)
      assert(plan.contains("BroadcastHashJoin"),
        "group cutoffs/stats are a tiny dim — must broadcast, never shuffle the facts")
      assert(!plan.contains("SortMergeJoin"))
    }
  }

  test("curation pipeline keep-min is a pure hash aggregate (no sort, no window)") {
    val plan = planOf(queries.LlmOps.qCurateE2e(spark, sfDir))
    assert(!plan.contains("Window"), "keep-min must not be a row_number window")
    assert(!plan.contains("SortAggregate"),
      "packed-long min must hash-aggregate (struct min_by would sort)")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "map-side partial + final required")
  }

  test("bm25: one-row stats dim broadcasts back, scorer has no per-term explode") {
    val plan = planOf(queries.LlmOps.qBm25(spark, sfDir))
    assert(!plan.contains("Generate"),
      "per-doc tf must be an array filter, not a (doc, term) explode")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the single-row corpus-stats dimension must broadcast")
    assert("documents\\.parquet".r.findAllIn(plan).size == 2,
      "one scan for stats, one for scoring — never a third")
  }

  test("integrity audit scans lineitem ONCE for all three of its FK checks") {
    val plan = planOf(queries.Etl.qIntegrity(spark, sfDir))
    assert("lineitem\\.parquet".r.findAllIn(plan).size == 1,
      "the three lineitem FK orphan counts must share one fact scan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "part/supplier membership probes must broadcast")
  }

  test("span dedup: no window/sort-aggregate; dup selection is a count agg, not collect per hash") {
    val df = graft.dedup.SpanDedup.docSpanStats(
      graft.sources.Tables.table(spark, sfDir, "documents"), "doc_id", "text", 8)
    val plan = planOf(df)
    assert(!plan.contains("Window"), "span accounting must not window")
    assert(!plan.contains("SortAggregate"),
      "span aggs must stay hash-based (collect_list is per-doc bounded)")
    // the duplicated-hash side aggregates counts only — the ONE logical
    // collect_list (the per-doc, per-group-bounded mask union) shows as
    // its partial + final pair and nothing more
    assert("collect_list".r.findAllIn(plan).size <= 2,
      "never collect occurrence lists per span hash (viral-span hazard)")
  }

  test("ntileApprox plans no sort and no window — cutoffs broadcast, buckets map-side") {
    // the documented 100 TB drop-in for exact ntile: the whole point is
    // removing the per-group sort, so the plan shape IS the contract
    val df = queries.Warehouse.ntileApprox(
      graft.sources.Tables.table(spark, sfDir, "events"), "event_type", "value")
    val plan = planOf(df)
    assert(!plan.contains("Window"), "approx tiling must not window")
    assert(!plan.contains("Sort"), "approx tiling must not sort anywhere")
    assert(plan.contains("BroadcastHashJoin"), "decile cutoffs must broadcast")
  }

  test("approx domain mix plans no sort and no window — thresholds broadcast, filter map-side") {
    // H16b's 100 TB contract: the exact face's per-source Window rank is
    // replaced by a sampled-quantile hash threshold, so the plan must
    // carry NO window and NO sort anywhere — the corpus is touched by a
    // scan, a bounded sample aggregate, and a broadcast-filtered scan
    val plan = planOf(queries.Mix.domainMixApprox(spark, sfDir, sampleMod = 16L))
    assert(!plan.contains("Window"), "approx mix must not window")
    assert(!plan.contains("Sort"), "approx mix must not sort anywhere")
    assert(plan.contains("BroadcastHashJoin"), "per-source thresholds must broadcast")
  }

  test("global-rank approx twins plan no window and no sort — cutoffs broadcast") {
    // the C46b/C59b/C61b contract: the exact faces' single-partition
    // Window.orderBy over the per-user frame (the bench log's "No
    // Partition Defined for Window" warnings) is replaced by sampled
    // cutoffs — the per-user frame must never sort or window anywhere
    Seq(
      "gini" -> queries.Warehouse.qGiniApprox(spark, sfDir),
      "lorenz" -> queries.Warehouse.lorenzDecilesApprox(spark, sfDir, 4L, 8),
      "rfm" -> queries.Warehouse.rfmSegmentsApprox(spark, sfDir, 4L, 8)
    ).foreach { case (name, df) =>
      val plan = planOf(df)
      assert(!plan.contains("Window"), s"$name approx must not window")
      assert(!plan.contains("Sort"), s"$name approx must not sort anywhere")
    }
  }

  test("approx ppl buckets plan no window — cutoffs broadcast onto the scored scan") {
    // F19c's contract: the per-source tercile Window of the exact face
    // is gone; boundaries ride a broadcast ~|sources|-row frame
    val plan = planOf(queries.LlmOps.qPplBucketsApprox(spark, sfDir))
    assert(!plan.contains("Window"), "approx bucketing must not window")
    assert(plan.contains("BroadcastHashJoin"), "cutoffs must broadcast")
  }

  test("ivf scan: probes and query vectors broadcast — assigned corpus never sort-merges") {
    val plan = planOf(queries.LlmOps.qAnnIvf(spark, sfDir))
    assert(!plan.contains("SortMergeJoin"),
      s"IVF must never shuffle the assigned corpus:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "probe pairs and query vectors must both broadcast")
  }

  test("ivf-pq scan: probes and tables broadcast — the codes corpus never sort-merges") {
    // E8b's 100 TB contract after the round-8 fix: a Q·nprobe×(m·k
    // doubles) probe frame past the auto-broadcast threshold made the
    // planner sort-merge on cell_id — a full corpus shuffle into nCells
    // skewed partitions (measured 5×). Both query-side frames broadcast
    // explicitly; any SortMergeJoin here means the corpus shuffled.
    val plan = planOf(queries.LlmOps.qPqIvf(spark, sfDir))
    assert(!plan.contains("SortMergeJoin"),
      s"IVF-PQ must never shuffle the codes corpus:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "probe pairs and ADC tables must both broadcast")
  }

  test("video frame sampling plans a pure map pass — zero exchanges") {
    // G3g's shape contract: synth + header parse + seek-sample are all
    // per-partition object maps; any Exchange means frame bytes or
    // payloads started traveling
    val plan = planOf(graft.multimodal.Video.sampleFrames(
      graft.multimodal.Video.syntheticVideoTable(
        graft.sources.Tables.table(spark, sfDir, "documents"), "doc_id"),
      nSamples = 4))
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
  }

  test("chunk dedup apply: no window; canonical + rebuild are hash aggregates") {
    // D16b re-keys by doc for the rebuild, but neither the canonical
    // selection nor the reassembly may plan a Window or sort-aggregate
    // (collect_list of kept structs runs as ObjectHashAggregate)
    val plan = planOf(queries.LlmOps.chunkDedupApply(
      graft.sources.Tables.table(spark, sfDir, "documents")))
    assert(!plan.contains("Window"), "chunk apply must not window")
    assert(!plan.contains("SortAggregate"), "rebuild must hash-aggregate, not sort")
    assert(plan.contains("ObjectHashAggregate"), "collect_list rebuild runs as object hash agg")
  }

  test("soft dedup plans a bounded-heap aggregate — no window, no per-group sort") {
    // D1b's viral-cluster contract: selection of the c smallest ids runs
    // as the TopKByScore aggregate (c slots of state), never a window
    // rank (which would sort a million-row duplicate cluster)
    val df = queries.LlmOps.qDedupSoft(spark, sfDir, c = 2)
    val plan = planOf(df)
    assert(!plan.contains("Window"), "soft dedup must not window")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "TopKByScore must run partial (map-side) + final")
  }

  test("kmv distinct sketch plans partial+final hash aggregate, no window, no expand") {
    // the documented 100 TB drop-in for COUNT(DISTINCT): one mergeable
    // sketch per group, exchanged as ≤k longs — the multi-distinct
    // Expand (and any window) would defeat it. (The registered query's
    // final orderBy is a 5-row presentation sort, so "no Sort" is
    // asserted on the pre-order plan.)
    val df = queries.LlmOps.qDistinctSketch(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Window"), "sketch agg must not window")
    assert(!plan.contains("Expand"),
      "sketches must not plan the multi-distinct Expand")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "KmvSketch must run partial (map-side) + final")
    val preOrder = planOf(graft.sources.Tables.table(spark, sfDir, "events")
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(graft.functions.kmvDistinct(
        org.apache.spark.sql.functions.col("user_id"), 8192).as("d")))
    assert(!preOrder.contains("Sort"), "sketch aggregation itself must not sort")
  }

  test("outlier mad: both stat frames broadcast back — the corpus never shuffles on the group key twice") {
    val plan = planOf(queries.Warehouse.qOutlierMad(spark, sfDir))
    assert(!plan.contains("Window"), "robust stats must not window")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "med and mad frames must both broadcast onto the fact scan")
    assert(!plan.contains("SortMergeJoin"),
      "|types|-row stat frames must never sort-merge")
  }

  test("attribution: one user exchange, no self-join of the event stream") {
    val df = queries.Warehouse.qAttribution(spark, sfDir)
    val plan = planOf(df)
    // the range self-join alternative would plan a second join here
    assert(!plan.contains("Join"), "attribution must be the window carry, not a join")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      "exactly one user-keyed exchange")
  }

  test("market basket: pair expansion joins on the order key, no cartesian of parts") {
    val plan = planOf(queries.Warehouse.qMarketBasket(spark, sfDir))
    assert(!plan.contains("CartesianProduct"),
      "pair expansion must ride the per-order equi-join")
    // the one-row totals frame is the only nested-loop (broadcast) join
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1,
      "only the one-row totals may cross-join")
  }

  test("domain cap plans the bounded-heap aggregate with a broadcast caps frame") {
    val plan = planOf(queries.LlmOps.qDomainCap(spark, sfDir))
    assert(!plan.contains("Window"), "cap selection must not window")
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "TopKByScore must run partial (map-side) + final")
    assert(plan.contains("BroadcastHashJoin"),
      "the per-source caps frame must broadcast onto the doc scan")
  }

  test("split leakage: bounded-state hash aggregation, no window, docs scanned once") {
    val df = queries.LlmOps.qSplitLeakage(spark, sfDir)
    val plan = planOf(df)
    assert(!plan.contains("Window"), "leak audit must not window")
    assert(!plan.contains("Join"), "leak audit is aggregation-only — no join")
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      "documents must be scanned exactly once")
  }

  test("seasonal decompose: 7-row seasonal frame broadcasts, no sort-merge join") {
    val plan = planOf(queries.Warehouse.qSeasonalDecompose(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), "dow seasonal join must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "nothing in the bounded-calendar path may sort-merge")
  }

  test("peak concurrency: boundary points window PARTITIONED by hour before the bounded carry") {
    val plan = planOf(queries.Warehouse.qPeakConcurrency(spark, sfDir))
    // the corpus-sized window must carry the hour partition key — only
    // the bounded hourly frame may hit the single-partition carry window
    assert("""\], \[h#\d+\], \[ts#""".r.findFirstIn(plan).isDefined,
      "intra-hour window must be hash-partitioned by hour")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"))
  }

  test("triangle census: equi-joins only — no cartesian, no broadcast nested loop") {
    val plan = planOf(queries.Warehouse.qTriangleCount(spark, sfDir))
    assert(!plan.contains("CartesianProduct"),
      "wedge join must be a hash/sort equi-join, never a cross product")
    // the one-row stat frames legitimately BNLJ-broadcast; the node-key
    // joins must not
    assert(!plan.contains("NestedLoopJoin") ||
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 2,
      "only the two one-row stat crossJoins may nested-loop")
  }

  test("video near-dup: banding is a shuffled equi-join on (slot, hash), no nested loop") {
    val plan = planOf(queries.LlmOps.qVideoNearDup(spark, sfDir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoopJoin"),
      "frame-hash banding must join on (slot, hash) keys only")
  }

  test("cusum by type: every window partitioned by the series key — no global window") {
    val plan = planOf(queries.Warehouse.qChangepointByType(spark, sfDir))
    // all four window passes must carry the event_type partition key
    // (single-partition windows are the C44-global shape this per-key
    // face exists to avoid); the final presentation orderBy is the only
    // permissible global sort
    val windowLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty)
    assert(windowLines.forall(_.contains("event_type")),
      s"every windowspec must partition by event_type:\n${windowLines.mkString("\n")}")
  }

  test("fd profile: one aggregation pair per candidate, no joins anywhere") {
    val plan = planOf(queries.Etl.qFdProfile(spark, sfDir))
    assert(!plan.contains("Join"), "FD checks are pure aggregations")
    assert(!plan.contains("Window"))
  }

  // ---- registry-wide plan-contract sweep -------------------------------
  // The per-face pins above check the shapes we KNOW are load-bearing;
  // this sweep closes the other direction: NO registered query may grow a
  // single-partition Window (the "Moving all data to a single partition"
  // stall at scale) or a CartesianProduct without landing on the declared
  // whitelist below. The walker descends into AQE-wrapped and subquery
  // plans (AdaptiveSparkPlanExec hides its tree from children traversal —
  // the first sweep version found ZERO windows for exactly that reason).
  test("gate sweep: ONE corpus scan — the totals ride the 11-row window, not a rescan") {
    val df = graft.queries.LlmOps.qGateSweep(spark, sfDir)
    val nodes = PlanSweep.allNodes(df.queryExecution.executedPlan)
    val scans = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec])
    assert(scans == 1, s"gate sweep must read documents once, found $scans scans")
  }

  test("registry sweep: partitionless windows only where declared, zero cartesians") {
    // why each face is ALLOWED its global window:
    //   sort-bound exact baselines, each with an EXECUTED sampled-cutoff
    //   twin registered (the C46b/C59b/C61b round-10 faces):
    val exactBaselines = Set("q_gini", "q_lorenz_deciles", "q_rfm_segments")
    //   windows over BOUNDED frames — calendar days, vocabulary terms,
    //   histogram buckets, distinct price levels: the frame size is
    //   data-DOMAIN-sized, independent of corpus row count, so a single
    //   partition is the right plan at any SF:
    val boundedFrames = Set(
      "q_anomaly_days", "q_changepoint", "q_seasonal_decompose",
      "q_peak_concurrency", "q_event_gaps", "q_cooccur_pmi",
      "q_tokenize", "q_vocab", "q_zipf_fit", "q_skyline",
      // C57b: BOTH its windows are domain-sized — the keep-set window
      // runs over the price-CELL census and the sweep over the distinct
      // prices of the grid SURVIVORS (PlanSpec's grid-bounded pin)
      "q_skyline_grid",
      // C96: the cumulative-ppm window runs over the ≤42-bucket log2
      // HISTOGRAM frame (I7's class) — domain-sized at any SF
      "q_time_to_convert",
      // H28: the totals window runs over the 11-row THRESHOLD frame —
      // it exists precisely to keep the face one-scan (a totals
      // aggregate or sweep self-join re-read the corpus: measured)
      "q_gate_sweep")
    val allowed = exactBaselines ++ boundedFrames
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    val cartesians = scala.collection.mutable.ListBuffer.empty[String]
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val nodes = PlanSweep.allNodes(df.queryExecution.executedPlan)
        val nw = nodes.count {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            w.partitionSpec.isEmpty
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
            w.partitionSpec.isEmpty
          case _ => false
        }
        if (nw > 0) offenders(name) = nw
        if (nodes.exists(
            _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]))
          cartesians += name
      } catch { case e: Throwable => failures += s"$name: ${e.getMessage}" }
    }
    assert(failures.isEmpty, s"queries failed to build: $failures")
    val undeclared = offenders.keySet.diff(allowed)
    assert(undeclared.isEmpty,
      s"UNDECLARED single-partition windows in: $undeclared — register an " +
        "approx twin (the C12b/C46b pattern) or move the window to a " +
        "bounded frame, then declare it here with its reason")
    val stale = allowed.diff(offenders.keySet)
    assert(stale.isEmpty,
      s"whitelist entries no longer carrying a global window: $stale — prune")
    assert(cartesians.isEmpty, s"CartesianProduct in: $cartesians")
  }
}
