package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.polyhash

/** Training-corpus curation operators: benchmark decontamination and
  * deterministic dataset splitting — the hygiene steps between "deduped
  * corpus" and "training shards" in an LLM data pipeline.
  */
object Curation {

  /** Ids of `corpus` documents sharing at least one word n-gram with any
    * `holdout` document — the standard n-gram-collision test-set
    * decontamination (flag training docs that would leak benchmark
    * content). Both sides explode to (id, gram) map-side; the join keys on
    * the gram string, so the shuffle carries grams, never document pairs
    * or texts. The holdout side reduces to DISTINCT grams first —
    * benchmark suites are tiny next to a training corpus, so that set
    * broadcasts and the corpus side never shuffles at all (AQE picks the
    * broadcast; at 100 TB the corpus-side explode stays embarrassingly
    * parallel). */
  def contaminatedIds(corpus: DataFrame, holdout: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    // tokens materialize as their own projection first: inlining the
    // split into the gram lambda re-tokenizes per gram (see
    // Dedup.wordNgrams perf note)
    def grams(df: DataFrame, cols: Column*) = df
      .select(cols :+ split(col(textCol), " ").as("__toks"): _*)
      .select(cols :+ explode(Dedup.ngramsFromTokens(col("__toks"), n)).as("gram"): _*)
    val corpusGrams = grams(corpus, col(idCol))
    val holdoutGrams = grams(holdout).distinct()
    corpusGrams.join(holdoutGrams, "gram")
      .select(col(idCol)).distinct()
  }

  /** Serialized Bloom filter over the holdout's distinct word n-grams —
    * the build side of the STREAMING decontamination gate. Built once from
    * the (small, static) benchmark suite. */
  def holdoutGramBloom(holdout: DataFrame, textCol: String, n: Int,
      expectedGrams: Long, fpp: Double = 1e-6): Array[Byte] = {
    val grams = holdout
      .select(split(col(textCol), " ").as("__toks"))
      .select(explode(Dedup.ngramsFromTokens(col("__toks"), n)).as("gram"))
      .distinct()
    graft.engine.BloomSemiJoin.buildBloom(grams, "gram", expectedGrams, fpp)
  }

  /** Stateless per-row decontamination gate: TRUE when no word n-gram of
    * the tokenized document might be in the holdout Bloom filter. Drops
    * every truly contaminated document (Bloom has no false negatives); a
    * false positive over-drops a clean document at rate ≈ grams·fpp — the
    * safe direction for decontamination. Being one Column predicate, the
    * gate runs unchanged in a streaming ingest filter (no state, no
    * join) — the 100 TB/streaming twin of the exact [[contaminatedIds]]
    * join. `toks` must be a MATERIALIZED token-array attribute (project
    * `split(text, " ")` first — the Dedup.wordNgrams lambda-CSE note). */
  def contaminationGate(toks: Column, bloomBytes: Array[Byte], n: Int): Column =
    !exists(Dedup.ngramsFromTokens(toks, n),
      g => graft.functions.bloomMightContain(g, bloomBytes))

  /** Drop every contaminated document from the corpus (left-anti on the
    * flagged id set). */
  def decontaminate(corpus: DataFrame, holdout: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame =
    corpus.join(contaminatedIds(corpus, holdout, textCol, idCol, n),
      Seq(idCol), "left_anti")

  /** The AUDIT half of decontamination: per holdout/benchmark document,
    * how much of it leaked into the training corpus — distinct-n-gram
    * match fraction, the number an eval-integrity review wants per
    * benchmark item (the D7 drop is pass/fail; this is the severity).
    *
    * Output: (idCol, n_grams, n_matched, contamination_x1000) — all
    * integers (x1000 via integer division) so the DuckDB oracle hash
    * matches bit-for-bit.
    *
    * Plan shape: the holdout's distinct (id, gram) pairs are
    * benchmark-sized and BROADCAST; the corpus side explodes to bare
    * grams map-side and hash-joins against them, so the only exchange
    * after the corpus scan carries the MATCHED grams (tiny) into a
    * distinct + per-holdout count. No corpus-wide gram distinct, no
    * gram-keyed shuffle of the full corpus — at 100 TB the corpus pass
    * stays embarrassingly parallel, same contract as [[contaminatedIds]].
    * Short holdout docs (< n tokens) report 0 grams / 0 contamination
    * rather than vanishing. */
  def contaminationReport(corpus: DataFrame, holdout: DataFrame,
      textCol: String, idCol: String, n: Int): DataFrame = {
    // tokens materialize as their own projection first (the
    // Dedup.wordNgrams lambda-CSE note: inlining split re-tokenizes
    // per gram element)
    val hToks = holdout
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
    val hGrams = hToks
      .select(col(idCol), explode(Dedup.ngramsFromTokens(col("__toks"), n)).as("gram"))
      .distinct()
    val totals = hToks
      .select(col(idCol),
        size(array_distinct(Dedup.ngramsFromTokens(col("__toks"), n)))
          .cast("long").as("n_grams"))
    val corpusGrams = corpus
      .select(split(col(textCol), " ").as("__toks"))
      .select(explode(Dedup.ngramsFromTokens(col("__toks"), n)).as("gram"))
    val matched = corpusGrams.join(broadcast(hGrams), "gram")
      .select(col(idCol), col("gram")).distinct()
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_matched"))
    totals.join(matched, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      .withColumn("contamination_x1000",
        when(col("n_grams") === 0, lit(0L))
          .otherwise(expr("CAST(1000 * n_matched div n_grams AS BIGINT)")))
  }

  /** Deterministic balanced subsample: exactly `n` rows per group, chosen
    * by content-hash order (md5 of `textCol`, id tiebreak) — a stable
    * "take 10k docs per language" that every rerun and every engine
    * reproduces bit-for-bit (no rand(), no partition dependence).
    * Plan: per-group row_number window; each stratum ranks within one
    * task, which is the exact-n contract's cost — strata are typically
    * few and the alternative (per-group hash thresholds from counts) is
    * approximate. For approximately-n at unbounded stratum size, filter
    * on [[assignSplit]]-style hash buckets instead. */
  def sampleExactPerGroup(df: DataFrame, groupCol: String, textCol: String,
      idCol: String, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(md5(col(textCol)), col(idCol))
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Temperature-weighted sampling to a TOKEN budget (H7) — the corpus-
    * mixing step of multilingual pretraining (mC4/XLM-R style): language
    * l's share of the budget is proportional to T_l^α (α < 1 upsamples
    * low-resource languages relative to their raw token mass), and each
    * document keeps independently with its language's probability,
    * decided by the same deterministic content-hash draw as H5 (stable
    * under reruns, row order, and engines).
    *
    * ALL-INTEGER arithmetic, deliberately: α = 1/2 via
    * floor(sqrt(T_l)) (exact for T_l < 2^52 — IEEE sqrt is correctly
    * rounded and the ulp gap can't cross an integer below 2^26²),
    * budget apportioning and the keep threshold via integer division
    * in parts-per-million. A float formulation would hash-diverge from
    * the oracle whenever a double summed in a different order lands
    * within an ulp of a floor boundary; integers make Spark and DuckDB
    * agree bit-for-bit. Per-language keep probability
    * ppm_l = min(1e6, budget·w_l·1e6 / (W·T_l)), w_l = isqrt(T_l),
    * W = Σ w_l.
    *
    * Plan: one 5-row aggregate over lang → broadcast back onto the doc
    * scan → map-side filter. No full-data shuffle at any corpus size. */
  /** The per-language keep-probability dimension of
    * [[temperatureSample]]: (langCol, t_l, keep_ppm). Computed from the
    * STATIC corpus; a stream reuses it as the broadcast side of a
    * stream-static join (G5 pattern — the gate itself stays a stateless
    * predicate). */
  def temperatureStats(df: DataFrame, langCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    val perLang = graft.text.TextAnalysis.tokenCounts(
      df.filter(col(textCol).isNotNull), textCol)
      .groupBy(col(langCol))
      .agg(sum(col("ws_tokens")).as("t_l"))
      .withColumn("w_l", floor(sqrt(col("t_l").cast("double"))).cast("long"))
    // W is a tiny driver-safe aggregate of the language dim (|langs| rows)
    perLang
      .crossJoin(broadcast(perLang.agg(sum(col("w_l")).as("w_total"))))
      .withColumn("target_tokens", expr(s"$budgetTokens * w_l div w_total"))
      .withColumn("keep_ppm",
        least(lit(1000000L), expr("target_tokens * 1000000 div t_l")))
      .select(col(langCol), col("t_l"), col("keep_ppm"))
  }

  /** The content-hash keep predicate (against a joined `keep_ppm`). */
  def temperatureKeep(textCol: String): Column =
    pmod(polyhash(col(textCol)), lit(1000000L)) < col("keep_ppm")

  def temperatureSample(df: DataFrame, langCol: String, textCol: String,
      idCol: String, budgetTokens: Long): DataFrame = {
    val toks = graft.text.TextAnalysis.tokenCounts(
      df.filter(col(textCol).isNotNull), textCol)
      .select(col(idCol), col(langCol), col(textCol), col("ws_tokens"))
    toks
      .join(broadcast(temperatureStats(df, langCol, textCol, budgetTokens)), langCol)
      .filter(temperatureKeep(textCol))
      .select(col(idCol), col(langCol), col("ws_tokens"), col("keep_ppm"))
  }

  /** Deterministic dataset split: bucket by a content hash (polyhash —
    * the codegen rolling hash, oracle-replicable via list_reduce), then
    * map cumulative integer shares to split names. Content-keyed, so the
    * assignment is stable under row order, partitioning, AND re-assigned
    * surrogate ids — re-running the pipeline never migrates a document
    * across the train/eval boundary (the property that matters for
    * leakage). Hash buckets make every stratum's split proportional in
    * expectation, with zero coordination or shuffling: the whole operator
    * is one map-side projection. */
  def assignSplit(textCol: String, shares: Seq[(String, Int)]): Column = {
    require(shares.nonEmpty && shares.forall(_._2 > 0), "shares must be positive")
    val total = shares.map(_._2).sum
    val bucket = pmod(polyhash(col(textCol)), lit(total))
    val cumulative = shares.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    shares.tail.zip(cumulative.tail)
      .foldLeft(when(bucket < cumulative.head, lit(shares.head._1))) {
        case (acc, ((name, _), upper)) => acc.when(bucket < upper, lit(name))
      }
  }
}
