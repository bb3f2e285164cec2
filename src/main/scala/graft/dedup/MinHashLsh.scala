package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (D2).
  *
  * Pipeline: word-shingle each document (map-side) → k=numHashes MinHash
  * signature via affine transforms of one xxhash64 base hash (map-side) →
  * split signature into b bands of r rows → explode to (band_idx,
  * band_hash, id) → self-join on band key → candidate pairs → verify with
  * exact Jaccard on the shingle sets.
  *
  * Shuffle profile at scale: the only wide exchange is keyed on
  * (band_idx, band_hash) and carries b rows of (two longs + id) per
  * document — NOT the document text. Hot bands (boilerplate shingles) are
  * the skew risk; AQE skew-join handles moderate skew, and a band-key salt
  * (append id mod s for oversized buckets) is the documented escape hatch.
  */
object MinHashLsh {

  /** MinHash signature: array of `numHashes` lane minima. One base
    * xxhash64 per shingle; lane j applies rotate-left(1 + j mod 63) then
    * XOR with a fixed splitmix64 constant — a bijection per lane (what
    * MinHash needs from its "permutations") built purely from shift/or/xor,
    * which stays overflow-free under Spark's default ANSI arithmetic
    * (multiply-add lane mixing would throw ARITHMETIC_OVERFLOW).
    *
    * All k lanes are computed in ONE pass over the hashes by the custom
    * codegen expression graft.functions.expressions.MinHashSignature (the
    * composable k × array_min(transform(...)) form allocates k intermediate
    * arrays per document). */
  def signature(shingles: Column, numHashes: Int): Column =
    graft.functions.minhashSignature(transform(shingles, s => xxhash64(s)), numHashes)

  /** Explode a signature into (band_idx, band_hash) rows: bands of
    * `rowsPerBand` adjacent lanes, each band hashed to one long. */
  def bands(df: DataFrame, sigCol: String, idCol: String, rowsPerBand: Int): DataFrame = {
    df.select(col(idCol), posexplode(
      transform(
        sequence(lit(0), (size(col(sigCol)) / rowsPerBand).cast("int") - 1),
        b => xxhash64(slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand))))
    ).as(Seq("band_idx", "band_hash")))
  }

  /** Candidate near-dup pairs: documents sharing at least one band.
    * Degenerate (clone-heavy) band buckets above `maxBucketSize` degrade to
    * star pairs on a canonical id — see [[Buckets.cappedSelfJoin]] for the
    * mechanism and plan shape (bucket stats via one aggregate joined back,
    * then one self-join; shingle sets stay on the verify join-back path
    * rather than riding the band explode). */
  def candidatePairs(banded: DataFrame, idCol: String,
      maxBucketSize: Int = 10000): DataFrame =
    Buckets.cappedSelfJoin(banded, Seq("band_idx", "band_hash"), idCol, maxBucketSize)

  /** The sampling bound the calibration curve (D15) measures: z standard
    * deviations of the k-lane matching-fraction estimator at J = τ,
    * in x1000 points (σ = √(J(1−J)/k); each lane matches independently
    * with probability exactly J). Pairs whose estimate clears τ by more
    * than this are (mis)classified only when the estimator errs beyond
    * zσ — the band [[nearDupPairs]]' fast path still verifies exactly. */
  def samplingBoundX1000(minJaccardX1000: Long, numHashes: Int,
      z: Double = 4.0): Long = {
    val j = minJaccardX1000.toDouble / 1000.0
    math.ceil(z * math.sqrt(j * (1.0 - j) / numHashes) * 1000.0).toLong
  }

  /** Full pipeline: near-dup pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jaccard_x1000) for pairs ≥ minJaccardX1000.
    *
    * `fastMarginX1000` (opt-in, D15-calibrated) adds a signature-
    * agreement PREFILTER to the verify stage: each candidate pair's
    * matching-lane estimate est is computed from the k-long signatures
    * already materialized for banding (512 bytes/doc on the join, not
    * the full shingle set), and only pairs in the uncertainty band
    * τ ± margin pay the exact hashed-shingle verify. est ≥ τ+margin is
    * accepted outright (emitting est as jaccard_x1000 — the score is
    * the sketch estimate, the pair decision is what the margin bounds);
    * est ≤ τ−margin is dropped outright. On clone-heavy corpora — where
    * verify dominates D2's cost precisely because most candidates are
    * near-identical (est ≈ 1000, far above any τ) — the band is a small
    * fraction of the candidate stream. Choose the margin from the D15
    * calibration curve ([[calibration]]) or [[samplingBoundX1000]]'s
    * analytic bound; misclassification requires the k-lane estimator to
    * err beyond the margin (4σ default ⇒ ~3e-5 two-sided per pair). */
  def nearDupPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, rowsPerBand: Int = 4,
      minJaccardX1000: Long = 500L, maxBucketSize: Int = 10000,
      fastMarginX1000: Option[Long] = None,
      sigSource: Option[DataFrame] = None): DataFrame = {
    // verify on HASHED shingles: Jaccard over xxhash64'd shingle sets is
    // the same similarity (sets are isomorphic, collisions negligible)
    // but long-array intersection is several times cheaper than string
    // comparison — and candidate verification dominates dedup cost on
    // duplicate-heavy corpora
    // tokens materialize as an attribute first: inlining split(text) into
    // the gram lambda re-tokenizes once per element_at (Catalyst does not
    // CSE across lambda boundaries — see Dedup.wordNgrams perf note).
    // hashedNgrams sorts per DOC so the verify kernel is merge-only per
    // pair; MinHashSignature is order-insensitive (min over lanes).
    val shingled = df
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), Dedup.hashedNgrams(col("__toks"), shingleSize).as("shingles"))
    // sigSource (a PINNED signature artifact, see LlmOps.pinnedFrame)
    // replaces the inline signature pass: deterministic ⇒ identical
    // values, and a pre-materialized parquet frame needs no checkpoint
    val sigs = shingled.select(col(idCol), col("shingles"),
      graft.functions.minhashSignature(col("shingles"), numHashes).as("sig"))
    def exactVerify(pairs: DataFrame): DataFrame = pairs
      .join(shingled.select(col(idCol).as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shingled.select(col(idCol).as("id_b"), col("shingles").as("sh_b")), "id_b")
      // fused merge-only Jaccard kernel (inputs doc-sorted by
      // hashedNgrams): bit-identical to Dedup.jaccardX1000 on long
      // arrays, zero per-pair allocation beyond the array copies —
      // verification dominates this pipeline on duplicate-heavy corpora
      .select(col("id_a"), col("id_b"),
        graft.functions.longSetJaccardSorted(col("sh_a"), col("sh_b")).as("jaccard_x1000"))
      .filter(col("jaccard_x1000") >= minJaccardX1000)
    fastMarginX1000 match {
      case None =>
        val sigFrame = sigSource.getOrElse(sigs.select(col(idCol), col("sig")))
        val banded = bands(sigFrame, "sig", idCol, rowsPerBand)
        exactVerify(candidatePairs(banded, idCol, maxBucketSize))
      case Some(margin) =>
        // one frame, three consumers (banding + two est join-backs):
        // signatures checkpoint so the k lane-minima over every shingle
        // aren't recomputed per branch (the D15 multi-branch shape)
        val sigFrame = sigSource.getOrElse(
          sigs.select(col(idCol), col("sig")).transform(graft.engine.Materialized.checkpoint))
        val banded = bands(sigFrame, "sig", idCol, rowsPerBand)
        val est = candidatePairs(banded, idCol, maxBucketSize)
          .join(sigFrame.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
          .join(sigFrame.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
          .withColumn("est_x1000",
            expr(s"(size(filter(zip_with(sig_a, sig_b, (a, b) -> a = b), m -> m)) * 1000L) DIV $numHashes"))
          .select(col("id_a"), col("id_b"), col("est_x1000"))
          // the est frame feeds TWO consumers (confident emit + the
          // uncertainty band); without truncation each re-runs the
          // bucket join AND both k-long signature join-backs — the 100×
          // sweep measured that double execution at 594s vs 275s for
          // PLAIN D2 (the prefilter was slower than the verify it
          // replaced). Materialized narrow — 3 scalars/pair, O(cands) —
          // the heavy joins run once and only the sliver inside
          // τ±margin pays the exact verify
          .transform(graft.engine.Materialized.checkpoint)
        val confident = est.filter(col("est_x1000") >= minJaccardX1000 + margin)
          .select(col("id_a"), col("id_b"), col("est_x1000").as("jaccard_x1000"))
        val band = est.filter(col("est_x1000") < minJaccardX1000 + margin &&
            col("est_x1000") > minJaccardX1000 - margin)
          .select(col("id_a"), col("id_b"))
        confident.unionAll(exactVerify(band))
    }
  }

  /** D15: sketch CALIBRATION — per LSH candidate pair, the MinHash
    * ESTIMATE of Jaccard (matching-lane fraction: P[min collides] =
    * J exactly, so lanes are k Bernoulli(J) trials) next to the EXACT
    * hashed-shingle Jaccard, rolled up into an error curve by exact-
    * similarity decile. The measurement you run before trusting
    * signature agreement as a similarity proxy (σ = √(J(1−J)/k): k=64
    * lanes ⇒ ±6 points at J=0.5 — whether that's acceptable is a
    * per-corpus call this report answers). Candidates come from the
    * SAME banded path as D2, so the report also reflects deployment
    * bias: banding over-samples high-J pairs by design. Output is
    * O(deciles), never corpus-sized; all averages integer (sum DIV n).
    *
    * `pairSamplePpm` keeps a deterministic hash-sampled fraction of the
    * candidate pairs BEFORE the wide verify join-backs: a calibration
    * curve is a statistical estimate — thousands of pairs pin each
    * decile to a few points — so at scale you sample the pair stream,
    * never verify every candidate (the 100× smoke's clone-heavy corpus
    * took 323s exhaustively vs seconds sampled, for the same curve). */
  def calibration(df: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, rowsPerBand: Int = 4,
      maxBucketSize: Int = 10000, pairSamplePpm: Long = 1000000L,
      sigSource: Option[DataFrame] = None,
      pairSource: Option[DataFrame] = None): DataFrame = {
    // shingled feeds the exact lane's TWO pair join-backs in every path
    // (and the signature pass in the non-pinned one): checkpoint it, or
    // the tokenize + gram-hash scan re-runs per consuming branch — the
    // multi-branch recompute shape the checkpoint rule exists to prevent
    // (r15 ADVICE: the pinned-sig path had lost this when shingles
    // stopped riding the checkpointed signature frame)
    val shingled = df
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), Dedup.hashedNgrams(col("__toks"), shingleSize).as("shingles"))
      .transform(graft.engine.Materialized.checkpoint)
    // sigSource/pairSource: PINNED artifact frames (LlmOps.pinnedFrame) —
    // deterministic ⇒ identical values to the inline passes, already
    // materialized parquet ⇒ no checkpoint needed, and the DuckDB oracle
    // reads the same parquet to replay the est/exact/decile lanes
    val sigs = sigSource.getOrElse(
      shingled.select(col(idCol),
        graft.functions.minhashSignature(col("shingles"), numHashes).as("sig"))
        // still checkpointed on its own: three consumers (banding + two
        // sig join-backs), and the k lane-minima are the expensive
        // derivation even over materialized shingles
        .transform(graft.engine.Materialized.checkpoint))
    val allPairs = pairSource.getOrElse {
      val banded = bands(sigs.select(col(idCol), col("sig")), "sig", idCol, rowsPerBand)
      candidatePairs(banded, idCol, maxBucketSize)
    }
    val pairs =
      if (pairSamplePpm >= 1000000L) allPairs
      else allPairs.filter(
        pmod(xxhash64(col("id_a"), col("id_b")), lit(1000000L)) < pairSamplePpm)
    val perPair = pairs
      .join(shingled.select(col(idCol).as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shingled.select(col(idCol).as("id_b"), col("shingles").as("sh_b")), "id_b")
      .join(sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("__n_match", size(filter(zip_with(col("sig_a"), col("sig_b"),
        (a, b) => a === b), m => m)).cast("long"))
      .select(expr(s"(__n_match * 1000) DIV $numHashes").as("est_x1000"),
        graft.functions.longSetJaccardSorted(col("sh_a"), col("sh_b")).as("exact_x1000"))
    perPair
      .groupBy(least(expr("exact_x1000 DIV 100"), lit(9L)).cast("int").as("exact_decile"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(est_x1000) DIV count(1)").as("mean_est_x1000"),
        expr("sum(exact_x1000) DIV count(1)").as("mean_exact_x1000"),
        expr("sum(abs(est_x1000 - exact_x1000)) DIV count(1)").as("mean_abs_err_x1000"),
        max(abs(col("est_x1000") - col("exact_x1000"))).as("max_abs_err_x1000"))
  }

  /** Cross-corpus near-dup JOIN (D11): for every NEW document, its
    * near-duplicates in an EXISTING corpus — the batch-ingest face of the
    * daily-crawl dedup (D8 catches exact copies by content hash; this
    * catches the reworded/perturbed ones; streaming twin = G8's SimHash
    * flagger). Both sides band identically, candidates come from an
    * A⋈B equi-join on (band_idx, band_hash) — never a cross product —
    * and exact hashed-shingle Jaccard verifies.
    *
    * Hot corpus buckets (boilerplate bands shared by millions of corpus
    * docs) degrade to their canonical minimum-id member above
    * `maxBucketSize` — the cross-join analog of Buckets.cappedSelfJoin's
    * star degrade, built from the SAME mechanism: one aggregate over the
    * band key (bucket size + canonical min id) joined back onto the
    * banded rows, never a row_number window (the windowed cap measured
    * ~3.4x slower on clone-heavy data — Buckets.scala doc — because its
    * sort-derived children poison the downstream exchanges). A
    * boilerplate bucket stays probe-able through its representative;
    * candidates beyond it are dropped (documented recall trade under the
    * same heuristic contract as D2; the verify stage keeps precision
    * exact). Returns (new_id, corpus_id, jaccard_x1000) with
    * jaccard ≥ minJaccardX1000. */
  def crossNearDups(
      newDf: DataFrame, corpusDf: DataFrame, textCol: String, idCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, rowsPerBand: Int = 4,
      minJaccardX1000: Long = 500L, maxBucketSize: Int = 10000): DataFrame = {
    def shingled(df: DataFrame) = df
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), Dedup.hashedNgrams(col("__toks"), shingleSize).as("shingles"))
    def banded(sh: DataFrame) = bands(
      sh.select(col(idCol),
        graft.functions.minhashSignature(col("shingles"), numHashes).as("sig")),
      "sig", idCol, rowsPerBand)
    val shNew = shingled(newDf)
    val shCorp = shingled(corpusDf)
    val corpBanded = banded(shCorp)
    val bucketStats = corpBanded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__n"), min(col(idCol)).as("__min_id"))
    val corpCapped = corpBanded
      .join(bucketStats, Seq("band_idx", "band_hash"))
      .filter(col("__n") <= maxBucketSize || col(idCol) === col("__min_id"))
      .select(col("band_idx"), col("band_hash"), col(idCol).as("corpus_id"))
    val candidates = banded(shNew)
      .select(col("band_idx"), col("band_hash"), col(idCol).as("new_id"))
      .join(corpCapped, Seq("band_idx", "band_hash"))
      .select(col("new_id"), col("corpus_id"))
      .distinct()
    candidates
      .join(shNew.select(col(idCol).as("new_id"), col("shingles").as("sh_a")), "new_id")
      .join(shCorp.select(col(idCol).as("corpus_id"), col("shingles").as("sh_b")), "corpus_id")
      .select(col("new_id"), col("corpus_id"),
        graft.functions.longSetJaccardSorted(col("sh_a"), col("sh_b")).as("jaccard_x1000"))
      .filter(col("jaccard_x1000") >= minJaccardX1000)
  }
}
