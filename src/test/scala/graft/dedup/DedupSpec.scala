package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // a base doc, a near-duplicate (one word changed), and two unrelated docs
  private val corpus = docs(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank today",
    2L -> "the quick brown fox jumps over the lazy cat near the river bank today",
    3L -> "completely different content about spark query engines and distributed shuffles here",
    4L -> "another unrelated document mentioning parquet files and columnar compression formats only")

  test("exact dedup groups identical content and keeps min id") {
    val df = docs(1L -> "same", 2L -> "same", 3L -> "other")
    val out = Dedup.exact(df, "text", "doc_id").collect()
    assert(out.length == 2)
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupGroup.getAs[Long]("canonical_id") == 1L)
  }

  test("word n-grams: correct count and short-doc guard") {
    import spark.implicits._
    val out = docs(1L -> "a b c d", 2L -> "a b", 3L -> "a")
      .select($"doc_id", Dedup.wordNgrams($"text", 3).as("g")).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(byId(1L) == Seq("a b c", "b c d"))
    assert(byId(2L).isEmpty && byId(3L).isEmpty)
  }

  test("minhash LSH finds the planted near-duplicate pair and only it") {
    val pairs = MinHashLsh.nearDupPairs(corpus, "text", "doc_id",
      shingleSize = 3, numHashes = 64, rowsPerBand = 4, minJaccardX1000 = 500L)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    // one word changed at position 9 → 3 of 12 shingles differ:
    // |A∩B| = 9, |A∪B| = 15 → jaccard 0.6
    assert(pairs.head.getAs[Long]("jaccard_x1000") == 600L)
  }

  test("fast verify prefilter: decisions ⊆ exact ∪ the calibrated band, band pairs exact") {
    // planted similarity spectrum around τ=0.5: clones (J=1), a strong
    // near-dup (J=0.6), a borderline pair (J=0.5), and unrelated docs
    val spectrum = docs(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank today",
      2L -> "the quick brown fox jumps over the lazy dog near the river bank today",
      3L -> "the quick brown fox jumps over the lazy cat near the river bank today",
      4L -> "the quick brown fox jumps over the lazy dog near the river bank tonight yes",
      5L -> "completely different content about spark query engines and distributed shuffles here",
      6L -> "another unrelated document mentioning parquet files and columnar compression formats only")
    val tau = 500L
    val m = MinHashLsh.samplingBoundX1000(tau, 64)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("jaccard_x1000")).toMap
    val exact = pairSet(MinHashLsh.nearDupPairs(spectrum, "text", "doc_id",
      shingleSize = 3, numHashes = 64, rowsPerBand = 4, minJaccardX1000 = tau))
    val fast = pairSet(MinHashLsh.nearDupPairs(spectrum, "text", "doc_id",
      shingleSize = 3, numHashes = 64, rowsPerBand = 4, minJaccardX1000 = tau,
      fastMarginX1000 = Some(m)))
    // widened exact run = ground truth similarity for every plausible pair
    val exactLow = pairSet(MinHashLsh.nearDupPairs(spectrum, "text", "doc_id",
      shingleSize = 3, numHashes = 64, rowsPerBand = 4,
      minJaccardX1000 = math.max(0L, tau - m)))
    assert(exact.nonEmpty && fast.nonEmpty)
    // 1. no confident pair lost: every exact pair clearing τ+m is kept
    exact.foreach { case (p, j) =>
      if (j >= tau + m) assert(fast.contains(p), s"confident pair $p (J=$j) dropped")
    }
    // 2. false accepts bounded: every fast pair is truly above τ−m
    fast.keys.foreach { p =>
      assert(exactLow.contains(p), s"fast pair $p below the τ−m band")
    }
    // 3. disagreements live inside the band (τ−m, τ+m) only
    ((exact.keySet diff fast.keySet) ++ (fast.keySet diff exact.keySet)).foreach { p =>
      val j = exactLow.getOrElse(p, 0L)
      assert(j > tau - m && j < tau + m, s"pair $p (J=$j) misclassified outside band")
    }
    // 4. a fast pair's score is either the exact Jaccard (band-verified)
    // or a confident estimate ≥ τ+m (fast-path accept) — never a
    // below-band estimate smuggled through
    fast.foreach { case (p, score) =>
      val j = exactLow(p)
      assert(score == j || score >= tau + m, s"pair $p: score $score, exact $j")
    }
    // clones must ride the fast path with est=1000 (identical signatures)
    assert(fast((1L, 2L)) == 1000L)
  }

  test("cross-corpus near-dup join finds planted cross pairs, never within-side pairs") {
    // corpus: 1..4; new batch: 11 is a near-dup of corpus doc 1, 12 is a
    // near-dup of corpus doc 3, 13 is novel. 11/12 must surface against
    // their corpus twins ONLY; identical new docs (11 vs 14) must NOT
    // pair with each other (that's the self-join's job, not this one's)
    val newBatch = docs(
      11L -> "the quick brown fox jumps over the lazy dog near the river bank tonight",
      12L -> "completely different content about spark query engines and distributed shuffles there",
      13L -> "entirely novel text with no overlap whatsoever against anything stored before now",
      14L -> "the quick brown fox jumps over the lazy dog near the river bank tonight")
    val got = MinHashLsh.crossNearDups(newBatch, corpus, "text", "doc_id",
      shingleSize = 3, numHashes = 64, rowsPerBand = 4, minJaccardX1000 = 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (11,2)/(14,2) sit exactly at J = 8/16 = 0.500: one trigram changed
    // on the new side (last word), three on the corpus side (mid-word)
    assert(got == Set((11L, 1L), (11L, 2L), (12L, 3L), (14L, 1L), (14L, 2L)))
    // pairs ⊆ exact: every emitted pair really clears the Jaccard bar
    val exact = newBatch.select(col("doc_id").as("new_id"),
        Dedup.hashedNgrams(split(col("text"), " "), 3).as("ga"))
      .crossJoin(corpus.select(col("doc_id").as("corpus_id"),
        Dedup.hashedNgrams(split(col("text"), " "), 3).as("gb")))
      .filter(graft.functions.longSetJaccardSorted(col("ga"), col("gb")) >= 500L)
      .select("new_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact, "at this size LSH candidates cover the exact pair set")
  }

  test("cross-corpus hot buckets degrade to the canonical min-id member, " +
      "not a sorted cap window") {
    // four identical corpus docs — every band bucket they form has size 4;
    // with maxBucketSize = 1 each bucket degrades to corpus doc 21 (min id),
    // so the probing near-dup matches exactly {21}, never 22/23/24
    val boiler = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val corpus = docs(21L -> boiler, 22L -> boiler, 23L -> boiler, 24L -> boiler)
    val newBatch = docs(31L -> boiler)
    val got = MinHashLsh.crossNearDups(newBatch, corpus, "text", "doc_id",
      shingleSize = 3, numHashes = 64, rowsPerBand = 4,
      minJaccardX1000 = 500L, maxBucketSize = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((31L, 21L)))
    // and with the cap above the bucket size, all four surface
    val uncapped = MinHashLsh.crossNearDups(newBatch, corpus, "text", "doc_id",
      shingleSize = 3, numHashes = 64, rowsPerBand = 4,
      minJaccardX1000 = 500L, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((31L, 21L), (31L, 22L), (31L, 23L), (31L, 24L)))
  }

  test("LSH dedup apply keeps a superset of the exact apply (conservative direction)") {
    val sfDir01 = "/root/testdata/sf0.001"
    val exact = graft.queries.LlmOps.qDedupApply(spark, sfDir01)
      .collect().map(_.getLong(0)).toSet
    val lsh = graft.queries.LlmOps.qDedupApplyLsh(spark, sfDir01)
      .collect().map(_.getLong(0)).toSet
    // missed LSH pairs mean fewer drops — the apply may only keep MORE
    assert(exact.subsetOf(lsh), s"exact-kept ids missing from LSH keep set: ${exact -- lsh}")
    val total = graft.sources.Tables.table(spark, sfDir01, "embeddings").count()
    assert(lsh.size < total, "LSH apply must still drop the found near-dups")
  }

  test("minhash signature approximates jaccard for near-dups") {
    import spark.implicits._
    val sigs = corpus
      .select($"doc_id", MinHashLsh.signature(Dedup.wordNgrams($"text", 3), 64).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs(1L), sigs(2L)) > 32)      // true jaccard 0.75
    assert(agree(sigs(1L), sigs(3L)) < 16)      // unrelated
  }

  test("simhash: duplicates collide at hamming 0, unrelated docs don't pair") {
    // simhash hamming ≤ 3 implies near-identical long docs; with short
    // synthetic docs only exact duplicates reliably land that close
    val base = (1 to 200).map(i => s"w${i % 37}").mkString(" ")
    val df = docs(1L -> base, 2L -> base,
      3L -> "completely different content about spark engines",
      4L -> "another unrelated document on parquet compression")
    val pairs = SimHash.nearDupPairs(df, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming")))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 == 0)
  }

  test("simhash hamming tracks document similarity") {
    import spark.implicits._
    val base = (1 to 300).map(i => s"word${i % 83}").mkString(" ")
    val nearDup = base.replace("word42", "changed")
    val sigs = SimHash.signatures(
      docs(1L -> base, 2L -> nearDup, 3L -> "totally different small text"),
      "text", "doc_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
  }

  test("hot-bucket cap degrades clone cliques to star pairs, not silence") {
    import spark.implicits._
    // 30 identical docs: every band bucket holds all 30 → above a cap of
    // 10, buckets emit star pairs to the minimum id (29 pairs, full
    // cluster recall via the canonical); uncapped, the full 435-pair
    // clique comes back
    val clones = (1 to 30).map(i => (i.toLong,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val capped = MinHashLsh.nearDupPairs(clones, "text", "doc_id",
      shingleSize = 2, minJaccardX1000 = 500L, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == (2 to 30).map(i => (1L, i.toLong)).toSet) // star on min id
    val uncapped = MinHashLsh.nearDupPairs(clones, "text", "doc_id",
      shingleSize = 2, minJaccardX1000 = 500L)
    assert(uncapped.count() == 435L) // C(30,2)
  }

  test("simhash hot-bucket cap degrades clone cliques to star pairs") {
    import spark.implicits._
    // 30 identical docs agree on every 16-bit chunk → every chunk bucket
    // holds all 30; above a cap of 10 the bucket emits star pairs on the
    // min id (29 rows, hamming 0) instead of the 435-pair clique
    val clones = (1 to 30).map(i => (i.toLong,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val capped = SimHash.nearDupPairs(clones, "text", "doc_id", maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == (2 to 30).map(i => (1L, i.toLong)).toSet)
    val uncapped = SimHash.nearDupPairs(clones, "text", "doc_id")
    assert(uncapped.count() == 435L) // C(30,2)
  }

  test("grid self-join: over-cap blocks keep the exact pair set, distributed") {
    import spark.implicits._
    // one 50-member block (well past chunkSize=8 → a 7x7 cell grid) plus a
    // 3-member block: the grid decomposition must return EXACTLY the
    // all-pairs set — no star degrade, no lost cross-chunk pairs, no
    // duplicate diagonal pairs — so the plan's scale behavior coincides
    // with the stated all-pairs-per-block semantics
    val rows = (1 to 50).map(i => ("big", i.toLong)) ++
      Seq(("tiny", 100L), ("tiny", 101L), ("tiny", 102L))
    val df = rows.toDF("blk", "id").repartition(4)
    val rowsOut = Buckets.gridSelfJoin(df, Seq("blk"), "id", chunkSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = rowsOut.toSet
    val expect =
      (for (a <- 1 to 50; b <- (a + 1) to 50) yield (a.toLong, b.toLong)).toSet ++
        (for (a <- 100 to 102; b <- (a + 1) to 102) yield (a.toLong, b.toLong)).toSet
    assert(got == expect) // 1225 + 3 pairs, exact
    // and duplicate-free WITHOUT a distinct: the grid emits each pair once
    assert(rowsOut.length == expect.size)
  }

  test("connected components: chains merge, singletons keep own label") {
    import spark.implicits._
    // components: {1,2,3,4} via chain, {10,11}, and 20-30 via one edge
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 30L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(20L) == 20L && cc(30L) == 20L)
    // the distributed propagation path (forced via threshold 0) agrees
    // with the driver union-find path exactly
    val dist = Dedup.connectedComponents(pairs, driverThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == cc)
  }

  test("connected components of an empty pair set is empty, not an error") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() == 0L)
  }

  test("connected components: strict mode fails loudly when iteration-capped, lax mode degrades split") {
    import spark.implicits._
    // a 12-node path has diameter 11 > the 2 hops one capped step allows
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // lax (dedup) mode: split components, never wrongly merged
    val lax = Dedup.connectedComponents(chain, maxIter = 1,
      driverThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lax.values.toSet.size > 1, "capped run must remain split")
    assert(lax.forall { case (id, c) => c <= id }, "labels only merge downward")
    // strict (report) mode: the same cap must throw, not ship wrong ids
    val err = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 1,
        driverThreshold = 0L, strict = true).collect()
    }
    assert(err.getMessage.contains("did not converge"))
    // with enough steps strict succeeds and matches the driver path
    val ok = Dedup.connectedComponents(chain, maxIter = 10,
      driverThreshold = 0L, strict = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 12L).forall(ok(_) == 1L))
  }

  test("keepCanonical drops exactly the non-canonical cluster members") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val docsDf = docs(1L -> "a", 2L -> "b", 3L -> "c", 9L -> "unpaired")
    val kept = Dedup.keepCanonical(docsDf, "doc_id", pairs)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(kept.toSeq == Seq(1L, 9L)) // cluster {1,2,3} keeps 1; 9 untouched
  }

  test("incremental dedup drops exactly the new-batch docs whose content exists in the corpus") {
    import spark.implicits._
    val docs = Seq(
      // even ids = accumulated corpus
      (0L, "alpha beta gamma"), (2L, "delta epsilon zeta"), (4L, "eta theta iota"),
      // odd ids = new batch: 1 and 5 duplicate corpus content, 3 and 7 are novel
      (1L, "alpha beta gamma"), (3L, "fresh new content"),
      (5L, "eta theta iota"), (7L, "another novel doc"))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("incdedup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = graft.queries.LlmOps.qDedupIncremental(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 7L))
  }

  test("jaccard x1000 matches exact set computation") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    assert(df.select(Dedup.jaccardX1000($"x", $"y")).first().getLong(0) == 500L) // 2/4
  }

  test("sketch calibration: estimates track exact jaccard within the sampling bound") {
    val report = graft.queries.LlmOps.qSketchCalibration(spark, sfDir).collect()
    assert(report.nonEmpty, "banded candidates must produce at least one decile")
    report.foreach { r =>
      val (decile, n) = (r.getAs[Int]("exact_decile"), r.getAs[Long]("n_pairs"))
      val (est, exact) = (r.getAs[Long]("mean_est_x1000"), r.getAs[Long]("mean_exact_x1000"))
      val err = r.getAs[Long]("mean_abs_err_x1000")
      assert(n > 0 && decile >= 0 && decile <= 9)
      assert(est >= 0 && est <= 1000 && exact >= 0 && exact <= 1000)
      // k=64 lanes: σ ≤ √(0.25/64) ≈ 62.5 x1000-points; mean |err| of a
      // decile should sit within ~3σ (loose — small deciles are noisy)
      assert(err <= 190, s"decile $decile mean abs err $err exceeds the k=64 bound")
      // the mean estimate itself must land in (or adjacent to) its decile
      assert(est >= (decile - 2) * 100 && est <= (decile + 3) * 100,
        s"decile $decile mean est $est drifted out of band")
    }
  }

  test("dedup rate by source: planted copies priced to the right origin") {
    import spark.implicits._
    val docs = Seq(
      // srcA: 2 originals; srcB: one original + two copies of alpha
      // (doc_ids later than srcA's 1, so B pays for the copies);
      // srcC: one copy of beta
      (1L, "alpha", "en", "srcA", 5L), (2L, "beta", "en", "srcA", 4L),
      (3L, "own", "en", "srcB", 3L), (4L, "alpha", "en", "srcB", 5L),
      (5L, "alpha", "en", "srcB", 5L),
      (6L, "beta", "en", "srcC", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("duprate").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.LlmOps.qDedupRateBySource(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dups"),
          r.getAs[Long]("n_distinct"), r.getAs[Long]("dup_ppm"))).toMap
    assert(out("srcA") == ((2L, 0L, 2L, 0L)))
    assert(out("srcB") == ((3L, 2L, 2L, 666666L)))
    assert(out("srcC") == ((1L, 1L, 1L, 1000000L)))
  }

  test("source overlap: planted syndication counted per pair, within-source copies invisible") {
    import spark.implicits._
    val docs = Seq(
      // "alpha" syndicated by B and C; "beta" only in A and B; "gamma"
      // duplicated WITHIN A (must not pair); "delta" unique
      (1L, "alpha", "en", "srcA", 5L), (2L, "alpha", "en", "srcB", 5L),
      (3L, "alpha", "en", "srcC", 5L),
      (4L, "beta", "en", "srcA", 4L), (5L, "beta", "en", "srcB", 4L),
      (6L, "gamma", "en", "srcA", 5L), (7L, "gamma", "en", "srcA", 5L),
      (8L, "delta", "en", "srcC", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("overlap").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.LlmOps.qSourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_shared")).toMap
    assert(out == Map(
      ("srcA", "srcB") -> 2L, // alpha + beta
      ("srcA", "srcC") -> 1L, // alpha
      ("srcB", "srcC") -> 1L  // alpha
    ), s"got $out")
  }

  test("normalized dedup (D26): cosmetic variants surface only in the norm lane") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!", "srcA"),  // raw-distinct from 2, norm-equal
      (2L, "hello world", "srcA"),
      (3L, "Hello, World!", "srcA"),  // byte-exact copy of 1
      (4L, "first unrelated doc", "srcB"),
      (5L, "second unrelated doc", "srcB"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("normdedup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.LlmOps.qDedupNormalized(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("dup_raw"),
          r.getAs[Long]("dup_norm"), r.getAs[Long]("norm_only_ppm"))).toMap
    assert(out("srcA") == ((3L, 1L, 2L, 333333L)), s"srcA: ${out("srcA")}")
    assert(out("srcB") == ((2L, 0L, 0L, 0L)), s"srcB: ${out("srcB")}")
    // real corpus: the norm lane can only ever ADD duplication
    graft.queries.LlmOps.qDedupNormalized(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("dup_norm") >= r.getAs[Long]("dup_raw"))
      assert(r.getAs[Long]("norm_only_ppm") ==
        (r.getAs[Long]("dup_norm") - r.getAs[Long]("dup_raw")) * 1000000L
          / r.getAs[Long]("n_docs"))
    }
  }

  test("quality survivorship (D28): keep-best provably disagrees with keep-min") {
    val out = graft.queries.LlmOps.qDedupBest(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("survivor_id"), r.getAs[Long]("survivor_quality_x1000")))
      .sortBy(_._1)
    // 500 docs -> planted ids 0,20,...,480 in groups of 5 per DIV-100
    assert(out.length == 5, s"got ${out.toSeq}")
    assert(out.forall(_._2 == 5L), "each planted group forms one 5-doc cluster")
    // repeats = (id DIV 20) % 4 + 1 peak mid-group: the survivor is the
    // max-quality member, NOT the min id, wherever the peak isn't first
    val survivors = out.map(_._3).toSet
    assert(out.exists(r => r._3 != r._1),
      s"at least one cluster's best copy must not be its min id: $out")
    // survivor = argmax of the engine's own quality lane (tie -> min id)
    val quality = graft.text.TextAnalysis.qualityScore(
      graft.sources.Tables.table(spark, sfDir, "documents"), "text")
    out.foreach { case (cid, _, sid, sq) =>
      assert(survivors.contains(sid))
      assert(sq > 0L)
    }
    // every survivor belongs to its own cluster's id range
    out.foreach { case (cid, _, sid, _) =>
      assert(sid >= cid && sid < cid + 100, s"survivor $sid outside cluster $cid")
    }
  }

  test("survivorship via LSH (D28b): banded candidates reproduce the exact face") {
    // at this corpus the LSH recall regime is exact: plants sit at J>=0.9
    // (16 bands of 4 rows miss such a pair with p~4e-8) and organic
    // same-source pairs peak far below tau — so the twin must EQUAL the
    // grid-exact face row for row, survivors and qualities included
    val exact = graft.queries.LlmOps.qDedupBest(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val lsh = graft.queries.LlmOps.qDedupBestLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(lsh.nonEmpty)
    assert(lsh.toSeq == exact.toSeq,
      s"LSH survivorship diverged: lsh=${lsh.toSeq} exact=${exact.toSeq}")
  }

  test("apply rep collapse (r15): identical vectors collapse losslessly vs the brute-force closure") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("applyrep").toString
    val a = Seq(1.0, 0.0, 0.0)
    val b = Seq(0.9, 0.1, 0.0) // cos(a,b) ~ 0.993 > tau: clusters with a
    val c = Seq(0.0, 0.0, 1.0) // orthogonal to both: singleton
    Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, b), (6L, c))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def control(d: String): Set[Long] = {
      val pairs = graft.ann.Ann.nearDupPairs(
        graft.sources.Tables.table(spark, d, "embeddings"),
        "vec_id", "embedding", tau = 0.35)
      graft.dedup.Dedup.keepCanonical(
        graft.sources.Tables.table(spark, d, "embeddings").select("vec_id"),
        "vec_id", pairs).collect().map(_.getLong(0)).toSet
    }
    val kept = graft.queries.LlmOps.qDedupApply(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(kept == control(dir), s"collapsed plan diverged from brute force: $kept")
    assert(kept == Set(1L, 6L),
      "a-clones + b-clones merge under canonical 1; c is a singleton")
    // the LSH twin keeps a superset (fewer candidate pairs => fewer drops)
    val lshKept = graft.queries.LlmOps.qDedupApplyLsh(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(lshKept), s"LSH keep $lshKept must contain exact keep $kept")
    assert(!lshKept.contains(2L) && !lshKept.contains(3L),
      "identical clones of the canonical must drop in ANY candidate regime")
    // the degenerate-but-consistent NaN semantic the collapse must
    // PRESERVE: both engines order NaN above every number, so a zero
    // vector's 0/0 cosine passes `> tau` and links everything it meets
    // — collapsed and uncollapsed plans must agree on that too
    val dirZ = java.nio.file.Files.createTempDirectory("applyrepz").toString
    val z = Seq(0.0, 0.0, 0.0)
    Seq((1L, a), (2L, a), (3L, c), (7L, z), (8L, z))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dirZ/embeddings.parquet")
    val keptZ = graft.queries.LlmOps.qDedupApply(spark, dirZ)
      .collect().map(_.getLong(0)).toSet
    assert(keptZ == control(dirZ), s"zero-vector corpus diverged: $keptZ")
    assert(keptZ == Set(1L),
      "NaN > tau is TRUE in Spark: the zero vectors bridge a and c into one cluster")
  }

  test("minhash apply (D2c): closure of the pair face; identical texts collapse; nulls stay singletons") {
    // verdicts on the sf corpus must be the transitive closure of the
    // registered pair face (the D3b proof shape)
    val pairs = graft.queries.LlmOps.qDedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = graft.queries.LlmOps.qDedupMinhashApply(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val slice = graft.sources.Tables.table(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0).count()
    assert(out.length == slice, "one verdict row per sliced doc")
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(id => id -> find(id)).toMap
    val canon = members.groupBy(_._2).flatMap { case (_, m) =>
      val c = m.keys.min; m.keys.map(_ -> c)
    }
    out.foreach { case (id, cid, kept) =>
      assert(cid == canon.getOrElse(id, id), s"doc $id: cluster $cid")
      assert(kept == (id == cid))
    }
    // planted corner corpus: identical texts merge under the min id, a
    // J=0.92 neighbor joins the cluster, NULL texts never pair (NULL
    // Jaccard) and each stays its own kept singleton
    import spark.implicits._
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val near = base + " w13" // J = 12/13 ~ 0.923 >= 0.7
    val dir = java.nio.file.Files.createTempDirectory("d2capply").toString
    Seq((0L, base), (10L, base), (20L, near), (30L, null),
        (40L, null), (50L, "z1 z2 z3"))
      .map { case (i, t) => (i, Option(t)) }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = graft.queries.LlmOps.qDedupMinhashApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(planted.toSeq == Seq(
      (0L, 0L, true), (10L, 0L, false), (20L, 0L, false),
      (30L, 30L, true), (40L, 40L, true), (50L, 50L, true)),
      s"planted verdicts wrong: ${planted.toSeq}")
  }

  test("simhash apply (D3b): per-doc verdicts are the transitive closure of the pair face") {
    val pairs = graft.queries.LlmOps.qDedupSimhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = graft.queries.LlmOps.qDedupSimhashApply(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val corpus = graft.sources.Tables.table(spark, sfDir, "documents").count()
    assert(out.length == corpus, "one verdict row per document — corpus-LINEAR output")
    val cluster = out.map(t => t._1 -> t._2).toMap
    // driver union-find over the pair face = the expected closure
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(id => id -> find(id)).toMap
    val canon = members.groupBy(_._2).flatMap { case (_, m) =>
      val c = m.keys.min; m.keys.map(_ -> c)
    }
    out.foreach { case (id, cid, kept) =>
      val want = canon.getOrElse(id, id) // singletons self-cluster
      assert(cid == want, s"doc $id: cluster $cid, expected $want")
      assert(kept == (id == cid), s"doc $id: kept must mean canonical")
    }
    assert(out.exists(!_._3), "the sf corpus plants clones — some doc must drop")
  }

  // shared prep for the r16 gram-domain rep-collapse specs — the exact
  // transform the D4/D28 faces run before their pair stage
  private def gramPrep(raw: org.apache.spark.sql.DataFrame) = raw
    .select(col("doc_id"), col("source"), split(col("text"), " ").as("__toks"))
    .select(col("doc_id"), col("source"), Dedup.hashedNgrams(col("__toks"), 2).as("grams"))

  test("ngram-jaccard rep collapse (r16): collapsed face ≡ brute grid join, empty-gram docs included") {
    import spark.implicits._
    val raw = Seq(
      (5L, "s1", "alpha beta gamma delta epsilon"),
      (10L, "s1", "alpha beta gamma delta epsilon"), // exact clone
      (15L, "s1", "alpha beta gamma delta zeta"),    // near (last word)
      (20L, "s1", "totally unrelated words here now"),
      (25L, "s1", "solo"),                           // empty gram set
      (30L, "s1", "solo"),                           // empty-gram clone
      (35L, "s2", "alpha beta gamma delta epsilon"), // clone, OTHER source
      (40L, "s2", "alpha beta gamma delta epsilon")
    ).toDF("doc_id", "source", "text")
    val docs = gramPrep(raw)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "jaccard_x1000").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val brute = rows(Buckets.gridSelfJoinPayload(
        docs, Seq("source"), "doc_id", Seq("grams"), 4096)
      .select(col("id_a"), col("id_b"),
        graft.functions.longSetJaccardSorted(col("grams_a"), col("grams_b"))
          .as("jaccard_x1000")))
    val collapsed = rows(graft.queries.LlmOps.ngramJaccardFrom(docs))
    assert(collapsed == brute,
      s"collapsed pair matrix diverged:\n collapsed=$collapsed\n brute=$brute")
    // cross-source clones never pair (blocking preserved by the group key)
    assert(!collapsed.exists { case (x, y, _) => x <= 30L && y >= 35L })
    // the planted clone pair carries jaccard 1000 through the expansion
    assert(collapsed.contains((5L, 10L, 1000L)))
    // and the whole face (real corpus): collapsed ≡ brute on sfDir too
    val faceDocs = gramPrep(graft.sources.Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") % 5 === 0))
    val faceBrute = rows(Buckets.gridSelfJoinPayload(
        faceDocs, Seq("source"), "doc_id", Seq("grams"), 4096)
      .select(col("id_a"), col("id_b"),
        graft.functions.longSetJaccardSorted(col("grams_a"), col("grams_b"))
          .as("jaccard_x1000")))
    val face = rows(graft.queries.LlmOps.qNgramJaccard(spark, sfDir))
    assert(face == faceBrute, "registered face diverged from brute on the sf corpus")
  }

  test("survivorship rep collapse (r16): star+rep-pair graph ≡ brute τ-pair graph components") {
    import spark.implicits._
    val raw = Seq(
      (1L, "s1", "one two three four five six seven eight nine ten eleven twelve"),
      (2L, "s1", "one two three four five six seven eight nine ten eleven twelve"), // clone
      (3L, "s1", "one two three four five six seven eight nine ten eleven other"),  // near: J=10/12
      (4L, "s1", "completely different text about other things entirely for sure today"),
      (5L, "s1", "x"),  // empty grams: selfpass fails for (∅,∅) iff kernel < τ
      (6L, "s1", "x"),
      (7L, "s2", "one two three four five six seven eight nine ten eleven twelve")  // other source
    ).toDF("doc_id", "source", "text")
    val docs = gramPrep(raw)
    def comps(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.connectedComponents(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = comps(Buckets.gridSelfJoinPayload(
        docs, Seq("source"), "doc_id", Seq("grams"), 4096)
      .filter(graft.functions.longSetJaccardSorted(col("grams_a"), col("grams_b")) >= 700L)
      .select(col("id_a"), col("id_b")))
    val collapsed = comps(
      graft.queries.LlmOps.survivorshipPairsCollapsed(docs, 700L))
    assert(collapsed == brute,
      s"component sets diverged:\n collapsed=$collapsed\n brute=$brute")
    // the planted 1-2-3 near-dup family is one component rooted at 1
    assert(collapsed.contains((2L, 1L)) && collapsed.contains((3L, 1L)))
    // cross-source clone 7 never joins it
    assert(!collapsed.exists(_._1 == 7L))
  }
}
