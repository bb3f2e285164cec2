package graft.ann

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {

  test("brute-force top-k: self excluded, k rows per query, ranks contiguous") {
    val out = LlmOps.qAnnTopK(spark, sfDir)
    val rows = out.collect()
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.values.forall(_.length == 10))
    assert(perQuery.values.forall(_.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 10L)))
  }

  test("LSH top-k: high recall on clustered data (the regime LSH serves)") {
    import spark.implicits._
    // 20 planted clusters: base direction + small perturbations. True
    // neighbors are co-cluster members; hyperplane signs barely move under
    // small perturbation, so same-bucket probing must recover them.
    val rng = new scala.util.Random(7)
    val dims = 16
    val corpus = (0 until 20).flatMap { c =>
      val base = Array.fill(dims)(rng.nextGaussian())
      (0 until 10).map { m =>
        val v = base.map(x => x + 0.05 * rng.nextGaussian())
        (c * 10L + m, v.toSeq)
      }
    }.toDF("vec_id", "emb")
    val queries = corpus.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"emb".as("qvec"))
    val exact = Ann.bruteForceTopK(queries, corpus, "vec_id", "emb", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.lshTopK(queries, corpus.select($"vec_id", $"emb"),
      "vec_id", "emb", k = 5, dims = dims, planes = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low on clustered data")
  }

  test("LSH top-k on the synthetic table returns ranked rows per query") {
    val rows = LlmOps.qAnnLsh(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.values.forall(_.map(_.getAs[Long]("rank")).distinct.length <= 10))
  }

  test("bucketed near-dup is a subset of exact with high recall on clusters") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val dims = 16
    val corpus = (0 until 15).flatMap { c =>
      val base = Array.fill(dims)(rng.nextGaussian())
      (0 until 6).map(m => (c * 10L + m, base.map(x => x + 0.03 * rng.nextGaussian()).toSeq))
    }.toDF("vec_id", "embedding")
    val exact = Ann.nearDupPairs(corpus, "vec_id", "embedding", tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.nearDupPairsLsh(corpus, "vec_id", "embedding", tau = 0.95, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))          // never a false positive
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"bucketed recall $recall too low on clustered data")
  }

  test("small-bucket probes reach an over-cap bucket through its canonical") {
    import spark.implicits._
    val dims = 8
    val rng = new scala.util.Random(3)
    val v = Array.fill(dims)(rng.nextGaussian())
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // batch-compute signatures for v and 500 perturbations (ramping scale)
    // to find a near-identical vector exactly ONE signature bit away —
    // the multi-probe flip regime
    val cands = (-1L, v.toSeq) +: (0 until 500).map { i =>
      val scale = 0.02 + 0.28 * i / 500.0
      (i.toLong, v.map(x => x + scale * rng.nextGaussian()).toSeq)
    }
    val sigs = cands.toDF("id", "emb")
      .select($"id", Ann.lshBucket($"emb", dims, planes = 6).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bv = sigs(-1L)
    val w = cands.drop(1).collectFirst {
      case (i, emb) if java.lang.Long.bitCount(bv ^ sigs(i)) == 1 &&
        cos(v, emb.toArray) > 0.95 => emb
    }.getOrElse(fail("no 1-bit-flip near-duplicate found; adjust seed/scales"))
    // 30 clones of v: one bucket of 30 > cap 10 → star pairs + canonical
    // stays probe-able; w sits alone in a bucket 1 bit away
    val corpus = ((0 until 30).map(i => (i.toLong, v.toSeq)) :+ (100L, w))
      .toDF("vec_id", "embedding")
    val pairs = Ann.nearDupPairsLsh(corpus, "vec_id", "embedding", tau = 0.95,
      dims = dims, planes = 6, probeBits = 1, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((1 to 29).forall(i => pairs.contains((0L, i.toLong)))) // hot star intact
    assert(pairs.contains((0L, 100L))) // the cross-bucket bridge to the canonical
  }

  test("IVF top-k: high recall with few probes on clustered data") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val dims = 16
    val corpus = (0 until 20).flatMap { c =>
      val base = Array.fill(dims)(rng.nextGaussian())
      (0 until 10).map(m => (c * 10L + m,
        base.map(x => x + 0.05 * rng.nextGaussian()).toSeq))
    }.toDF("vec_id", "emb")
    val queries = corpus.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"emb".as("qvec"))
    val exact = Ann.bruteForceTopK(queries, corpus, "vec_id", "emb", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val index = Ivf.buildIndex(corpus, "vec_id", "emb", nCells = 20, seed = 7L)
    val approx = Ivf.ivfTopK(queries, index, k = 5, nprobe = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall too low on clustered data")
  }

  test("IVF on the synthetic table returns ranked rows per query") {
    val rows = graft.queries.LlmOps.qAnnIvf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.values.forall(_.map(_.getAs[Long]("rank")).distinct.length <= 10))
  }

  test("int8 quantization: lanes in range, dequantized cosine ≈ 1") {
    import spark.implicits._
    val q = LlmOps.qQuantize(spark, sfDir)
    val rows = q.collect()
    assert(rows.nonEmpty)
    val lanes = rows.flatMap(_.getString(2).split(",").map(_.toLong))
    assert(lanes.forall(v => v >= -127L && v <= 127L))
    assert(lanes.exists(_ != 0L))
    // round-trip: cosine(original, dequantized) stays near 1
    val orig = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .select($"vec_id", Ann.asDouble($"embedding").as("emb"))
    val joined = q.join(orig, "vec_id")
      .select($"vec_id", graft.functions.cosineSim($"emb",
        graft.ann.Quantize.dequantize($"q_csv", $"scale_x1e6")).as("sim"))
      .collect().map(_.getDouble(1))
    assert(joined.forall(_ > 0.995), s"worst cosine ${joined.min}")
  }

  test("topKByScore orders best-first with id tiebreak, bounded at k") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.9, 10L), (1L, 0.7, 11L), (1L, 0.9, 9L), (1L, 0.1, 12L),
      (2L, 0.5, 20L)).toDF("query_id", "sim", "neighbor_id").repartition(4)
    val out = df.groupBy($"query_id")
      .agg(graft.functions.topKByScore($"sim", $"neighbor_id", 3).as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getDouble(0), s.getLong(1))))
      .toMap
    // 0.9 ties break on ascending id; 0.1 is evicted by the k=3 bound
    assert(out(1L) == Seq((0.9, 9L), (0.9, 10L), (0.7, 11L)))
    assert(out(2L) == Seq((0.5, 20L)))
    // NaN ranks FIRST, matching ORDER BY sim DESC in Spark SQL (NaN > +Inf)
    val nanOut = Seq((1L, Double.NaN, 5L), (1L, 0.9, 6L), (1L, 0.8, 7L))
      .toDF("query_id", "sim", "neighbor_id")
      .groupBy($"query_id")
      .agg(graft.functions.topKByScore($"sim", $"neighbor_id", 2).as("top"))
      .select(explode($"top.neighbor_id")).collect().map(_.getLong(0)).toSeq
    assert(nanOut == Seq(5L, 6L))
  }

  test("cosine similarity function: known vectors") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0)), (Seq(1.0, 1.0), Seq(1.0, 1.0)))
      .toDF("a", "b")
    val sims = df.select(graft.functions.cosineSim($"a", $"b").as("s"))
      .collect().map(_.getDouble(0))
    assert(math.abs(sims(0)) < 1e-12)
    assert(math.abs(sims(1) - 1.0) < 1e-12)
  }

  test("hard negatives: never the query's own label, ranks contiguous per query") {
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val labelOf = emb.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = LlmOps.qHardNegatives(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(n != q)
      assert(labelOf(n) != labelOf(q), s"query $q got same-label negative $n")
    }
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach(g =>
      assert(g.map(_.getAs[Long]("rank")).sorted.sameElements(1L to g.length)))
  }

  test("LSH hard negatives: label-valid always, high recall vs exact on clusters") {
    import spark.implicits._
    // labeled clusters around ONE shared direction: other-label clusters
    // are genuinely NEAR the query (the hard-negative regime — boundary
    // cases, not random far vectors, which no bucketing could rank)
    val rng = new scala.util.Random(41)
    val dims = 16
    val shared = Array.fill(dims)(rng.nextGaussian())
    val corpus = (0 until 12).flatMap { c =>
      val base = shared.map(x => x + 0.3 * rng.nextGaussian())
      (0 until 8).map { m =>
        (c * 10L + m, base.map(x => x + 0.1 * rng.nextGaussian()).toSeq, c % 4)
      }
    }.toDF("vec_id", "emb", "label")
    val queries = corpus.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("query_id"), $"emb".as("qvec"), $"label".as("qlabel"))
    val exact = Ann.hardNegatives(queries, corpus, "vec_id", "emb", "label", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val bucketed = corpus.select($"vec_id", $"emb", $"label",
      Ann.lshBucket(Ann.asDouble($"emb"), dims, planes = 6).as("bucket"))
    // hard negatives live in OTHER clusters (cluster-scale distances),
    // so they need deeper multi-probe than same-cluster top-k: 3 flipped
    // bits probes 42/64 buckets — the recall/cost dial the operator exposes
    val approx = Ann.hardNegativesLsh(queries, bucketed, "vec_id", "emb", "label",
      k = 5, dims = dims, planes = 6, probeBits = 3).collect()
    val labelOf = corpus.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    approx.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(labelOf(n) != labelOf(q), s"same-label negative $n for query $q")
    }
    val approxSet = approx.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact & approxSet).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH hard-negative recall $recall too low")
  }

  test("semdedup: exact clones collapse to the minimum id, originals survive") {
    import spark.implicits._
    // identical vectors assign to identical cells, so clone collapse is
    // guaranteed regardless of how k-means carves the space
    val rng = new scala.util.Random(23)
    val dims = 16
    val base = (0L until 50L).map(i => i -> Array.fill(dims)(rng.nextGaussian()).toSeq)
    val clones = (0 until 10).flatMap(i =>
      Seq((100L + i) -> base(i)._2, (200L + i) -> base(i)._2))
    val corpus = (base ++ clones).toDF("vec_id", "embedding")
    val out = SemDedup.keepDecisions(corpus, "vec_id", "embedding",
      nCells = 8, tau = 0.999).collect()
    assert(out.length == 70) // one decision row per vector
    val kept = out.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("vec_id")).toSet
    assert(kept == (0L until 50L).toSet,
      s"expected exactly the 50 originals kept, got ${kept.size}: $kept")
  }

  test("semdedup soundness: every dropped id has an exact smaller-id near neighbor") {
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val decisions = LlmOps.qSemDedup(spark, sfDir).collect()
    assert(decisions.length == emb.count())
    val dropped = decisions.filterNot(_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("vec_id")).toSet
    // exact D5 pair set at the same τ: a drop is justified iff the id
    // appears as the LARGER side of some exact near-dup pair
    val justified = Ann.nearDupPairs(emb, "vec_id", "embedding", tau = 0.35)
      .collect().map(_.getAs[Long]("id_b")).toSet
    assert(dropped.subsetOf(justified),
      s"unjustified drops: ${dropped -- justified}")
  }

  test("semdedup with an unreachable threshold keeps everything") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val corpus = (0L until 40L).map(i => i -> Array.fill(8)(rng.nextGaussian()).toSeq)
      .toDF("vec_id", "embedding")
    val out = SemDedup.keepDecisions(corpus, "vec_id", "embedding",
      nCells = 4, tau = 1.0000001).collect()
    assert(out.length == 40 && out.forall(_.getAs[Boolean]("kept")))
  }

  test("knn classify: label-clustered corpus recovers labels; tie-break deterministic") {
    val out = graft.queries.LlmOps.qKnnClassify(spark, sfDir).collect()
    assert(out.nonEmpty)
    // every probe row carries a vote count within [1, k] and a verdict
    assert(out.forall { r =>
      val v = r.getAs[Long]("votes"); v >= 1L && v <= 10L })
    val acc = out.count(_.getAs[Boolean]("correct")).toDouble / out.length
    // the synthetic labels cluster in embedding space; kNN must beat the
    // 1/|labels| random-guess floor by a wide margin
    val nLabels = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .select("label").distinct().count()
    assert(acc > 1.5 / nLabels.toDouble,
      s"kNN accuracy $acc vs ${nLabels} labels — embeddings or vote broken")
  }

  test("filtered ANN: pre-filter returns the true top-k of the satisfying set; post-filter under-returns") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.LlmOps.qAnnFiltered(spark, sfDir).collect()
    assert(out.nonEmpty)
    val allowed = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .filter(col("label") === 1).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    // every result satisfies the predicate
    assert(out.forall(r => allowed(r.getAs[Long]("neighbor_id"))),
      "a neighbor escaped the predicate")
    // full k wherever the satisfying set allows (it does at sf0.001)
    val k = 10
    assert(allowed.size > k)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length == k, s"query $q returned ${rs.length} of $k")
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to k.toLong),
        s"query $q ranks not contiguous")
    }
    // the classic recall bug: post-filtering an UNFILTERED top-k returns
    // fewer than k for any query whose global top-k isn't all label-1 —
    // pre-filtering is a different (correct) operator, not an optimization
    val unfiltered = graft.queries.LlmOps.qAnnTopK(spark, sfDir).collect()
    val postCounts = unfiltered.filter(r => allowed(r.getAs[Long]("neighbor_id")))
      .groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length).toMap
    assert(postCounts.values.exists(_ < k),
      "corpus labels too uniform to demonstrate the pre/post separation")
  }

  test("margin mining (E26): planted one-hot alignment recovered with the exact hub-free margin") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // pair i: src vec_id=2i and tgt vec_id=2i+1 share basis vector e_i —
    // the unique alignment; every cross dot is 0, so each pair must be
    // rank-1 mutual and its ratio margin exactly d/(d/k) = k (1e7 ppm)
    val dims = 64
    val nPairs = 20
    val rows = (0 until nPairs).flatMap { i =>
      val v = Array.tabulate(dims)(j => if (j == i) 1.0f else 0.0f)
      Seq((2L * i, v), (2L * i + 1, v))
    }
    val dir = java.nio.file.Files.createTempDirectory("margin").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    // srcEvery = 1 is the full-corpus exactness baseline this plant tests;
    // the registered default is the batched (srcEvery = 25) face, asserted
    // separately below
    val out = graft.queries.LlmOps.qMarginMining(spark, dir, srcEvery = 1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("score_i"),
        r.getAs[Long]("margin_ppm")))
    assert(out.length == nPairs, s"got ${out.length} mutual pairs")
    out.foreach { case (s, t, d, m) =>
      assert(t == s + 1, s"misaligned pair ($s, $t)")
      assert(d == 127L * 127L, s"unit one-hot quantizes to 127: $d")
      assert(m == 10000000L, s"hub-free margin must be exactly k x 1e6: $m")
    }
    // the batched DEFAULT mines only src vec_ids with (id/2) % 25 == 0 —
    // on this plant that is exactly vec_id 0, so exactly the (0, 1) pair
    val batched = graft.queries.LlmOps.qMarginMining(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(batched.toSeq == Seq((0L, 1L)),
      s"batched default must return exactly the (id/2)%25==0 subset: ${batched.toSeq}")
    // corpus face: mutual pairs are symmetric-unique (each side appears
    // at most once at rank 1) and margins positive where dots are
    val corpus = graft.queries.LlmOps.qMarginMining(spark, sfDir).collect()
    assert(corpus.nonEmpty)
    assert(corpus.map(_.getLong(0)).distinct.length == corpus.length)
    assert(corpus.map(_.getLong(1)).distinct.length == corpus.length)
    corpus.filter(_.getAs[Long]("score_i") > 0).foreach(r =>
      assert(r.getAs[Long]("margin_ppm") > 0L))
  }

  test("int8 search (E19): integer scores recompute, recall vs exact is high (E20)") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.LlmOps.qAnnInt8(spark, sfDir).collect()
    assert(out.nonEmpty)
    val perQ = out.groupBy(_.getAs[Long]("query_id"))
    perQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length))
      val scores = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("score_i"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "heap order is score-descending")
    }
    // recompute one pair's integer dot from the quantized lanes directly
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val q8 = graft.ann.Quantize.unitInt8(emb, "vec_id", "embedding", "q")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Long]]("q")).toMap
    val probe = out.head
    val dot = q8(probe.getAs[Long]("query_id"))
      .zip(q8(probe.getAs[Long]("neighbor_id"))).map { case (a, b) => a * b }.sum
    assert(probe.getAs[Long]("score_i") == dot, "integer dot recomputes")
    // every quantized lane is a valid int8 value
    q8.values.flatten.foreach(v => assert(v >= -127L && v <= 127L))
    // E20: 64-dim int8 keeps overlap@10 high; floor deliberately loose —
    // the oracle checks exact values, this pins the QUALITY contract
    val rec = graft.queries.LlmOps.qAnnInt8Recall(spark, sfDir).collect()
    assert(rec.forall(_.getAs[Long]("n_exact") == 10L))
    val mean = rec.map(_.getAs[Long]("recall_ppm")).sum / rec.length
    assert(mean >= 800000L, s"mean int8 recall@10 ppm = $mean")
    rec.foreach { r =>
      assert(r.getAs[Long]("recall_ppm") ==
        r.getAs[Long]("n_overlap") * 1000000L / r.getAs[Long]("n_exact"))
    }
  }

  test("cascade (E21): int8 prefilter + float rescore nearly reproduces exact top-10") {
    val cas = graft.queries.LlmOps.qAnnCascade(spark, sfDir).collect()
    val exact = graft.queries.LlmOps.qAnnTopK(spark, sfDir).collect()
    val casSet = cas.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exSet = exact.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(cas.length == exact.length, "same (query x k) shape")
    val overlap = casSet.intersect(exSet).size.toDouble / exSet.size
    assert(overlap >= 0.9, s"cascade overlap with exact = $overlap")
    cas.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length))
    }
  }

  test("IVF incremental maintenance (E3b): appending a delta needs only its own assign pass") {
    // the index lifecycle's append step: new rows assign against the
    // EXISTING centroids (map-side, no k-means refit, no base rescan) —
    // and because assignment is a pure per-row function of the centroid
    // constants, base-assigned ∪ delta-assigned IS the full re-assign
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val idx = Ivf.buildIndex(base, "vec_id", "embedding", nCells = 8)
    val centers = idx.centroids.collect()
      .map(r => (r.getAs[Long]("cell_id"), r.getSeq[Double](1).toArray)).toSeq
    def cells(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select("vec_id", "cell_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incremental = cells(idx.assigned) ++
      cells(Ivf.assign(delta, "vec_id", "embedding", centers))
    val full = cells(Ivf.assign(emb, "vec_id", "embedding", centers))
    assert(incremental == full,
      "incrementally maintained assignment must equal the full re-assign")
    assert(incremental.size == emb.count(),
      "every vector (base + delta) is assigned")
    // the appended rows landed in existing cells — no refit happened
    assert(incremental.values.toSet.subsetOf(centers.map(_._1).toSet))
  }

  test("pair-face rep collapse (r16): collapsed plan ≡ brute pair matrix, zero vectors included") {
    import spark.implicits._
    val a = Seq(1.0, 0.0, 0.0)
    val b = Seq(0.9, 0.1, 0.0) // cos(a,b) ≈ 0.993 > τ
    val c = Seq(0.0, 0.0, 1.0) // orthogonal to a/b: pairs only via NaN
    val z = Seq(0.0, 0.0, 0.0) // zero vector: 0/0 = NaN > τ semantics
    val corpus = Seq(
      1L -> a, 2L -> a, 3L -> a, // clone group
      4L -> b, 5L -> b,          // clone group near a's
      6L -> c,                   // singleton
      7L -> z, 8L -> z           // zero-vector clone group
    ).toDF("vec_id", "embedding")
    val bruteRows = Ann.nearDupPairs(corpus, "vec_id", "embedding", tau = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val collapsedRows = Ann.nearDupPairsCollapsed(corpus, "vec_id", "embedding", tau = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(collapsedRows.toSet == bruteRows.toSet,
      s"collapsed ${collapsedRows.toSet} != brute ${bruteRows.toSet}")
    // each unordered pair exactly once — the expansion must not double-emit
    assert(collapsedRows.length == collapsedRows.toSet.size,
      "duplicate pair rows out of the expansion")
    assert(collapsedRows.length == bruteRows.length)
    // the expansion really regenerates within-group AND cross-group pairs
    val set = collapsedRows.toSet
    assert(set.contains((1L, 2L)) && set.contains((2L, 3L)), "within-group pairs")
    assert(set.contains((1L, 4L)) && set.contains((3L, 5L)), "cross-group expansion")
    assert(set.contains((6L, 7L)) && set.contains((7L, 8L)),
      "NaN > tau pairs (zero vectors) survive the collapse")
    assert(!set.contains((1L, 6L)), "orthogonal nonzero vectors stay unpaired")
  }

  test("top-k rep collapse (r16): collapsed ≡ brute incl. clone-dominated top-k, self's clone group, equal-sim ties") {
    import spark.implicits._
    val q = Seq(1.0, 0.0)
    // the query row itself; 15 clones of the query (own group wider than
    // k — self must drop, clones must stay); two DISTINCT vectors with
    // exactly equal cosine to the query (0.6), ids interleaved across
    // the groups; an antipodal vector
    val corpus = (Seq(0L -> q) ++ (1L to 15L).map(_ -> q) ++
      Seq(20L -> Seq(0.6, 0.8), 22L -> Seq(0.6, 0.8),
        21L -> Seq(0.6, -0.8), 23L -> Seq(0.6, -0.8),
        30L -> Seq(-1.0, 0.0))).toDF("vec_id", "emb")
    val queries = Seq((0L, q)).toDF("query_id", "qvec")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"))).sortBy(x => (x._1, x._3)).toSeq
    for (k <- Seq(10, 20)) {
      val brute = rows(Ann.bruteForceTopK(queries, corpus, "vec_id", "emb", k))
      val coll = rows(Ann.bruteForceTopKCollapsed(queries, corpus, "vec_id", "emb", k))
      assert(coll == brute, s"k=$k diverged:\n coll=$coll\n brute=$brute")
    }
    // the k=10 answer is exactly the 10 smallest clone ids — the
    // clone-dominated case where naive rep-level top-k would starve
    val top10 = rows(Ann.bruteForceTopKCollapsed(queries, corpus, "vec_id", "emb", 10))
    assert(top10.map(_._2) == (1L to 10L), s"clone fill broken: $top10")
    // and the registered faces on the sf corpus: collapsed ≡ brute
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val fq = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), Ann.asDouble(col("embedding")).as("qvec"))
    val bruteFace = rows(Ann.bruteForceTopK(fq,
      emb.select(col("vec_id"), Ann.asDouble(col("embedding")).as("emb")),
      "vec_id", "emb", 10))
    assert(rows(LlmOps.qAnnTopK(spark, sfDir)) == bruteFace,
      "registered E1 face diverged from brute on the sf corpus")
    val lq = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"),
        Ann.asDouble(col("embedding")).as("qvec"), col("label").as("qlabel"))
    val bruteHn = rows(Ann.hardNegatives(lq,
      emb.select(col("vec_id"), Ann.asDouble(col("embedding")).as("emb"), col("label")),
      "vec_id", "emb", "label", 3))
    assert(rows(LlmOps.qHardNegatives(spark, sfDir)) == bruteHn,
      "registered E7 face diverged from brute on the sf corpus")
  }

  test("int8 top-k rep collapse (r16): collapsed ≡ the uncollapsed integer scan, scores included") {
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val corpus = Quantize.unitInt8(emb, "vec_id", "embedding", "qc")
    val probes = Quantize.unitInt8(
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", "qq")
      .withColumnRenamed("vec_id", "query_id")
    // the pre-r16 uncollapsed scan, inline
    val brute = corpus.join(broadcast(probes), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.dotProductLong(col("qq"), col("qc")).as("score_i"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topKByScore(
        col("score_i").cast("double"), col("neighbor_id"), 10).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nbr")))
      .select(col("query_id"), col("nbr.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("nbr.sim").cast("long").as("score_i"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"), r.getAs[Long]("score_i")))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(rows(LlmOps.qAnnInt8(spark, sfDir)) == rows(brute),
      "collapsed int8 scan diverged from the uncollapsed one")
  }

  test("semdedup rep collapse (r16): collapsed pair stage ≡ uncollapsed within-cell verdicts") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val dims = 8
    val base = (0L until 40L).map(i => i -> Array.fill(dims)(rng.nextGaussian()).toSeq)
    val clones = (0 until 8).flatMap(i =>
      Seq((100L + i) -> base(i)._2, (200L + i) -> base(i)._2))
    val zeros = Seq(300L -> Seq.fill(dims)(0.0), 301L -> Seq.fill(dims)(0.0))
    val corpus = (base ++ clones ++ zeros).toDF("vec_id", "embedding")
    val idx = Ivf.buildIndex(corpus, "vec_id", "embedding", nCells = 4)
    // the pre-r16 uncollapsed path, inline: every vector enters the
    // within-cell grid join
    val pairs = graft.dedup.Buckets.gridSelfJoin(
      idx.assigned.select(col("vec_id"), col("cell_id")),
      Seq("cell_id"), "vec_id", 4096)
    val embs = idx.assigned.select(col("vec_id"), col("__emb"))
    val tau = 0.8
    val dropped = pairs
      .join(embs.select(col("vec_id").as("id_a"), col("__emb").as("emb_a")), "id_a")
      .join(embs.select(col("vec_id").as("id_b"), col("__emb").as("emb_b")), "id_b")
      .filter(graft.functions.cosineSim(col("emb_a"), col("emb_b")) >= tau)
      .select(col("id_b")).collect().map(_.getLong(0)).toSet
    val control = idx.assigned.select(col("vec_id"), col("cell_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), !dropped.contains(r.getLong(0)))).toSet
    val out = SemDedup.keepDecisions(idx, "vec_id", tau, chunkSize = 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out == control,
      s"collapsed semdedup diverged: extra=${out -- control} missing=${control -- out}")
    // sanity: clones of kept originals dropped; the later zero vector
    // dropped by the earlier one (NaN ≥ τ)
    val kept = out.filter(_._3).map(_._1)
    assert(!kept.contains(301L), "zero-vector clone must drop via NaN ≥ tau")
  }

  test("candidate-stage rep collapse (r17): expandCandidateTopK ≡ the uncollapsed member heap at every k, ties and boundary included") {
    import spark.implicits._
    val q = Seq(1.0, 0.0)
    // self's clone group (6 members incl. the query), an exact TIE class
    // spanning two distinct groups with interleaved ids (cos = 0.8 for
    // both (0.8,0.6) and (0.8,-0.6)), a 10-clone group, one antipode;
    // ks chosen to land inside the self group, mid-tie-class, mid-clone
    // group, and past the corpus
    val corpus = (Seq(0L -> q) ++ (1L to 5L).map(_ -> q) ++
      Seq(10L -> Seq(0.8, 0.6), 12L -> Seq(0.8, 0.6),
        11L -> Seq(0.8, -0.6), 13L -> Seq(0.8, -0.6)) ++
      (20L to 29L).map(_ -> Seq(0.6, 0.8)) ++
      Seq(40L -> Seq(-1.0, 0.0))).toDF("vec_id", "emb")
    val queries = Seq((0L, q)).toDF("query_id", "qvec")
    val gm = Ann.groupMembership(
      corpus.select(col("vec_id"), col("emb")), "vec_id", Seq("emb"))
    val repScored = gm.select(col("__gid"), col("emb"))
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col("__gid"),
        graft.functions.cosineSim(col("qvec"), col("emb")).as("sim"))
    def bruteCands(k: Int): Set[(Long, Long)] = corpus
      .join(broadcast(queries), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.cosineSim(col("qvec"), col("emb")).as("sim"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topKByScore(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), explode(col("top.neighbor_id")).as("__mid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k <- Seq(1, 3, 5, 7, 9, 12, 15, 19, 100)) {
      val coll = Ann.expandCandidateTopK(Ann.repTopK(repScored, k + 1), gm, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(coll == bruteCands(k),
        s"k=$k diverged: extra=${coll -- bruteCands(k)} missing=${bruteCands(k) -- coll}")
    }
  }

  test("pca + cascade candidate collapse (r17): registered faces ≡ their uncollapsed no-cutoff plans on the sf corpus") {
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"))).sortBy(x => (x._1, x._3)).toSeq
    def rescoreTopK(stage1: org.apache.spark.sql.DataFrame,
        probes: org.apache.spark.sql.DataFrame, k: Int) = {
      val rescored = stage1
        .join(emb.select(col("vec_id").as("neighbor_id"),
          Ann.asDouble(col("embedding")).as("nvec")), "neighbor_id")
        .join(broadcast(probes), "query_id")
        .select(col("query_id"), col("neighbor_id"),
          graft.functions.cosineSim(col("qvec"), col("nvec")).as("sim"))
      rescored.groupBy(col("query_id"))
        .agg(graft.functions.topKByScore(col("sim"), col("neighbor_id"), k).as("top"))
        .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nbr")))
        .select(col("query_id"), col("nbr.neighbor_id").as("neighbor_id"),
          (col("pos") + 1).cast("long").as("rank"))
    }
    // E23 reference: the oracle's stated plan — member-level projected
    // stage-1 heap WITHOUT the sampled cutoff, exact rescore
    val (m, projected) = LlmOps.pcaIndex(spark, sfDir)
    val pq = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), Ann.asDouble(col("embedding")).as("qvec"))
      .withColumn("__n", sqrt(aggregate(col("qvec"), lit(0.0), (a, x) => a + x * x)))
      .filter(col("__n") > 0.0)
      .select(col("query_id"), col("qvec"),
        Pca.projectExpr(transform(col("qvec"), x => x / col("__n")), m, 16)
          .as("qpvec"))
    val pcaStage1 = projected
      .join(broadcast(pq.select(col("query_id"), col("qpvec"))),
        col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (graft.functions.dotProductDouble(col("pvec"), col("qpvec")) * 2.0
          - col("pnorm2")).as("sim"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topKByScore(col("sim"), col("neighbor_id"), 200).as("top"))
      .select(col("query_id"), explode(col("top.neighbor_id")).as("neighbor_id"))
    val pcaRef = rows(rescoreTopK(pcaStage1,
      pq.select(col("query_id"), col("qvec")), 10))
    assert(rows(LlmOps.qAnnPca(spark, sfDir)) == pcaRef,
      "collapsed E23 face diverged from the uncollapsed no-cutoff plan")
    // E21 reference: member-level int8 top-100 candidate set + rescore
    val corpus8 = Quantize.unitInt8(emb, "vec_id", "embedding", "qc")
    val probes8 = Quantize.unitInt8(
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", "qq")
      .withColumnRenamed("vec_id", "query_id")
    val cascStage1 = corpus8
      .join(broadcast(probes8), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.dotProductLong(col("qq"), col("qc"))
          .cast("double").as("sim"))
      .groupBy(col("query_id"))
      .agg(graft.functions.topKByScore(col("sim"), col("neighbor_id"), 100).as("top"))
      .select(col("query_id"), explode(col("top.neighbor_id")).as("neighbor_id"))
    val fq = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), Ann.asDouble(col("embedding")).as("qvec"))
    val cascRef = rows(rescoreTopK(cascStage1, fq, 10))
    assert(rows(LlmOps.qAnnCascade(spark, sfDir)) == cascRef,
      "collapsed E21 face diverged from the uncollapsed no-cutoff plan")
  }

  test("clone-adaptive dispatch (r17): collapse engages on a compressing corpus, not on a clone-free one") {
    import spark.implicits._
    val dims = 8
    def writeCorpus(name: String, vecOf: Int => Int): String = {
      val dir = java.nio.file.Files.createTempDirectory(name).toString
      (0 until 200).map { i =>
        (i.toLong, Array.tabulate(dims)(j => if (j == vecOf(i) % dims) 1.0 else 0.1 * vecOf(i)))
      }.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    // 200 distinct vectors -> ratio 1.0 -> the face must run the brute
    // plan (no membership expansion in the physical plan); 20 distinct
    // vectors x 10 clones -> ratio 0.1 -> the collapse must engage.
    val freeDir = writeCorpus("gmfree", identity)
    val cloneDir = writeCorpus("gmclone", _ % 20)
    def planOf(dir: String): String =
      LlmOps.qAnnTopK(spark, dir).queryExecution.toString
    val freePlan = planOf(freeDir)
    val clonePlan = planOf(cloneDir)
    assert(!freePlan.contains("__mids"),
      "clone-free corpus dispatched to the collapsed plan — the dispatch is paying the expansion premium for nothing")
    assert(clonePlan.contains("__mids"),
      "clone-compressing corpus dispatched to the brute plan — the dispatch lost the 100x collapse win")
    // and the two plans agree with each other where they overlap in
    // content: each face's rows are pinned against brute elsewhere;
    // here pin that BOTH dispatch branches yield self-free contiguous
    // ranks on their own corpus (cheap smoke on the planted dirs)
    Seq(freeDir, cloneDir).foreach { d =>
      val rs = LlmOps.qAnnTopK(spark, d).collect()
      assert(rs.nonEmpty)
      assert(rs.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    }
  }
}
