package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-mixing operators (SURVEY §2 H14–H16): training-order shuffle,
  * epoch planning, exact-quota domain rebalancing. */
class MixSpec extends SparkSpec {

  test("DSIR weights (H31): lambda re-derives from the pinned counts; target-like docs up-weight") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // planted corpus: target (en) speaks alpha-bigrams, the off-domain
    // raw mass speaks beta-bigrams; an unlabeled gamma doc mixing alpha
    // must out-weight one mixing beta
    val alpha = (1 to 30).map(i => s"a$i").mkString(" ")
    val beta = (1 to 30).map(i => s"b$i").mkString(" ")
    val docs = (
      (1 to 10).map(i => (i.toLong, "en", alpha)) ++
      (11 to 20).map(i => (i.toLong, "de", beta)) ++
      Seq((21L, "xx", alpha), (22L, "xx", beta)))
      .toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Mix.qDsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("importance_x1e6"), r.getAs[Long]("n_feats"))).toMap
    assert(out(21L)._1 > out(22L)._1,
      s"alpha-speaking doc must out-weight beta-speaking: ${out(21L)} vs ${out(22L)}")
    assert(out(21L)._2 == 29L && out(22L)._2 == 29L, "30 tokens => 29 bigrams")
    // the pinned model's lambda column re-derives from its OWN stored
    // counts (the non-circular half of the artifact contract): HALF_UP
    // rounding AT THE INTEGER SCALE — round(lnRatio·1e6, 0) — never
    // round-to-6-decimals-then-multiply, whose double can sit one ulp
    // below k/1e6 and truncate to k−1 (the r15 ADVICE defect)
    val lam = spark.read.parquet(
      graft.catalog.Artifacts.path(dir, "dsir_lam2_en_b4096")).collect()
    assert(lam.nonEmpty)
    lam.foreach { r =>
      val (ct, cr, nt, nr) = (r.getAs[Long]("ct"), r.getAs[Long]("cr"),
        r.getAs[Long]("n_target"), r.getAs[Long]("n_raw"))
      val want = BigDecimal(
        (math.log((ct + 1).toDouble / (nt + 4096))
          - math.log((cr + 1).toDouble / (nr + 4096))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP)
      assert(r.getAs[Long]("lam_x1e6") == want.toLong,
        s"bucket ${r.getAs[Long]("bkt")}: stored lambda != re-derivation")
    }
    // importance recomputes as the integer sum of per-gram lambdas
    val lamMap = lam.map(r => r.getAs[Long]("bkt") -> r.getAs[Long]("lam_x1e6")).toMap
    def imp(text: String): Long = {
      val toks = text.split(" ")
      toks.sliding(2).map(_.mkString(" ")).map { g =>
        val h = g.codePoints().toArray.foldLeft(0L)((acc, c) => (acc * 131 + c) % 2147483647L)
        lamMap(math.floorMod(h, 4096L))
      }.sum
    }
    assert(out(21L)._1 == imp(alpha) && out(22L)._1 == imp(beta),
      "per-doc importance must equal the imperative integer fold")
  }

  test("DSIR resample (H32): Gumbel keys re-derive from the pinned artifact; " +
    "a dominant importance gap overrides the noise") {
    import spark.implicits._
    val alpha = (1 to 30).map(i => s"a$i").mkString(" ")
    val beta = (1 to 30).map(i => s"b$i").mkString(" ")
    // 20 alpha-speaking docs (10 en + 10 unlabeled) vs 20 beta-speaking:
    // the per-doc importance gap is ~70 nats, the Gumbel support is
    // [−3.1, +21.5] (u on the mod-M lane), so EVERY alpha doc must
    // out-key every beta doc — the noise reorders within a domain only
    val docs = (
      (1 to 10).map(i => (i.toLong, "en", alpha)) ++
      (11 to 20).map(i => (i.toLong, "de", beta)) ++
      (21 to 40).map(i => (i.toLong, "xx", if (i % 2 == 1) alpha else beta)))
      .toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("dsirres").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Mix.qDsirResample(spark, dir, k = 12).collect()
    assert(out.map(_.getAs[Long]("sample_rank")).toSeq == (1L to 12L),
      "exactly k dense ranks")
    val keys = out.map(r => (r.getAs[Long]("key_x1e6"), r.getAs[Long]("doc_id")))
    assert(keys.sliding(2).forall {
      case Array((k1, d1), (k2, d2)) => k1 > k2 || (k1 == k2 && d1 < d2)
      case _ => true
    }, "ranks follow (key desc, doc_id asc) exactly")
    val alphaIds = ((1 to 10) ++ (21 to 40 by 2)).map(_.toLong).toSet
    assert(out.forall(r => alphaIds(r.getAs[Long]("doc_id"))),
      "all selected docs speak the target domain (importance dominates)")
    // determinism: a rerun (artifact now pinned) is identical
    val again = Mix.qDsirResample(spark, dir, k = 12).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // the pinned key table re-derives end to end on the driver: u from
    // the dsir: drawMix fold, gumbel = HALF_UP micro-nats of −ln(−ln(u)),
    // key = integer addition
    def ph(s: String) =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 131 + c) % 2147483647L)
    def sq(h: Long) = (h * h) % 2147483647L
    val art = spark.read.parquet(
      graft.catalog.Artifacts.path(dir, "dsir_key_en_b4096")).collect()
    assert(art.length == 40)
    art.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val u = r.getAs[Long]("u_draw")
      assert(u == sq(sq(ph(s"dsir:$id"))), s"doc $id: u_draw lane mismatch")
      val g = BigDecimal(
        -math.log(-math.log((u + 1).toDouble / 2147483648.0)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(r.getAs[Long]("gumbel_x1e6") == g, s"doc $id: gumbel mismatch")
      assert(r.getAs[Long]("key_x1e6") ==
        r.getAs[Long]("importance_x1e6") + g, s"doc $id: key != imp + gumbel")
    }
  }

  test("global shuffle is a bijection onto strided positions, deterministic") {
    val out = Mix.qGlobalShuffle(spark, sfDir).cache()
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val n = docs.count()
    assert(out.count() == n, "every doc gets exactly one position")
    assert(out.select("doc_id").distinct().count() == n)
    assert(out.select("global_pos").distinct().count() == n,
      "global positions are unique (strided interleave is injective)")
    // shard must agree with the hash the query derives positions from,
    // and pos must be dense 1..count within each shard
    val dense = out.groupBy("shard")
      .agg(count(lit(1)).as("c"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("c") || col("mn") =!= 1)
    assert(dense.count() == 0, "per-shard positions are dense 1..n_shard")
    // content-hash determinism: a rerun (fresh plan) is identical
    val again = Mix.qGlobalShuffle(spark, sfDir)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
    // pseudo-random balance: no shard hoards the corpus (loose bound —
    // 500 docs over 64 shards, expect ~8/shard; a constant-hash bug
    // would put everything in one shard)
    val maxShard = out.groupBy("shard").count().agg(max("count")).head().getLong(0)
    assert(maxShard < n / 4, s"shard sizes should be spread, max=$maxShard of $n")
    out.unpersist()
  }

  test("epoch plan: targets exhaust the budget and decompose exactly") {
    val plan = Mix.qEpochPlan(spark, sfDir, budgetX = 4).cache()
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull)
    val totalTokens = docs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    val budget = 4L * totalTokens
    val rows = plan.collect()
    val sumTargets = rows.map(_.getAs[Long]("target_tokens")).sum
    // each per-source floor-div loses < 1 token of share; Σ within |sources|
    assert(sumTargets <= budget && budget - sumTargets <= rows.length,
      s"targets $sumTargets should fill budget $budget within ${rows.length}")
    rows.foreach { r =>
      val (t, target) = (r.getAs[Long]("corpus_tokens"), r.getAs[Long]("target_tokens"))
      val (epochs, ppm) = (r.getAs[Long]("full_epochs"), r.getAs[Long]("partial_ppm"))
      assert(epochs == target / t)
      assert(ppm == (target % t) * 1000000L / t)
      assert(ppm >= 0 && ppm < 1000000L)
    }
    // temperature mixing upsamples small domains: every source gets at
    // least one full pass when the budget is 4x the corpus
    assert(rows.forall(_.getAs[Long]("full_epochs") >= 1))
    plan.unpersist()
  }

  test("factored DIV identity: w*(T DIV S) + (w*(T mod S)) DIV S == (w*T) DIV S") {
    // the overflow-safe form qEpochPlan uses must be EXACT, not approximate
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val w = rnd.nextInt(1 << 20).toLong + 1
      val t = rnd.nextInt(1 << 21).toLong + 1
      val s = rnd.nextInt(1 << 10).toLong + 1
      assert(w * (t / s) + (w * (t % s)) / s == (w * t) / s, s"w=$w t=$t s=$s")
    }
  }

  test("domain mix hits per-source quotas exactly with the hash-rank draw") {
    val out = Mix.qDomainMix(spark, sfDir).cache()
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    // recompute the quota arithmetic independently
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = counts.keys.map(s => s -> (if (s.drop(3).toLong % 2 == 0) 3L else 1L)).toMap
    val wSum = w.values.sum
    val nMax = counts.map { case (s, n) => n * wSum / w(s) }.min
    val k = w.map { case (s, ws) => s -> ws * nMax / wSum }
    val got = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    k.filter(_._2 > 0).foreach { case (s, ks) =>
      assert(got.getOrElse(s, 0L) == ks, s"source $s: expected quota $ks, got ${got.get(s)}")
    }
    // survivors are the lowest (hash, id) per source — spot-check one source
    val src = counts.keys.head
    val hashed = docs.filter(col("source") === src)
      .select(col("doc_id"), Mix.selHash(col("doc_id")).as("h"))
      .orderBy("h", "doc_id").limit(k(src).toInt)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = out.filter(col("source") === src)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == hashed, s"survivors for $src must be the ${k(src)} lowest hash ranks")
    out.unpersist()
  }

  test("training order materializes one file per shard, pos-ordered, a bijection") {
    val out = java.nio.file.Files.createTempDirectory("trainorder").toString
    val written = Mix.writeTrainingOrder(spark, sfDir, out)
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    assert(written == docs.count(), "every doc lands in the layout exactly once")
    // one parquet data file per shard directory (one shard = one write task)
    val shardDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty && shardDirs.length <= Mix.ShuffleShards)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: one shard = one file, got ${files.length}")
    }
    // reading a shard file back yields pos order 1..n with the strided
    // global_pos — the loader's zero-sort contract; row order in a
    // single parquet file is the written order
    val expected = Mix.qGlobalShuffle(spark, sfDir)
      .select("doc_id", "shard", "pos", "global_pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._2)
    shardDirs.take(4).foreach { d =>
      val shard = d.getName.stripPrefix("shard=").toInt
      val rows = spark.read.parquet(d.getAbsolutePath)
        .select("doc_id", "pos", "global_pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(rows.map(_._2).toSeq == (1 to rows.length).toSeq,
        s"shard $shard file must be in dense pos order")
      rows.foreach { case (_, pos, gp) =>
        assert(gp == (pos - 1).toLong * Mix.ShuffleShards + shard) }
      // content matches the registered H14 face for this shard
      val exp = expected(shard).sortBy(_._3).map(t => (t._1, t._4))
      assert(rows.map(t => (t._1, t._3)).toSeq == exp.toSeq,
        s"shard $shard rows must be the H14 assignment in global order")
    }
  }

  test("approx domain mix: near-quota, h-prefix monotone, deterministic") {
    val out = Mix.qDomainMixApprox(spark, sfDir).cache()
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    // independent quota arithmetic (same as the exact-face test)
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = counts.keys.map(s => s -> (if (s.drop(3).toLong % 2 == 0) 3L else 1L)).toMap
    val wSum = w.values.sum
    val nMax = counts.map { case (s, n) => n * wSum / w(s) }.min
    val k = w.map { case (s, ws) => s -> ws * nMax / wSum }
    val got = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // near-quota: threshold selection is binomial around the target
    // quantile — allow 4σ (uniform fallback at this scale: σ² ≤ n_s·p(1−p))
    k.foreach { case (s, ks) =>
      val n = counts(s).toDouble
      val p = ks / n
      val tol = math.max(4.0, 4.0 * math.sqrt(n * p * (1 - p)))
      assert(math.abs(got.getOrElse(s, 0L) - ks) <= tol,
        s"source $s: quota $ks, got ${got.getOrElse(s, 0L)} (tol $tol)")
    }
    // monotone h-prefix: within each source the kept set is exactly the
    // docs below a hash threshold — max kept hash < min dropped hash
    val hashed = docs.select(col("doc_id"), col("source"),
      Mix.selHash(col("doc_id")).as("h"))
    val kept = hashed.join(out.select("doc_id"), "doc_id")
      .groupBy("source").agg(max("h").as("max_kept"))
    val dropped = hashed.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("source").agg(min("h").as("min_dropped"))
    val violations = kept.join(dropped, "source")
      .filter(col("max_kept") >= col("min_dropped"))
    assert(violations.count() == 0,
      "selection must be an h-prefix per source (pure threshold filter)")
    // content-hash determinism: a fresh plan is identical
    val again = Mix.qDomainMixApprox(spark, sfDir)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
    out.unpersist()
  }

  test("approx domain mix: full sample degenerates to the exact quotas") {
    // sampleMod=1 samples every doc, so the (k_s·(m+1)) DIV n_s index is
    // the exact k_s-th order statistic and output counts hit k_s exactly
    val full = Mix.domainMixApprox(spark, sfDir, sampleMod = 1L, minSample = 1)
    val exact = Mix.qDomainMix(spark, sfDir)
    val gotFull = full.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotExact = exact.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotFull == gotExact,
      s"full-sample approx must hit the exact per-source quotas: $gotFull vs $gotExact")
    // and the SETS agree, not just the counts: both select the lowest-h
    // prefix (rank ties broken by doc_id can only matter on hash
    // collisions, absent in this corpus)
    val fullIds = full.select("doc_id").collect().map(_.getLong(0)).toSet
    val exactIds = exact.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fullIds == exactIds)
  }

  test("shuffle quality: observed adjacency within the binomial band of the mixed ideal") {
    val r = Mix.qShuffleQuality(spark, sfDir).collect().head
    val nPairs = r.getAs[Long]("n_pairs")
    val samePpm = r.getAs[Long]("same_ppm")
    val expPpm = r.getAs[Long]("expected_ppm")
    // pair accounting: every doc contributes one pair except each
    // nonempty shard's first row
    val shuffled = Mix.qGlobalShuffle(spark, sfDir)
    val nDocs = shuffled.count()
    val nShards = shuffled.select("shard").distinct().count()
    assert(nPairs == nDocs - nShards)
    // a hash shuffle is as good as random: observed collision rate sits
    // within 4 binomial sd of Σp² (a clustered order would be ~1e6)
    val p = expPpm / 1e6
    val sd4 = 4.0 * math.sqrt(p * (1 - p) / nPairs) * 1e6
    assert(math.abs(samePpm - expPpm) <= sd4 + 1,
      s"same $samePpm vs expected $expPpm ± $sd4")
    assert(samePpm < 500000L, "a source-clustered order would approach 1e6")
  }

  test("every id-keyed draw lane (r10+) passes the pair-adjacency audit on sequential ids") {
    // the polyhash-affinity trap shipped five times because each NEW
    // id-keyed lane skipped the audit — this spec closes the loophole at
    // the function level: every prefix lane introduced this round must
    // draw adjacent ids independently (1/4 threshold draw, worst-case
    // sequential ids, 4σ binomial band on the both-drawn pair rate)
    import spark.implicits._
    val n = 40000
    val ids = (0L until n.toLong).toDF("id")
    // pcasmp:/pqsmp: are E23/E25's corpus-sample cutoff lanes (round 11)
    Seq("usmp:", "psi:", "rev:", "fix:", "cursmp:", "pcasmp:", "pqsmp:")
      .foreach { prefix =>
      val flags = ids.select(col("id"),
        (Mix.drawMix(graft.functions.polyhash(
          concat(lit(prefix), col("id").cast("string")))) * lit(4L)
          < lit(2147483647L)).cast("long").as("f"))
        .orderBy("id").collect().map(_.getLong(1))
      val both = flags.zip(flags.tail).count { case (a, b) => a == 1L && b == 1L }
      val p = 1.0 / 16
      val exp = (n - 1) * p
      val sd4 = 4.0 * math.sqrt((n - 1) * p * (1 - p))
      assert(math.abs(both - exp) <= sd4,
        s"lane $prefix: both-drawn pairs $both vs $exp ± $sd4 — an affine" +
          " or single-mixed lane reads far outside this band")
    }
  }

  test("epoch independence (H27): mixed epoch orders decorrelated, raw lanes are NOT") {
    import spark.implicits._
    val n = 20000
    val ids = (0L until n.toLong).toDF("doc_id")
    def pearson(xs: Array[Long], ys: Array[Long]): Double = {
      val nn = xs.length.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxy = xs.zip(ys).map { case (a, b) => a.toDouble * b }.sum
      val sxx = xs.map(a => a.toDouble * a).sum
      val syy = ys.map(a => a.toDouble * a).sum
      (sxy - sx * sy / nn) /
        math.sqrt((sxx - sx * sx / nn) * (syy - sy * sy / nn))
    }
    def order(salt: String, mixed: Boolean): Array[Long] = {
      val h0 = graft.functions.polyhash(
        concat(lit(salt), col("doc_id").cast("string")))
      val h = if (mixed) expr(s"(__h0 * __h0) % 2147483647") else col("__h0")
      ids.withColumn("__h0", h0).withColumn("__h", h)
        .orderBy("doc_id").collect()
        .map(_.getAs[Long]("__h"))
    }
    val band = 4.0 / math.sqrt(n.toDouble)
    // the REGISTERED machinery: single-square-mixed per-epoch salts
    val m0 = order("epoch0:", mixed = true)
    val m1 = order("epoch1:", mixed = true)
    assert(math.abs(pearson(m0, m1)) <= band,
      s"mixed epoch hash lanes must decorrelate: ${pearson(m0, m1)}")
    // the broken control (the shipped affinity-trap class): RAW lanes
    // share the id-digit polyhash tail, so epoch orders correlate hard
    val r0 = order("epoch0:", mixed = false)
    val r1 = order("epoch1:", mixed = false)
    assert(math.abs(pearson(r0, r1)) > 0.3,
      s"the raw-lane control must read far outside the band: ${pearson(r0, r1)}")
    // the registered face: full pair grid, self-consistent shape, and
    // every pair inside the n=|docs| binomial band
    val rows = Mix.qEpochIndependence(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val nDocs = r.getAs[Long]("n").toDouble
      assert(math.abs(r.getAs[Double]("order_corr")) <= 4.0 / math.sqrt(nDocs),
        s"epoch pair ${r.getAs[Long]("epoch_a")}-${r.getAs[Long]("epoch_b")}" +
          s" corr ${r.getAs[Double]("order_corr")} outside the band")
    }
  }

  test("curriculum order: stage monotone in length, stages concatenate, near-quartile sizes") {
    val out = Mix.qCurriculumOrder(spark, sfDir).cache()
    val rows = out.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("ws_tokens"), r.getAs[Long]("stage"),
      r.getAs[Long]("curriculum_pos")))
    val n = rows.length
    assert(n > 0 && rows.map(_._4).distinct.length == n,
      "curriculum positions are unique (a loader can sort by them)")
    assert(rows.forall(r => r._3 >= 1 && r._3 <= 4))
    // stage is the cutoff count — EXACTLY monotone in token length
    val byLen = rows.sortBy(r => (r._2, r._1))
    byLen.zip(byLen.tail).foreach { case (a, b) =>
      assert(a._3 <= b._3, s"stage must be monotone in length: $a vs $b") }
    // stages concatenate: every position in stage k precedes stage k+1
    val maxByStage = rows.groupBy(_._3).view.mapValues(_.map(_._4).max).toMap
    val minByStage = rows.groupBy(_._3).view.mapValues(_.map(_._4).min).toMap
    maxByStage.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) => assert(maxByStage(a) < minByStage(b),
        s"stage $a must fully precede stage $b")
      case _ =>
    }
    // sampled quartiles: each stage within the order-stat band (sample
    // size ≈ n/4 under the default 1/4 draw)
    val tol = 4.0 * math.sqrt(0.25 * 0.75 / math.max(1, n / 4)) * n + 3
    (1L to 4L).foreach { s =>
      val sz = rows.count(_._3 == s)
      assert(math.abs(sz - n / 4.0) <= tol, s"stage $s size $sz vs ${n / 4.0} ± $tol")
    }
    // deterministic rerun
    val again = Mix.qCurriculumOrder(spark, sfDir)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
    out.unpersist()
  }

  test("fixed sample: exactly k, the brute-force k smallest mixed hashes, deterministic") {
    val out = Mix.qSampleFixed(spark, sfDir, k = 37).collect()
      .map(r => (r.getAs[Long]("sample_rank"), r.getAs[Long]("doc_id")))
    assert(out.length == 37, "exact-n contract")
    assert(out.map(_._1).toSeq == (1L to 37L), "dense ranks")
    assert(out.map(_._2).distinct.length == 37)
    // brute force: k smallest (mixed hash, id)
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val expect = docs.select(col("doc_id"),
      Mix.drawMix(graft.functions.polyhash(
        concat(lit("fix:"), col("doc_id").cast("string")))).as("h"))
      .orderBy("h", "doc_id").limit(37)
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_._2).toSet == expect, "heap selection ≡ hash order")
    // determinism
    assert(Mix.qSampleFixed(spark, sfDir, k = 37).collect()
      .map(_.getAs[Long]("doc_id")).toSeq == out.map(_._2).toSeq)
  }

  test("H16c uniformity audit: every draw lane inside the binomial band " +
    "on a sequential-id corpus") {
    // sequential ids are the WORST CASE for a polyhash draw (the affine
    // structure is maximal): pre-fix the raw 'mix:' lane read 666k ppm
    // keep-adjacency vs 555k expected here (clustered, z≈+157) and the
    // sample lanes read ~0 (periodic anti-clustering, z≈−44/−182); the
    // double-square-mixed threshold draws must sit inside 4σ both ways
    val dir = java.nio.file.Files.createTempDirectory("mixuni").toString
    import spark.implicits._
    (0L until 40000L).map(i => (i, "src" + (i % 4))).toDF("doc_id", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Mix.qMixUniformity(spark, dir).collect()
    assert(rows.map(_.getAs[String]("lane")).toSeq ==
      Seq("cur_sample", "dsir_sample", "mix_keep", "mix_sample", "ppl_sample"))
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      assert(n == 40000L - 4L, "one pair per doc except each source's first")
      val obs = r.getAs[Long]("observed_ppm")
      val exp = r.getAs[Long]("expected_ppm")
      val p = exp / 1e6
      val sd4 = 4.0 * math.sqrt(p * (1 - p) / n) * 1e6
      assert(math.abs(obs - exp) <= sd4 + 1,
        s"${r.getString(0)}: obs $obs vs exp $exp ± $sd4 — an affine draw" +
          " lane reads ~p·1e6 (clustered) or ~0 (periodic) here")
    }
  }
}
