package graft.curation

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("decontamination flags exactly the docs sharing an n-gram with the holdout") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"),   // contains holdout 4-gram
      (2L, "completely different content here now"), // clean
      (3L, "short doc"),                             // shorter than n → clean
      (4L, "quick brown fox jumps somewhere else"))  // same 4-gram, shifted
      .toDF("doc_id", "text")
    val holdout = Seq((100L, "a quick brown fox jumps test"))
      .toDF("doc_id", "text")
    val bad = Curation.contaminatedIds(corpus, holdout, "text", "doc_id", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(bad == Set(1L, 4L)) // "quick brown fox jumps" leaks in both
    val clean = Curation.decontaminate(corpus, holdout, "text", "doc_id", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L))
  }

  test("contamination report scores per-holdout leak severity") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // contains holdout 200's grams
      (2L, "unrelated words entirely elsewhere today"))
      .toDF("doc_id", "text")
    val holdout = Seq(
      (100L, "alpha beta gamma delta"),        // 1 gram, fully leaked
      (200L, "alpha beta gamma delta epsilon nope"), // 3 grams, 2 leaked
      (300L, "nothing here matches the corpus text"),// 0 leaked
      (400L, "too short"))                     // < n tokens → 0 grams
      .toDF("doc_id", "text")
    val got = Curation.contaminationReport(corpus, holdout, "text", "doc_id", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(100L) == ((1L, 1L, 1000L)), "verbatim substring scores 1000")
    assert(got(200L) == ((3L, 2L, 666L)), "partial leak is the integer ratio")
    assert(got(300L) == ((3L, 0L, 0L)))
    assert(got(400L) == ((0L, 0L, 0L)), "short docs report zero, not vanish")
  }

  test("contamination report agrees with the decontamination verdict") {
    // any corpus doc flagged by contaminatedIds shares ≥1 gram with SOME
    // holdout doc, so some holdout doc must report n_matched > 0 — and a
    // zero-report across all holdout docs implies nothing was flagged
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val holdout = docs.filter(col("doc_id") % 97 === 0)
    val flagged = Curation.contaminatedIds(corpus, holdout, "text", "doc_id", 4).count()
    val reported = Curation.contaminationReport(corpus, holdout, "text", "doc_id", 4)
      .agg(sum(col("n_matched"))).collect().head.getLong(0)
    assert((flagged > 0) == (reported > 0))
  }

  test("exact per-group sample: n per stratum, stable under repartitioning") {
    import spark.implicits._
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val a = Curation.sampleExactPerGroup(docs, "lang", "text", "doc_id", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.sampleExactPerGroup(docs.repartition(17), "lang", "text", "doc_id", n = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b) // identical selection regardless of physical layout
    val perLang = Curation.sampleExactPerGroup(docs, "lang", "text", "doc_id", n = 5)
      .groupBy("lang").count().collect().map(_.getLong(1))
    assert(perLang.forall(_ == 5L))
  }

  test("quality gate drops the bottom quartile per language, never across strata") {
    import spark.implicits._
    val kept = graft.queries.LlmOps.qQualityGate(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(kept.nonEmpty)
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val total = docs.count()
    // strictly-above-p25 keeps at most 75% and (with ties) can keep less —
    // but never less than half
    assert(kept.length <= total * 3 / 4 + 1 && kept.length >= total / 2)
    // per language, every kept doc beats that language's own cutoff
    val cuts = graft.text.TextAnalysis.qualityScore(docs, "text")
      .groupBy($"lang").agg(expr("percentile(quality_x1000, 0.25)").as("q25"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    kept.foreach { case (_, lang, q) => assert(q > cuts(lang)) }
  }

  test("split assignment is deterministic, content-keyed, and ~proportional per stratum") {
    import spark.implicits._
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val split = Curation.assignSplit("text", Seq("train" -> 8, "val" -> 1, "test" -> 1))
    val out = docs.select($"doc_id", $"lang", split.as("split"))
    // deterministic: two evaluations agree row-for-row
    val a = out.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val b = out.orderBy(rand(7)).collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(a == b)
    // content-keyed: duplicate text always lands in the same split even
    // under different ids
    val dup = Seq((1L, "same words exactly"), (999L, "same words exactly"))
      .toDF("doc_id", "text")
      .select(Curation.assignSplit("text", Seq("train" -> 8, "val" -> 1, "test" -> 1)))
      .collect().map(_.getString(0)).toSet
    assert(dup.size == 1)
    // proportions roughly 80/10/10 overall and within each lang stratum
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.1)
    assert(counts.keySet == Set("train", "val", "test"))
    val perLang = out.groupBy("lang", "split").count().collect()
      .groupBy(_.getString(0))
    perLang.values.foreach { rows =>
      val total = rows.map(_.getLong(2)).sum.toDouble
      val train = rows.find(_.getString(1) == "train").map(_.getLong(2)).getOrElse(0L)
      assert(math.abs(train / total - 0.8) < 0.2)
    }
  }

  test("weighted sampling: deterministic, keep rate rises with quality") {
    val a = graft.queries.LlmOps.qSampleWeighted(spark, sfDir).collect()
    val b = graft.queries.LlmOps.qSampleWeighted(spark, sfDir).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq, "rerun-stable")
    val all = graft.text.TextAnalysis.qualityScore(
      graft.sources.Tables.table(spark, sfDir, "documents"), "text")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("quality_x1000"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = a.map(_.getLong(0)).toSet
    def keepRate(p: Long => Boolean) = {
      val ids = all.filter { case (_, q) => p(q) }.keys
      if (ids.isEmpty) 0.0 else ids.count(kept).toDouble / ids.size
    }
    val median = all.values.toSeq.sorted.apply(all.size / 2)
    val lowRate = keepRate(_ < median)
    val highRate = keepRate(_ >= median)
    assert(highRate > lowRate, s"high-quality docs must survive more often ($highRate vs $lowRate)")
    // expected keep rate = quality/1500; aggregate check within sampling noise
    val expected = all.values.map(_.toDouble / 1500.0).sum
    assert(math.abs(kept.size - expected) < 0.15 * all.size)
  }

  test("temperature sampling: low-resource languages upsampled, budget respected") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val budget = 15000L
    val kept = graft.curation.Curation.temperatureSample(
      docs, "lang", "text", "doc_id", budget).collect()
    // deterministic rerun
    val again = graft.curation.Curation.temperatureSample(
      docs, "lang", "text", "doc_id", budget).collect()
    assert(kept.map(_.getLong(0)).sorted.toSeq == again.map(_.getLong(0)).sorted.toSeq)
    val ppmByLang = kept.map(r => r.getString(1) -> r.getLong(3)).toMap
    val massByLang = graft.text.TextAnalysis.tokenCounts(
      docs.filter(col("text").isNotNull), "text")
      .groupBy(col("lang"))
      .agg(org.apache.spark.sql.functions.sum(col("ws_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // α = 1/2: languages with LESS raw mass get a HIGHER keep probability
    // (keep_ppm ∝ budget·sqrt(T)/T·W = c/sqrt(T))
    val ordered = massByLang.toSeq.sortBy(_._2).map(_._1)
    val ppms = ordered.flatMap(ppmByLang.get)
    assert(ppms.zip(ppms.tail).forall { case (lo, hi) => lo >= hi },
      s"keep_ppm must be non-increasing in language mass: $ordered -> $ppms")
    // kept token mass ≈ budget (hash draw is uniform; generous tolerance)
    val keptTokens = kept.map(_.getLong(2)).sum
    assert(math.abs(keptTokens - budget) < 0.2 * budget,
      s"kept $keptTokens tokens for a $budget budget")
    // every language still represented (the point of upsampling)
    assert(kept.map(_.getString(1)).toSet == massByLang.keySet)
  }

  test("shard manifest: checksum invariant under partitioning, sensitive to content") {
    import org.apache.spark.sql.functions.col
    val a = graft.queries.LlmOps.qShardManifest(spark, sfDir).collect()
    // a wildly different physical layout must produce the identical
    // manifest — XOR checksums are order/partition-independent
    val repartitioned = graft.sources.Tables.table(spark, sfDir, "documents")
      .repartition(17, col("lang"))
    val b = graft.text.TextAnalysis.tokenCounts(
      repartitioned.filter(col("text").isNotNull), "text")
      .select(
        org.apache.spark.sql.functions.pmod(
          graft.functions.polyhash(col("text")),
          org.apache.spark.sql.functions.lit(16L)).as("shard"),
        col("doc_id"), col("ws_tokens"),
        graft.functions.polyhash(col("text")).as("fp"))
      .groupBy(col("shard"))
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum(col("ws_tokens")).as("n_tokens"),
        org.apache.spark.sql.functions.min(col("doc_id")).as("min_doc_id"),
        org.apache.spark.sql.functions.max(col("doc_id")).as("max_doc_id"),
        org.apache.spark.sql.functions.expr("bit_xor(fp)").as("checksum"))
      .orderBy("shard").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // every document is in exactly one shard
    val total = a.map(_.getAs[Long]("n_docs")).sum
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull).count()
    assert(total == docs)
  }

  test("curation pipeline: unique normalized content, gated quality, canonical ids") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.LlmOps.qCurateE2e(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("quality_x1000") >= 300L))
    assert(out.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
    // reconstruct the reference: survivors are exactly the min-id docs of
    // each gated doc's normalized-content group
    val nt = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "  +", " "))
    val gated = graft.text.TextAnalysis.qualityScore(
      graft.sources.Tables.table(spark, sfDir, "documents")
        .filter(col("text").isNotNull), "text")
      .filter(col("quality_x1000") >= 300)
      .select(col("doc_id"), md5(nt).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val canonical = gated.groupBy(_._2).values.map(_.map(_._1).min).toSet
    assert(out.map(_.getLong(0)).toSet == canonical)
  }

  test("gate sweep: monotone in threshold, zero-threshold keeps everything, ppm exact") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.LlmOps.qGateSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("threshold"))
    assert(rows.length == 11)
    val nDocs = graft.sources.Tables.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull).count()
    val t0 = rows.head
    assert(t0.getAs[Long]("threshold") == 0L)
    assert(t0.getAs[Long]("docs_kept") == nDocs, "threshold 0 gates nothing")
    assert(t0.getAs[Long]("docs_kept_ppm") == 1000000L)
    assert(t0.getAs[Long]("tokens_kept_ppm") == 1000000L)
    // a stricter gate can only keep less, in docs AND token mass
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("docs_kept") <= a.getAs[Long]("docs_kept"))
        assert(b.getAs[Long]("tokens_kept") <= a.getAs[Long]("tokens_kept"))
      case _ =>
    }
    // ppm columns recompute from the count columns exactly
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_kept_ppm") ==
        1000000L * r.getAs[Long]("docs_kept") / nDocs)
    }
  }

  test("approx ntile twin: buckets near-equal, assignment monotone in value") {
    import org.apache.spark.sql.functions._
    val tiled = graft.queries.Warehouse.ntileApprox(
      graft.sources.Tables.table(spark, sfDir, "events"), "event_type", "value")
      .select(col("event_type"), col("value"), col("decile")).collect()
    tiled.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val byDecile = rs.groupBy(_.getAs[Long]("decile"))
      assert(byDecile.keySet.subsetOf((1L to 10L).toSet), t)
      // near-equal populations: each bucket within 40% of the ideal tenth
      val ideal = rs.length / 10.0
      byDecile.values.foreach(b =>
        assert(math.abs(b.length - ideal) < 0.4 * ideal + 3, s"$t bucket ${b.length} vs $ideal"))
      // monotone: max(value) of decile d <= min(value) of decile d+2
      val sorted = byDecile.toSeq.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Seq((_, lo), (_, hi)) =>
          assert(lo.map(_.getDouble(1)).max <= hi.map(_.getDouble(1)).min + 1e-9, t)
        case _ =>
      }
    }
  }

  test("soft dedup caps clusters at c, keeps the c smallest ids, spares singletons") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.LlmOps.qDedupSoft(spark, sfDir, c = 2).cache()
    // per cluster: kept count = min(c, size); kept ids are the smallest
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    rows.groupBy(_._2).foreach { case (h, cluster) =>
      val n = cluster.length
      assert(cluster.head._3 == n, s"$h n_copies must equal cluster size")
      val kept = cluster.filter(_._4).map(_._1).sorted
      assert(kept.length == math.min(2, n), s"$h kept ${kept.length} of $n")
      assert(kept.toSeq == cluster.map(_._1).sorted.take(2).toSeq,
        s"$h must keep the smallest ids")
    }
    // c=1 degenerates to D1's keep-min canonical on duplicated clusters
    val c1 = graft.queries.LlmOps.qDedupSoft(spark, sfDir, c = 1)
      .filter(col("kept")).groupBy("content_hash").count()
      .filter(col("count") =!= 1)
    assert(c1.count() == 0, "c=1 keeps exactly one doc per cluster")
    out.unpersist()
  }

  test("soft dedup selects exact long ids past 2^53 (no double collapse)") {
    // 2^53, 2^53+1, 2^53+2 are indistinguishable once cast to double
    // (a −id double score would collapse them); the bounded heap's id
    // lane is an exact Long compare — the c smallest ids must come back
    // precisely, verdict r9 item 7's boundary case
    import spark.implicits._
    val base = 1L << 53
    val dir = java.nio.file.Files.createTempDirectory("soft53").toString
    Seq(
      (base + 3L, "srcA", "dup text"), (base + 1L, "srcA", "dup text"),
      (base, "srcA", "dup text"), (base + 2L, "srcA", "dup text"),
      (base + 4L, "srcB", "solo text"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.LlmOps.qDedupSoft(spark, dir, c = 2).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(rows(base) && rows(base + 1L),
      "the two smallest ids of the duplicate cluster are kept")
    assert(!rows(base + 2L) && !rows(base + 3L),
      "ids adjacent at double precision must still be dropped exactly")
    assert(rows(base + 4L), "singletons survive")
  }

  test("approx ppl buckets: near-terciles, threshold-monotone, full sample ≈ exact") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.LlmOps.qPplBucketsApprox(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (src, docs) =>
      val n = docs.length
      val sizes = docs.groupBy(_._4).view.mapValues(_.length).toMap
      // sampled boundaries: each bucket within 40% of n/3 plus slack
      (0L to 2L).foreach { b =>
        val got = sizes.getOrElse(b, 0)
        assert(math.abs(got - n / 3.0) <= 0.4 * n / 3.0 + 4,
          s"$src bucket $b: $got of $n")
      }
      // threshold monotonicity is exact: min(head) >= max(middle) etc.
      def scores(b: Long) = docs.filter(_._4 == b).map(_._3)
      for (hi <- 0L to 1L; lo = hi + 1 if scores(hi).nonEmpty && scores(lo).nonEmpty)
        assert(scores(hi).min >= scores(lo).max,
          s"$src: bucket $hi must outscore bucket $lo everywhere")
    }
    // sampleMod=1 collects every score: boundaries are exact order
    // statistics, so sizes match the exact face within ties
    val full = graft.queries.LlmOps.qPplBucketsApprox(spark, sfDir, sampleMod = 1L)
      .groupBy("source", "bucket_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = graft.queries.LlmOps.qPplBuckets(spark, sfDir)
      .groupBy("source", "bucket_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    (full.keySet ++ exact.keySet).foreach { k =>
      assert(math.abs(full.getOrElse(k, 0L) - exact.getOrElse(k, 0L)) <= 3,
        s"$k: full-sample ${full.get(k)} vs exact ${exact.get(k)} (ties only)")
    }
  }

  test("ppl buckets: terciles within 1 per source, head outscores tail, monotone") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.LlmOps.qPplBuckets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3),
        r.getString(4)))
    assert(out.nonEmpty)
    assert(out.forall(t => Seq("head", "middle", "tail")(t._4.toInt) == t._5),
      "bucket label must match bucket id")
    out.groupBy(_._2).foreach { case (src, docs) =>
      val sizes = docs.groupBy(_._4).view.mapValues(_.length).toMap
      val n = docs.length
      // exact integer terciles: every bucket within 1 of n/3
      (0L to 2L).foreach { b =>
        val expect = ((b + 1) * n) / 3 - (b * n) / 3
        assert(math.abs(sizes.getOrElse(b, 0) - expect) <= 1,
          s"$src bucket $b: ${sizes.getOrElse(b, 0)} vs ~$expect of $n")
      }
      // monotone: every head score >= every tail score (rank-based carve)
      val heads = docs.filter(_._4 == 0L).map(_._3)
      val tails = docs.filter(_._4 == 2L).map(_._3)
      if (heads.nonEmpty && tails.nonEmpty)
        assert(heads.min >= tails.max - 1e-9,
          s"$src head must outscore tail")
    }
  }

  test("domain cap: at most c per source, kept = the c smallest ids, totals reconcile") {
    val c = 10
    val rows = graft.queries.LlmOps.qDomainCap(spark, sfDir, c).collect()
    val total = graft.sources.Tables.table(spark, sfDir, "documents").count()
    assert(rows.length.toLong == total, "one verdict per document")
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val n = rs.length.toLong
      assert(rs.forall(_.getAs[Long]("n_source") == n),
        s"$src: n_source must equal the group size")
      val kept = rs.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("doc_id"))
      assert(kept.length == math.min(c.toLong, n).toInt,
        s"$src: kept ${kept.length} of $n with cap $c")
      val smallest = rs.map(_.getAs[Long]("doc_id")).sorted.take(c).toSet
      assert(kept.toSet == smallest, s"$src: kept set must be the $c smallest ids")
    }
  }

  test("split leakage: reported hashes truly span splits; content-hash splits report empty") {
    val rows = graft.queries.LlmOps.qSplitLeakage(spark, sfDir).collect()
    assert(rows.nonEmpty, "the sf0.001 corpus plants cross-split chunk reuse")
    // recompute each reported hash's split set from the raw chunks
    val chunks = graft.text.Chunking.chunk(
      graft.sources.Tables.table(spark, sfDir, "documents"),
      "text", "doc_id", size = 16, stride = 16)
      .select(md5(col("chunk_text")).as("h"), col("doc_id"))
      .distinct().collect()
      .map(r => (r.getAs[String]("h"), r.getAs[Long]("doc_id")))
    def split(id: Long): String =
      if (id % 10 < 8) "train" else if (id % 10 < 9) "val" else "test"
    val byHash = chunks.groupBy(_._1)
    rows.foreach { r =>
      val h = r.getAs[String]("h")
      val docs = byHash(h).map(_._2)
      val splits = docs.map(split).distinct.sorted
      assert(splits.length > 1, s"$h does not span splits")
      assert(r.getAs[Long]("n_docs") == docs.length.toLong)
      assert(r.getAs[Long]("n_splits") == splits.length.toLong)
      assert(r.getAs[String]("splits") == splits.mkString(","))
    }
    // completeness: every truly-leaking hash is reported
    val leaking = byHash.filter(_._2.map(x => split(x._2)).distinct.length > 1)
    assert(rows.length == leaking.size,
      s"reported ${rows.length} but corpus leaks ${leaking.size}")
    // under H1's content-hash split the same audit is structurally empty:
    // identical text → identical hash → identical split
    assert(leaking.values.forall(_.map(_._2).distinct.length > 1),
      "a leaking hash must involve more than one document")
  }

  test("lang confusion: cells partition the corpus, shares row-normalize") {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val out = graft.queries.LlmOps.qLangConfusion(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    out.groupBy(_.getAs[String]("declared_lang")).foreach { case (l, cells) =>
      val tot = cells.map(_.getAs[Long]("share_ppm")).sum
      assert(tot > 1000000L - cells.length && tot <= 1000000L,
        s"$l shares must row-normalize: $tot")
    }
  }

  test("minhash tuning: S-curves monotone in s, D2's b16r4 threshold is 0.5") {
    val out = graft.queries.LlmOps.qMinhashTuning(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band"),
        r.getAs[Long]("s_x10"), r.getAs[Double]("collide_prob"),
        r.getAs[Double]("s_threshold")))
    assert(out.length == 7 * 9)
    out.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      val ps = rows.sortBy(_._3).map(_._4)
      ps.zip(ps.tail).foreach { case (a, b) => assert(a <= b + 1e-12) }
    }
    // the shipped D2 config: (1/16)^(1/4) = 0.5 exactly
    val d2 = out.find(r => r._1 == 16L && r._2 == 4L).get
    assert(d2._5 == 0.5, s"b16r4 threshold: ${d2._5}")
    // at s = threshold the collision prob sits near 1−(1−1/b)^b ≈ .63
    val atThr = out.find(r => r._1 == 16L && r._2 == 4L && r._3 == 5L).get._4
    assert(atThr > 0.6 && atThr < 0.7, s"prob at threshold: $atThr")
  }

  test("readability and domain entropy: hand-checked plants, uniform corpus maxes entropy") {
    import spark.implicits._
    // "go. we sit up." → 4 words, 2 sentences, 4 vowel groups:
    // 206.835 − 1.015·2 − 84.6·1 = 120.205
    val dir = java.nio.file.Files.createTempDirectory("read").toString
    Seq((0L, "src0", "go. we sit up."), (1L, "src1", "aa bb"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.LlmOps.qReadability(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), x.getAs[Long]("n_sentences"),
          x.getAs[Long]("n_syllables"), x.getAs[Double]("flesch"))).toMap
    assert(r(0L) == ((4L, 2L, 4L, 120.21)), s"${r(0L)}")
    assert(r(1L)._2 == 1L, "no terminal punctuation still counts one sentence")
    // entropy: the 20-source uniform corpus reads ln(20) nats and ~20
    // effective domains; the 2-source plant reads ln(2)
    val e = graft.queries.LlmOps.qDomainEntropy(spark, sfDir).collect().head
    assert(e.getAs[Long]("n_sources") == 20L)
    assert(math.abs(e.getAs[Double]("entropy_nats") - math.log(20)) < 1e-3)
    assert(math.abs(e.getAs[Double]("effective_domains") - 20.0) < 0.05)
    val e2 = graft.queries.LlmOps.qDomainEntropy(spark, dir).collect().head
    assert(math.abs(e2.getAs[Double]("entropy_nats") - math.log(2)) < 1e-6)
  }

  test("oov rate: planted vocab split counts exactly; covered docs read zero") {
    import spark.implicits._
    val docs = Seq(
      (0L, "src0", "alpha beta gamma"),       // train
      (2L, "src0", "delta echo"),             // train
      (1L, "src0", "alpha beta delta"),       // held-out: fully covered
      (3L, "src0", "alpha zulu yankee zulu")) // held-out: 3/4 OOV
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("oov").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.LlmOps.qOovRate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("oov_ppm"))).toMap
    assert(out(1L) == ((3L, 0L, 0L)), s"covered doc: ${out(1L)}")
    assert(out(3L) == ((4L, 3L, 750000L)), s"3/4 OOV doc: ${out(3L)}")
    assert(!out.contains(0L) && !out.contains(2L), "train docs are not scored")
  }

  test("template clusters: planted slot-varying docs collapse to one template each") {
    val out = graft.queries.LlmOps.qTemplateClusters(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("n_distinct_raw"),
        r.getAs[Long]("sample_doc_id")))
    // 2/5 of 500 docs → two clusters of 100, every raw form distinct —
    // the template signature exact dedup (D1) is blind to
    assert(out.length == 2, s"got ${out.toSeq}")
    out.foreach { case (n, raw, _) =>
      assert(n == 100L && raw == 100L,
        "each planted template collapses 100 distinct raw docs") }
    assert(out.map(_._3).toSet == Set(0L, 1L), "sample ids are the cluster minima")
  }

  test("review sample: k per stratum, gate-consistent, heap-planned, deterministic") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.LlmOps.qReviewSample(spark, sfDir, k = 3)
    val rows = out.collect().map(r => (r.getAs[String]("lang"),
      r.getAs[Boolean]("kept"), r.getAs[Long]("stratum_size"),
      r.getAs[Long]("review_rank"), r.getAs[Long]("doc_id")))
    rows.groupBy(r => (r._1, r._2)).foreach { case ((lang, kept), g) =>
      val n = g.head._3
      assert(g.length == math.min(3L, n), s"($lang, $kept): ${g.length} of $n")
      assert(g.map(_._4).sorted.toSeq == (1L to g.length).toSeq, "dense ranks")
    }
    // gate consistency: kept-stratum docs are exactly H3 survivors
    val gate = graft.queries.LlmOps.qQualityGate(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { case (_, kept, _, _, id) =>
      assert(gate.contains(id) == kept, s"doc $id gate mismatch") }
    // the sample is a bounded-heap aggregate, not a rank window
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "review sampling must not window")
    // deterministic rerun
    val again = graft.queries.LlmOps.qReviewSample(spark, sfDir, k = 3)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("zipf fit: a planted 1/r corpus fits slope −1 with r² ≈ 1; ranks cap at k") {
    import spark.implicits._
    // term_i appears floor(1000/i) times, i = 1..50 — the ideal curve
    val tokens = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"term$i"))
    // spread over docs so the count aggregate actually reduces
    val docs = tokens.grouped(200).zipWithIndex
      .map { case (ts, i) => (i.toLong, "src0", ts.mkString(" ")) }.toSeq
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("zipf").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.queries.LlmOps.qZipfFit(spark, dir).collect().head
    assert(r.getAs[Long]("n_terms") == 50L)
    val slope = r.getAs[Double]("slope")
    assert(slope > -1.05 && slope < -0.95, s"planted 1/r law must fit −1: $slope")
    assert(r.getAs[Double]("r2") > 0.99, s"fit must be tight: $r")
    // k caps the vocabulary: a 600-term corpus reports exactly k ranks
    val wide = (1 to 600).map(i => s"w$i").grouped(100).zipWithIndex
      .map { case (ts, i) => (i.toLong, "src0", ts.mkString(" ")) }.toSeq
      .toDF("doc_id", "source", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("zipf2").toString
    wide.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    assert(graft.queries.LlmOps.qZipfFit(spark, dir2).collect()
      .head.getAs[Long]("n_terms") == 500L)
  }

  test("ngram coverage (F37): planted bigram overlap per lang, short docs emit none") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c", "en"),          // train: bigrams {a b, b c}
      (2L, "d e", "de"),            // train: {d e}
      (1L, "a b x", "en"),          // test en: {a b, b x} -> 1 of 2 covered
      (3L, "d e", "de"),            // test de: {d e} -> covered
      (5L, "z", "fr"))              // test fr: no bigrams -> lang absent
      .map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("ngcov").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.LlmOps.qNgramCoverage(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_test_bigrams"), r.getAs[Long]("n_covered"),
          r.getAs[Long]("coverage_ppm"))).toMap
    assert(out("en") == ((2L, 1L, 500000L)), s"en: ${out("en")}")
    assert(out("de") == ((1L, 1L, 1000000L)), s"de: ${out("de")}")
    assert(!out.contains("fr"), "a test doc with no bigrams scores no lang row")
    // real corpus: ppm bounded and consistent with its own counters
    graft.queries.LlmOps.qNgramCoverage(spark, sfDir).collect().foreach { r =>
      val (n, c, p) = (r.getAs[Long]("n_test_bigrams"), r.getAs[Long]("n_covered"),
        r.getAs[Long]("coverage_ppm"))
      assert(c >= 0L && c <= n && p == c * 1000000L / n)
    }
  }
}
