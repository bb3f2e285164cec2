package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks: the new operators vs brute-force reference
  * implementations on randomized inputs — beyond the hand-picked spec
  * cases, these sweep edge shapes (empty blocks, all-one-bucket, ties,
  * single-element keys) that example tests miss. Deterministic seeds so
  * failures reproduce. */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("Video.polyhash31 equals the Catalyst polyhash expression on random strings") {
    import spark.implicits._
    // the GVID oracle parity silently rests on this identity: the
    // builder/decoder hash frame bytes with the plain-Scala fold while
    // the DuckDB oracle mirrors the documented Column semantics — any
    // drift between the two folds would break q_video_frames obscurely
    val gen = Gen.listOfN(300, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(20)),
      Gen.listOfN(12, Gen.choose(32.toChar, 126.toChar)).map(_.mkString),
      Gen.const(""),
      Gen.choose(Long.MinValue, Long.MaxValue).map(id => s"vid:$id:3:47")))
    val strings = sample(gen, seed = 88L).distinct
    val viaColumn = strings.toDF("s")
      .select(col("s"), graft.functions.polyhash(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strings.foreach { s =>
      assert(graft.multimodal.Video.polyhash31(s) == viaColumn(s),
        s"fold divergence on ${s.take(40)}")
    }
  }

  test("gridSelfJoin equals naive all-pairs for random block shapes") {
    import spark.implicits._
    // the blocking key must PARTITION ids (the operator's precondition:
    // key = function of the row), so each id draws its block once
    val gen = for {
      nBlocks <- Gen.choose(1, 6)
      ids <- Gen.listOfN(120, Gen.choose(0L, 200L)).map(_.distinct)
      blocks <- Gen.listOfN(201, Gen.choose(0, nBlocks - 1))
    } yield ids.map(id => (s"b${blocks(id.toInt)}", id))
    (1 to 8).foreach { seed =>
      val rows = sample(gen, seed.toLong)
      val df = rows.toDF("blk", "id").repartition(3)
      val chunk = if (seed % 2 == 0) 7 else 1000 // force multi-cell and single-cell
      val rowsOut = dedup.Buckets.gridSelfJoin(df, Seq("blk"), "id", chunkSize = chunk)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val got = rowsOut.toSet
      val expect = rows.groupBy(_._1).values.flatMap { members =>
        val ids = members.map(_._2).distinct
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }.toSet
      assert(got == expect, s"seed=$seed chunk=$chunk")
      // duplicate-free by construction — there is NO dropDuplicates to hide behind
      assert(rowsOut.length == expect.size, s"seed=$seed chunk=$chunk emitted dups")
    }
  }

  test("asOf equals the naive latest-at-or-before scan for random series") {
    import spark.implicits._
    val gen = for {
      lefts <- Gen.listOfN(40, for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      rights <- Gen.listOfN(40, for {
        k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
    } yield (lefts.distinct, rights.map { case (k, t) => (k, t, s"p$k-$t") }
      .distinctBy(r => (r._1, r._2)))
    (1 to 8).foreach { seed =>
      val (lefts, rights) = sample(gen, 100L + seed)
      val leftDf = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val rightDf = rights.toDF("k", "rt", "v")
      val got = operators.AsOfJoin.asOf(leftDf, rightDf, "k", "t", "rt", Seq("v"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
      lefts.zipWithIndex.foreach { case ((k, t), i) =>
        val expect = rights.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        assert(got(i.toLong) == expect, s"seed=$seed left=($k,$t)")
      }
    }
  }

  test("chunked sync union equals single-shot sync for random chunk sizes") {
    import graft.catalog.Streams
    import graft.sync.{Bookmarks, SyncState}
    import graft.target.ApiSink
    val active = sources.Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey"))
    val total = sources.Tables.table(spark, sfDir, "orders").count()
    val cfg = ApiSink.SinkConfig(
      ApiSink.Endpoint("https://example.invalid", "account"),
      callsPerPeriod = 1000000, periodMillis = 1000L, parallelism = 1)
    Seq(97, 333, 1499).foreach { chunkRows =>
      ApiSink.RecordingPoster.reset()
      val r = Pipeline.runIncrementalChunked(spark, sfDir, Streams.visitors,
        active, "o_custkey", new ApiSink.RecordingPoster(), cfg,
        Bookmarks.buildState(SyncState(), Streams.all), chunkRows = chunkRows, nowMs = 1L)
      assert(r.exhausted, s"chunkRows=$chunkRows")
      import scala.jdk.CollectionConverters._
      val pushed = ApiSink.RecordingPoster.calls.asScala.flatMap(_._2).toSeq
      assert(pushed.size.toLong == total, s"chunkRows=$chunkRows pushed=${pushed.size}")
      assert(pushed.distinct.size == pushed.size, s"chunkRows=$chunkRows dup push")
    }
  }

  test("fused long-set jaccard kernel equals set math and the column formulation") {
    import spark.implicits._
    val gen = for {
      xs <- Gen.listOf(Gen.choose(-20L, 20L))
      ys <- Gen.listOf(Gen.choose(-20L, 20L))
    } yield (xs, ys) // small value range → dense duplicates and overlaps
    (1 to 50).foreach { seed =>
      val (xs, ys) = sample(gen, 500L + seed)
      val expect = {
        val (sa, sb) = (xs.toSet, ys.toSet)
        val union = (sa ++ sb).size
        if (union == 0) 0L else 1000L * (sa & sb).size / union
      }
      val kernel = functions.expressions.JaccardKernel
        .jaccardX1000(xs.toArray, ys.toArray)
      assert(kernel == expect, s"seed=$seed xs=$xs ys=$ys")
      val sortedKernel = functions.expressions.JaccardKernel
        .jaccardX1000Sorted(xs.sorted.toArray, ys.sorted.toArray)
      assert(sortedKernel == expect, s"sorted variant seed=$seed")
    }
    // and through the Column path against Dedup.jaccardX1000
    val df = Seq((Seq(1L, 2L, 2L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
    val viaExpr = df.select(functions.longSetJaccard(col("a"), col("b"))).first().getLong(0)
    val viaCols = df.select(dedup.Dedup.jaccardX1000(col("a"), col("b"))).first().getLong(0)
    assert(viaExpr == viaCols && viaExpr == 500L) // {2,3} of {1,2,3,4}
  }

  test("chunking reconstructs the document for any size/stride combination") {
    import spark.implicits._
    val gen = for {
      nTok <- Gen.choose(1, 120)
      size <- Gen.choose(1, 40)
      stride <- Gen.choose(1, size)
    } yield (nTok, size, stride)
    (1 to 10).foreach { seed =>
      val (nTok, size, stride) = sample(gen, seed.toLong)
      val toks = (1 to nTok).map(i => s"t$i")
      val chunks = text.Chunking.chunk(
        Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"),
        "text", "doc_id", size, stride)
        .orderBy("chunk_id")
        .collect().map(r => (r.getLong(1), r.getString(3).split(" ").toSeq))
      // window k starts at k*stride and carries min(size, n - start) tokens
      chunks.foreach { case (k, ctoks) =>
        val start = (k * stride).toInt
        assert(ctoks == toks.slice(start, start + size),
          s"seed=$seed size=$size stride=$stride window=$k")
      }
      // starts cover [0, n): the last window begins before the end, every
      // token is inside some window
      val starts = chunks.map(_._1 * stride)
      assert(starts.last < nTok && chunks.flatMap(_._2).toSet == toks.toSet,
        s"seed=$seed size=$size stride=$stride coverage")
      // non-overlapping config reconstructs the document exactly
      if (stride == size)
        assert(chunks.flatMap(_._2).toSeq == toks, s"seed=$seed reconstruction")
    }
  }

  test("sequence packing conserves tokens and bounds deviation for random budgets") {
    import spark.implicits._
    val gen = for {
      nChunks <- Gen.choose(5, 150)
      maxTok <- Gen.choose(1L, 40L)
      budget <- Gen.choose(maxTok, 300L) // budget >= any single chunk
    } yield (nChunks, maxTok, budget)
    (1 to 6).foreach { seed =>
      val (nChunks, maxTok, budget) = sample(gen, seed.toLong)
      val rnd = new scala.util.Random(seed)
      val chunks = (1 to nChunks).map { i =>
        (i.toLong, 0L, rnd.nextLong().abs % maxTok + 1, s"chunk text $i $seed")
      }.toDF("doc_id", "chunk_id", "n_tokens", "chunk_text")
      val packed = text.Chunking.packSequences(
        chunks, "n_tokens", "chunk_text", Seq("doc_id", "chunk_id"), budget,
        numPartitions = Some(1 + seed % 5))
      val seqs = packed.groupBy("seq_id").agg(sum("n_tokens").as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      assert(seqs.map(_._2).sum == chunks.agg(sum("n_tokens")).head().getLong(0),
        s"seed=$seed conservation")
      // cum-start assignment: every sequence but the last overshoots its
      // budget boundary by less than one chunk and undershoots by less
      // than one chunk
      seqs.dropRight(1).foreach { case (id, t) =>
        assert(t > budget - maxTok && t < budget + maxTok,
          s"seed=$seed seq=$id tokens=$t budget=$budget maxTok=$maxTok")
      }
      // seq ids are contiguous from 0
      assert(seqs.map(_._1).toSeq == (0L until seqs.length.toLong))
    }
  }

  test("split shares converge to the requested proportions on random share vectors") {
    import spark.implicits._
    val docs = (1 to 4000).map(i => s"content number $i with words").toDF("text")
    Seq(Seq("a" -> 1, "b" -> 1), Seq("x" -> 7, "y" -> 2, "z" -> 1)).foreach { shares =>
      val total = shares.map(_._2).sum.toDouble
      val counts = docs.select(curation.Curation.assignSplit("text", shares).as("s"))
        .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.keySet == shares.map(_._1).toSet)
      shares.foreach { case (name, w) =>
        val frac = counts(name) / 4000.0
        assert(math.abs(frac - w / total) < 0.06, s"$shares → $name at $frac")
      }
    }
  }

  test("WavCodec round-trips arbitrary PCM: parse(encode(x)) recovers format and data") {
    val gen = for {
      frames <- Gen.choose(0, 5000)
      rate <- Gen.oneOf(8000, 16000, 44100)
      channels <- Gen.choose(1, 2)
      bytes <- Gen.listOfN(frames * channels * 2, Gen.choose(-128, 127).map(_.toByte))
    } yield (bytes.toArray, rate, channels)
    (1 to 12).foreach { seed =>
      val (pcm, rate, channels) = sample(gen, seed.toLong)
      val wav = multimodal.Binary.WavCodec.encodePcm(pcm, rate, channels, 16)
      val parsed = multimodal.Binary.WavCodec.parse(wav)
      assert(parsed.isDefined, s"seed=$seed")
      val p = parsed.get
      assert(p.sampleRate == rate && p.channels == channels && p.bitsPerSample == 16)
      assert(p.dataLength == pcm.length)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(wav, p.dataOffset, p.dataOffset + p.dataLength),
        pcm), s"seed=$seed data bytes must round-trip exactly")
      // and the JDK's own reader agrees on the container we wrote
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      assert(in.getFormat.getSampleRate.toInt == rate &&
        in.getFormat.getChannels == channels)
      in.close()
    }
    // fuzz: random garbage never throws, PCM-less containers fall through
    val junkGen = Gen.listOfN(200, Gen.choose(-128, 127).map(_.toByte))
    (1 to 20).foreach { seed =>
      val junk = sample(junkGen, 100L + seed).toArray
      assert(multimodal.Binary.WavCodec.parse(junk).isEmpty || junk.length >= 44)
    }
  }

  test("packed keep-min recovers (doc_id, quality, bucket) for boundary values") {
    import spark.implicits._
    val gen = for {
      id <- Gen.oneOf(Gen.choose(0L, 1L << 47), Gen.oneOf(0L, 1L, (1L << 48) - 1))
      q <- Gen.choose(0L, 1500L)
      ph <- Gen.choose(0L, 9L)
    } yield (id, q, ph)
    val rows = (1 to 40).map(s => sample(gen, s.toLong))
    val df = rows.toDF("doc_id", "q", "ph")
      .select((shiftleft($"doc_id", 15)
        .bitwiseOR(shiftleft($"q", 4)).bitwiseOR($"ph")).as("p"))
      .select(
        shiftrightunsigned($"p", 15).as("doc_id"),
        shiftrightunsigned($"p", 4).bitwiseAND(lit(0x7ffL)).as("q"),
        $"p".bitwiseAND(lit(0xfL)).as("ph"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(df.toSeq == rows, "pack/unpack must be the identity on the bit budget")
    // min over packed longs == min_by doc_id (doc_id dominates the high bits)
    val minPacked = rows.map { case (id, q, ph) => (id << 15) | (q << 4) | ph }.min
    val byMinId = rows.minBy(_._1)
    assert((minPacked >>> 15) == byMinId._1)
  }

  test("fuzzy join equals brute-force levenshtein pairs on random small-alphabet strings") {
    import spark.implicits._
    // a 3-letter alphabet and short lengths force dense distance-1/2
    // neighborhoods — the regime where a blocking bug would show
    val word = for {
      n <- Gen.choose(1, 7)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val gen = Gen.listOfN(60, word)
    for (seed <- 1 to 6; d <- Seq(1, 2)) {
      val names = sample(gen, seed.toLong)
      val df = names.toDF("name").repartition(3)
      val got = operators.FuzzyJoin.editDistancePairs(df, "name", d)
        .orderBy("name_a", "name_b")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val distinct = names.distinct
      val want = (for {
        a <- distinct; b <- distinct if a < b
        dist = levenshteinRef(a, b) if dist <= d
      } yield (a, b, dist.toLong)).sortBy(p => (p._1, p._2))
      assert(got == want, s"seed=$seed d=$d")
      assert(want.nonEmpty, s"seed=$seed d=$d must generate close pairs")
    }
  }

  /** Textbook DP Levenshtein — the independent reference. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val sub = dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1), sub)
    }
    dp(a.length)(b.length)
  }
}
