package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinarySpec extends SparkSpec {

  test("media table: payload bytes round-trip the text, metadata correct") {
    import spark.implicits._
    val df = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val media = Binary.toMediaTable(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(new String(media(1L).getAs[Array[Byte]]("payload"), "UTF-8") == "hello")
    assert(media(1L).getAs[Long]("n_chars") == 5L)
    assert(media(2L).getAs[Array[Byte]]("payload").isEmpty)
  }

  test("feature extraction: deterministic stub features, batched shape") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"document payload $i")).toDF("doc_id", "text")
    val media = Binary.toMediaTable(df, "text", "doc_id")
    val feats = Binary.extractFeatures(media, batchSize = 64, featureDim = 8).collect()
    assert(feats.length == 200)
    val f1 = feats.find(_.doc_id == 1L).get
    val bytes = "document payload 1".getBytes("UTF-8")
    assert(f1.byte_len == bytes.length.toLong)
    assert(f1.head_sum == bytes.take(16).map(_ & 0xff).sum.toLong)
    assert(f1.feature.length == 8)
    // deterministic: rerun gives identical features
    val again = Binary.extractFeatures(media, batchSize = 7, featureDim = 8).collect()
      .find(_.doc_id == 1L).get
    assert(again.feature.sameElements(f1.feature) && again.head_sum == f1.head_sum)
  }

  test("resize: every record leaves with exactly width x height bytes") {
    import spark.implicits._
    val df = Seq((1L, "abcdefghij"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val media = Binary.toMediaTable(df, "text", "doc_id")
    val out = Binary.resize(media, width = 4, height = 2, batchSize = 2).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out.values.forall(r => r.pixels.length == 8 && r.width == 4 && r.height == 2))
    // deterministic sampling: first output pixel is the first byte
    assert(out(1L).pixels(0) == 'a'.toByte)
    assert(out(3L).pixels.forall(_ == 0.toByte)) // empty payload → zero frame
  }

  test("frame sampling slices fixed-size frames declaratively") {
    import spark.implicits._
    // 10-byte payload, 3-byte frames → frames at 0,1,2 (9 bytes); everyN=2 → 0,2
    val df = Seq((1L, "abcdefghij"), (2L, "ab")).toDF("doc_id", "text")
    val media = Binary.toMediaTable(df, "text", "doc_id")
    val frames = Binary.sampleFrames(media, frameBytes = 3, everyN = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"),
        new String(r.getAs[Array[Byte]]("frame"), "UTF-8")))
    assert(frames.toSet == Set((1L, 0L, "abc"), (1L, 2L, "ghi")))
    // doc 2 is shorter than one frame → filtered, not an error
    assert(!frames.exists(_._1 == 2L))
    // no UDF in the plan — frame slicing stays codegen'd
    val plan = Binary.sampleFrames(media, 3, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  /** A real w×h image, PNG- or JPEG-encoded via the same JDK codec the
    * decode path uses — filled with a solid color so channel means are
    * predictable. */
  private def imageBytes(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, format, buf)
    buf.toByteArray
  }

  test("real image decode: dims + channel stats from actual PNG/JPEG bytes") {
    import spark.implicits._
    val red = 0xff0000
    val gray = 0x808080
    val media = Seq(
      (1L, imageBytes(32, 16, red, "png")),
      (2L, imageBytes(8, 8, gray, "jpg")),
      (3L, "definitely not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val metas = Binary.decodeImageMeta(media, batchSize = 2).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).ok && metas(1L).width == 32 && metas(1L).height == 16)
    assert(metas(1L).mean_r == 255.0 && metas(1L).mean_g == 0.0 && metas(1L).mean_b == 0.0)
    assert(metas(1L).channels == 3)
    // JPEG is lossy — solid gray must round-trip to ~gray, not exactly
    assert(metas(2L).ok && metas(2L).width == 8 && metas(2L).height == 8)
    assert(math.abs(metas(2L).mean_r - 0x80) < 4 &&
      math.abs(metas(2L).mean_g - 0x80) < 4 && math.abs(metas(2L).mean_b - 0x80) < 4)
    // garbage bytes degrade to ok=false, never an exception
    assert(!metas(3L).ok && metas(3L).width == 0)
  }

  test("real audio decode: format + RMS from actual WAV bytes, corrupt degrades") {
    import spark.implicits._
    val media = Binary.syntheticAudioTable(
      Seq(5L, 12L).toDF("doc_id"), "doc_id")
      .unionAll(Seq((99L, "not audio at all".getBytes("UTF-8")))
        .toDF("doc_id", "payload"))
    val metas = Binary.decodeAudioMeta(media, batchSize = 2).collect()
      .map(m => m.doc_id -> m).toMap
    // id 5: amplitude 5*73+1000 = 1365, frames 4000+65 = 4065
    assert(metas(5L).ok && metas(5L).sample_rate == 8000.0 && metas(5L).channels == 1)
    assert(metas(5L).n_frames == 4065L && metas(5L).duration_ms == 4065.0 / 8)
    assert(metas(5L).rms == 1365.0, "constant signal: RMS equals amplitude exactly")
    assert(metas(12L).ok && metas(12L).rms == (12 * 73 % 16384 + 1000).toDouble)
    assert(!metas(99L).ok && metas(99L).n_frames == 0L)
  }

  test("non-WAV audio containers decode through the AudioSystem fallback") {
    import spark.implicits._
    // an AIFF (big-endian PCM) — NOT parseable by the lock-free WAV fast
    // path, must round-trip through javax.sound.sampled instead
    val amp = 2000
    val frames = 3000
    val pcm = new Array[Byte](frames * 2)
    for (i <- 0 until frames) { // big-endian 16-bit constant signal
      pcm(i * 2) = ((amp >> 8) & 0xff).toByte
      pcm(i * 2 + 1) = (amp & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, buf)
    val media = Seq((7L, buf.toByteArray)).toDF("doc_id", "payload")
    val m = Binary.decodeAudioMeta(media).collect().head
    assert(m.ok && m.sample_rate == 16000.0 && m.channels == 1)
    assert(m.n_frames == frames.toLong && m.rms == amp.toDouble)
  }

  test("patch stats: floor-grid tiles with integer luminance, corrupt emits nothing") {
    import spark.implicits._
    // 7x5 grayscale PNG with lum(x,y) = 10*y + x: patches of 3x2 form a
    // 2x2 floor grid (column 6 and row 4 drop — the partial-tile crop)
    val im = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 7) {
      val v = 10 * y + x
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", buf)
    val media = Seq((1L, buf.toByteArray), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val out = Binary.patchStats(media, patchW = 3, patchH = 2).collect()
    assert(out.forall(_.getAs[Long]("doc_id") == 1L), "corrupt payload emits no patches")
    assert(out.length == 4, s"2x2 floor grid, got ${out.length}")
    val byId = out.map(r => r.getAs[Int]("patch_id") ->
      (r.getAs[Long]("sum_lum"), r.getAs[Int]("min_lum"), r.getAs[Int]("max_lum"))).toMap
    // patch 0 covers x 0..2, y 0..1: lums {0,1,2,10,11,12}
    assert(byId(0) == ((36L, 0, 12)), s"patch 0: ${byId(0)}")
    // patch 1 covers x 3..5, y 0..1: lums {3,4,5,13,14,15}
    assert(byId(1) == ((54L, 3, 15)))
    // patch 2 covers x 0..2, y 2..3: lums {20,21,22,30,31,32}
    assert(byId(2) == ((156L, 20, 32)))
    assert(byId(3) == ((174L, 23, 35)))
  }

  test("real resize: output payloads are valid PNGs of the target dimensions") {
    import spark.implicits._
    val media = Seq(
      (1L, imageBytes(64, 32, 0x00ff00, "png")),
      (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Binary.resizeImages(media, 16, 16).collect()
    // undecodable rows drop; the resized payload re-decodes at 16x16
    // with the color preserved
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    val bytes = out.head.getAs[Array[Byte]]("payload")
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(im.getWidth == 16 && im.getHeight == 16)
    val rgb = im.getRGB(8, 8)
    assert(((rgb >> 8) & 0xff) == 0xff && ((rgb >> 16) & 0xff) == 0)
  }

  test("video frames: uniform seek-sampling, mean ≡ direct recompute, corrupt degrades") {
    import spark.implicits._
    val ids = Seq(5L, 12L, 100L).toDF("doc_id")
    val table = Video.syntheticVideoTable(ids, "doc_id")
    val out = Video.sampleFrames(table, nSamples = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // 4 samples per video, indices uniformly spread over n_frames
    out.groupBy(_._1).foreach { case (id, rows) =>
      val nFrames = 8 + math.floorMod(id, 16)
      assert(rows.length == 4)
      assert(rows.map(_._2).sorted.toSeq ==
        (0 until 4).map(j => j.toLong * nFrames / 4),
        s"video $id must sample (j*n) DIV 4")
      rows.foreach { case (_, idx, ts, mean, ok) =>
        assert(ok && ts == idx * 100, "ts from the header fps")
        // mean matches recomputing the generative formula directly
        val expect = (0 until 48).map(p =>
          Video.polyhash31(s"vid:$id:$idx:$p") % 256).sum / 48
        assert(mean == expect, s"video $id frame $idx")
      }
    }
    // determinism: a fresh build+sample is identical
    val again = Video.sampleFrames(
      Video.syntheticVideoTable(ids, "doc_id"), nSamples = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(again.sortBy(t => (t._1, t._2)).toSeq ==
      out.map(t => (t._1, t._2, t._4)).sortBy(t => (t._1, t._2)).toSeq)
    // corrupt payloads degrade to an ok=false row, never throw —
    // including a CRAFTED header with valid magic but zero frame area
    // (w=0), which would otherwise divide by zero at scoring time
    val zeroArea = {
      val bb = java.nio.ByteBuffer.allocate(32)
      bb.putInt(Video.Magic).putInt(0).putInt(10).putInt(1)
      bb.array()
    }
    val bad = Seq(
      (1L, "GARBAGE".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, zeroArea)).toDF("doc_id", "payload")
    val degraded = Video.sampleFrames(bad, nSamples = 4).collect()
    assert(degraded.length == 4 && degraded.forall(!_.getBoolean(4)))
  }

  test("video frames: nSamples above nFrames samples every frame once, no duplicates") {
    import spark.implicits._
    // doc_id 0 -> nFrames = 8; oversampling must yield each of the 8
    // frames exactly once ((j*n) DIV m with m = actual count), never
    // duplicate early frames while skipping the tail
    val table = Video.syntheticVideoTable(Seq(0L).toDF("doc_id"), "doc_id")
    val out = Video.sampleFrames(table, nSamples = 100).collect()
      .map(r => r.getLong(1))
    assert(out.sorted.toSeq == (0L to 7L), s"got ${out.toSeq}")
  }

  test("audio envelope hash: siblings identical, perturbed within 2 bits, corrupt flagged") {
    import spark.implicits._
    // one full group (ids 0..7: 7 clean siblings + the perturbed id 7)
    val media = Binary.syntheticSegmentedAudioTable((0L to 7L).toDF("doc_id"), "doc_id")
    val hashes = Binary.audioEnvelopeHash(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Boolean]("ok"), r.getAs[Long]("ehash")))
      .toMap
    assert(hashes.values.forall(_._1), "every synthesized WAV must decode")
    val clean = (0L to 6L).map(hashes(_)._2).distinct
    assert(clean.size == 1, s"unperturbed siblings share one profile: $clean")
    val d = java.lang.Long.bitCount(clean.head ^ hashes(7L)._2)
    assert(d >= 1 && d <= 2,
      s"one-segment edit moves only its boundary comparisons: hamming $d")
    assert(hashes.values.forall(_._2 >= 0L), "63-bit hash never sets the sign bit")
    // corrupt payload degrades, never throws
    val bad = Binary.audioEnvelopeHash(
      Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")).collect()
    assert(bad.length == 1 && !bad(0).getAs[Boolean]("ok"))
  }

  test("audio near-dup: banding finds exactly the all-pairs hamming<=3 set") {
    import spark.implicits._
    val media = Binary.syntheticSegmentedAudioTable((0L until 32L).toDF("doc_id"), "doc_id")
    val sigs = Binary.audioEnvelopeHash(media).filter(org.apache.spark.sql.functions.col("ok"))
      .select("doc_id", "ehash")
    val banded = graft.dedup.SimHash.nearDupPairsFromSigs(sigs, "doc_id", "ehash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = sigs.collect().map(r => r.getLong(0) -> r.getLong(1))
    val allPairs = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(banded == allPairs, s"banding must be complete for hamming<=3")
    assert(allPairs.nonEmpty, "planted groups must produce pairs")
  }

  test("video near-dup: planted sibling groups are exactly the output, slot counts exact") {
    import spark.implicits._
    val ids = (0L until 64L).toDF("doc_id")
    val pairs = graft.queries.LlmOps.videoNearDupPairs(
      Video.frameHashes(Video.syntheticVideoGroupTable(ids, "doc_id")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly the 8 groups x C(8,2) sibling pairs, nothing cross-group
    assert(pairs.length == 8 * 28, s"got ${pairs.length}")
    assert(pairs.forall { case (a, b, _) => a / 8 == b / 8 && a < b })
    // matched-slot counts: pairs touching the edited member (id%8=7)
    // lose exactly one slot IF the edited frame is among the 4 sampled
    pairs.foreach { case (a, b, n) =>
      val g = a / 8
      val nFrames = 8 + g % 16
      val sampled = (0 until 4).map(j => j.toLong * nFrames / 4).toSet
      val editSampled = sampled.contains(g % nFrames)
      val touchesEdited = b % 8 == 7
      val expect = if (touchesEdited && editSampled) 3L else 4L
      assert(n == expect, s"pair ($a,$b): n_match $n, expected $expect")
    }
    // at least one group must actually exercise the 3-slot path
    assert(pairs.exists(_._3 == 3L), "no group sampled its edited frame")
  }

  test("video near-dup: corrupt payloads produce no fingerprints and never pair") {
    import spark.implicits._
    val good = Video.syntheticVideoGroupTable((0L until 16L).toDF("doc_id"), "doc_id")
    val bad = Seq((999L, "JUNK".getBytes("UTF-8")),
      (998L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    assert(Video.frameHashes(bad).count() == 0L)
    val pairs = graft.queries.LlmOps.videoNearDupPairs(
      Video.frameHashes(good.unionAll(bad))).collect()
    assert(pairs.length == 2 * 28)
    assert(pairs.forall(r => r.getLong(0) < 16L && r.getLong(1) < 16L))
  }
}
