package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 G3): opaque binary payloads
  * with typed metadata, plus a batched "decode / feature-extract" stage.
  *
  * Real pipelines carry images/audio as parquet `binary` columns next to
  * typed metadata and run batched model inference per partition. The
  * IMAGE path is real (javax.imageio decode/resize — [[decodeImageMeta]],
  * [[resizeImages]]); the model-inference "feature" stage stays a
  * clearly-marked deterministic STUB (no inference runtime in this
  * container), sharing the same batched-partition shape so swapping the
  * per-batch body is the only change a real model needs.
  */
object Binary {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String, n_chars: Long)
  final case class MediaFeatures(doc_id: Long, byte_len: Long, head_sum: Long, feature: Array[Float])

  /** Wrap a text table into (binary payload + metadata) — the shape a real
    * multimodal table has (payload would be jpeg/wav bytes). */
  def toMediaTable(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "utf-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      length(col(textCol)).cast("long").as("n_chars"))

  /** Batched decode + feature extraction over the binary column.
    *
    * STUB DECODE: a real implementation hands each batch to an image/audio
    * decoder + model (the mapInPandas pattern); here the "features" are a
    * deterministic function of the bytes so tests can verify the plumbing.
    * The batching shape (partition iterator → fixed-size batches → flat
    * result iterator) is exactly what batched inference needs.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64, featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // === STUB: replace with real batched decode/inference ===
          batch.map { case (id, bytes) =>
            val headSum = bytes.take(16).foldLeft(0L)((acc, b) => acc + (b & 0xff))
            val feature = Array.tabulate(featureDim) { d =>
              if (bytes.isEmpty) 0f
              else bytes(d % bytes.length).toFloat / 127f
            }
            MediaFeatures(id, bytes.length.toLong, headSum, feature)
          }
        }
      }
  }

  /** Oracle-checkable face of the media table: byte length + metadata
    * (the feature stub itself is spec-verified, not oracle-verified). */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(col("doc_id"), length(col("payload")).cast("long").as("byte_len"),
      col("mime"), col("n_chars"))

  final case class ResizedMedia(doc_id: Long, width: Int, height: Int, pixels: Array[Byte])

  /** Batched "resize": fixed-dimension output per record. STUB RESAMPLE —
    * a real implementation decodes and bilinear-resamples each batch (the
    * mapInPandas pattern); here each output pixel deterministically samples
    * the byte at its scaled offset so the shape contract (every row leaves
    * with exactly width×height bytes) is testable. Batching shape identical
    * to [[extractFeatures]]. */
  def resize(media: DataFrame, width: Int, height: Int,
      batchSize: Int = 64): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // === STUB: replace with real batched decode + resample ===
          batch.map { case (id, bytes) =>
            val n = width * height
            val out = Array.tabulate(n) { i =>
              if (bytes.isEmpty) 0.toByte
              else bytes((i.toLong * bytes.length / n).toInt)
            }
            ResizedMedia(id, width, height, out)
          }
        }
      }
  }

  final case class ImageMeta(doc_id: Long, ok: Boolean, width: Int,
      height: Int, channels: Int, mean_r: Double, mean_g: Double,
      mean_b: Double)

  /** Deterministic REAL-image table: one solid-color `width`×`height` PNG
    * per row, color derived from the id (r,g,b = id·37, id·101, id·211
    * mod 256). Real bytes through the real encoder — and because the
    * color function is plain integer arithmetic and PNG is lossless, the
    * decoded metadata is exactly computable by an engine with no image
    * codec at all, which is what makes the G3 decode path ORACLE-checkable
    * (q_image_meta) instead of rows-only. */
  def syntheticImageTable(df: DataFrame, idCol: String,
      width: Int = 16, height: Int = 8, batchSize: Int = 64): DataFrame = {
    require(width > 0 && height > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.grouped(batchSize).flatMap { batch =>
          batch.map { id =>
            val rgb = ((math.floorMod(id * 37, 256).toInt << 16)
              | (math.floorMod(id * 101, 256).toInt << 8)
              | math.floorMod(id * 211, 256).toInt)
            val im = new java.awt.image.BufferedImage(width, height,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) { im.setRGB(x, y, rgb); x += 1 }
              y += 1
            }
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(im, "png", buf)
            (id, buf.toByteArray)
          }
        }
      }
      .toDF("doc_id", "payload")
  }

  /** REAL image decode — the honest codec counterpart to the
    * [[extractFeatures]] stub: each batch's payloads decode through
    * `javax.imageio` (PNG/JPEG/GIF/BMP ship with the JDK — no external
    * native libs), emitting dimensions, channel count, and per-channel
    * mean intensity. Undecodable payloads degrade to an `ok = false` row
    * (a corrupt image must never kill a 100 TB scan — same contract as
    * PERMISSIVE JSON parsing).
    *
    * Same batched-partition shape as the stubs (partition iterator →
    * fixed-size batches → flat result iterator): a model-inference stage
    * swaps the per-batch body, nothing else. ImageIO reader instances are
    * per-JVM; the in-memory `ByteArrayInputStream` path does no disk-cache
    * I/O (`ImageIO.setUseCache(false)` per executor). */
  def decodeImageMeta(media: DataFrame, batchSize: Int = 64): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val img =
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes)))
              catch { case _: java.io.IOException => None }
            img match {
              case Some(im) =>
                val (w, h) = (im.getWidth, im.getHeight)
                var (sr, sg, sb) = (0L, 0L, 0L)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = im.getRGB(x, y)
                    sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                    x += 1
                  }
                  y += 1
                }
                val n = w.toLong * h
                ImageMeta(id, ok = true, w, h, im.getColorModel.getNumComponents,
                  sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
              case None =>
                ImageMeta(id, ok = false, 0, 0, 0, 0.0, 0.0, 0.0)
            }
          }
        }
      }
  }

  /** G3f: ViT-style PATCH GRID extraction over real decoded pixels —
    * the preprocessing step between "image bytes in a column" and
    * "patch embeddings": the image splits into a floor grid of
    * `patchW`×`patchH` tiles (partial edge tiles drop, the standard
    * ViT crop contract) and each patch emits integer luminance stats
    * (Rec.601 ×1000 integer weights, same arithmetic as the dHash
    * path) — sum/min/max are what batch-norm calibration and trivial-
    * patch filtering (solid-color sky/background tiles) consume, and
    * integers make the whole decode→tile→reduce path oracle-checkable
    * bit-for-bit. One batched map-side decode pass, ~patches×8 bytes
    * out per image, pixels never leave the scan — the same scale shape
    * as [[decodeImageMeta]]; undecodable payloads emit no patches. */
  def patchStats(media: DataFrame, patchW: Int, patchH: Int,
      batchSize: Int = 64): DataFrame = {
    require(patchW > 0 && patchH > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            val img =
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes)))
              catch { case _: java.io.IOException => None }
            img.toSeq.flatMap { im =>
              val (gw, gh) = (im.getWidth / patchW, im.getHeight / patchH)
              for (py <- 0 until gh; px <- 0 until gw) yield {
                var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
                var y = py * patchH
                while (y < (py + 1) * patchH) {
                  var x = px * patchW
                  while (x < (px + 1) * patchW) {
                    val rgb = im.getRGB(x, y)
                    val l = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
                      + 114 * (rgb & 0xff)) / 1000
                    sum += l; if (l < mn) mn = l; if (l > mx) mx = l
                    x += 1
                  }
                  y += 1
                }
                (id, py * gw + px, sum, mn, mx)
              }
            }
          }
        }
      }
      .toDF("doc_id", "patch_id", "sum_lum", "min_lum", "max_lum")
  }

  /** REAL resize — decode + area-averaging resample + PNG re-encode, per
    * batch, same degrade contract as [[decodeImageMeta]] (undecodable
    * rows drop; a filter on decodability belongs upstream where the
    * caller can count them). Output payloads are valid PNG bytes of
    * exactly `width`×`height`. */
  def resizeImages(media: DataFrame, width: Int, height: Int,
      batchSize: Int = 64): DataFrame = {
    require(width > 0 && height > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            val img =
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes)))
              catch { case _: java.io.IOException => None }
            img.map { im =>
              val scaled = im.getScaledInstance(width, height,
                java.awt.Image.SCALE_AREA_AVERAGING)
              val out = new java.awt.image.BufferedImage(width, height,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try g.drawImage(scaled, 0, 0, null) finally g.dispose()
              val buf = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", buf)
              (id, width, height, buf.toByteArray)
            }
          }
        }
      }
      .toDF("doc_id", "width", "height", "payload")
  }

  final case class AudioMeta(doc_id: Long, ok: Boolean, sample_rate: Double,
      channels: Int, n_frames: Long, duration_ms: Double, rms: Double)

  /** Lock-free canonical RIFF/WAVE PCM codec for the hot path.
    *
    * `javax.sound.sampled.AudioSystem`'s entry points consult a
    * synchronized SPI provider registry on EVERY call — measured
    * (AudioMicro): 110 µs/encode + 56 µs/decode single-threaded, and
    * under 32 concurrent executor threads throughput collapses to
    * single-thread rates (the 50× smoke's 250k WAVs took 56s — exactly
    * 226 µs/row serial). Parsing the RIFF container directly is ~100
    * bytes of arithmetic with no shared state, so the per-executor-core
    * scaling a 100 TB scan needs survives. Non-WAV containers
    * (AIFF/AU/…) still fall back to AudioSystem in [[decodeAudioMeta]].
    */
  private[graft] object WavCodec {
    /** Canonical 44-byte-header PCM WAV (little-endian). */
    def encodePcm(pcm: Array[Byte], sampleRate: Int, channels: Int,
        bitsPerSample: Int): Array[Byte] = {
      val byteRate = sampleRate * channels * bitsPerSample / 8
      val blockAlign = channels * bitsPerSample / 8
      val out = java.nio.ByteBuffer.allocate(44 + pcm.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1.toShort) // PCM
        .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
        .putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
        .put("data".getBytes("US-ASCII")).putInt(pcm.length)
        .put(pcm)
      out.array()
    }

    final case class Pcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
        dataOffset: Int, dataLength: Int)

    /** Walk the RIFF chunks for `fmt ` + `data`; None for anything that
      * isn't a plain PCM WAV (caller falls back to AudioSystem). */
    def parse(bytes: Array[Byte]): Option[Pcm] = {
      if (bytes.length < 44) return None
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
      var data: Option[(Int, Int)] = None     // (offset, length)
      while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(off)
        val size = b.getInt(off + 4)
        if (size < 0 || off + 8 + size > bytes.length) return None
        id match {
          case "fmt " if size >= 16 =>
            val audioFormat = b.getShort(off + 8).toInt
            if (audioFormat != 1) return None // PCM only on the fast path
            fmt = Some((b.getInt(off + 12), b.getShort(off + 10).toInt,
              b.getShort(off + 22).toInt))
          case "data" => data = Some((off + 8, size))
          case _ => ()
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      for ((rate, ch, bits) <- fmt; (dOff, dLen) <- data
           if ch > 0 && bits % 8 == 0 && bits > 0)
        yield Pcm(rate, ch, bits, dOff, dLen)
    }
  }

  /** REAL audio decode: sample rate, channel count, frame count,
    * duration, and RMS amplitude of the PCM signal. Plain PCM WAVs —
    * the overwhelmingly common case in a training corpus — go through
    * the lock-free [[WavCodec]] parser (the JDK AudioSystem registry
    * serializes concurrent callers; see the WavCodec doc for measured
    * numbers); other containers (AIFF/AU/…) fall back to
    * `javax.sound.sampled`. Undecodable payloads degrade to
    * `ok = false` rows, the same corrupt-input contract as
    * [[decodeImageMeta]]. Batched-partition shape identical to the
    * image path. PCM 16-bit-signed and 8-bit supported. */
  def decodeAudioMeta(media: DataFrame, batchSize: Int = 64): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._

    def rmsOf(data: Array[Byte], off: Int, len: Int, bits: Int,
        bigEndian: Boolean): Double = {
      val bytesPerSample = math.max(1, bits / 8)
      val n = len / bytesPerSample
      var sumSq = 0.0
      var i = 0
      while (i < n) {
        val v: Double =
          if (bits == 16) {
            val o = off + i * 2
            if (bigEndian) ((data(o) << 8) | (data(o + 1) & 0xff)).toShort.toDouble
            else ((data(o + 1) << 8) | (data(o) & 0xff)).toShort.toDouble
          } else data(off + i).toDouble
        sumSq += v * v
        i += 1
      }
      if (n == 0) 0.0 else math.sqrt(sumSq / n)
    }

    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            WavCodec.parse(bytes) match {
              case Some(p) =>
                val frames = p.dataLength / (p.channels * p.bitsPerSample / 8)
                AudioMeta(id, ok = true, p.sampleRate.toDouble, p.channels,
                  frames.toLong, frames * 1000.0 / p.sampleRate,
                  rmsOf(bytes, p.dataOffset, p.dataLength, p.bitsPerSample,
                    bigEndian = false))
              case None =>
                try {
                  val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                    new java.io.ByteArrayInputStream(bytes))
                  try {
                    val fmt = in.getFormat
                    val data = in.readAllBytes()
                    val frames = in.getFrameLength
                    AudioMeta(id, ok = true, fmt.getSampleRate.toDouble,
                      fmt.getChannels, frames,
                      frames * 1000.0 / fmt.getSampleRate,
                      rmsOf(data, 0, data.length, fmt.getSampleSizeInBits,
                        fmt.isBigEndian))
                  } finally in.close()
                } catch {
                  case _: javax.sound.sampled.UnsupportedAudioFileException |
                       _: java.io.IOException =>
                    AudioMeta(id, ok = false, 0.0, 0, 0L, 0.0, 0.0)
                }
            }
          }
        }
      }
  }

  /** Deterministic REAL-audio table: one mono 16-bit PCM WAV per row at
    * 8 kHz — a constant-amplitude signal (amplitude = id·73 mod 16384 +
    * 1000, frames = 4000 + id·13 mod 1000), so RMS equals the amplitude
    * EXACTLY and every metadata field is integer arithmetic an engine
    * with no audio codec can compute — [[decodeAudioMeta]]'s
    * oracle-checkable face (q_audio_meta), the audio twin of
    * [[syntheticImageTable]]. */
  def syntheticAudioTable(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.grouped(batchSize).flatMap { batch =>
          batch.map { id =>
            val amp = (math.floorMod(id * 73, 16384) + 1000).toInt
            val frames = (4000 + math.floorMod(id * 13, 1000)).toInt
            val pcm = new Array[Byte](frames * 2)
            var i = 0
            while (i < frames) {
              pcm(i * 2) = (amp & 0xff).toByte
              pcm(i * 2 + 1) = ((amp >> 8) & 0xff).toByte
              i += 1
            }
            (id, WavCodec.encodePcm(pcm, 8000, 1, 16))
          }
        }
      }
      .toDF("doc_id", "payload")
  }

  /** G3h synthesis: SEGMENTED constant-amplitude PCM — 64 segments ×
    * 125 frames (1 s mono 16-bit @ 8 kHz), one segment per envelope
    * window so ALL 63 contour comparisons carry information, each
    * segment's amplitude a pure integer hash of the doc id (details in
    * the loop comment below), with a PLANTED near-dup structure: ids
    * sharing `id DIV 8` form a group with identical amplitude
    * profiles, and the group's last member (`id % 8 = 7`) perturbs
    * exactly ONE segment (+12000, always above the max inter-window
    * gap) — an audible edit that moves ≤2 envelope-hash bits. The
    * amplitude formula is replayable in the oracle with NO audio
    * codec, the same proof shape as [[syntheticAudioTable]]/G3b. */
  def syntheticSegmentedAudioTable(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.grouped(batchSize).flatMap { batch =>
          batch.map { id =>
            val g = id / 8
            val perturbed = math.floorMod(id, 8) == 7
            val pSeg = math.floorMod(g, 64).toInt
            val frames = 8000
            val pcm = new Array[Byte](frames * 2)
            var s = 0
            while (s < 64) {
              // 64 constant-amplitude segments, aligned one-per-envelope-
              // window, each from a per-(group, segment) multiplicative
              // hash + xor-fold — so ALL 63 contour comparisons carry
              // independent information. The first cut (16 segments from
              // an arithmetic progression mod 97) had two scale defects
              // found by the sf0.1 bench: only 97 distinct profiles
              // (hamming-0 clusters grew linearly with the corpus), and
              // even fully-mixed 16-segment profiles leave just 15
              // informative bits, whose hamming≤3 ball is dense (365k
              // accidental pairs at 5000 docs). With 63 informative bits
              // the planted groups are the ONLY pairs at any corpus size
              // (pair output = 28·N/8, linear forever). The +12000 edit
              // always exceeds the 11520 max inter-window gap, so the
              // perturbed member's single-window edit moves its ≤2
              // boundary comparisons and nothing else. Exact-integer
              // replayable in SQL (the oracle recomputes it verbatim).
              val m = math.floorMod(g * 2654435761L, 2147483647L)
              val x = math.floorMod(m * (10007L + 74L * s), 2147483647L)
              val base = ((x ^ (x >> 16)) % 97L * 120L + 1000L).toInt
              val amp = if (perturbed && s == pSeg) base + 12000 else base
              var i = s * 125
              val end = i + 125
              while (i < end) {
                pcm(i * 2) = (amp & 0xff).toByte
                pcm(i * 2 + 1) = ((amp >> 8) & 0xff).toByte
                i += 1
              }
              s += 1
            }
            (id, WavCodec.encodePcm(pcm, 8000, 1, 16))
          }
        }
      }
      .toDF("doc_id", "payload")
  }

  final case class AudioHash(doc_id: Long, ok: Boolean, ehash: Long)

  /** G3h: energy-envelope perceptual hash — the audio analog of the
    * image dHash (G3d): REAL WAV decode through the lock-free
    * [[WavCodec]] parser, mean |amplitude| over 64 equal time windows,
    * bit i (0..62) set iff window i is louder than window i+1 — a
    * 63-bit loudness-CONTOUR signature invariant to global gain-ish
    * edits and stable under local perturbation (one edited segment
    * moves at most its two boundary comparisons). 63 bits, not 64:
    * the oracle engine's left-shift overflows at bit 63, and a
    * contour bit buys nothing there. Undecodable or non-16-bit-mono
    * payloads degrade to ok=false, the codec-family corrupt-input
    * contract. One map pass over the bytes; the hash is 8 bytes/doc —
    * near-dup banding never shuffles audio. */
  def audioEnvelopeHash(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val windows = 64
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) =>
            WavCodec.parse(bytes) match {
              case Some(p) if p.bitsPerSample == 16 && p.channels == 1 &&
                  p.dataLength >= 2 * windows =>
                val n = p.dataLength / 2
                val env = new Array[Long](windows)
                val cnt = new Array[Long](windows)
                var i = 0
                while (i < n) {
                  val o = p.dataOffset + i * 2
                  val v = ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort.toLong
                  val w = (i.toLong * windows / n).toInt
                  env(w) += math.abs(v)
                  cnt(w) += 1
                  i += 1
                }
                var h = 0L
                var j = 0
                while (j < windows - 1) {
                  val a = if (cnt(j) == 0) 0L else env(j) / cnt(j)
                  val b = if (cnt(j + 1) == 0) 0L else env(j + 1) / cnt(j + 1)
                  if (a > b) h |= (1L << j)
                  j += 1
                }
                AudioHash(id, ok = true, h)
              case _ => AudioHash(id, ok = false, 0L)
            }
          }
        }
      }.toDF()
  }

  /** Frame sampling: treat the payload as fixed-size frames and emit every
    * `everyN`-th one as its own row. Fully declarative (sequence +
    * transform + substring over binary run inside whole-stage codegen, and
    * the explode distributes frames across the cluster) — no UDF, because
    * frame slicing, unlike decoding, IS expressible with built-ins. */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int = 1): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    media
      .filter(octet_length(col("payload")) >= frameBytes)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, CAST(octet_length(payload) / $frameBytes AS INT) - 1, $everyN),
             |  i -> substring(payload, i * $frameBytes + 1, $frameBytes))""".stripMargin))
          .as(Seq("sample_idx", "frame")))
      .select(col("doc_id"),
        (col("sample_idx") * everyN).cast("long").as("frame_idx"),
        col("frame"))
  }
}
