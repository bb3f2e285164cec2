package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Video frame-sampling over opaque binary payloads (SURVEY.md §2 G3g).
  *
  * Real video codecs don't ship in this container, so the CONTAINER
  * FORMAT is a documented deterministic stand-in ("GVID"): a 16-byte
  * header (width, height, fps, n_frames as big-endian ints) followed by
  * n_frames raw frames of width×height single-channel bytes, each byte
  * derived from the 31-bit polyhash of `"vid:<id>:<frame>:<pixel>"` —
  * the q_image_patches planted-content pattern. What is REAL — and what
  * the operator exists to prove at 100 TB shape — is the Spark side:
  * binary payloads ride an opaque `binary` column, the decoder
  * iterates partitions in fixed-size groups (the G3 batched-partition
  * CONTRACT: rows are handed to the body batch-at-a-time so a model-
  * inference stage swaps in without reshaping the operator — the
  * synthetic body itself needs no per-batch state), parses actual
  * bytes with ByteBuffer (header + frame slicing), the sampling
  * policy picks frames WITHOUT decoding the rest, and output is one
  * row per sampled frame with typed metadata. Swapping the
  * byte-parsing body for an FFmpeg/JNI call changes nothing about the
  * schema, partitioning, or batch shape.
  *
  * Because the frame bytes are polyhash-derived, an engine with no
  * video stack at all can rebuild every sampled frame's statistics from
  * first principles — which is what makes the face [[graft.queries]]
  * oracle-checkable instead of rows-only (the q_image_meta lesson).
  */
object Video {

  /** The same 31-bit fold as graft.functions.polyhash (h·131+byte mod
    * 2³¹−1 over UTF-8), in plain Scala for the builder/decoder side. */
  private[graft] def polyhash31(s: String): Long = {
    val M = 2147483647L
    var h = 0L
    for (b <- s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      h = (h * 131 + (b & 0xff)) % M
    h
  }

  val Magic: Int = 0x47564944 // "GVID"

  /** Deterministic synthetic video table: one GVID blob per row.
    * width = 8, height = 6 fixed; fps = 10; n_frames = 8 + id mod 16
    * (8..23 frames, ~0.8–2.3 s of "footage"). */
  def syntheticVideoTable(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.grouped(batchSize).flatMap { batch =>
          batch.map { id =>
            val (w, h, fps) = (8, 6, 10)
            val nFrames = (8 + math.floorMod(id, 16)).toInt
            val buf = java.nio.ByteBuffer.allocate(16 + nFrames * w * h)
            buf.putInt(Magic).putInt((w << 16) | h).putInt(fps).putInt(nFrames)
            var f = 0
            while (f < nFrames) {
              var p = 0
              while (p < w * h) {
                buf.put((polyhash31(s"vid:$id:$f:$p") % 256).toByte)
                p += 1
              }
              f += 1
            }
            (id, buf.array())
          }
        }
      }
      .toDF("doc_id", "payload")
  }

  /** G3i synthesis: GROUP-KEYED videos — ids sharing `id DIV 8` carry
    * IDENTICAL GVID content (the same footage re-encoded per member),
    * with pixel bytes keyed on the GROUP id so profile diversity scales
    * with N (the G3h audio lesson: a bounded profile space makes
    * accidental clusters grow with the corpus and the benchmark ends up
    * measuring the plant, not the operator — polyhash over the 2³¹
    * group space cannot collapse). The group's last member (id % 8 = 7)
    * carries ONE fully re-rendered frame (index `g mod n_frames`,
    * ':edit'-salted bytes) — an inserted overlay/scene that moves
    * exactly that frame's content hash and no other. */
  def syntheticVideoGroupTable(df: DataFrame, idCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.grouped(batchSize).flatMap { batch =>
          batch.map { id =>
            val g = math.floorDiv(id, 8L)
            val (w, h, fps) = (8, 6, 10)
            val nFrames = (8 + math.floorMod(g, 16)).toInt
            val edited = math.floorMod(id, 8L) == 7L
            val editFrame = math.floorMod(g, nFrames.toLong).toInt
            val buf = java.nio.ByteBuffer.allocate(16 + nFrames * w * h)
            buf.putInt(Magic).putInt((w << 16) | h).putInt(fps).putInt(nFrames)
            var f = 0
            while (f < nFrames) {
              val salt = if (edited && f == editFrame) ":edit" else ""
              var p = 0
              while (p < w * h) {
                // SQUARE-MIX the polyhash before the byte reduction:
                // the raw hash is AFFINE in p (consecutive p → consecutive
                // hashes → a frame's 48 bytes collapse to ~2 degrees of
                // freedom and cross-group videos collide wholesale — the
                // 100× smoke measured 488k spurious pairs); (H² mod M)
                // is nonlinear, so two groups share a frame byte-sequence
                // only on a true 2⁻³¹ prefix-state collision
                val hh = polyhash31(s"vidg:$g:$f:$p$salt")
                buf.put((hh * hh % 2147483647L % 256).toByte)
                p += 1
              }
              f += 1
            }
            (id, buf.array())
          }
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Per-sampled-frame CONTENT hashes — the video fingerprint G3i's
    * near-dup banding joins on: the same uniform-spread O(samples) seek
    * as [[sampleFrames]] (unsampled frames' bytes never touched), each
    * sampled frame's pixel bytes folded through the 31-bit polyhash
    * (h·131 + byte mod 2³¹−1, initial 0 — first-element init in the
    * oracle's list_reduce is identical because byte < modulus). One row
    * per (video, sample slot); corrupt payloads contribute NO rows
    * (their triage lane is [[sampleFrames]]' ok=false — a broken blob
    * must never kill, or pair up in, a 100 TB near-dup scan). */
  def frameHashes(media: DataFrame, nSamples: Int = 4,
      batchSize: Int = 64): DataFrame = {
    require(nSamples > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            val parsed: Option[(Int, Int, Int, Int)] =
              if (bytes == null || bytes.length < 16) None
              else {
                val bb = java.nio.ByteBuffer.wrap(bytes)
                val magic = bb.getInt()
                val wh = bb.getInt()
                val fps = bb.getInt()
                val nFrames = bb.getInt()
                val (w, h) = (wh >>> 16, wh & 0xffff)
                if (magic != Magic || fps <= 0 || nFrames <= 0 ||
                    w <= 0 || h <= 0 ||
                    bytes.length < 16 + nFrames.toLong * w * h) None
                else Some((w, h, fps, nFrames))
              }
            parsed.toSeq.flatMap { case (w, h, _, nFrames) =>
              val frameLen = w * h
              val m = math.min(nSamples, nFrames)
              (0 until m).map { j =>
                val idx = (j.toLong * nFrames) / m
                val off = 16 + idx.toInt * frameLen
                val M = 2147483647L
                var hh = 0L
                var p = 0
                while (p < frameLen) {
                  hh = (hh * 131 + (bytes(off + p) & 0xff)) % M
                  p += 1
                }
                (id, j.toLong, hh)
              }
            }
          }
        }
      }
      .toDF("doc_id", "j", "frame_hash")
  }

  /** Frame sampling: parse the header, pick `nSamples` uniformly spread
    * frame indices (`(j·n_frames) DIV nSamples`), and emit one row per
    * sampled frame with its timestamp and mean intensity — WITHOUT
    * touching unsampled frames' bytes (the ByteBuffer positions
    * straight to each sampled frame: at deployment that is the
    * keyframe-seek that makes sampling O(samples), not O(frames)).
    * Corrupt payloads (bad magic / truncated) degrade to ok=false rows
    * — a broken video must never kill a 100 TB scan. */
  def sampleFrames(media: DataFrame, nSamples: Int = 4,
      batchSize: Int = 64): DataFrame = {
    require(nSamples > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, bytes) =>
            val parsed: Option[(Int, Int, Int, Int)] =
              if (bytes == null || bytes.length < 16) None
              else {
                val bb = java.nio.ByteBuffer.wrap(bytes)
                val magic = bb.getInt()
                val wh = bb.getInt()
                val fps = bb.getInt()
                val nFrames = bb.getInt()
                val (w, h) = (wh >>> 16, wh & 0xffff)
                // zero-area frames are corrupt too: frameLen = 0 would
                // divide by zero below — degrade, never kill the scan
                if (magic != Magic || fps <= 0 || nFrames <= 0 ||
                    w <= 0 || h <= 0 ||
                    bytes.length < 16 + nFrames.toLong * w * h) None
                else Some((w, h, fps, nFrames))
              }
            parsed match {
              case None =>
                Seq((id, -1L, -1L, -1L, false))
              case Some((w, h, fps, nFrames)) =>
                val frameLen = w * h
                // the divisor is the ACTUAL sample count: with
                // nSamples > nFrames, dividing by nSamples would emit
                // duplicate indices and never reach the tail frames
                val m = math.min(nSamples, nFrames)
                (0 until m).map { j =>
                  val idx = (j.toLong * nFrames) / m
                  val off = 16 + idx.toInt * frameLen
                  var sum = 0L
                  var p = 0
                  while (p < frameLen) {
                    sum += (bytes(off + p) & 0xff)
                    p += 1
                  }
                  (id, idx, idx * 1000L / fps, sum / frameLen, true)
                }
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "ts_ms", "mean_intensity", "ok")
  }
}
