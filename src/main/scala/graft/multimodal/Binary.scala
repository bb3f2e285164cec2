package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 G3): opaque binary payloads
  * with typed metadata, plus a batched "decode / feature-extract" stage.
  *
  * Real pipelines carry images/audio as parquet `binary` columns next to
  * typed metadata and run batched model inference per partition. The
  * container has no image/audio libraries, so the decode step is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing (schema,
  * partition-wise batching, feature schema) is real and is what's tested.
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
