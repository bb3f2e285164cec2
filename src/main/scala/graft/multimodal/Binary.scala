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
}
