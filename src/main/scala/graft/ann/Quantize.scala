package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage-side counterpart of the ANN
  * operators: at 100 TB an fp32 embedding column is often the single
  * biggest table, and symmetric int8 cuts it 4× while keeping cosine
  * ranking nearly intact (|error| ≤ 1/254 of the per-vector max).
  *
  * Per-vector symmetric scheme: scale = 127 / max|x|, q = round(x·scale).
  * Rounding is written as floor(x+0.5) explicitly — "round half up" has
  * engine-specific variants (half-even, half-away-from-zero), and
  * floor(x+0.5) is the one spelling every engine computes identically, so
  * the oracle matches bit-for-bit. All map-side projection, no shuffle.
  */
object Quantize {

  /** (id, scale_x1e6, q_csv): the scale as an exact integer micro-scale
    * and the int8 lanes as a CSV string (a portable, hash-comparable
    * serialization; parquet int8 arrays re-read as engine-specific list
    * types that defeat value comparison). */
  def int8(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol), Ann.asDouble(col(embCol)).as("__emb"))
      .select(col(idCol), col("__emb"),
        array_max(transform(col("__emb"), x => abs(x))).as("__amax"))
      .select(col(idCol), col("__emb"),
        when(col("__amax") === 0.0, lit(1.0))
          .otherwise(lit(127.0) / col("__amax")).as("__scale"))
      .select(col(idCol),
        floor(col("__scale") * 1e6 + 0.5).cast("long").as("scale_x1e6"),
        array_join(
          transform(col("__emb"),
            x => floor(x * col("__scale") + lit(0.5)).cast("long").cast("string")),
          ",").as("q_csv"))

  /** Reconstruct approximate doubles from the CSV lanes + micro-scale
    * (for error-bound verification: x ≈ q / scale). */
  def dequantize(qCsv: Column, scaleX1e6: Column): Column =
    transform(split(qCsv, ","),
      s => s.cast("double") * lit(1e6) / scaleX1e6.cast("double"))
}
