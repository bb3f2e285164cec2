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

  /** Unit-normalize then quantize at the FIXED scale 127 (E19's search
    * lanes): q_i = floor(127·x_i/‖x‖ + 0.5) as array<bigint>. Unlike the
    * per-vector adaptive scale above (best for STORAGE reconstruction),
    * the fixed post-normalization scale makes the integer dot product
    * Σ q_a·q_b a rank proxy for cosine — the shared scale cancels in
    * ranking, so scores compare ACROSS corpus vectors. The norm fold is
    * a left fold from 0.0 (bit-identical to the oracle's list_reduce
    * over squares: IEEE 0+y = y), computed once per row in its own
    * projection, not once per lane inside the transform lambda. */
  def unitInt8(df: DataFrame, idCol: String, embCol: String,
      out: String): DataFrame =
    df.select(col(idCol), Ann.asDouble(col(embCol)).as("__v"))
      .withColumn("__nrm",
        sqrt(aggregate(col("__v"), lit(0.0), (a, x) => a + x * x)))
      .select(col(idCol),
        when(col("__nrm") === 0.0, transform(col("__v"), _ => lit(0L)))
          .otherwise(transform(col("__v"),
            x => floor(x * lit(127.0) / col("__nrm") + lit(0.5)).cast("long")))
          .as(out))
}
