package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{hamming64, simhash64}

/** SimHash near-duplicate detection (D3): one 64-bit signature per
  * document; near-dups are pairs within a small hamming distance.
  *
  * Candidate generation uses the pigeonhole principle: split the signature
  * into 4 16-bit chunks — any pair within hamming ≤ 3 must agree exactly on
  * at least one chunk — so the self-join keys on (chunk_idx, chunk_value)
  * instead of comparing all pairs. Same shuffle profile as MinHash LSH:
  * only (id, chunk) rows move, 4 per document.
  */
object SimHash {

  /** Per-document 64-bit SimHash over word-token hashes (custom codegen
    * expression graft.functions.expressions.SimHash64). */
  def signatures(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      simhash64(transform(split(col(textCol), " "), t => xxhash64(t))).as("simhash"))

  private def chunks(sig: Column): Column =
    array((0 until 4).map(i =>
      shiftrightunsigned(sig, i * 16).bitwiseAND(lit(0xffffL))): _*)

  /** Near-dup pairs with hamming distance ≤ maxHamming (≤ 3 guaranteed
    * complete by the 4-chunk pigeonhole; larger thresholds would need more
    * chunks).
    *
    * Scale note: a 16-bit chunk has only 65,536 distinct values, so at
    * corpus scale every chunk bucket is populated by thousands of
    * documents — an uncapped self-join would emit B² pairs per bucket.
    * Buckets above `maxBucketSize` degrade to star pairs on a canonical id
    * ([[Buckets.cappedSelfJoin]]); star pairs whose endpoints exceed the
    * hamming bound are then filtered like any candidate, trading bounded
    * output for exhaustive-pair recall inside degenerate buckets (clone
    * clusters keep a canonical representative). */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole is only complete for hamming <= 3")
    val sigs = signatures(df, textCol, idCol)
    val banded = sigs.select(col(idCol),
      posexplode(chunks(col("simhash"))).as(Seq("chunk_idx", "chunk_val")))
    val pairs = Buckets.cappedSelfJoin(
      banded, Seq("chunk_idx", "chunk_val"), idCol, maxBucketSize)
    pairs
      .join(sigs.select(col(idCol).as("id_a"), col("simhash").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("simhash").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"), hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
