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
    * chunks). */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk pigeonhole is only complete for hamming <= 3")
    val sigs = signatures(df, textCol, idCol)
    val banded = sigs.select(col(idCol), col("simhash"),
      posexplode(chunks(col("simhash"))).as(Seq("chunk_idx", "chunk_val")))
    val l = banded.select(col("chunk_idx"), col("chunk_val"),
      col(idCol).as("id_a"), col("simhash").as("sig_a"))
    val r = banded.select(col("chunk_idx").as("ci"), col("chunk_val").as("cv"),
      col(idCol).as("id_b"), col("simhash").as("sig_b"))
    l.join(r, l("chunk_idx") === r("ci") && l("chunk_val") === r("cv") && l("id_a") < r("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
