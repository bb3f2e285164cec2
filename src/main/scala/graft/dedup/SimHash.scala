package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{hamming64, simhash64}

/** SimHash near-duplicate detection (D3): one 64-bit signature per
  * document; near-dups are pairs within a small hamming distance.
  *
  * Candidate generation uses the block-combination pigeonhole (the
  * multi-table scheme of Manku et al., WWW'07): split the signature into 6
  * blocks (~11 bits each); hamming ≤ 3 flips touch at most 3 blocks, so
  * every near-dup pair agrees exactly on some 3 of the 6 blocks — key the
  * self-join on all C(6,3)=20 block triples (~33-bit keys). Versus the
  * naive 4×16-bit chunk scheme, the 20 tables cost 5× the exploded rows
  * but raise bucket entropy from 16 to ~33 bits: on real corpora (whose
  * shared vocabulary makes signature chunks collide heavily) this is the
  * difference between bounded buckets and quadratic mid-size buckets that
  * no cap can rescue. Shuffle carries (id, table_idx, key) rows only.
  */
object SimHash {

  /** Per-document 64-bit SimHash over word-token hashes (custom codegen
    * expression graft.functions.expressions.SimHash64). */
  def signatures(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      simhash64(transform(split(col(textCol), " "), t => xxhash64(t))).as("simhash"))

  /** 6 blocks of 11/11/11/11/10/10 bits covering the 64-bit signature. */
  private val blockBounds: Seq[(Int, Int)] = { // (shift, width)
    val widths = Seq(11, 11, 11, 11, 10, 10)
    widths.scanLeft(0)(_ + _).zip(widths).map { case (shift, w) => (shift, w) }
  }

  private def blockVal(sig: Column, b: Int): Column = {
    val (shift, width) = blockBounds(b)
    shiftrightunsigned(sig, shift).bitwiseAND(lit((1L << width) - 1))
  }

  /** One join key per 3-of-6 block combination: the three block values
    * packed into fixed 11-bit lanes (≤ 33 bits total). */
  private def comboKeys(sig: Column): Column =
    array(Seq(0, 1, 2, 3, 4, 5).combinations(3).toSeq.map { combo =>
      combo.map(blockVal(sig, _))
        .reduce((acc, v) => shiftleft(acc, 11).bitwiseOR(v))
    }: _*)

  /** Static banded index of a corpus — one (corpus_id, corpus_sig,
    * table_idx, table_key) row per document per block-combination table.
    * Build ONCE (persist or write it); the stream-static near-dup gate
    * joins incoming documents against it. */
  def bandedIndex(df: DataFrame, textCol: String, idCol: String): DataFrame =
    signatures(df, textCol, idCol)
      .select(col(idCol).as("corpus_id"), col("simhash").as("corpus_sig"))
      .select(col("corpus_id"), col("corpus_sig"),
        posexplode(comboKeys(col("corpus_sig"))).as(Seq("table_idx", "table_key")))

  /** Near-dup matches of `docs` against a [[bandedIndex]] — STATELESS
    * except the equi-join, so `docs` may be a STREAMING DataFrame
    * (stream-static join): flag documents arriving near-identical to an
    * already-ingested corpus at ingest time, before they enter the
    * training set. Emits one row per (doc, corpus doc, matching table) —
    * distinct per pair downstream if needed (a streaming distinct would
    * need watermark state; flagging tolerates duplicates).
    * The corpus side of the join should be persisted/compacted; the
    * stream side shuffles only (id, sig, key) lanes. */
  def matchesAgainst(index: DataFrame, docs: DataFrame, textCol: String,
      idCol: String, maxHamming: Int = 3): DataFrame =
    matchesAgainstSigs(index,
      signatures(docs, textCol, idCol), idCol, "simhash", maxHamming)

  /** [[bandedIndex]] over an ALREADY-COMPUTED 64-bit signature column —
    * the multimodal corpus index (round-14 G8 extension): image dHash
    * (G3d) and audio envelope hashes (G3h) band identically, so a media
    * corpus becomes stream-probeable through the same 20-table layout. */
  def bandedIndexFromSigs(sigs: DataFrame, idCol: String,
      sigCol: String): DataFrame =
    sigs.select(col(idCol).as("corpus_id"), col(sigCol).as("corpus_sig"))
      .select(col("corpus_id"), col("corpus_sig"),
        posexplode(comboKeys(col("corpus_sig"))).as(Seq("table_idx", "table_key")))

  /** [[matchesAgainst]] for pre-signed rows — the stream side carries
    * (idCol, sigCol) computed map-side (SimHash64 for text; dHash /
    * audioEnvelopeHash run in mapPartitions, which is streaming-legal),
    * so ANY 64-bit locality-sensitive signature family gets the same
    * stateless stream-static near-dup gate: banding explodes the
    * incoming row to its 20 table keys, the equi-join probes the static
    * index, the hamming bound verifies. Emits one row per (row, corpus
    * doc, matching table) like [[matchesAgainst]]. */
  def matchesAgainstSigs(index: DataFrame, sigs: DataFrame, idCol: String,
      sigCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "3-of-6 block pigeonhole is only complete for hamming <= 3")
    val banded = sigs
      .select(col(idCol), col(sigCol).as("__sig"),
        posexplode(comboKeys(col(sigCol))).as(Seq("table_idx", "table_key")))
    banded.join(index, Seq("table_idx", "table_key"))
      .filter(hamming64(col("__sig"), col("corpus_sig")) <= maxHamming)
      .select(col(idCol), col("corpus_id"),
        hamming64(col("__sig"), col("corpus_sig")).as("hamming"))
  }

  /** Near-dup pairs with hamming distance ≤ maxHamming (≤ 3 guaranteed
    * complete by the 3-of-6 block pigeonhole; larger thresholds would need
    * wider combinations).
    *
    * Degenerate buckets (clone clusters collapse every table key) above
    * `maxBucketSize` degrade to star pairs on a canonical id
    * ([[Buckets.cappedSelfJoin]]); star pairs whose endpoints exceed the
    * hamming bound are then filtered like any candidate, trading bounded
    * output for exhaustive-pair recall inside degenerate buckets (clone
    * clusters keep a canonical representative). */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame =
    nearDupPairsFromSigs(signatures(df, textCol, idCol), idCol, "simhash",
      maxHamming, maxBucketSize)

  /** [[nearDupPairs]] over an ALREADY-COMPUTED 64-bit signature column —
    * the banding/capping/verify machinery is hash-agnostic, so any 64-bit
    * locality-sensitive signature (text SimHash, image dHash, …) shares
    * it. Signatures verify via per-DOC join-backs, not by riding the
    * banded explode: carrying them per-pair widens the candidate
    * distinct's exchange (measured 3x slower at 50x) while the id-keyed
    * joins against the small signature table stay cheap. */
  def nearDupPairsFromSigs(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    require(maxHamming <= 3, "3-of-6 block pigeonhole is only complete for hamming <= 3")
    val s = sigs.select(col(idCol), col(sigCol).as("__sig"))
    val banded = s.select(col(idCol),
      posexplode(comboKeys(col("__sig"))).as(Seq("table_idx", "table_key")))
    val pairs = Buckets.cappedSelfJoin(
      banded, Seq("table_idx", "table_key"), idCol, maxBucketSize)
    pairs
      .join(s.select(col(idCol).as("id_a"), col("__sig").as("sig_a")), "id_a")
      .join(s.select(col(idCol).as("id_b"), col("__sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"), hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
