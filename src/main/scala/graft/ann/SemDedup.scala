package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.cosineSim

/** SemDeDup — semantic deduplication by embedding clustering (Abbas et al.
  * 2023, arXiv:2303.09540): a k-means coarse quantizer partitions the
  * corpus into cells, and pairwise cosine comparison happens ONLY within a
  * cell. A vector is dropped when some LOWER-ID cell-mate sits within
  * `tau` cosine of it — the lowest id of each near-duplicate set survives
  * as the canonical representative (deterministic, rerun-stable; same
  * keep-min convention as the D1/D6 dedup family).
  *
  * This is the embedding-space counterpart of MinHash dedup for the cases
  * hash grams can't see: paraphrases, translations, re-renderings — near
  * duplicates in MEANING with little lexical overlap (reference semantics:
  * the D-block dedup contract applied to the embeddings table).
  *
  * Scale shape: the quantizer fit is MLlib k-means (bounded passes over
  * the distributed corpus, k×dims centroids on the driver); assignment is
  * one map-side pass. Within-cell pairs go through Buckets.gridSelfJoin —
  * each cell's clique is hash-chunked into independent grid cells with
  * their own shuffle keys, so a giant cluster spreads over the executors
  * instead of one straggler task, and the pair count stays Σ|cell|², not
  * N² (cells average N/k; k scales with the corpus). Embeddings join back
  * to the pairs by id (8-byte keys on the pair exchange, vectors ride the
  * two id-keyed joins — the D4 join-back shape). Like any SemDeDup, a
  * near-dup pair STRADDLING two cells is missed; that recall/cost tradeoff
  * is the operator's contract (the exact baseline is D5).
  */
object SemDedup {

  /** Per-vector keep decision: (idCol, cell_id, kept). `kept=false` iff a
    * same-cell neighbor with smaller id has cosine ≥ `tau`. */
  def keepDecisions(corpus: DataFrame, idCol: String, embCol: String,
      nCells: Int, tau: Double, seed: Long = 42L,
      chunkSize: Int = 4096): DataFrame =
    keepDecisions(Ivf.buildIndex(corpus, idCol, embCol, nCells, seed),
      idCol, tau, chunkSize)

  /** Same, over an already-built (possibly memoized/persisted) IVF index —
    * dedup and ANN share one quantizer fit. */
  def keepDecisions(idx: Ivf.IvfIndex, idCol: String, tau: Double,
      chunkSize: Int): DataFrame = {
    // cell_id is a FUNCTION of the row (each id in exactly one cell) —
    // gridSelfJoin's partition precondition, so no pair-distinct needed
    val pairs = graft.dedup.Buckets.gridSelfJoin(
      idx.assigned.select(col(idCol), col("cell_id")),
      Seq("cell_id"), idCol, chunkSize)
    val embs = idx.assigned.select(col(idCol), col("__emb"))
    val dropped = pairs
      .join(embs.select(col(idCol).as("id_a"), col("__emb").as("emb_a")), "id_a")
      .join(embs.select(col(idCol).as("id_b"), col("__emb").as("emb_b")), "id_b")
      .filter(cosineSim(col("emb_a"), col("emb_b")) >= tau)
      .select(col("id_b").as(idCol)) // id_a < id_b: the larger id drops
      .distinct()
      .withColumn("__drop", lit(true))
    idx.assigned.select(col(idCol), col("cell_id"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell_id"),
        coalesce(col("__drop"), lit(false)) === false).toDF(idCol, "cell_id", "kept")
  }
}
