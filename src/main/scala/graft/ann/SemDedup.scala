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
    * dedup and ANN share one quantizer fit.
    *
    * Round 16: the pair stage runs REP-COLLAPSED (the r15 lossless
    * collapse applied to SemDeDup's within-cell cliques). The k-means
    * FIT stays on the full corpus (collapsing before the fit would
    * move the centroids — weights change the k-means‖ seeding — and
    * with them the cell walls), but cell assignment is a function of
    * the vector alone, so identical vectors share a cell and:
    *
    *  - a non-rep member always has its group's rep as a LOWER-ID
    *    cell-mate at the self-cosine (nonzero: 1 up to one ulp; zero
    *    vector: NaN, ordered above every τ) — when that self-cosine
    *    clears τ the member is a guaranteed drop without entering the
    *    pair stage at all;
    *  - a rep's verdict needs only other GROUPS: any lower-id member
    *    y of group g implies rep_g ≤ y in the same cell with the same
    *    cosine, so rep-vs-rep (plus the members of the rare
    *    un-collapsible groups) decides exactly what member-vs-member
    *    would.
    *
    * Groups whose self-cosine does NOT clear τ (only τ within one ulp
    * of 1 can do that) stay uncollapsed — each member enters the pair
    * stage individually — so the rewrite is exact for EVERY τ, never
    * assumed. Σ|cell∩participants|² replaces Σ|cell|²: on a
    * clone-heavy corpus the quadratic within-cell work shrinks by the
    * squared clone factor while the per-vector verdicts are unchanged. */
  def keepDecisions(idx: Ivf.IvfIndex, idCol: String, tau: Double,
      chunkSize: Int): DataFrame = {
    val groups = idx.assigned.groupBy(col("__emb"))
      .agg(min(col(idCol)).as("__gid"))
      .withColumn("__selfpass", cosineSim(col("__emb"), col("__emb")) >= tau)
      .transform(graft.engine.Materialized.checkpoint)
    val annotated = idx.assigned.join(groups, Seq("__emb"))
      .select(col(idCol), col("cell_id"), col("__emb"),
        col("__gid"), col("__selfpass"))
      .transform(graft.engine.Materialized.checkpoint)
    val participants = annotated
      .filter(!col("__selfpass") || col(idCol) === col("__gid"))
    // cell_id is a FUNCTION of the row (each id in exactly one cell) —
    // gridSelfJoin's partition precondition, so no pair-distinct needed
    val pairs = graft.dedup.Buckets.gridSelfJoin(
      participants.select(col(idCol), col("cell_id")),
      Seq("cell_id"), idCol, chunkSize)
    val embs = participants.select(col(idCol), col("__emb"))
    val dropped = pairs
      .join(embs.select(col(idCol).as("id_a"), col("__emb").as("emb_a")), "id_a")
      .join(embs.select(col(idCol).as("id_b"), col("__emb").as("emb_b")), "id_b")
      .filter(cosineSim(col("emb_a"), col("emb_b")) >= tau)
      .select(col("id_b").as(idCol)) // id_a < id_b: the larger id drops
      .distinct()
      .withColumn("__drop", lit(true))
    annotated.select(col(idCol), col("cell_id"), col("__gid"), col("__selfpass"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell_id"),
        (coalesce(col("__drop"), lit(false)) === false &&
          !(col("__selfpass") && col(idCol) =!= col("__gid"))).as("kept"))
  }
}
