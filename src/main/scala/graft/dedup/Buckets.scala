package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed candidate-pair generation shared by the LSH-family dedup
  * operators (MinHash bands, SimHash chunks): self-join rows that share a
  * bucket key, with a hard cap on degenerate buckets.
  *
  * A bucket of B members contributes B² clique pairs — one boilerplate-heavy
  * bucket can dwarf (or OOM) the whole job at corpus scale. Buckets above
  * `maxBucketSize` emit STAR pairs instead: every member paired with the
  * bucket's minimum id. Clone clusters keep their recall (each member still
  * reaches a canonical representative, and transitively the cluster) at B−1
  * output rows per bucket instead of B².
  *
  * Plan shape: ONE aggregate over the bucket key computes both the bucket
  * size and the canonical min id; the stats join back onto the banded rows
  * is left to Catalyst/AQE (broadcast while the per-bucket stats fit, a
  * key-partitioned shuffle join beyond that). The banded input is cheap to
  * re-derive (a narrow explode over the signature scan), so branches
  * recompute it rather than forcing a window: the windowed alternative
  * (partitionBy bucket + count/min over the whole frame) measured ~3.4x
  * slower end-to-end on a clone-heavy 50x corpus — the sort-derived join
  * children made the following pair-distinct exchange dramatically more
  * expensive — while this shape kept candidate generation at ~24s for
  * ~96M raw pairs.
  */
object Buckets {

  /** Distinct (id_a, id_b) pairs (id_a < id_b) of rows sharing a bucket.
    * `keyCols` name the bucket key columns in `banded`; `idCol` the member
    * id.
    *
    * `carry` names payload columns of `banded` (functions of the id, e.g.
    * a signature) to surface on the output as `<name>_a`/`<name>_b` —
    * verification then needs NO join back to the source (worth it when the
    * payload is small enough to ride the banded explode; keep wide
    * payloads like shingle arrays on the join-back path instead). */
  def cappedSelfJoin(
      banded: DataFrame, keyCols: Seq[String], idCol: String,
      maxBucketSize: Int, carry: Seq[String] = Nil): DataFrame = {
    val keys = keyCols.map(col)
    val outCols = (Seq("id_a", "id_b") ++
      carry.map(c => s"${c}_a") ++ carry.map(c => s"${c}_b")).map(col)
    val stats = banded.groupBy(keys: _*)
      .agg(count(lit(1)).as("__n"), min(col(idCol)).as("__min_id"))
    val annotated = banded.join(stats, keyCols)

    val small = annotated.filter(col("__n") <= maxBucketSize)
    val l = small.select(keys ++ (col(idCol).as("id_a") +:
      carry.map(c => col(c).as(s"${c}_a"))): _*)
    val r = small.select(keyCols.map(c => col(c).as(s"__r_$c")) ++
      (col(idCol).as("id_b") +: carry.map(c => col(c).as(s"${c}_b"))): _*)
    val cliquePairs = l.join(r,
        keyCols.map(c => col(c) === col(s"__r_$c")).reduce(_ && _) &&
          col("id_a") < col("id_b"))
      .select(outCols: _*)

    // star branch: the member row supplies the _b side; the canonical's
    // carry joins back by id — bounded rows, one row per id
    val starBase = annotated.filter(col("__n") > maxBucketSize)
      .filter(col(idCol) =!= col("__min_id"))
      .select(col("__min_id").as("id_a") +: (col(idCol).as("id_b") +:
        carry.map(c => col(c).as(s"${c}_b"))): _*)
    val starPairs =
      if (carry.isEmpty) starBase.select(outCols: _*)
      else starBase.join(
        banded.select(col(idCol).as("id_a") +:
          carry.map(c => col(c).as(s"${c}_a")): _*).dropDuplicates("id_a"),
        "id_a").select(outCols: _*)

    cliquePairs.unionAll(starPairs).dropDuplicates("id_a", "id_b")
  }

  /** EXACT all-pairs within each bucket, distributed: the semantics-
    * preserving counterpart to [[cappedSelfJoin]] for operators whose
    * contract is "every pair in the block" (e.g. exact n-gram Jaccard per
    * blocking key) rather than "good candidates".
    *
    * A B-member bucket's B²/2 pairs are inherent to that contract — what
    * must NOT happen at scale is (a) silently changing the result set
    * (the star degrade) or (b) computing the clique inside one task. Here
    * each bucket is hash-split into ⌈B/chunkSize⌉ chunks and the clique
    * becomes a grid of chunk×chunk cells: a row in chunk c joins as the
    * left of cells (c, j≥c) and as the right of cells (i≤c, c), so every
    * cell is an independent ~chunkSize² unit of work with its own shuffle
    * key — a billion-pair bucket spreads over the cluster instead of one
    * straggler task. Small buckets get nChunks=1 and the plan degenerates
    * to the plain bucket self-join (no explode amplification: the
    * sequence() is a single element).
    *
    * The decomposition is duplicate-free BY CONSTRUCTION, so there is no
    * global pair-distinct (at 312M pairs in the 50× smoke that exchange
    * dominated the whole query): a same-chunk pair exists only in its
    * diagonal cell, where both orders appear and `id_l < id_r` keeps one;
    * a cross-chunk pair exists in exactly one cell (i,j), i<j — the
    * lower-chunk member on the left — normalized via least/greatest.
    * PRECONDITION: the key PARTITIONS the ids — each id appears in
    * exactly one (keys) block, i.e. the blocking key is a function of
    * the row (a source, a prefix, a hash bucket). An id in several
    * blocks would emit its pairs once per shared block; that
    * multi-membership shape is [[cappedSelfJoin]]'s contract (LSH bands),
    * which is why THAT operator ends in a pair-distinct and this one
    * doesn't need to. */
  def gridSelfJoin(
      banded: DataFrame, keyCols: Seq[String], idCol: String,
      chunkSize: Int): DataFrame =
    gridSelfJoinPayload(banded, keyCols, idCol, Nil, chunkSize)

  /** [[gridSelfJoin]] carrying payload columns (e.g. gram arrays) on the
    * pair output as `<name>_a`/`<name>_b` — for operators that FILTER or
    * score every in-block pair (exact Jaccard ≥ τ).
    *
    * The scale contract this exists for: a payload consumed per PAIR must
    * never ride a per-pair exchange. Joining ids first and the payload
    * back per pair sorts Σ B²/2 rows × payload width — at the 100× smoke
    * that is 1.25B pairs × ~430 B gram arrays ≈ 500 GB of sort spill (it
    * filled the disk). Here the payload rides the grid join's LEGS: a doc
    * appears once per cell it meets (~nChunks/2 rows each side, i.e.
    * pairs/chunkSize rows total — 3 orders of magnitude fewer), the
    * cell-keyed exchange carries ~130 MB, and each cell's B²-pair stream
    * is scored/filtered INSIDE the join's output pipeline (one codegen
    * stage, no pair-wide shuffle ever exists). The caller's filter on
    * `<name>_a`/`<name>_b` composes there before any downstream exchange.
    * Payloads follow their id through the least/greatest normalization
    * (a cross-chunk cell can present either order). */
  def gridSelfJoinPayload(
      banded: DataFrame, keyCols: Seq[String], idCol: String,
      payloadCols: Seq[String], chunkSize: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val keys = keyCols.map(col)
    val stats = banded.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
    val annotated = banded.join(stats, keyCols)
      .withColumn("__nchunks",
        ((col("__n") + (chunkSize - 1)) / chunkSize).cast("int"))
      .withColumn("__chunk", pmod(hash(col(idCol)), col("__nchunks")))
    val l = annotated
      .withColumn("__cell_j", explode(sequence(col("__chunk"), col("__nchunks") - 1)))
      .select(keys ++ Seq(col("__chunk").as("__cell_i"), col("__cell_j"),
        col(idCol).as("__id_l")) ++ payloadCols.map(c => col(c).as(s"__l_$c")): _*)
    val r = annotated
      .withColumn("__cell_i", explode(sequence(lit(0), col("__chunk"))))
      .select(keyCols.map(c => col(c).as(s"__r_$c")) ++
        Seq(col("__cell_i").as("__r_cell_i"), col("__chunk").as("__r_cell_j"),
          col(idCol).as("__id_r")) ++ payloadCols.map(c => col(c).as(s"__r_$c")): _*)
    val swap = col("__id_l") < col("__id_r")
    l.join(r,
        keyCols.map(c => col(c) === col(s"__r_$c")).reduce(_ && _) &&
          col("__cell_i") === col("__r_cell_i") &&
          col("__cell_j") === col("__r_cell_j") &&
          (col("__cell_i") =!= col("__cell_j") || col("__id_l") < col("__id_r")) &&
          col("__id_l") =!= col("__id_r"))
      .select(Seq(least(col("__id_l"), col("__id_r")).as("id_a"),
        greatest(col("__id_l"), col("__id_r")).as("id_b")) ++
        payloadCols.flatMap(c => Seq(
          when(swap, col(s"__l_$c")).otherwise(col(s"__r_$c")).as(s"${c}_a"),
          when(swap, col(s"__r_$c")).otherwise(col(s"__l_$c")).as(s"${c}_b"))): _*)
  }
}
