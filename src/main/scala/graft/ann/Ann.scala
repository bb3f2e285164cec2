package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.cosineSim

/** Similarity search over an embedding column (SURVEY.md §2 E-block).
  *
  * E1 brute-force is the exact baseline: broadcast the (small) query set
  * against the corpus — the corpus side streams, nothing shuffles until the
  * per-query top-k (keyed on query_id, k rows each).
  *
  * E2 LSH is the scale path: random-hyperplane signatures bucket the corpus
  * ONCE (map-side); queries probe only their own bucket, so the candidate
  * set per query is corpus/2^planes on average. Recall is tunable with
  * multi-probe (flip one sign bit) — implemented as `probes = 1 + planes`.
  */
object Ann {

  /** Cast a float embedding to double for engine-stable arithmetic. */
  def asDouble(emb: Column): Column = transform(emb, x => x.cast("double"))

  /** E1: exact top-k cosine neighbors for each query row.
    * `queries`: (query_id, qvec); `corpus`: (idCol, embCol). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosineSim(col("qvec"), col(embCol)).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** D5 exact baseline: ALL pairs with cosine similarity above a
    * threshold. O(N²) with one side broadcast — correct and fast while
    * one side fits in memory (the oracle-checked reference semantics);
    * beyond that use [[nearDupPairsLsh]], which bounds candidates by
    * bucket. */
  def nearDupPairs(corpus: DataFrame, idCol: String, embCol: String, tau: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), asDouble(col(embCol)).as("emb_a"))
    val b = corpus.select(col(idCol).as("id_b"), asDouble(col(embCol)).as("emb_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosineSim(col("emb_a"), col("emb_b")).as("sim"))
      .filter(col("sim") > tau)
      .select(col("id_a"), col("id_b"))
  }

  /** D5 scale path: LSH-bucketed near-dup pairs. Both sides bucket
    * map-side; one side additionally probes every 1-bit-flipped bucket;
    * the join keys on bucket equality (a shuffle of (id, bucket, emb)
    * rows, never N² pairs). Approximate: recall follows the hyperplane
    * collision probability 1 - angle/pi per plane — high for genuinely
    * near-duplicate vectors. */
  def nearDupPairsLsh(corpus: DataFrame, idCol: String, embCol: String,
      tau: Double, dims: Int, planes: Int = 8): DataFrame = {
    val bucketed = corpus.select(col(idCol), asDouble(col(embCol)).as("__emb"),
      lshBucket(asDouble(col(embCol)), dims, planes).as("__bucket"))
    val probeFlips = array((lit(0L) +: (0 until planes).map(p => lit(1L << p))).map(identity): _*)
    val probing = bucketed.select(col(idCol).as("id_a"), col("__emb").as("emb_a"),
      explode(transform(probeFlips, f => col("__bucket").bitwiseXOR(f))).as("__bucket"))
    val base = bucketed.select(col("__bucket").as("__bucket_b"),
      col(idCol).as("id_b"), col("__emb").as("emb_b"))
    probing.join(base,
        col("__bucket") === col("__bucket_b") && col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), cosineSim(col("emb_a"), col("emb_b")).as("sim"))
      .filter(col("sim") > tau)
      .select(col("id_a"), col("id_b"))
  }

  /** Random-hyperplane LSH bucket signature: one bit per plane = sign of
    * the dot product with a fixed pseudo-random plane (fused custom
    * codegen expression — graft.functions.expressions.LshBucket). */
  def lshBucket(emb: Column, dims: Int, planes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.LshBucket(
      ColumnBridge.expression(emb), dims, planes))
  }

  /** E2: LSH-bucketed approximate top-k. Queries probe their own bucket
    * plus every 1-bit-flipped neighbor bucket (multi-probe → recall).
    * The query bucket is computed ONCE, then the probe set is built by
    * XOR-flipping the precomputed value. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int, dims: Int, planes: Int = 8): DataFrame = {
    val bucketed = corpus.select(col(idCol), col(embCol),
      lshBucket(col(embCol), dims, planes).as("bucket"))
    val probeBuckets = array((lit(0L) +: (0 until planes).map(p => lit(1L << p))).map(identity): _*)
    val probed = queries
      .withColumn("qbucket", lshBucket(col("qvec"), dims, planes))
      .select(col("query_id"), col("qvec"),
        explode(transform(probeBuckets, flip => col("qbucket").bitwiseXOR(flip))).as("bucket"))
    // a neighbor can surface from several probe buckets — dedupe the
    // candidate PAIRS before scoring so cosine runs once per pair
    val candidates = probed.join(bucketed,
        probed("bucket") === bucketed("bucket") && col("query_id") =!= col(idCol))
      .select(col("query_id"), col("qvec"), col(idCol).as("neighbor_id"), col(embCol))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(asDouble(col("qvec")), asDouble(col(embCol))).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
