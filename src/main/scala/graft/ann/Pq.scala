package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{pqAdc, pqDistTable, pqEncode, topKByScore}

/** Product quantization (E8, SURVEY.md §2) — the MEMORY-bound ANN scale
  * path (Jégou et al. 2011): each d-dim vector compresses to m codebook
  * ids (m bytes at k ≤ 256), a 32× shrink for float32·64-dim — the
  * difference between an embedding store that fits executor memory at
  * 100 TB corpus scale and one that doesn't. Search is asymmetric
  * (ADC): the query stays full-precision, builds one m·k distance table,
  * and every candidate costs m array lookups.
  *
  * Scale shape: codebooks train on a bounded SAMPLE (m independent
  * per-subspace k-means — FAISS trains on ~100k-1M points regardless of
  * corpus size; the quantizer needs the distribution, not the corpus),
  * then encoding is one map-side pass with the codebooks riding the
  * generated code as a reference object. The scored scan reuses E1's
  * broadcast-queries + bounded-heap-aggregate shape, so the only
  * exchange carries partitions×k rows per query. Composes with IVF
  * (E3) for cell-pruned candidate generation in front — this module is
  * the compressed-scoring half.
  */
object Pq {

  /** Trained product quantizer: flattened m×k×dsub centroid matrix plus
    * its shape. Driver-side object, KBs — broadcast implicitly via the
    * expressions that close over it. */
  final case class PqCodebooks(flat: Array[Double], m: Int, k: Int, dsub: Int)

  /** Fit per-subspace codebooks on a sample of the corpus. Deterministic
    * for a fixed seed and layout (MLlib k-means). `sampleFraction` bounds
    * the training cost independent of corpus size; the m fits each scan
    * only the (dsub-wide) subvector projection of the sample.
    *
    * r17, the cold-fit attribution (SCALE_r16's 159.2s q_pq_topk_cold):
    * the cold/warm gap was never the ADC kernel's codegen — it was this
    * fit running m SEQUENTIAL MLlib k-means (each ~10 Lloyd jobs plus a
    * k-means|| init of ~5 more: ~120 driver-scheduled jobs back to
    * back, mostly scheduling latency at 200k×8-dim inputs). Two fixes,
    * both result-preserving at gate scale:
    *  - the m fits now run CONCURRENTLY (independent inputs, disjoint
    *    output slices, per-subspace seeds — Spark schedules concurrent
    *    jobs from separate threads; results are bit-identical to the
    *    sequential loop at every scale since no fit reads another's
    *    state);
    *  - `maxTrainRows` caps the training sample (the FAISS practice:
    *    k=32 needs thousands of points, not the corpus) so fit cost is
    *    corpus-size-independent. A no-op below the cap — gate corpora
    *    (≤2k vectors) keep sampleFraction 1.0 and the identical pinned
    *    codebooks; the 100× smoke trains on a seeded 65k-row sample. */
  def fit(corpus: DataFrame, embCol: String, m: Int, k: Int,
      seed: Long = 42L, maxIter: Int = 10,
      sampleFraction: Double = 1.0, maxTrainRows: Long = 65536L): PqCodebooks = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Ann.asDouble(col(embCol))
    val dims = corpus.select(size(emb)).head().getInt(0)
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val dsub = dims / m
    val n = corpus.count()
    val frac = math.min(sampleFraction,
      maxTrainRows.toDouble / math.max(1L, n).toDouble)
    val sample =
      if (frac >= 1.0) corpus
      else corpus.sample(withReplacement = false, frac, seed)
    // one narrow materialization feeds all m fits: the full-width
    // embedding is read once, not m times
    val subs = sample.select(
      (0 until m).map(j => slice(emb, j * dsub + 1, dsub).as(s"__s$j")): _*)
      .persist()
    val flat = new Array[Double](m * k * dsub)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(m)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      subs.count() // materialize once before the concurrent readers
      val fits = (0 until m).map { j =>
        scala.concurrent.Future {
          val model = new KMeans()
            .setK(k).setSeed(seed + j).setMaxIter(maxIter)
            .setFeaturesCol("__features")
            .fit(subs.select(array_to_vector(col(s"__s$j")).as("__features")))
          model.clusterCenters.zipWithIndex.foreach { case (v, c) =>
            val a = v.toArray
            var d = 0
            while (d < dsub) { flat((j * k + c) * dsub + d) = a(d); d += 1 }
          }
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fits),
        scala.concurrent.duration.Duration.Inf): Unit
    } finally { pool.shutdown(); subs.unpersist(): Unit }
    PqCodebooks(flat, m, k, dsub)
  }

  /** Persist the trained codebooks (one parquet row: shape + flattened
    * centroid matrix) stamped with the source corpus row count — the
    * train-once artifact a deployment ships instead of refitting m
    * k-means per session (see [[graft.catalog.Artifacts]]). */
  def saveCodebooks(cb: PqCodebooks, spark: org.apache.spark.sql.SparkSession,
      path: String, srcCount: Long): Unit = {
    import spark.implicits._
    Seq((cb.flat.toSeq, cb.m, cb.k, cb.dsub, srcCount))
      .toDF("flat", "m", "k", "dsub", "src_count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load codebooks persisted by [[saveCodebooks]]; None when absent or
    * the stamp disagrees with `srcCount` (stale → caller refits). */
  def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
      path: String, srcCount: Long): Option[PqCodebooks] = {
    if (!graft.catalog.Artifacts.exists(spark, path)) None
    else {
      val rows = spark.read.parquet(path)
        .select("flat", "m", "k", "dsub", "src_count").collect()
      rows.headOption.filter(_.getLong(4) == srcCount).map { r =>
        PqCodebooks(r.getSeq[Double](0).toArray, r.getInt(1), r.getInt(2), r.getInt(3))
      }
    }
  }

  /** Encode every corpus vector to its m codebook ids — one map-side
    * projection ([[graft.functions.pqEncode]]). */
  def encode(corpus: DataFrame, idCol: String, embCol: String,
      cb: PqCodebooks): DataFrame =
    corpus.select(col(idCol),
      pqEncode(Ann.asDouble(col(embCol)), cb.flat, cb.m, cb.k, cb.dsub)
        .as("codes"))

  /** Decoded (reconstructed) vectors — each subvector replaced by its
    * centroid. The quantization-error side of the compression trade;
    * spec fodder, not a hot path. */
  def decode(encoded: DataFrame, idCol: String, cb: PqCodebooks): DataFrame = {
    val cbCol = lit(cb.flat)
    encoded.select(col(idCol),
      flatten(transform(sequence(lit(0), lit(cb.m - 1)), j =>
        slice(cbCol,
          (j * cb.k + col("codes").getItem(j).cast("int")) * cb.dsub + 1,
          lit(cb.dsub)))).as("decoded"))
  }

  /** E8b: IVF-PQ — the composed deployment plan (FAISS's IVFPQ shape,
    * by_residual=false): the IVF coarse quantizer prunes the scan to each
    * query's `nprobe` nearest cells, and within those cells candidates
    * are scored by ADC over their PQ codes instead of their full vectors.
    * The scan cost drops twice — nprobe/nCells of the corpus is touched,
    * and what IS touched moves m bytes per vector, not d·8.
    *
    * `encodedCells`: (idCol, cell_id, codes) — the IVF assignment joined
    * to the PQ codes, built once with the index ([[encode]] +
    * IvfIndex.assigned; both map-side). Candidate generation is the same
    * bounded (cell_id-keyed) join as Ivf.ivfTopK — cell_id is the shuffle
    * key at 100 TB; the full-precision embedding never ships. Scoring
    * non-residual codes trades a little quantization error (centered
    * residuals quantize tighter) for reusing one corpus-wide codebook
    * across all cells — the PqSpec recall bound is the measured price. */
  def ivfPqTopK(queries: DataFrame, ivf: Ivf.IvfIndex, encodedCells: DataFrame,
      idCol: String, cb: PqCodebooks, topK: Int, nprobe: Int): DataFrame = {
    import graft.functions.cosineSim
    // nprobe best cells per query by centroid cosine (centroids are tiny)
    val probes = queries.crossJoin(broadcast(ivf.centroids))
      .select(col("query_id"),
        cosineSim(col("qvec"), col("centroid")).as("csim"), col("cell_id"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("csim"), col("cell_id"), nprobe).as("cells"))
      .select(col("query_id"), explode(col("cells.neighbor_id")).as("cell_id"))
    // one ADC table per query, carried to its probed cells' members only.
    // JOIN ORDER MATTERS: both query-side frames broadcast EXPLICITLY so
    // the codes corpus never shuffles — (probes ⋈ tables) first would
    // weigh Q·nprobe × an m·k-double table (past the auto-broadcast
    // threshold), and the planner then sort-merges on cell_id: a full
    // shuffle of the corpus into nCells effective partitions (measured
    // 5× at 250k vectors / 100 queries: 2.24s vs 0.44s for flat PQ).
    // Broadcasting the bare (query_id, cell_id) probe pairs prunes the
    // corpus scan map-side; the (query_id, table) frame attaches after,
    // also broadcast — Q tables travel once, not nprobe times.
    val q = queries.select(col("query_id"),
      pqDistTable(col("qvec"), cb.flat, cb.m, cb.k, cb.dsub).as("__table"))
    val scored = encodedCells
      .join(broadcast(probes), "cell_id")
      .filter(col("query_id") =!= col(idCol))
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        (-pqAdc(col("__table"), col("codes"), cb.k)).as("sim"))
    scored.groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("neighbor_id"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nbr")))
      .select(col("query_id"), col("nbr.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** E8 with the r17 candidate-stage collapse in front — identical rows
    * and ranks to [[pqTopK]] on every input: clone vectors encode to
    * identical codes (deterministic argmin — PqSpec pins it), identical
    * codes ADC-score identically against every query, so the
    * corpus-sized pair stream through the bounded heap (the measured
    * cost of the warm 100× block — the ADC lookups themselves are
    * memory-bound and cheap) shrinks to one row per DISTINCT code
    * vector, and the exact member-level top-k reconstructs from the
    * top-(k+1) code reps via `Ann.expandCandidateTopK` (ADC distances
    * are discrete sums, so cross-group ties are COMMON here — the tie-
    * class machinery is load-bearing, not an edge case; all-zero
    * distances negate to a uniform -0.0, so the ±0.0 class corner
    * cannot split). Candidates re-score through the same ADC kernel
    * (bit-equal — members carry their rep's codes) and a bounded heap
    * re-ranks. */
  def pqTopKCollapsed(queries: DataFrame, encoded: DataFrame, idCol: String,
      cb: PqCodebooks, topK: Int,
      gmIndex: Option[DataFrame] = None): DataFrame = {
    val q = queries.select(col("query_id"),
      pqDistTable(col("qvec"), cb.flat, cb.m, cb.k, cb.dsub).as("__table"))
    val gm = gmIndex.getOrElse(Ann.groupMembership(
      encoded.select(col(idCol), col("codes")), idCol, Seq("codes")))
    val repScored = gm.select(col("__gid"), col("codes"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("__gid"),
        (-pqAdc(col("__table"), col("codes"), cb.k)).as("sim"))
    val cands = Ann.expandCandidateTopK(
      Ann.repTopK(repScored, topK + 1), gm, topK)
    val rescored = cands
      .join(encoded.select(col(idCol).as("__mid"), col("codes")), "__mid")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("__mid").as("neighbor_id"),
        (-pqAdc(col("__table"), col("codes"), cb.k)).as("sim"))
    rescored.groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("neighbor_id"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nbr")))
      .select(col("query_id"), col("nbr.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** E8: ADC top-k — queries (query_id, qvec) against the encoded corpus
    * (idCol, codes). E1's broadcast + bounded-heap shape, but the corpus
    * side carries m·8-byte codes instead of d·8-byte vectors and each
    * candidate costs m lookups. Rank by ascending approximate distance
    * (ties to the lower id, matching the exact baselines). */
  def pqTopK(queries: DataFrame, encoded: DataFrame, idCol: String,
      cb: PqCodebooks, topK: Int): DataFrame = {
    val q = queries.select(col("query_id"),
      pqDistTable(col("qvec"), cb.flat, cb.m, cb.k, cb.dsub).as("__table"))
    val scored = encoded
      .join(broadcast(q), col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        // heap keeps the LARGEST scores: negate the distance
        (-pqAdc(col("__table"), col("codes"), cb.k)).as("sim"))
    scored.groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("neighbor_id"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nbr")))
      .select(col("query_id"), col("nbr.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
