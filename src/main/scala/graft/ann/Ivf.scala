package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{cosineSim, topKByScore}

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * alternative to random-hyperplane LSH (E-block, SURVEY.md §2): k-means
  * centroids partition the corpus into cells; a query scores only the
  * vectors in its `nprobe` nearest cells.
  *
  * Scale shape: training touches the corpus a bounded number of passes
  * (k-means on the distributed corpus; centroids — k×dims doubles — live on
  * the driver and broadcast from there). Cell assignment is one map-side
  * pass. At query time the candidate set is bounded by nprobe/k of the
  * corpus, keyed by cell id — the join shuffles (cell, id, emb) rows, never
  * all pairs. Versus LSH: cells adapt to the data distribution (clustered
  * corpora get balanced cells where fixed hyperplanes crowd one bucket).
  */
object Ivf {

  /** Clustered corpus: `centroids` (cell_id, centroid) is tiny and
    * broadcastable; `assigned` carries (idCol, __emb, cell_id). */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame)

  /** Fit the coarse quantizer and assign every corpus vector to its cell.
    * Deterministic for a fixed seed. Assignment goes through [[assign]]
    * (not `model.transform`) so an index REBUILT from persisted
    * centroids reproduces the build-time assignment bit for bit — both
    * paths share one arithmetic. */
  def buildIndex(corpus: DataFrame, idCol: String, embCol: String,
      nCells: Int, seed: Long = 42L, maxIter: Int = 10): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val feats = corpus
      .select(col(idCol), Ann.asDouble(col(embCol)).as("__emb"))
      .withColumn("__features", array_to_vector(col("__emb")))
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__features")
      .fit(feats)
    val centers = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    val centroids = centers.map { case (i, a) => (i, a.toSeq) }
      .toSeq.toDF("cell_id", "centroid")
    IvfIndex(centroids, assign(corpus, idCol, embCol, centers))
  }

  /** Map-side nearest-centroid assignment: one codegen'd projection per
    * row computing the argmin squared-euclidean over the (driver-held,
    * k×dims — KBs) centroid array. No MLlib vector UDT, no UDF; ties
    * break to the lowest cell id via the struct min. This is the whole
    * "load an index" story at scale: centroids ship as literals, the
    * corpus is touched once. */
  def assign(corpus: DataFrame, idCol: String, embCol: String,
      centers: Seq[(Long, Array[Double])]): DataFrame = {
    val emb = Ann.asDouble(col(embCol))
    val scored = array(centers.map { case (cid, cvec) =>
      struct(
        aggregate(zip_with(emb, lit(cvec), (a, b) => (a - b) * (a - b)),
          lit(0.0), _ + _).as("d2"),
        lit(cid).as("cell_id"))
    }: _*)
    corpus.select(col(idCol), emb.as("__emb"),
      array_min(scored).getField("cell_id").as("cell_id"))
  }

  /** Persist the trained half of the index — the centroids — stamped
    * with the source corpus's row count (the staleness guard
    * [[graft.catalog.Artifacts]] documents). The assignment is NOT
    * persisted: it's one [[assign]] pass from the centroids, and at
    * corpus scale you'd materialize it as a regular table anyway. */
  def saveCentroids(index: IvfIndex, path: String, srcCount: Long): Unit =
    index.centroids.withColumn("src_count", lit(srcCount))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load centroids persisted by [[saveCentroids]] and rebuild the full
    * index against `corpus`; None when the artifact is absent or its
    * stamp disagrees with `srcCount` (stale → caller refits). */
  def loadIndex(corpus: DataFrame, idCol: String, embCol: String,
      path: String, srcCount: Long): Option[IvfIndex] = {
    val spark = corpus.sparkSession
    if (!graft.catalog.Artifacts.exists(spark, path)) None
    else {
      val stored = spark.read.parquet(path)
      val rows = stored.select("cell_id", "centroid", "src_count").collect()
      if (rows.isEmpty || rows.exists(_.getLong(2) != srcCount)) None
      else {
        val centers = rows.map(r => (r.getLong(0),
          r.getSeq[Double](1).toArray)).sortBy(_._1).toSeq
        val centroids = stored.select("cell_id", "centroid")
        Some(IvfIndex(centroids, assign(corpus, idCol, embCol, centers)))
      }
    }
  }

  /** G22: the IVF-family ARRIVAL-TIME probe gate — the E3 index's
    * streaming twin, closing the index-family grid (text simhash, image
    * dHash, audio envelope, embedding LSH and DSIR all stream-probe a
    * static index; the data-adaptive cell index now does too). The
    * `nprobe` best cells per arriving vector compute MAP-SIDE from the
    * driver-held centroid array as one sorted-literal expression —
    * struct order (−csim, cell_id) ≡ ivfTopK's probe aggregate order
    * (csim desc, cell_id asc), so the stream probes exactly the cells
    * the batch face scores — then the equi-join keys on cell_id against
    * the static assigned corpus and the cosine verify gates on τ.
    * Stateless end to end → append-legal in Structured Streaming. A
    * corpus vector lives in ONE cell and the probed cells are distinct,
    * so a pair can match through at most one probe — no dedupe state
    * (the G20 argument). Unlike the LSH gate a novel vector still
    * probes its nearest cells (IVF has no empty-bucket miss), so
    * novelty shows as sub-τ cosines, not absent candidates. `centers`
    * is the driver-held centroid array ([[buildIndex]]/[[loadIndex]]
    * both hold it; KBs). */
  def ivfNearDupFlags(index: IvfIndex, centers: Seq[(Long, Array[Double])],
      arriving: DataFrame, idCol: String, embCol: String,
      tau: Double, nprobe: Int): DataFrame = {
    val emb = Ann.asDouble(col(embCol))
    val cellScores = array(centers.map { case (cid, cvec) =>
      struct((-cosineSim(emb, lit(cvec))).as("nsim"), lit(cid).as("cell_id"))
    }: _*)
    val probed = arriving.select(col(idCol), emb.as("__pemb"),
        explode(slice(array_sort(cellScores), 1, nprobe)).as("__c"))
      .select(col(idCol), col("__pemb"), col("__c.cell_id").as("cell_id"))
    probed.join(index.assigned.select(col("cell_id"),
        col(index.assigned.columns.head).as("corpus_id"), col("__emb")),
      Seq("cell_id"))
      .select(col(idCol), col("corpus_id"),
        cosineSim(col("__pemb"), col("__emb")).as("sim"))
      .filter(col("sim") > tau)
  }

  /** E3: IVF top-k. `queries`: (query_id, qvec). Each query probes its
    * `nprobe` nearest cells (by centroid cosine) and ranks only those
    * cells' members. */
  def ivfTopK(queries: DataFrame, index: IvfIndex, k: Int, nprobe: Int): DataFrame = {
    // per-query probe list: nprobe best cells — centroids are tiny, so
    // this is a broadcast product of Q × nCells scored map-side
    val probes = queries.crossJoin(broadcast(index.centroids))
      .select(col("query_id"),
        cosineSim(col("qvec"), col("centroid")).as("csim"), col("cell_id"))
      .groupBy(col("query_id"))
      .agg(topKByScore(col("csim"), col("cell_id"), nprobe).as("cells"))
      .select(col("query_id"), explode(col("cells.neighbor_id")).as("cell_id"))
    // join order + explicit broadcasts (the E8b round-8 lesson): the
    // corpus-side assigned frame must never shuffle on cell_id — probe
    // pairs broadcast first (map-side cell pruning), query vectors
    // attach after (each qvec travels once, not nprobe times). Left
    // implicit, the probe⋈queries frame crosses the auto-broadcast
    // threshold right around the Q∝N stress batch and the planner
    // sort-merges the corpus into nCells skewed partitions.
    val candidates = index.assigned
      .join(broadcast(probes), "cell_id")
      .filter(col("query_id") =!= col(index.assigned.columns.head))
      .join(broadcast(queries), "query_id")
    val scored = candidates.select(col("query_id"),
      col(index.assigned.columns.head).as("neighbor_id"),
      cosineSim(col("qvec"), col("__emb")).as("sim"))
    Ann.topKReduce(scored, k)
  }
}
