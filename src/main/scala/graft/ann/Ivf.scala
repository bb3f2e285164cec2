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
    * Deterministic for a fixed seed. */
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
    val assigned = model.transform(feats)
      .select(col(idCol), col("__emb"),
        col(model.getPredictionCol).cast("long").as("cell_id"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray.toSeq) }
      .toSeq.toDF("cell_id", "centroid")
    IvfIndex(centroids, assigned)
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
    val candidates = probes
      .join(queries, "query_id")
      .join(index.assigned, "cell_id")
      .filter(col("query_id") =!= col(index.assigned.columns.head))
    val scored = candidates.select(col("query_id"),
      col(index.assigned.columns.head).as("neighbor_id"),
      cosineSim(col("qvec"), col("__emb")).as("sim"))
    Ann.topKReduce(scored, k)
  }
}
