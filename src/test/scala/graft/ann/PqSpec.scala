package graft.ann

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private def clusteredCorpus(nClusters: Int, perCluster: Int, dims: Int,
      jitter: Double, seed: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until nClusters).flatMap { c =>
      val base = Array.fill(dims)(rng.nextGaussian())
      (0 until perCluster).map { m =>
        (c * perCluster.toLong + m,
          base.map(x => x + jitter * rng.nextGaussian()).toSeq)
      }
    }.toDF("vec_id", "emb")
  }

  test("exact clones encode to identical codes; encoding is rerun-stable") {
    val corpus = clusteredCorpus(8, 10, 16, 0.05, seed = 3)
    val cb = Pq.fit(corpus, "emb", m = 4, k = 8)
    // clone vec 0 under a new id: same vector must get the same codes
    val withClone = corpus.union(
      corpus.filter(col("vec_id") === 0).select(lit(9999L), col("emb")))
    val codes = Pq.encode(withClone, "vec_id", "emb", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(9999L) == codes(0L))
    val again = Pq.encode(withClone, "vec_id", "emb", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again == codes, "encoding must be deterministic")
  }

  test("reconstruction error shrinks as the codebook grows") {
    val corpus = clusteredCorpus(8, 12, 16, 0.3, seed = 11)
    def mse(k: Int): Double = {
      val cb = Pq.fit(corpus, "emb", m = 4, k = k)
      val dec = Pq.decode(
        Pq.encode(corpus, "vec_id", "emb", cb), "vec_id", cb)
      corpus.join(dec, "vec_id")
        .select(aggregate(
          zip_with(col("emb"), col("decoded"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("e"))
        .agg(avg(col("e"))).head().getDouble(0)
    }
    val coarse = mse(2)
    val fine = mse(16)
    assert(fine < coarse * 0.5,
      s"k=16 must quantize much better than k=2: $fine vs $coarse")
  }

  test("ADC lookup equals the distance to the decoded vector") {
    val corpus = clusteredCorpus(6, 8, 16, 0.2, seed = 5)
    val cb = Pq.fit(corpus, "emb", m = 4, k = 8)
    val enc = Pq.encode(corpus, "vec_id", "emb", cb)
    val dec = Pq.decode(enc, "vec_id", cb)
    val q = corpus.filter(col("vec_id") === 0)
      .select(col("emb").as("qvec"))
    val adc = enc.crossJoin(q)
      .select(col("vec_id"),
        graft.functions.pqAdc(
          graft.functions.pqDistTable(col("qvec"), cb.flat, cb.m, cb.k, cb.dsub),
          col("codes"), cb.k).as("adc"))
    val direct = dec.crossJoin(q)
      .select(col("vec_id"), aggregate(
        zip_with(col("qvec"), col("decoded"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x).as("d2"))
    val diff = adc.join(direct, "vec_id")
      .select(max(abs(col("adc") - col("d2")))).head().getDouble(0)
    assert(diff < 1e-9, s"ADC must equal decoded distance, max diff $diff")
  }

  test("PQ top-k: high recall vs exact L2 on clustered data") {
    val corpus = clusteredCorpus(20, 10, 16, 0.05, seed = 7)
    val cb = Pq.fit(corpus, "emb", m = 4, k = 16)
    val enc = Pq.encode(corpus, "vec_id", "emb", cb)
    val queries = corpus.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("qvec"))
    // recall is measured at CLUSTER width (top-9 = the 9 co-cluster
    // members): within a tight cluster all members share codes, so ADC
    // distances tie and intra-cluster RANKING is undefined by design —
    // what PQ must get right is separating this cluster from the rest
    val approx = Pq.pqTopK(queries, enc, "vec_id", cb, topK = 9).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // exact L2 top-9, computed driver-side (200 vectors)
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val exact = vecs.keys.filter(_ % 10 == 0).flatMap { qid =>
      val q = vecs(qid)
      vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(9)
        .map { case (id, _) => (qid, id) }
    }.toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"PQ recall $recall too low on clustered data")
    // and every returned neighbor is a true co-cluster member
    val sameCluster = approx.count { case (q, n) => q / 10 == n / 10 }
    assert(sameCluster.toDouble / approx.size >= 0.9,
      "PQ neighbors must come from the query's own cluster")
  }

  test("PQ cascade (E25): exact rescore lifts recall@10 to >= 0.9 on the sf corpus") {
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val exact = sets(graft.queries.LlmOps.qAnnTopK(spark, sfDir))
    val cas = sets(graft.queries.LlmOps.qPqCascade(spark, sfDir))
    assert(cas.keySet == exact.keySet)
    val recall = exact.map { case (q, ex) =>
      (ex & cas(q)).size.toDouble / ex.size }.sum / exact.size
    // measured 0.99 at kCand=200 (0.93 at 100, 0.78 at 50) — the floor
    // leaves sf-to-sf codebook variation room without passing a broken
    // candidate stage
    assert(recall >= 0.9, s"PQ-cascade recall@10 $recall < 0.9")
  }

  test("IVF-PQ top-k: cell pruning keeps recall on clustered data") {
    val corpus = clusteredCorpus(20, 10, 16, 0.05, seed = 13)
    val cb = Pq.fit(corpus, "emb", m = 4, k = 16)
    val ivf = Ivf.buildIndex(corpus, "vec_id", "emb", nCells = 10)
    val encodedCells = ivf.assigned.select(col("vec_id"), col("cell_id"))
      .join(Pq.encode(corpus, "vec_id", "emb", cb), "vec_id")
    val queries = corpus.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("qvec"))
    val approx = Pq.ivfPqTopK(queries, ivf, encodedCells, "vec_id", cb,
      topK = 9, nprobe = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // cluster-width recall (see the PQ top-k test for why): the probed
    // cells must cover the query's own cluster, so co-cluster members
    // dominate the returned set exactly as in the unpruned scan
    val sameCluster = approx.count { case (q, n) => q / 10 == n / 10 }
    assert(sameCluster.toDouble / approx.size >= 0.9,
      "IVF-PQ neighbors must come from the query's own cluster")
    val perQuery = approx.groupBy(_._1)
    assert(perQuery.values.forall(_.size == 9))
  }

  test("q_pq_ivf: k rows per query, contiguous ranks, self excluded") {
    val rows = LlmOps.qPqIvf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.values.forall(_.length == 10))
    assert(perQuery.values.forall(
      _.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 10L)))
  }

  test("q_pq_topk: k rows per query, contiguous ranks, self excluded") {
    val rows = LlmOps.qPqTopK(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.values.forall(_.length == 10))
    assert(perQuery.values.forall(
      _.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 10L)))
  }

  test("pq top-k candidate collapse (r17): collapsed ≡ uncollapsed scan on the sf corpus and on planted clone/tie corpora") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"))).sortBy(x => (x._1, x._3)).toSeq
    // sf corpus through the registered index: the face (collapsed) must
    // equal the uncollapsed kernel row for row
    val (cb, encoded) = LlmOps.pqIndex(spark, sfDir)
    val q = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), Ann.asDouble(col("embedding")).as("qvec"))
    assert(rows(Pq.pqTopKCollapsed(q, encoded, "vec_id", cb, 10)) ==
      rows(Pq.pqTopK(q, encoded, "vec_id", cb, 10)),
      "collapsed PQ scan diverged on the sf corpus")
    // planted: clone groups (identical codes by construction) + code
    // groups that TIE in ADC distance (discrete sums make ties common —
    // the tie-class reconstruction is load-bearing here); k lands both
    // inside the query's own clone group and mid-tie
    val base = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0), Seq(0.0, 0.0, 0.0, 1.0))
    val planted = (Seq(0L -> base(0)) ++ (1L to 6L).map(_ -> base(0)) ++
      (10L to 14L).map(_ -> base(1)) ++ (20L to 24L).map(_ -> base(2)) ++
      Seq(30L -> base(3))).toDF("vec_id", "embedding")
    val cbP = Pq.fit(planted, "embedding", m = 2, k = 4, maxIter = 5)
    val encP = Pq.encode(planted, "vec_id", "embedding", cbP)
    val qP = planted.filter(col("vec_id") === 0L || col("vec_id") === 30L)
      .select(col("vec_id").as("query_id"), Ann.asDouble(col("embedding")).as("qvec"))
    for (k <- Seq(1, 3, 7, 11, 50)) {
      assert(rows(Pq.pqTopKCollapsed(qP, encP, "vec_id", cbP, k)) ==
        rows(Pq.pqTopK(qP, encP, "vec_id", cbP, k)),
        s"collapsed PQ scan diverged on the planted corpus at k=$k")
    }
  }
}
