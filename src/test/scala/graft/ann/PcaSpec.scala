package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("pca (E22): eigenbasis is orthonormal and carries the full trace") {
    val m = Pca.fit(
      graft.sources.Tables.table(spark, sfDir, "embeddings"), "embedding")
    assert(m.d == 64 && m.n > 0)
    // orthonormal rows
    for (i <- m.components.indices; j <- i until m.d) {
      val d = dot(m.components(i), m.components(j))
      if (i == j) assert(math.abs(d - 1.0) < 1e-9, s"norm of c$i = $d")
      else assert(math.abs(d) < 1e-9, s"c$i . c$j = $d")
    }
    // eigenvalues sorted desc, non-negative (covariance is PSD)
    val ev = m.eigenvalues
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b })
    assert(ev.forall(_ >= -1e-9))
    // trace identity: sum of eigenvalues == sum of per-dimension variances
    val rows = graft.sources.Tables.table(spark, sfDir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val trace = (0 until 64).map { k =>
      val xs = rows.map(_(k))
      val mu = xs.sum / n
      xs.map(x => (x - mu) * (x - mu)).sum / n
    }.sum
    assert(math.abs(ev.sum - trace) / trace < 1e-9,
      s"trace ${ev.sum} vs $trace")
  }

  test("pca (E22): planted anisotropy is recovered as the top component") {
    // 400 points along a known direction + small noise on one other axis:
    // the top component must align with the plant and carry ~all variance
    val d = 8
    val w = Array.tabulate(d)(i => if (i == 2) 0.8 else if (i == 5) -0.6 else 0.0)
    val pts = (0 until 400).map { i =>
      val t = (i % 41) - 20.0 // deterministic spread
      val noise = ((i * 7) % 11 - 5.0) / 50.0
      (i.toLong, Array.tabulate(d)(k =>
        (w(k) * t + (if (k == 0) noise else 0.0)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val m = Pca.fit(pts, "embedding")
    val cos = math.abs(dot(m.components(0), w)) /
      math.sqrt(dot(w, w))
    assert(cos > 0.9999, s"top component misaligned: $cos")
    assert(m.eigenvalues(0) / m.totalVariance > 0.99)
    // spectrum face: ppm lanes are the floored shares, cum monotone
    val spec = Pca.varianceSpectrum(pts, "embedding", 4).collect()
    assert(spec.length == 4)
    assert(spec.head.getAs[Long]("var_ppm") > 990000L)
    val cums = spec.map(_.getAs[Long]("cum_var_ppm"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last <= 1000000L)
  }

  test("pca cascade (E23): recall@10 >= 0.9 vs exact, dense ranks, deterministic") {
    val out = graft.queries.LlmOps.qAnnPca(spark, sfDir).collect()
    val exact = graft.queries.LlmOps.qAnnTopK(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val approx = out.groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    assert(approx.keySet == exact.keySet, "every query answered")
    // ranks dense 1..10 per query, no self-neighbors
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 10L))
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q))
    }
    val recall = exact.map { case (q, ex) =>
      (ex & approx(q)).size.toDouble / ex.size }.sum / exact.size
    assert(recall >= 0.9, s"PCA-cascade recall@10 $recall < 0.9")
    // contractive stage 1 + exact rescore is deterministic end to end
    val rerun = graft.queries.LlmOps.qAnnPca(spark, sfDir).collect()
    assert(rerun.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
  }

  test("pca projection (E22b): coordinates recompute on the driver") {
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val out = Pca.project(emb, "vec_id", "embedding", 2).collect()
    val m = Pca.fit(emb, "embedding")
    val byId = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(out.length == byId.size)
    out.take(50).foreach { r =>
      val x = byId(r.getAs[Long]("vec_id"))
      val c = x.indices.map(i => x(i) - m.mean(i)).toArray
      assert(r.getAs[Long]("pc1_x1000") ==
        math.floor(dot(c, m.components(0)) * 1000).toLong)
      assert(r.getAs[Long]("pc2_x1000") ==
        math.floor(dot(c, m.components(1)) * 1000).toLong)
    }
  }
}
