package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Centroids / VectorSum: exact means, outlier scoring, and the aggregate's
  * mergeability (same result under any partitioning). */
class CentroidSpec extends SparkSpec {
  import spark.implicits._

  test("centroid is the exact per-position mean") {
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.0f)),
      (2L, 0, Seq(0.0f, 1.0f)),
      (3L, 1, Seq(2.0f, 2.0f))).toDF("id", "label", "vec")
    val c = Centroids.centroids(df, "label", "vec")
      .orderBy("label").as[(Int, Seq[Double], Long)].collect()
    assert(c(0) == ((0, Seq(0.5, 0.5), 2L)))
    assert(c(1) == ((1, Seq(2.0, 2.0), 1L)))
  }

  test("planted mislabeled vector scores lowest against its label centroid") {
    // label 0 clusters near (1, 0); the outlier points the opposite way
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.1f)),
      (2L, 0, Seq(1.0f, -0.1f)),
      (3L, 0, Seq(0.9f, 0.0f)),
      (4L, 0, Seq(-1.0f, 0.0f)), // mislabeled
      (5L, 1, Seq(0.0f, 1.0f))).toDF("id", "label", "vec")
    val scored = Centroids.scoreAgainstCentroid(df, "id", "label", "vec")
      .filter($"label" === 0)
      .orderBy($"cos_centroid")
      .as[(Long, Int, Double)].collect()
    assert(scored.head._1 == 4L, "outlier must rank last in its own label")
    assert(scored.head._3 < 0.0)
    assert(scored.tail.forall(_._3 > 0.9))
  }

  test("VectorSum is partitioning-independent (mergeable partials)") {
    val df = (1 to 200).map(i => (i.toLong, i % 3, Seq(i.toFloat, (i * 2).toFloat)))
      .toDF("id", "label", "vec")
    val one = Centroids.centroids(df.coalesce(1), "label", "vec")
      .orderBy("label").collect().toSeq
    val many = Centroids.centroids(df.repartition(13), "label", "vec")
      .orderBy("label").collect().toSeq
    assert(one == many)
  }

  test("null vectors are skipped; null elements count as zero") {
    val df = Seq(
      (1L, 0, Seq[java.lang.Double](1.0, 2.0)),
      (2L, 0, null.asInstanceOf[Seq[java.lang.Double]]),
      (3L, 0, Seq[java.lang.Double](3.0, null))).toDF("id", "label", "vec")
    val c = Centroids.centroids(df, "label", "vec").collect()(0)
    // n counts the 2 non-null vectors; sums: (1+3)/2, (2+0)/2
    assert(c.getLong(2) == 2L)
    assert(c.getSeq[Double](1) == Seq(2.0, 1.0))
  }

  test("cohort drift: aligned cohorts score ~1, an inverted cohort scores -1") {
    val df = Seq(
      // label 0: both cohorts drawn around (1, 0) → cos ≈ 1
      (1L, 0, true, Seq(1.0f, 0.1f)), (2L, 0, true, Seq(1.0f, -0.1f)),
      (3L, 0, false, Seq(0.9f, 0.05f)), (4L, 0, false, Seq(1.1f, -0.05f)),
      // label 1: cohort B is the negation of cohort A → cos = -1
      (5L, 1, true, Seq(1.0f, 2.0f)), (6L, 1, true, Seq(3.0f, 2.0f)),
      (7L, 1, false, Seq(-1.0f, -2.0f)), (8L, 1, false, Seq(-3.0f, -2.0f)),
      // label 2: cohort B missing → NULL drift
      (9L, 2, true, Seq(1.0f, 1.0f))).toDF("id", "label", "isa", "vec")
    val out = Centroids.cohortDrift(df, "label", "vec", "isa")
      .orderBy("label").collect()
    assert(out(0).getAs[Double]("cos_ab") > 0.99)
    assert(math.abs(out(1).getAs[Double]("cos_ab") + 1.0) < 1e-9)
    assert(out(2).isNullAt(3), "missing cohort must yield NULL, not a crash")
    assert(out(2).getAs[Long]("n_b") == 0L)
  }

  test("inconsistent dimensions fail fast with a clear error") {
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.0f)),
      (2L, 0, Seq(1.0f, 0.0f, 0.0f))).toDF("id", "label", "vec")
    val e = intercept[Exception] {
      Centroids.centroids(df.coalesce(1), "label", "vec").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("inconsistent dimensions")))
  }

  test("diversity: the pairless identity equals the brute-force pairwise mean") {
    val df = Seq(
      ("a", Array(1.0f, 0.0f)), ("a", Array(0.0f, 1.0f)), ("a", Array(1.0f, 1.0f)),
      ("b", Array(2.0f, 0.0f)), ("b", Array(2.0f, 0.0f)),
      ("c", Array(9.0f, 9.0f))) // singleton: no pairs, dropped
      .toDF("label", "embedding")
    val out = Centroids.diversity(df, "label", "embedding").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // a: ordered pairs 2*(0 + 1 + 1) / 6 = 0.666667; self (1+1+2)/3
    assert(out("a")._1 == 3L)
    assert(math.abs(out("a")._2 - 0.666667) < 1e-6, s"${out("a")}")
    assert(math.abs(out("a")._3 - 1.333333) < 1e-6)
    // b: identical vectors read mean pair dot == mean self dot (=4) --
    // the mode-collapse signature the metric exists to catch
    assert(out("b")._2 == 4.0 && out("b")._3 == 4.0)
    assert(!out.contains("c"), "singleton groups have no pairs")
  }


  test("dim profile: planted dead and live dimensions read their exact moments") {
    val df = Seq(
      Array(1.0f, 5.0f, 0.0f),
      Array(3.0f, 5.0f, 0.0f),
      Array(5.0f, 5.0f, 0.0f)).map(Tuple1(_)).toDF("embedding")
    val out = Centroids.dimProfile(df, "embedding").collect()
      .map(r => r.getAs[Long]("dim") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Double]("mean"),
          r.getAs[Double]("variance"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((3L, 3.0, 2.666667)), s"${out(1L)}") // var = 8/3 rounded 6dp
    assert(out(2L)._2 == 5.0 && out(2L)._3 == 0.0,
      "a constant dimension reads zero variance — the dead-dim flag")
    assert(out(3L)._2 == 0.0 && out(3L)._3 == 0.0)
  }

  test("centroid margins: separable plants read positive, the mislabeled vector flags") {
    val df = Seq(
      (1L, "a", Array(1.0f, 0.05f)), (2L, "a", Array(0.9f, 0.0f)),
      (3L, "a", Array(1.0f, -0.05f)),
      (4L, "b", Array(0.0f, 1.0f)), (5L, "b", Array(0.05f, 0.9f)),
      (6L, "b", Array(-0.05f, 1.0f)),
      (7L, "a", Array(0.0f, 1.0f))) // labeled a, sits in b's cluster
      .toDF("vec_id", "label", "embedding")
    val out = Centroids.centroidMargins(df, "label", "embedding", "vec_id")
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_vectors"),
        r.getAs[Double]("mean_margin"), r.getAs[Long]("n_confused"))).toMap
    assert(out("b")._3 == 0L, s"clean cluster must not confuse: ${out("b")}")
    assert(out("b")._2 > 0.1, "separable cluster reads a healthy margin")
    assert(out("a")._3 == 1L,
      s"exactly the mislabeled vector is confused: ${out("a")}")
    assert(out("a")._1 == 4L)
  }
}
