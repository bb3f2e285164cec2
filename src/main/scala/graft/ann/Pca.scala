package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction face of the embedding pipeline (whitening,
  * compaction before ANN, drift axes). Reference scope: the pipeline's
  * analytics surface (sync.py:107's SELECT-shaped reads); PCA itself is
  * the standard corpus-embedding reduction (the RowMatrix.computeCovariance
  * + local eigen pattern MLlib uses, re-expressed on the DataFrame API).
  *
  * Scale shape: ONE pass over the vectors — each row projects to the
  * flattened `[1, x, x⊗x]` moment array (1 + d + d² doubles) and a single
  * [[graft.functions.vectorSum]] TypedImperativeAggregate reduces it with
  * map-side partials (one (d²+d+1)-length buffer per partition, merged
  * buffer-at-a-time; for d=64 that is a 33 KB partial — corpus size never
  * appears). The d×d eigen-decomposition runs on the DRIVER via cyclic
  * Jacobi — deterministic, d is a schema constant (64 here), the matrix is
  * 32 KB; no iterative Spark job, no collect of row data.
  */
object Pca {

  /** Fitted model: `mean(d)`, eigenvalues desc, eigenvectors as rows
    * (orthonormal, sign-fixed: largest-|component| coordinate positive). */
  final case class Model(
      n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]]) {
    def d: Int = mean.length
    def totalVariance: Double = eigenvalues.sum
  }

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** One-pass moments → driver Jacobi. Covariance is the POPULATION
    * covariance (÷ n, matching the moment identity E[xy] − μμᵀ exactly —
    * the sample ÷(n−1) rescale would shift every eigenvalue by the same
    * factor and change no component). */
  def fit(df: DataFrame, vecCol: String): Model = {
    val moments = df
      .filter(col(vecCol).isNotNull)
      .select(asDouble(col(vecCol)).as("__x"))
      .select(
        concat(
          array(lit(1.0)),
          col("__x"),
          flatten(transform(col("__x"), a =>
            transform(col("__x"), b => a * b)))).as("__m"))
      .agg(graft.functions.vectorSum(col("__m")).as("s"))
      .head.getSeq[Double](0).toArray
    val d = ((math.sqrt(4.0 * moments.length - 3) - 1) / 2).round.toInt
    require((d + 1) * d + 1 == moments.length, s"moment length ${moments.length}")
    val n = moments(0).round
    require(n > 0, "PCA over an empty vector set")
    val mean = Array.tabulate(d)(i => moments(1 + i) / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      moments(1 + d + i * d + j) / n - mean(i) * mean(j)
    }
    val (vals, vecs) = jacobiEigen(cov)
    Model(n, mean, vals, vecs)
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric d×d matrix:
    * deterministic sweep order, converges quadratically; returns
    * (eigenvalues desc, row-major orthonormal eigenvectors) with the sign
    * convention that each vector's largest-|coordinate| entry is
    * positive (ties → lowest index), so reruns and engines agree. */
  def jacobiEigen(matrix: Array[Array[Double]], sweeps: Int = 30,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = matrix.length
    val a = Array.tabulate(d, d)((i, j) => matrix(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      // sign fix: largest-|coordinate| entry positive, ties lowest index
      var best = 0
      var k = 1
      while (k < d) { if (math.abs(col(k)) > math.abs(col(best))) best = k; k += 1 }
      if (col(best) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Serialize a fitted model to a DataFrame for artifact pinning
    * (LlmOps.pinnedFrame): idx 0 carries the mean (eigenvalue slot
    * re-used for n), idx 1..d the components with their eigenvalues in
    * descending order. [[modelFromRows]] inverts it. */
  def modelToFrame(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    ((0L, m.n.toDouble, m.mean.toSeq) +:
      m.eigenvalues.zip(m.components).zipWithIndex.map { case ((ev, w), i) =>
        (i.toLong + 1, ev, w.toSeq)
      }.toSeq).toDF("idx", "eigenvalue", "vec")
  }

  /** Rebuild a [[Model]] from a pinned [[modelToFrame]] frame (d+1 rows —
    * a driver-sized collect, KB class). */
  def modelFromRows(df: DataFrame): Model = {
    val rows = df.select("idx", "eigenvalue", "vec").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    val (_, n, mean) = rows.head
    Model(n.round, mean, rows.tail.map(_._2), rows.tail.map(_._3))
  }

  /** E22: the variance spectrum — per component its share of total
    * variance in floored ppm plus the running total (the "how many
    * dimensions does this embedding really use" readout; compare E17's
    * per-dimension stats, which cannot see correlated axes). */
  def varianceSpectrum(df: DataFrame, vecCol: String, k: Int): DataFrame =
    spectrumFromModel(df.sparkSession, fit(df, vecCol), k)

  /** [[varianceSpectrum]]'s readout from an already-fitted model — the
    * pinned-artifact face path. Sequential driver arithmetic (tot = the
    * desc-ordered eigenvalue sum, cum = running prefix) so the oracle's
    * list_reduce prefix folds replay it exactly. */
  def spectrumFromModel(spark: org.apache.spark.sql.SparkSession,
      m: Model, k: Int): DataFrame = {
    import spark.implicits._
    val tot = m.totalVariance
    var cum = 0.0
    (0 until math.min(k, m.d)).map { i =>
      cum += m.eigenvalues(i)
      (i.toLong + 1, math.floor(m.eigenvalues(i) / tot * 1e6).toLong,
        math.floor(cum / tot * 1e6).toLong)
    }.toDF("component", "var_ppm", "cum_var_ppm")
  }

  /** Map-side projection of a double-array vector column onto the
    * model's top-k components, with the centering folded into
    * per-component offsets (`dot(x−μ, w) = dot(x, w) − dot(μ, w)`), so
    * the hot path is k dot products and k subtractions and the mean
    * never re-enters the row loop. Components ride the expression tree
    * as array literals — no join, no shuffle. */
  def projectExpr(vec: Column, m: Model, k: Int): Column =
    array(m.components.take(k).map { w =>
      val off = w.zip(m.mean).map { case (a, b) => a * b }.sum
      aggregate(zip_with(vec, array(w.map(lit(_)): _*), (x, ww) => x * ww),
        lit(0.0), (acc, x) => acc + x) - lit(off)
    }: _*)

  /** E22b: project every vector onto the top-k components — a map-side
    * broadcast-scalar projection (the components ride the closure as a
    * d×k constant; no join, no shuffle), coordinates ×1000 floored to
    * integer lanes for a deterministic readout. */
  def project(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    projectWithModel(df, idCol, vecCol, k, fit(df, vecCol))

  /** [[project]] against an already-fitted (e.g. pinned) model. */
  def projectWithModel(df: DataFrame, idCol: String, vecCol: String,
      k: Int, m: Model): DataFrame = {
    val comps = m.components.take(k)
    val meanArr = m.mean
    val meanCol = array(meanArr.map(lit(_)): _*)
    val centered = df.filter(col(vecCol).isNotNull)
      .select(col(idCol), zip_with(asDouble(col(vecCol)), meanCol, (x, mu) => x - mu).as("__c"))
    val coords = comps.zipWithIndex.map { case (w, i) =>
      floor(aggregate(
        zip_with(col("__c"), array(w.map(lit(_)): _*), (x, ww) => x * ww),
        lit(0.0), (acc, x) => acc + x) * 1000).cast("long").as(s"pc${i + 1}_x1000")
    }
    centered.select(col(idCol) +: coords: _*).orderBy(idCol)
  }
}
