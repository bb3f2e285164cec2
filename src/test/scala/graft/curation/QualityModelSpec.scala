package graft.curation

import graft.SparkSpec
import graft.queries.LlmOps
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {

  private lazy val table = {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val split = docs.select(col("doc_id"),
      Curation.assignSplit("text", Seq("train" -> 4, "eval" -> 1)).as("split"))
    QualityModel.features(docs, "text", "doc_id")
      .withColumn("label", (col("quality_x1000") >= 350L).cast("double"))
      .join(split, "doc_id")
      .cache()
  }

  test("single-projection features match the F2/F5 operators exactly") {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val got = QualityModel.features(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_word_frac_x1000"), r.getAs[Double]("top_bigram_frac_x1000"))).toMap
    val want = graft.text.TextAnalysis.repetitionSignals(
      docs.filter(col("text").isNotNull), "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dup_word_frac_x1000").toDouble,
          r.getAs[Long]("top_bigram_frac_x1000").toDouble)).toMap
    assert(got == want)
  }

  test("column scorer reproduces MLlib transform probabilities exactly") {
    val model = QualityModel.fit(table.filter(col("split") === "train"), "label")
    val viaColumn = table
      .select(col("doc_id"), QualityModel.scoreColumn(model).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(QualityModel.featureCols.toArray).setOutputCol("__features")
      .transform(table)
    val viaTransform = model.transform(assembled)
      .select(col("doc_id"), col(model.getProbabilityCol))
      .collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1)(1)).toMap
    assert(viaColumn.keySet == viaTransform.keySet)
    viaColumn.foreach { case (id, p) =>
      assert(math.abs(p - viaTransform(id)) < 1e-9, s"doc $id: $p vs ${viaTransform(id)}")
    }
  }

  test("held-out AUC: the learned scorer ranks positives above negatives") {
    val model = QualityModel.fit(table.filter(col("split") === "train"), "label")
    val eval = table.filter(col("split") === "eval")
      .select(col("label"), QualityModel.scoreColumn(model).as("p"))
      .collect().map(r => (r.getDouble(0) > 0.5, r.getDouble(1)))
    val pos = eval.filter(_._1).map(_._2)
    val neg = eval.filterNot(_._1).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty, "eval split must contain both classes")
    // Mann–Whitney AUC: P(score_pos > score_neg) + ties/2
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toLong * neg.length)
    assert(auc >= 0.95, s"held-out AUC $auc below 0.95")
  }

  test("fit is deterministic: same data, same coefficients") {
    val train = table.filter(col("split") === "train")
    val a = QualityModel.fit(train, "label")
    val b = QualityModel.fit(train, "label")
    val diff = a.coefficients.toArray.zip(b.coefficients.toArray)
      .map { case (x, y) => math.abs(x - y) }.max
    assert(diff < 1e-9 && math.abs(a.intercept - b.intercept) < 1e-9)
  }

  test("registered query: one decision per doc, probabilities in [0,1]") {
    val rows = LlmOps.qQualityClassifier(spark, sfDir).collect()
    val nDocs = graft.sources.Tables.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val p = r.getAs[Double]("quality_prob")
      assert(p >= 0.0 && p <= 1.0)
    }
    // the scorer must actually separate: mean prob of label-1 docs above label-0
    val (p1, p0) = (
      rows.filter(_.getAs[Long]("label") == 1L).map(_.getAs[Double]("quality_prob")),
      rows.filter(_.getAs[Long]("label") == 0L).map(_.getAs[Double]("quality_prob")))
    assert(p1.sum / p1.length > p0.sum / p0.length + 0.2)
  }

  test("calibration table: mass conserved, confidence inside its bin, rates in range") {
    val cal = LlmOps.qCalibration(spark, sfDir).collect()
    val nDocs = graft.sources.Tables.table(spark, sfDir, "documents")
      .filter(col("text").isNotNull).count()
    assert(cal.map(_.getAs[Long]("n")).sum == nDocs, "every scored doc lands in a bin")
    cal.foreach { r =>
      val (bin, conf, frac) = (r.getAs[Long]("bin"),
        r.getAs[Long]("mean_conf_ppm"), r.getAs[Long]("frac_pos_ppm"))
      assert(bin >= 0L && bin <= 9L)
      assert(conf >= bin * 100000L, s"bin $bin mean conf $conf below bin floor")
      assert(bin == 9L || conf < (bin + 1) * 100000L,
        s"bin $bin mean conf $conf above bin ceiling")
      assert(frac >= 0L && frac <= 1000000L)
    }
    // the diagram must slope upward overall: top-half bins see a higher
    // positive rate than bottom-half bins (the scorer separates)
    val (hi, lo) = cal.partition(_.getAs[Long]("bin") >= 5L)
    def rate(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getAs[Long]("frac_pos_ppm") * r.getAs[Long]("n")).sum.toDouble /
        math.max(1L, rs.map(_.getAs[Long]("n")).sum)
    assert(rate(hi) > rate(lo) + 100000.0, "calibration curve must slope upward")
  }
}
