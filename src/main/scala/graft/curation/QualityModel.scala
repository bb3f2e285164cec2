package graft.curation

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering (H10) — the fastText/classifier stage of
  * an LLM data pipeline (CCNet, GPT-3, LLaMA all gate on a learned quality
  * score, not heuristics alone). Two halves, deliberately separated:
  *
  *  - TRAIN: MLlib logistic regression over the F-block text features.
  *    Distributed and bounded — L-BFGS runs a fixed number of passes over
  *    the corpus (treeAggregate gradients), and the artifact is just
  *    |features|+1 doubles on the driver. Labels here derive from a
  *    deterministic heuristic (a threshold on the F2 quality score) —
  *    a stand-in for the human/LLM annotations a production pipeline
  *    trains on; what this operator proves is the train → coefficients →
  *    score path, not the label source.
  *
  *  - SCORE: the fitted coefficients fold into a pure `Column`
  *    (sigmoid(w·x + b)) — a codegen'd map-side projection with no MLlib
  *    vector UDT, no UDF, and no model object on the hot path. The same
  *    expression drops into a Structured Streaming gate unchanged (the
  *    G5 stateless-predicate pattern), which a `model.transform` with its
  *    assembler stage would not.
  *
  * At 100 TB: training reads the corpus a bounded number of times and is
  * amortized across every downstream scoring run; scoring is a projection
  * on the document scan — zero shuffle, zero state.
  */
object QualityModel {

  /** Feature column names, in coefficient order. */
  val featureCols: Seq[String] = Seq(
    "n_words", "avg_word_len_x100", "stop_hits",
    "dup_word_frac_x1000", "top_bigram_frac_x1000")

  /** F-block feature vector per document: the F2 quality components and
    * the F5 repetition signals, all cast to double for the optimizer.
    * Keeps `quality_x1000` alongside for heuristic-label derivation. */
  def features(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
    val q = graft.text.TextAnalysis.qualityScore(base, textCol)
      .select(col(idCol), col("n_words").cast("double").as("n_words"),
        col("avg_word_len_x100").cast("double").as("avg_word_len_x100"),
        col("stop_hits").cast("double").as("stop_hits"),
        col("quality_x1000"))
    val r = graft.text.TextAnalysis.repetitionSignals(base, textCol, idCol)
      .select(col(idCol),
        col("dup_word_frac_x1000").cast("double").as("dup_word_frac_x1000"),
        col("top_bigram_frac_x1000").cast("double").as("top_bigram_frac_x1000"))
    q.join(r, idCol)
  }

  /** Fit the classifier. Deterministic: L-BFGS from a zero start over the
    * same data converges to the same coefficients (no random init). */
  def fit(feats: DataFrame, labelCol: String,
      regParam: Double = 0.01, maxIter: Int = 100): LogisticRegressionModel = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features")
      .transform(feats)
    new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol(labelCol)
      .setRegParam(regParam).setMaxIter(maxIter)
      .fit(assembled)
  }

  /** The fitted model as a pure column expression over the feature
    * columns: sigmoid(w·x + b). Codegen'd, streaming-safe, no UDF. */
  def scoreColumn(model: LogisticRegressionModel): Column = {
    val linear = featureCols.zip(model.coefficients.toArray)
      .map { case (c, w) => col(c) * lit(w) }
      .reduce(_ + _) + lit(model.intercept)
    lit(1.0) / (lit(1.0) + exp(-linear))
  }
}
