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
    * Keeps `quality_x1000` alongside for heuristic-label derivation.
    *
    * ONE stateless projection (no self-join of two feature branches) —
    * which is what lets the identical code score a STREAM: a streaming
    * ingest gate is `features → scoreColumn ≥ τ`, no state, no
    * watermark. The repetition fractions reuse the F5 expressions
    * verbatim (sorted-gram run-length fold; n_words from the same token
    * split), so values match `repetitionSignals` exactly. */
  def features(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import graft.text.TextAnalysis
    val toks = split(col(textCol), " ")
    TextAnalysis.qualityScore(df.filter(col(textCol).isNotNull), textCol)
      .withColumn("__toks", toks)
      .withColumn("__rep_n_words", size(col("__toks")).cast("long"))
      .withColumn("__top_bigram", TextAnalysis.maxRunLength(
        array_sort(graft.dedup.Dedup.ngramsFromTokens(col("__toks"), 2))))
      .select(col(idCol),
        col("n_words").cast("double").as("n_words"),
        col("avg_word_len_x100").cast("double").as("avg_word_len_x100"),
        col("stop_hits").cast("double").as("stop_hits"),
        expr("CAST(1000 * (__rep_n_words - size(array_distinct(__toks))) div __rep_n_words AS BIGINT)")
          .cast("double").as("dup_word_frac_x1000"),
        when(col("__rep_n_words") < 2, lit(0L))
          .otherwise(expr("CAST(1000 * __top_bigram div (__rep_n_words - 1) AS BIGINT)"))
          .cast("double").as("top_bigram_frac_x1000"),
        col("quality_x1000"))
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
