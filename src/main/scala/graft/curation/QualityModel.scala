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

  /** The scoring artifact: |features|+1 doubles, weight order =
    * [[featureCols]]. This — not the MLlib model object — is what ships:
    * everything downstream (batch scorer, streaming gate) needs only
    * these numbers. */
  final case class Coefs(weights: Seq[Double], intercept: Double)

  def coefsOf(model: LogisticRegressionModel): Coefs =
    Coefs(model.coefficients.toArray.toSeq, model.intercept)

  /** The fitted coefficients as a pure column expression over the
    * feature columns: sigmoid(w·x + b). Codegen'd, streaming-safe, no
    * UDF. */
  def scoreColumn(c: Coefs): Column = {
    val linear = featureCols.zip(c.weights)
      .map { case (f, w) => col(f) * lit(w) }
      .reduce(_ + _) + lit(c.intercept)
    lit(1.0) / (lit(1.0) + exp(-linear))
  }

  def scoreColumn(model: LogisticRegressionModel): Column =
    scoreColumn(coefsOf(model))

  /** Persist the coefficients (one parquet row) stamped with the
    * training-table row count (see [[graft.catalog.Artifacts]]). */
  def saveCoefs(c: Coefs, spark: org.apache.spark.sql.SparkSession,
      path: String, srcCount: Long): Unit = {
    import spark.implicits._
    Seq((c.weights, c.intercept, srcCount))
      .toDF("weights", "intercept", "src_count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load coefficients persisted by [[saveCoefs]]; None when absent or
    * stale. */
  def loadCoefs(spark: org.apache.spark.sql.SparkSession,
      path: String, srcCount: Long): Option[Coefs] = {
    if (!graft.catalog.Artifacts.exists(spark, path)) None
    else spark.read.parquet(path).select("weights", "intercept", "src_count")
      .collect().headOption.filter(_.getLong(2) == srcCount)
      .map(r => Coefs(r.getSeq[Double](0), r.getDouble(1)))
  }
}
