package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.expressions.{CosineSimilarity, FreqSketch, InterleaveBits, KmvSketch, LongSetJaccard, LshBucket, MinHashSignature, PolyHash, SimHash64, TopKByScore, VectorSum}

/** SparkSessionExtensions hook: registers the engine's custom codegen
  * expressions as SQL functions, so `spark.sql` queries (and any SQL-first
  * tooling pointed at the session) can call them directly:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)
  * spark.sql("SELECT polyhash(text), simhash64(hashes) FROM docs")
  * }}}
  *
  * Install via `.withExtensions` or
  * `spark.sql.extensions=graft.engine.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<bigint>) - 64-bit SimHash of token hashes"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    ext.injectFunction((FunctionIdentifier("polyhash"),
      info("polyhash", "polyhash(string) - polynomial rolling-hash fingerprint"),
      (args: Seq[Expression]) => PolyHash(args.head)))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(array<double>, array<double>)"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(array<bigint>, k) - k-lane MinHash"),
      (args: Seq[Expression]) =>
        MinHashSignature(args.head, intArg(args(1), "minhash_signature k"))))
    ext.injectFunction((FunctionIdentifier("lsh_bucket"),
      info("lsh_bucket", "lsh_bucket(array<double>, dims, planes) - hyperplane LSH bucket"),
      (args: Seq[Expression]) => LshBucket(args.head,
        intArg(args(1), "lsh_bucket dims"), intArg(args(2), "lsh_bucket planes"))))
    ext.injectFunction((FunctionIdentifier("long_set_jaccard"),
      info("long_set_jaccard",
        "long_set_jaccard(array<bigint>, array<bigint>) - exact set Jaccard x1000"),
      (args: Seq[Expression]) => LongSetJaccard(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("interleave_bits"),
      info("interleave_bits",
        "interleave_bits(bigint, ...) - Morton Z-order key over N columns"),
      (args: Seq[Expression]) => InterleaveBits(args)))
    // aggregates: the analyzer wraps a returned AggregateFunction in its
    // AggregateExpression, so these work directly under GROUP BY
    ext.injectFunction((FunctionIdentifier("vector_sum"),
      info("vector_sum", "vector_sum(array<double>) - elementwise sum (centroids)"),
      (args: Seq[Expression]) => VectorSum(args.head)))
    ext.injectFunction((FunctionIdentifier("topk_by_score"),
      info("topk_by_score",
        "topk_by_score(double, bigint, k) - bounded top-k (score desc, id asc)"),
      (args: Seq[Expression]) =>
        TopKByScore(args(0), args(1), intArg(args(2), "topk_by_score k"))))
    ext.injectFunction((FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct", "kmv_distinct(value, k) - KMV distinct-count estimate"),
      (args: Seq[Expression]) =>
        KmvSketch(args(0), intArg(args(1), "kmv_distinct k"))))
    ext.injectFunction((FunctionIdentifier("freq_items"),
      info("freq_items", "freq_items(value, k) - Misra-Gries heavy hitters map"),
      (args: Seq[Expression]) =>
        FreqSketch(args(0), intArg(args(1), "freq_items k"))))
  }
}
