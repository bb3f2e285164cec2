package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.expressions.{CosineSimilarity, LshBucket, MinHashSignature, PolyHash, SimHash64}

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
  }
}
