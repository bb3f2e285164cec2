package graft.catalog

import org.apache.spark.sql.SparkSession

/** Filesystem layout + existence probe for TRAIN-ONCE artifacts (IVF
  * centroids, PQ codebooks, LR coefficients, BPE merges).
  *
  * A quantizer or classifier fit is a real job you run once and ship; a
  * per-process memo alone means every new session refits. Each artifact
  * persists as parquet under an artifacts root keyed by the data
  * directory it was trained on, and the per-operator loaders
  * (Ivf/Pq/QualityModel/Bpe `save*`/`load*`) validate a stored
  * source-row-count stamp before trusting it — the staleness guard for
  * a rewritten corpus. (At warehouse scale the stamp would be the table
  * format's snapshot id rather than a count; the count is this repo's
  * engine-agnostic stand-in, one cheap aggregate per session.)
  *
  * Root resolution: `SPARK_GRAFT_ARTIFACTS` env var, else
  * `<cwd>/artifacts` — NEVER inside the (possibly read-only) data dir.
  * Paths go through the Hadoop FileSystem API, so an object-store root
  * works the same as the local default. */
object Artifacts {

  def root: String = sys.env.getOrElse("SPARK_GRAFT_ARTIFACTS",
    new java.io.File(sys.props("user.dir"), "artifacts").getAbsolutePath)

  /** `<root>/<sanitized data dir>/<name>` — name should bake in the fit
    * hyperparameters (e.g. `ivf_c16_s42`) so a config change can't read
    * a mismatched artifact. */
  def path(dataDir: String, name: String): String = {
    val key = dataDir.stripSuffix("/").replaceAll("[^A-Za-z0-9._-]", "_")
      .dropWhile(_ == '_')
    s"$root/$key/$name"
  }

  /** True iff a COMPLETE parquet write exists at `path` (the _SUCCESS
    * marker guards against a half-written artifact from a killed job). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    try fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    catch { case _: java.io.IOException => false }
  }
}
