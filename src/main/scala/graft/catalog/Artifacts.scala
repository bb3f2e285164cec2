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
  * staleness stamp before trusting it. The stamp folds the source row
  * count together with a FILE-LEVEL content fingerprint (lengths +
  * modification times of the table's data files, [[fingerprint]]) — a
  * corpus rewritten with an identical row count still changes the
  * fingerprint, so it can't silently reuse a stale model. (At warehouse
  * scale the stamp would be the table format's snapshot id; this is the
  * engine-agnostic stand-in — one cheap aggregate plus one FS listing
  * per session, no data read.)
  *
  * Root resolution: `SPARK_GRAFT_ARTIFACTS` env var, else
  * `<cwd>/artifacts` — NEVER inside the (possibly read-only) data dir.
  * Paths go through the Hadoop FileSystem API, so an object-store root
  * works the same as the local default. */
object Artifacts {

  def root: String = sys.env.getOrElse("SPARK_GRAFT_ARTIFACTS",
    new java.io.File(sys.props("user.dir"), "artifacts").getAbsolutePath)

  /** `<root>/<sanitized data dir>_<hash>/<name>` — name should bake in
    * the fit hyperparameters (e.g. `ivf_c16_s42`) so a config change
    * can't read a mismatched artifact. The short hash of the RAW dir
    * string keeps distinct dirs distinct even when sanitization would
    * collapse them (`/data/x` vs `/data_x` both sanitize to `data_x`). */
  def path(dataDir: String, name: String): String = {
    val key = dataDir.stripSuffix("/").replaceAll("[^A-Za-z0-9._-]", "_")
      .dropWhile(_ == '_')
    val disambig = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dataDir.stripSuffix("/")))
    s"$root/${key}_$disambig/$name"
  }

  /** Cheap file-level content fingerprint of one source table: XOR-fold
    * of hashed (name, length, mtime, footer-tail bytes) over its parquet
    * data files. Lengths/mtimes catch ordinary rewrites; the last 16
    * bytes of each file (parquet footer: metadata length + magic + the
    * tail of the serialized row-group stats) catch the pathological
    * rewrite that preserves both length and mtime (rsync -a, cp -p onto
    * a coarse-mtime filesystem) — different content almost surely
    * serializes different footer metadata, while a byte-identical copy
    * keeps the same fingerprint, which is the correct answer. One
    * O(16-byte) pread per file, no data pages read; order-independent
    * fold so listing order can't matter. Returns 0 for unreadable/
    * missing paths (the stamp then degrades to the row count alone
    * rather than failing the load path). */
  def fingerprint(spark: SparkSession, tablePath: String): Long =
    try {
      // Path construction itself throws IllegalArgumentException on
      // malformed strings — inside the try, per the degrade contract
      val p = new org.apache.hadoop.fs.Path(tablePath)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val files: Seq[org.apache.hadoop.fs.FileStatus] =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq.filter(f => f.isFile &&
            !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        else Seq(fs.getFileStatus(p))
      files.foldLeft(0L) { (acc, f) =>
        val tail = new Array[Byte](math.min(16L, f.getLen).toInt)
        if (tail.nonEmpty) {
          val in = fs.open(f.getPath)
          try { in.readFully(f.getLen - tail.length, tail) } finally in.close()
        }
        acc ^ scala.util.hashing.MurmurHash3.productHash(
          (f.getPath.getName, f.getLen, f.getModificationTime,
            java.util.Arrays.hashCode(tail))).toLong
      }
    } catch { case scala.util.control.NonFatal(_) => 0L }

  /** True iff a COMPLETE parquet write exists at `path` (the _SUCCESS
    * marker guards against a half-written artifact from a killed job). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    try fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    catch { case _: java.io.IOException => false }
  }
}
