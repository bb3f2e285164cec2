package graft.catalog

import graft.SparkSpec
import graft.ann.{Ivf, Pq}
import graft.curation.QualityModel
import graft.text.Bpe
import org.apache.spark.sql.functions._

/** Train-once artifact persistence: every fitted artifact (IVF
  * centroids, PQ codebooks, LR coefficients, BPE merges) round-trips
  * through parquet bit-exact, stale stamps refuse to load, and the
  * rebuilt IVF index reproduces the build-time cell assignment. */
class ArtifactsSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-artifacts-spec")
    s"$d/$name"
  }

  test("IVF centroids round-trip and the rebuilt assignment is identical") {
    val corpus = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val built = Ivf.buildIndex(corpus, "vec_id", "embedding", nCells = 8)
    val path = tmp("ivf")
    Ivf.saveCentroids(built, path, srcCount = 123L)
    val loaded = Ivf.loadIndex(corpus, "vec_id", "embedding", path, srcCount = 123L)
      .getOrElse(fail("artifact did not load"))
    val a = built.centroids.orderBy("cell_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val b = loaded.centroids.orderBy("cell_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.sameElements(b), "centroids must round-trip bit-exact")
    val assignA = built.assigned.select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val assignB = loaded.assigned.select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assignA == assignB,
      "rebuilt index must assign every vector to the same cell")
  }

  test("PQ codebooks round-trip bit-exact; encode agrees") {
    val corpus = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val cb = Pq.fit(corpus, "embedding", m = 8, k = 8)
    val path = tmp("pq")
    Pq.saveCodebooks(cb, spark, path, srcCount = 7L)
    val loaded = Pq.loadCodebooks(spark, path, srcCount = 7L)
      .getOrElse(fail("artifact did not load"))
    assert(loaded.m == cb.m && loaded.k == cb.k && loaded.dsub == cb.dsub)
    assert(loaded.flat.sameElements(cb.flat), "flat centroid matrix bit-exact")
    val a = Pq.encode(corpus, "vec_id", "embedding", cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = Pq.encode(corpus, "vec_id", "embedding", loaded).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b, "same codebooks must encode identically")
  }

  test("LR coefficients round-trip bit-exact") {
    val c = QualityModel.Coefs(Seq(0.5, -1.25, 3.75e-3, 0.0, 42.0), -0.125)
    val path = tmp("lr")
    QualityModel.saveCoefs(c, spark, path, srcCount = 99L)
    assert(QualityModel.loadCoefs(spark, path, srcCount = 99L).contains(c))
  }

  test("BPE merges round-trip in rank order") {
    val merges = Seq(
      Bpe.Merge(0, "e", "s</w>", 9L), Bpe.Merge(1, "l", "o", 7L),
      Bpe.Merge(2, "lo", "w", 5L))
    val path = tmp("bpe")
    Bpe.saveMerges(merges, spark, path, srcCount = 11L)
    assert(Bpe.loadMerges(spark, path, srcCount = 11L).contains(merges))
  }

  test("stale stamp and missing path refuse to load") {
    val c = QualityModel.Coefs(Seq(1.0), 0.0)
    val path = tmp("stale")
    QualityModel.saveCoefs(c, spark, path, srcCount = 10L)
    assert(QualityModel.loadCoefs(spark, path, srcCount = 11L).isEmpty,
      "a different source count must invalidate the artifact")
    assert(QualityModel.loadCoefs(spark, tmp("absent"), srcCount = 10L).isEmpty)
    assert(Bpe.loadMerges(spark, tmp("absent2"), srcCount = 1L).isEmpty)
    assert(Pq.loadCodebooks(spark, tmp("absent3"), srcCount = 1L).isEmpty)
  }

  test("pinned artifact: partitioned and single-file writes read back frame-identical") {
    import spark.implicits._
    // the size gate flips corpus-LINEAR signature artifacts to a
    // partitioned write at scale — both shapes must satisfy the same
    // stamp contract and read back the same frame (r15, verdict item 5)
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v").repartition(7)
    val p1 = tmp("art-single")
    val p2 = tmp("art-parts")
    graft.queries.LlmOps.writeArtifact(df, p1, 42L, singleFile = true)
    graft.queries.LlmOps.writeArtifact(df, p2, 42L, singleFile = false)
    val a = spark.read.parquet(p1)
    val b = spark.read.parquet(p2)
    assert(a.select("src_count").distinct().collect().map(_.getLong(0)).toSeq == Seq(42L))
    assert(b.select("src_count").distinct().collect().map(_.getLong(0)).toSeq == Seq(42L))
    def dataFiles(p: String) = new java.io.File(p).listFiles
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(dataFiles(p1) == 1, "single-file mode writes exactly one data file")
    assert(dataFiles(p2) > 1, "partitioned mode keeps the write parallel")
    assert(a.drop("src_count").except(b.drop("src_count")).isEmpty
      && b.drop("src_count").except(a.drop("src_count")).isEmpty,
      "both read paths must be frame-identical")
  }

  test("empty artifact frames pin fresh via the stamp sidecar") {
    import spark.implicits._
    // a zero-row build frame has no row to carry the src_count column —
    // the sidecar stamp is what keeps it from rebuilding every session
    val path = tmp("art-empty")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    graft.queries.LlmOps.writeArtifact(empty, path, 7L, singleFile = true)
    assert(graft.queries.LlmOps.artifactFresh(spark, path, 7L),
      "an empty frame with a matching sidecar stamp must read FRESH")
    assert(!graft.queries.LlmOps.artifactFresh(spark, path, 8L),
      "a different stamp must read stale")
  }

  test("pinnedFrame freshness probe: a foreign artifact without src_count rebuilds, never fails") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pin-probe").toString
    Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    // a pre-existing COMPLETE parquet dir at the artifact path with no
    // src_count column (older code, other tooling): the stamp read
    // throws AnalysisException — that must count as STALE (r15 ADVICE)
    Seq((9L, 9L)).toDF("a", "b").write.parquet(Artifacts.path(dir, "probe_art"))
    val frame = graft.queries.LlmOps.pinnedFrame(spark, dir, "documents", "probe_art") {
      Seq((1L, 10L)).toDF("doc_id", "v")
    }
    assert(frame.columns.toSeq == Seq("doc_id", "v"), "rebuilt with the build frame's schema")
    assert(frame.count() == 1)
  }

  test("artifact paths sit under the root, keyed by data dir") {
    val p = Artifacts.path("/root/testdata/sf0.01", "ivf_c16_s42")
    assert(p.startsWith(Artifacts.root))
    assert(p.matches(""".*root_testdata_sf0\.01_[0-9a-f]+/ivf_c16_s42$"""),
      s"sanitized key + raw-dir hash expected: $p")
    // sanitization collisions stay distinct via the raw-dir hash, and a
    // trailing slash is NOT a distinct dir
    assert(Artifacts.path("/data/x", "m") != Artifacts.path("/data_x", "m"))
    assert(Artifacts.path("/data/x/", "m") == Artifacts.path("/data/x", "m"))
  }

  test("file-level fingerprint changes on rewrite, stable on re-read") {
    val d = java.nio.file.Files.createTempDirectory("fp").toFile
    val f = new java.io.File(d, "part-0.parquet")
    java.nio.file.Files.write(f.toPath, "aaaa".getBytes)
    f.setLastModified(1000000L)
    val fp1 = Artifacts.fingerprint(spark, d.getAbsolutePath)
    assert(fp1 == Artifacts.fingerprint(spark, d.getAbsolutePath), "deterministic")
    // same length, different mtime — the count-preserving rewrite case
    f.setLastModified(2000000L)
    val fp2 = Artifacts.fingerprint(spark, d.getAbsolutePath)
    assert(fp1 != fp2, "mtime change must change the fingerprint")
    // different length
    java.nio.file.Files.write(f.toPath, "aaaaaa".getBytes)
    f.setLastModified(2000000L)
    val fp3 = Artifacts.fingerprint(spark, d.getAbsolutePath)
    assert(fp3 != fp2)
    // the pathological rewrite: same name, same LENGTH, same MTIME,
    // different content (rsync -a / cp -p onto a coarse-mtime fs) — the
    // footer-tail bytes must still change the fingerprint
    java.nio.file.Files.write(f.toPath, "bbbbbb".getBytes)
    f.setLastModified(2000000L)
    assert(Artifacts.fingerprint(spark, d.getAbsolutePath) != fp3,
      "content rewrite preserving length+mtime must change the fingerprint")
    // while a byte-identical restore recovers the original fingerprint
    java.nio.file.Files.write(f.toPath, "aaaaaa".getBytes)
    f.setLastModified(2000000L)
    assert(Artifacts.fingerprint(spark, d.getAbsolutePath) == fp3,
      "identical content+metadata must fingerprint identically")
    // missing path degrades to 0, never throws
    assert(Artifacts.fingerprint(spark, d.getAbsolutePath + "/nope") == 0L)
  }
}
