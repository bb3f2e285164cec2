package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  test("chunking windows cover every token with the configured overlap") {
    import spark.implicits._
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"),
      "text", "doc_id", size = 32, stride = 24)
      .orderBy("chunk_id")
      .collect()
    // starts at 0, 24, 48, 72, 96 → 5 chunks; last has 100-96 = 4 tokens
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_.getLong(2)).toSeq == Seq(32L, 32L, 32L, 28L, 4L))
    assert(out(1).getString(3).startsWith("w25 "))   // start 24 → token 25
    assert(out(4).getString(3) == "w97 w98 w99 w100")
    // every token appears in at least one chunk
    val covered = out.flatMap(_.getString(3).split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"w$i").toSet)
  }

  test("one-token and shorter-than-size docs chunk to a single window") {
    import spark.implicits._
    val out = Chunking.chunk(
      Seq((1L, "only"), (2L, "two words")).toDF("doc_id", "text"),
      "text", "doc_id", size = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSet == Set((1L, 0L, 1L, "only"), (2L, 0L, 2L, "two words")))
  }

  test("null-text docs chunk to nothing (matching SQL range-over-null semantics)") {
    import spark.implicits._
    val out = Chunking.chunk(
      Seq((1L, null: String), (2L, "real text")).toDF("doc_id", "text"),
      "text", "doc_id", size = 4, stride = 4)
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(2L))
  }

  test("boilerplate units shared by many docs are dropped, rare units kept in order") {
    import spark.implicits._
    // 'c1 c2' is the planted boilerplate (in every doc); unique payloads stay
    val docs = (1 to 10).map(i => (i.toLong, s"c1 c2 u$i v$i z$i y$i")).toDF("doc_id", "text")
    val out = Chunking.dropBoilerplate(docs, "text", "doc_id", unit = 2, maxDocFreq = 5L)
      .orderBy("doc_id").collect()
    assert(out.length == 10)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == 3L)             // n_units: 6 tokens / 2
      assert(r.getLong(2) == 2L)             // n_kept: boilerplate unit dropped
      assert(r.getString(3) == s"u${i + 1} v${i + 1} z${i + 1} y${i + 1}") // order preserved
    }
  }

  test("sequence packing: budget kept within one chunk, stable under repartitioning") {
    import spark.implicits._
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val chunks = Chunking.chunk(docs, "text", "doc_id", size = 32, stride = 32)
    def pack(c: org.apache.spark.sql.DataFrame) =
      Chunking.packSequences(c, "n_tokens", "chunk_text",
        Seq("doc_id", "chunk_id"), budgetTokens = 256L)
    val packed = pack(chunks)
    val seqs = packed.groupBy("seq_id")
      .agg(sum("n_tokens").as("toks"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // conservation
    assert(seqs.map(_._2).sum ==
      chunks.agg(sum("n_tokens")).head().getLong(0))
    // every sequence except the last deviates from the budget by < one chunk
    val maxChunk = 32L
    seqs.dropRight(1).foreach { case (id, toks) =>
      assert(toks > 256L - maxChunk && toks < 256L + maxChunk, s"seq $id has $toks")
    }
    // content-keyed determinism: physical layout must not matter
    val a = packed.select("doc_id", "chunk_id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = pack(chunks.repartition(17)).select("doc_id", "chunk_id", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("sequence packing treats NULL token counts as 0 instead of an executor NPE") {
    import spark.implicits._
    val chunks = Seq(
      (1L, 0L, Option(100L), "aaa"),
      (2L, 0L, Option.empty[Long], "bbb"),  // null n_tokens
      (3L, 0L, Option(100L), "ccc"),
      (4L, 0L, Option(100L), "ddd"))
      .toDF("doc_id", "chunk_id", "n_tokens", "chunk_text")
    val packed = Chunking.packSequences(chunks, "n_tokens", "chunk_text",
      Seq("doc_id", "chunk_id"), budgetTokens = 150L)
    val rows = packed.select("doc_id", "seq_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.size == 4) // the null row is kept and assigned
    // conservation over non-null tokens: 300 total / budget 150 ⇒ ids 0..2
    assert(rows.values.max <= 2L)
  }

  test("a doc that is all boilerplate keeps an empty cleaned_text row") {
    import spark.implicits._
    val docs = ((1 to 9).map(i => (i.toLong, s"same pair u$i v$i")) :+ (10L, "same pair"))
      .toDF("doc_id", "text")
    val out = Chunking.dropBoilerplate(docs, "text", "doc_id", unit = 2, maxDocFreq = 5L)
      .filter($"doc_id" === 10L).collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 0L && out(0).getString(3) == "")
  }

  test("chunk dedup: a paragraph duplicated across docs keeps exactly one canonical") {
    import spark.implicits._
    // 16-token "paragraph" P embedded in three docs at different
    // positions, chunk-aligned (16-token windows): the (doc 1, chunk 0)
    // occurrence is the packed-min canonical; distinct chunks all keep
    val p = (1 to 16).map(i => s"p$i").mkString(" ")
    val filler1 = (1 to 16).map(i => s"a$i").mkString(" ")
    val filler2 = (1 to 16).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p $filler1"),          // P at chunk 0 ← canonical
      (2L, s"$filler2 $p"),          // P at chunk 1 → dropped
      (3L, s"$p"))                   // P at chunk 0 → dropped
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("chunkdedup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.LlmOps.qChunkDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    assert(out((1L, 0L)), "first occurrence is the canonical")
    assert(!out((2L, 1L)) && !out((3L, 0L)), "later occurrences drop")
    assert(out((1L, 1L)) && out((2L, 0L)), "distinct chunks all keep")
  }

  test("chunk dedup apply: rebuild drops exactly the copied paragraph, totals reconcile") {
    import spark.implicits._
    val p = (1 to 16).map(i => s"p$i").mkString(" ")
    val filler1 = (1 to 16).map(i => s"a$i").mkString(" ")
    val filler2 = (1 to 16).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p $filler1"),          // canonical doc: keeps everything
      (2L, s"$filler2 $p"),          // loses the copied P, keeps filler2
      (3L, s"$p"))                   // entire doc is the dup → empty rebuild
      .toDF("doc_id", "text")
    val out = graft.queries.LlmOps.chunkDedupApply(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 2L, s"$p $filler1")), "canonical doc rebuilds unchanged")
    assert(out(2L) == ((2L, 1L, filler2)), "copied chunk drops, survivor keeps order")
    assert(out(3L) == ((1L, 0L, "")), "all-duplicate doc rebuilds to empty text")
  }
}
