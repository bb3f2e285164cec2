package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D14 exact-substring span dedup: planted duplicated spans, within-doc
  * repetition, short-doc edge, and a declarative ≡ imperative sweep over
  * the real sf0.001 documents table. */
class SpanDedupSpec extends SparkSpec {

  private val w = 4 // small window keeps hand-checked cases readable

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Imperative reference: same semantics, plain Scala. */
  private def expected(rows: Seq[(Long, String)], w: Int)
      : Map[Long, (Long, Long, Long)] = {
    def tokHash(s: String): Long =
      s.codePoints.toArray.foldLeft(0L)((h, c) => (h * 131 + c) % 2147483647L)
    val spans = rows.flatMap { case (id, text) =>
      val hs = text.split(" ", -1).map(tokHash)
      (0 to hs.length - w).map(p =>
        (id, p.toLong,
          hs.slice(p, p + w).foldLeft(0L)((a, x) => (a * 131 + x) % 2147483647L)))
    }
    val dupHashes = spans.groupBy(_._3).filter(_._2.size >= 2).keySet
    val dupSpans = spans.filter(s => dupHashes(s._3))
    rows.map { case (id, text) =>
      val mine = dupSpans.filter(_._1 == id)
      val covered = mine.flatMap(s => s._2 until s._2 + w).toSet
      id -> (text.split(" ", -1).length.toLong, mine.size.toLong,
        covered.size.toLong)
    }.toMap
  }

  private def check(rows: (Long, String)*): Unit = {
    val got = SpanDedup.docSpanStats(docs(rows: _*), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected(rows, w))
  }

  test("cross-document duplicated span is found and masked") {
    check(
      1L -> "a b c d e f",
      2L -> "x y c d e f",   // shares the 4-span "c d e f"
      3L -> "p q r s t u")
    val stats = SpanDedup.docSpanStats(docs(
      1L -> "a b c d e f",
      2L -> "x y c d e f",
      3L -> "p q r s t u"), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(stats(1L) == 4 && stats(2L) == 4 && stats(3L) == 0)
  }

  test("within-document repetition masks itself") {
    // "x x x x x x": spans at 0,1,2 all hash equal -> all 6 tokens covered
    check(1L -> "x x x x x x", 2L -> "unrelated words entirely here now")
  }

  test("spanHashes tolerates null tokens (containsNull input) without NPE") {
    import spark.implicits._
    // arrays built by transform over nullable columns carry containsNull;
    // a null token hashes to the fixed 0 lane (round-14 advice fix)
    val out = Seq(Tuple1(Seq("a", null, "b", "c", "d")))
      .toDF("toks")
      .select(graft.functions.spanHashes(col("toks"), w).as("h"))
      .collect()
    assert(out.head.getSeq[Long](0).length == 2, "5 tokens, w=4 => 2 spans")
  }

  test("documents shorter than w emit no spans and zero dups") {
    check(1L -> "a b c", 2L -> "a b c") // 3 tokens < w=4: exact dup text, no span
    val out = SpanDedup.docSpanStats(docs(1L -> "a b c", 2L -> "a b c"),
      "doc_id", "text", w).collect()
    assert(out.forall(r => r.getLong(2) == 0 && r.getLong(3) == 0))
  }

  test("overlapping duplicated spans union their positions") {
    // docs share a 6-token run -> three overlapping 4-spans, union = 6
    check(
      1L -> "u v a b c d e f",
      2L -> "a b c d e f w z")
    val stats = SpanDedup.docSpanStats(docs(
      1L -> "u v a b c d e f",
      2L -> "a b c d e f w z"), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(stats(1L) == ((3L, 6L)) && stats(2L) == ((3L, 6L)))
  }

  test("declarative ≡ imperative on the real corpus (w=8)") {
    val real = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val rows = real.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = SpanDedup.docSpanStats(real, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected(rows, 8))
    assert(got.values.exists(_._3 > 0), "corpus should contain duplicated spans")
  }

  test("apply keeps the canonical (first) occurrence and drops the rest") {
    val out = SpanDedup.dedupApply(docs(
      1L -> "a b c d e f",
      2L -> "x y c d e f",   // shares "c d e f" (w=4) — doc 1 is canonical
      3L -> "c d e f q r"), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((6L, "a b c d e f")), "canonical doc untouched")
    assert(out(2L) == ((2L, "x y")), "non-canonical occurrence dropped")
    assert(out(3L) == ((2L, "q r")))
  }

  test("apply masks within-doc repeats, keeping the earliest span whole") {
    // "x x x x x x": spans at 0,1,2 share one hash; canonical pos 0 kept,
    // spans 1 and 2 masked -> positions 1..5 dropped, "x" remains
    val out = SpanDedup.dedupApply(docs(1L -> "x x x x x x"),
      "doc_id", "text", w).collect().head
    assert(out.getLong(2) == 1 && out.getString(3) == "x")
  }

  test("apply on a dup-free corpus is the identity") {
    val rows = Seq(1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five six")
    val out = SpanDedup.dedupApply(docs(rows: _*), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == rows.toMap)
  }

  test("apply drops a fully-duplicated doc to empty text, never null") {
    val out = SpanDedup.dedupApply(docs(
      1L -> "a b c d", 2L -> "a b c d"), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((4L, "a b c d")))
    assert(out(2L) == ((0L, "")), "empty result must be '' (oracle parity)")
  }

  test("dup_frac_x1000 is the integer-scaled mask ratio") {
    val out = SpanDedup.docSpanStats(docs(
      1L -> "a b c d e f g h i j",   // 10 tokens, no dup
      2L -> "k l a b c d m n o p",   // shares "a b c d": 4 of 10 -> 400
      3L -> "q r a b c d s t u v"), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 400L, 2L -> 400L, 3L -> 400L))
  }
}
