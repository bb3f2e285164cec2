package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  // the Sennrich et al. reference corpus (word → frequency)
  private val classic = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("classic corpus learns the reference merges in order, ties broken lexicographically") {
    val merges = Bpe.train(classic, numMerges = 5)
    // pair counts: (e,s)=9 (s,t)=9 (t,</w>)=9 tie → lexicographic (e,s)
    // first; then (es,t)=9, (est,</w>)=9; then (l,o)=7/(o,w)=7 tie → (l,o)
    assert(merges.map(m => (m.left, m.right)) == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_.count) == Seq(9L, 9L, 9L, 7L, 7L))
  }

  test("declarative apply matches the imperative trainer fold on every word") {
    import spark.implicits._
    val merges = Bpe.train(classic, numMerges = 8)
    def reference(w: String): Seq[String] =
      merges.sortBy(_.rank).foldLeft(w.map(_.toString).toArray :+ "</w>") {
        (s, m) => Bpe.mergeOnce(s, m.left, m.right)
      }.toSeq
    val words = classic.map(_._1) ++ Seq("lowest", "newer", "wide", "x")
    val got = words.toDF("word")
      .select($"word", Bpe.applyMerges($"word", merges).as("sym"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach(w => assert(got(w) == reference(w), s"mismatch for '$w'"))
  }

  test("overlapping pairs merge leftmost-first (the aaa case)") {
    import spark.implicits._
    val merges = Seq(Bpe.Merge(0, "a", "a", 9L))
    val got = Seq("aaa", "aaaa", "aa").toDF("word")
      .select($"word", Bpe.applyMerges($"word", merges).as("sym"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("aaa") == Seq("aa", "a", "</w>"))
    assert(got("aaaa") == Seq("aa", "aa", "</w>"))
    assert(got("aa") == Seq("aa", "</w>"))
  }

  test("segmentation round-trips: concatenated subwords reproduce the word") {
    val out = graft.queries.LlmOps.qBpeEncode(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rebuilt = r.getAs[String]("subwords").replace(" ", "")
      assert(rebuilt == r.getAs[String]("word") + "</w>",
        s"round-trip failed for ${r.getAs[String]("word")}: $rebuilt")
    }
  }

  test("merges below the count floor are never learned") {
    val merges = Bpe.train(Seq("ab" -> 1L, "cd" -> 1L), numMerges = 5, minCount = 2L)
    assert(merges.isEmpty)
  }

  test("property: random small-alphabet corpora — declarative ≡ imperative, round-trip holds") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    // 3-letter alphabet → dense repeated pairs, overlapping runs ("aaa"),
    // and merge chains deeper than the classic corpus exercises
    val word = for {
      n <- Gen.choose(1, 10)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    for (seed <- 1 to 5) {
      val words = sample(Gen.listOfN(40, word), seed.toLong)
      val hist = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val merges = Bpe.train(hist, numMerges = 12)
      assert(merges.nonEmpty, s"seed=$seed should learn merges")
      def reference(w: String): Seq[String] =
        merges.sortBy(_.rank).foldLeft(w.map(_.toString).toArray :+ "</w>") {
          (s, m) => Bpe.mergeOnce(s, m.left, m.right)
        }.toSeq
      val distinct = words.distinct
      val got = distinct.toDF("word")
        .select($"word", Bpe.applyMerges($"word", merges).as("sym"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      distinct.foreach { w =>
        assert(got(w) == reference(w), s"seed=$seed apply mismatch for '$w'")
        assert(got(w).mkString == w + "</w>", s"seed=$seed round-trip for '$w'")
      }
    }
  }

  test("registered trainer emits ranked merges over the corpus") {
    val rows = graft.queries.LlmOps.qBpeTrain(spark, sfDir).collect()
    assert(rows.length == 40)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (0L until 40L))
    // counts are non-increasing only within a pass structure, but every
    // learned merge must have met the floor
    rows.foreach(r => assert(r.getAs[Long]("count") >= 2L))
  }

  test("fertility report: >= 1000 per lang, mass-weighted, merges reduce it") {
    import spark.implicits._
    val out = graft.queries.LlmOps.qBpeFertility(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (lang, nWords, nPieces, fert) =>
      assert(nWords > 0 && nPieces >= nWords, lang)
      assert(fert == nPieces * 1000L / nWords, s"$lang roll-up arithmetic")
      assert(fert >= 1000L, s"$lang: a word is always >= 1 piece")
    }
    // independent word-mass check: n_words matches a plain count
    val expect = graft.sources.Tables.table(spark, sfDir, "documents")
      .where($"text".isNotNull)
      .select($"lang", org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("w"))
      .where(org.apache.spark.sql.functions.length($"w") > 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(t => t._1 -> t._2).toMap == expect)
    // with NO merges every word splits to its characters + </w>: the
    // corpus merges must strictly reduce fertility below that ceiling
    val merges = graft.queries.LlmOps.bpeMerges(spark, sfDir)
    assert(merges.nonEmpty)
    val unmergedPieces = graft.sources.Tables.table(spark, sfDir, "documents")
      .where($"text".isNotNull)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("w"))
      .where(org.apache.spark.sql.functions.length($"w") > 0)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length($"w") + 1).cast("long"))
      .head().getLong(0)
    val totalPieces = out.map(_._3).sum
    assert(totalPieces < unmergedPieces,
      "trained merges must compress below the char-split ceiling")
  }
}
