package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (F22) — byte-pair-encoding merge learning
  * (Sennrich et al. 2016), the step that turns a curated corpus into a
  * subword vocabulary. Structured the way production trainers are:
  *
  *  1. The CORPUS-SCALE pass is one Spark aggregate: the word-type
  *     histogram (word → count). That is the only pass that touches all
  *     the data — 100 TB in, |vocabulary| rows out.
  *  2. The merge LOOP runs over that bounded histogram on the driver
  *     (`maxTypes` caps it explicitly, count-desc/word-asc top-K like
  *     the F12 vocabulary). Each iteration is O(types × word length) on
  *     a few-MB structure — distributing it would shuffle a tiny table
  *     `numMerges` times for nothing. Same bounded-driver contract as
  *     the D6 union-find threshold and the F11 offset array.
  *  3. APPLY is declarative again: the learned merges fold into a chain
  *     of array expressions (one leftmost-greedy merge pass per rule, in
  *     rank order — exactly the reference algorithm's apply), so
  *     encoding is a map-side projection over any corpus, streaming
  *     included. No UDF, no per-row interpreter.
  *
  * Symbol convention: a word is its characters plus a final `</w>`
  * end-of-word marker (the original paper's), so merges can learn
  * suffix units distinct from mid-word ones.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** The one corpus-scale pass: whitespace word-type histogram, capped
    * to the `maxTypes` most frequent types (count desc, word asc — the
    * deterministic F12 ordering). */
  def wordHistogram(df: DataFrame, textCol: String, maxTypes: Int): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(maxTypes)

  /** Learn `numMerges` merges from the histogram. Deterministic: best
    * pair = max count, ties broken (left, right) ascending. Pairs below
    * `minCount` are never merged (the trainer stops early if nothing
    * qualifies). */
  def train(hist: Seq[(String, Long)], numMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    var seqs: Seq[(Array[String], Long)] = hist.map { case (w, n) =>
      (w.map(_.toString).toArray :+ "</w>", n)
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (s, n) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + n
          i += 1
        }
      }
      val candidates = counts.filter(_._2 >= minCount)
      if (candidates.isEmpty) done = true
      else {
        val ((l, r), c) = candidates.minBy { case ((a, b), n) => (-n, a, b) }
        merges += Merge(rank, l, r, c)
        seqs = seqs.map { case (s, n) => (mergeOnce(s, l, r), n) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Persist the learned merge table (rank, left, right, count) stamped
    * with the source corpus row count — the tokenizer-training artifact
    * a deployment ships (see [[graft.catalog.Artifacts]]). */
  def saveMerges(merges: Seq[Merge], spark: org.apache.spark.sql.SparkSession,
      path: String, srcCount: Long): Unit = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.count, srcCount))
      .toDF("rank", "left", "right", "count", "src_count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load merges persisted by [[saveMerges]]; None when absent or
    * stale. Rank order restored by sort (parquet rows are unordered). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String, srcCount: Long): Option[Seq[Merge]] = {
    if (!graft.catalog.Artifacts.exists(spark, path)) None
    else {
      val rows = spark.read.parquet(path)
        .select("rank", "left", "right", "count", "src_count").collect()
      if (rows.isEmpty || rows.exists(_.getLong(4) != srcCount)) None
      else Some(rows.map(r =>
        Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_.rank).toSeq)
    }
  }

  /** One leftmost-greedy merge pass over a symbol array (the reference
    * apply step: merged symbols don't re-pair with what preceded them
    * in the same pass). */
  private[text] def mergeOnce(s: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == l && s(i + 1) == r) { out += l + r; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** A word column → its initial symbol array (chars + `</w>`). */
  def symbolize(word: Column): Column =
    concat(split(word, ""), array(lit("</w>")))

  /** One declarative leftmost-greedy merge pass: the Column twin of
    * [[mergeOnce]]. The fold carries (out, pending) — `pending` holds a
    * just-seen `l` awaiting its `r`; a merged token is flushed to `out`
    * and can't re-pair leftward, matching the imperative scan. */
  private def mergePass(arr: Column, l: String, r: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"), lit(null).cast("string").as("pend"))
    val step = (acc: Column, x: Column) => {
      val pend = acc.getField("pend")
      val out = acc.getField("out")
      when(pend.isNotNull && x === lit(r),
        struct(concat(out, array(lit(l + r))).as("out"),
          lit(null).cast("string").as("pend")))
        .when(x === lit(l),
          struct(when(pend.isNotNull, concat(out, array(pend))).otherwise(out).as("out"),
            x.as("pend")))
        .otherwise(
          struct(concat(when(pend.isNotNull, concat(out, array(pend))).otherwise(out),
            array(x)).as("out"),
            lit(null).cast("string").as("pend")))
    }
    val fin = (acc: Column) =>
      when(acc.getField("pend").isNotNull,
        concat(acc.getField("out"), array(acc.getField("pend"))))
        .otherwise(acc.getField("out"))
    aggregate(arr, init, step, fin)
  }

  /** Apply learned merges to a word column, rank order (the standard
    * apply): returns the final symbol array. A chain of `merges.length`
    * array folds in ONE projection — map-side, streaming-safe. */
  def applyMerges(word: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(symbolize(word)) { (arr, m) =>
      mergePass(arr, m.left, m.right)
    }
}
