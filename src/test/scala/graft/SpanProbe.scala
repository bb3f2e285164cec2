package graft

import org.apache.spark.sql.functions._

/** Probe: where do q_span_dedup's 11s go at sf0.1? Stages timed with the
  * honest consume action (Consume.rows), fresh-JVM semantics per run. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("span-probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = graft.engine.Consume.rows(df)
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    println("docs stats:")
    docs.select(count(lit(1)).as("n"),
      avg(size(split(col("text"), " "))).as("avg_toks"),
      max(size(split(col("text"), " "))).as("max_toks")).show()
    t("tokenize_only") {
      docs.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    }
    t("token_hashes") {
      docs.select(col("doc_id"),
        transform(split(col("text"), " "),
          tk => graft.functions.polyhash(tk)).as("hs"))
        .select(col("doc_id"), size(col("hs")).as("n"))
    }
    t("span_hashes_full") {
      graft.dedup.SpanDedup.spanHashes(docs, "doc_id", "text", 8)
    }
    t("dup_hashes") {
      graft.dedup.SpanDedup.duplicatedHashes(
        graft.dedup.SpanDedup.spanHashes(docs, "doc_id", "text", 8))
    }
    t("doc_span_stats") {
      graft.dedup.SpanDedup.docSpanStats(docs, "doc_id", "text", 8)
    }
    // three warm passes of the full face
    (1 to 3).foreach { i =>
      t(s"doc_span_stats_warm$i") {
        graft.dedup.SpanDedup.docSpanStats(docs, "doc_id", "text", 8)
      }
    }
    spark.stop()
  }
}
