package graft.curation

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalStatsSpec extends SparkSpec {

  private def docs = graft.sources.Tables.table(spark, sfDir, "documents")

  test("merged half-states equal the full-recompute state bit-for-bit") {
    val whole = CorpusState.state(docs, "text").collect()(0)
    val merged = CorpusState.merge(
      CorpusState.state(docs.filter(col("doc_id") % 2 === 0), "text")
        .unionAll(CorpusState.state(docs.filter(col("doc_id") % 2 =!= 0), "text")))
      .collect()(0)
    Seq("n_docs", "n_text_docs", "total_tokens", "min_tokens", "max_tokens")
      .foreach(c => assert(merged.getAs[Long](c) == whole.getAs[Long](c), c))
    Seq("content_sketch", "lang_sketch").foreach { c =>
      assert(merged.getSeq[Long](merged.fieldIndex(c)) ==
        whole.getSeq[Long](whole.fieldIndex(c)),
        s"$c must merge to exactly the union's sketch")
    }
  }

  test("distinct estimates are exact below sketch capacity") {
    val rendered = CorpusState.render(CorpusState.state(docs, "text"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("value")).toMap
    val exactContent = docs.filter(col("text").isNotNull)
      .select(countDistinct(md5(col("text")))).collect()(0).getLong(0)
    val exactLangs = docs.select(countDistinct(col("lang"))).collect()(0).getLong(0)
    assert(rendered("distinct_content_est") == exactContent)
    assert(rendered("distinct_lang_est") == exactLangs)
    assert(rendered("n_docs") == docs.count())
  }

  test("over-capacity sketch estimates within KMV error bounds") {
    val k = 128
    val est = CorpusState.render(CorpusState.state(docs, "text", k), k)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("value")).toMap
    val exact = docs.filter(col("text").isNotNull)
      .select(countDistinct(md5(col("text")))).collect()(0).getLong(0)
    assert(exact > k, "test needs an over-capacity corpus")
    val rel = math.abs(est("distinct_content_est").toDouble - exact) / exact
    assert(rel < 0.25, s"estimate ${est("distinct_content_est")} vs $exact: rel error $rel")
  }

  test("registered incremental card renders the seven state metrics") {
    val rows = graft.queries.LlmOps.qCorpusReportIncremental(spark, sfDir).collect()
    assert(rows.length == 7)
    val m = rows.map(r => r.getString(0) -> r.getAs[Long]("value")).toMap
    assert(m("n_docs") == docs.count())
    assert(m("min_tokens") >= 1L && m("max_tokens") >= m("min_tokens"))
  }
}
