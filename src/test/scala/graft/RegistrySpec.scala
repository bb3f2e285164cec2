package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guardrails: the query registry and oracle map must
  * stay consistent or the correctness gate silently weakens. */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key is a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only queries are the documented set, no silent oracle drops") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set(
      "q_dedup_minhash", "q_dedup_simhash", "q_embedding_neardup_lsh",
      "q_ann_lsh", "q_ann_ivf", "q_dedup_cross", "q_dedup_apply_lsh",
      "q_semdedup", "q_quality_classifier", "q_bpe_train", "q_bpe_encode",
      "q_hard_negatives_lsh", "q_corpus_report_incremental",
      "q_join_estimate", "q_join_estimate_skew", "q_pq_topk", "q_pq_ivf"),
      s"unexpected rows-only set: $rowsOnly — add an oracle or document the exception")
  }

  test("oracle SQL is non-empty with margins stripped") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, k)
      // an unstripped margin leaves lines starting with a single pipe
      // (string concat '||' is legitimate and excluded)
      val unstripped = sql.linesIterator.exists(l =>
        l.trim.startsWith("|") && !l.trim.startsWith("||"))
      assert(!unstripped, s"$k: unstripped margin")
    }
  }
}
