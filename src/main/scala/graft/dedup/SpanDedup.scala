package graft.dedup

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Exact-substring (duplicated-span) detection — the token-level
  * complement of the document-level D-block: find every w-token span
  * whose content occurs more than once ANYWHERE in the corpus (another
  * document, or a repeat inside the same document) and account, per
  * document, for the tokens such spans cover. This is the practical
  * corpus-scale shape of suffix-array exact-substring dedup (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better"):
  * a suffix array over 100 TB is not a distributed-friendly structure,
  * but fixed-width span hashing finds the same ≥w-token duplicated
  * regions — any duplicated region of length ≥ w contains a duplicated
  * w-span, and the union of covered positions recovers the region.
  *
  * Scale notes (100 TB):
  *  - Span hashing is entirely map-side: one polyhash per TOKEN (not per
  *    span), then each span hash folds w precomputed 8-byte token hashes
  *    ((h·B + x) mod M) — O(w) long ops per token, no per-span string
  *    re-join, no O(chars·w) rehash.
  *  - The only wide exchanges are keyed on the 8-byte span hash and the
  *    document id. Text never shuffles.
  *  - Duplicated-hash selection is groupBy(h).count ≥ 2 — NOT
  *    collect_list of occurrences per hash: a boilerplate span shared by
  *    millions of documents would put millions of structs in one
  *    aggregation buffer (the D6 viral-bucket hazard). The count-then-
  *    join-back shape keeps every aggregation state a single long, at
  *    the cost of computing the span stream twice — two map-side scans
  *    beat one unbounded buffer.
  *  - Per-document mask union IS a bounded collect_list: span starts per
  *    doc are capped by the doc's own token count, the same per-group
  *    bound as holding the document text itself.
  */
object SpanDedup {

  /** Same constants as [[graft.functions.expressions.PolyHash]] so the
    * span fold stays in the no-overflow envelope: h < M = 2³¹−1, so
    * h·131 + x < 2³⁹. */
  final val M = 2147483647L
  final val B = 131L

  /** The (id, pos, h) span-hash stream: one row per w-token window.
    * Documents shorter than w tokens emit nothing (the fused expression
    * returns an empty array; posexplode drops the row; a NULL text
    * yields a NULL array, same effect). Round-12 rewrite: the span fold
    * is ONE fused expression ([[graft.functions.spanHashes]]) instead
    * of a transform/aggregate/slice HOF chain — the chain's per-span
    * slice copy + boxed fold was 7.8s of q_span_dedup's 11s at sf0.1;
    * the fused loop reads the same stream in ~0.3s, bit-identical
    * hashes (shared [[graft.functions.expressions.PolyHash]] lane). */
  def spanHashes(df: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame =
    df.select(col(idCol),
        posexplode(graft.functions.spanHashes(split(col(textCol), " "), w))
          .as(Seq("pos", "h")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("h"))

  /** Span hashes whose content occurs ≥2 times corpus-wide (the
    * "duplicated substring" set). Single-long aggregation state per
    * hash — safe under any span popularity skew. */
  def duplicatedHashes(spans: DataFrame): DataFrame =
    spans.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)

  /** Per-document duplicated-span accounting:
    * (id, n_tokens, n_dup_spans, n_dup_tokens, dup_frac_x1000) where
    * n_dup_tokens is the size of the UNION of [pos, pos+w) intervals of
    * duplicated spans — the token mass exact-substring dedup would drop.
    * Integer-scaled fraction for engine-parity. */
  def docSpanStats(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val spans = spanHashes(docs, idCol, textCol, w)
    val dup = duplicatedHashes(spans).select("h")
    val perDoc = spans.join(dup, "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_spans"),
        collect_list(col("pos")).as("__ps"))
      // interval union WITHOUT materializing covered positions (r17 —
      // was flatten(per-span sequence) + array_distinct, O(spans × w)
      // elements plus a hash set per doc): span starts are distinct per
      // doc, so after an array_sort the union of [p, p+w) intervals is
      // w for the last span plus Σ min(w, next − cur) over adjacent
      // pairs — one O(spans) fold, exact for every overlap pattern
      .select(col(idCol), col("n_dup_spans"), {
        val ps = array_sort(col("__ps"))
        val len = greatest(size(ps) - 1, lit(0))
        val diffs = zip_with(
          slice(ps, lit(2), len), slice(ps, lit(1), len),
          (nxt, cur) => least(lit(w.toLong), nxt - cur))
        (aggregate(diffs, lit(0L), (a, x) => a + x) + lit(w.toLong))
          .cast("long").as("n_dup_tokens")
      })
    docs.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_dup_spans", "n_dup_tokens"))
      .withColumn("dup_frac_x1000",
        F.expr("CAST(1000 * n_dup_tokens div n_tokens AS BIGINT)"))
  }

  /** The dedup TRANSFORM: drop every NON-CANONICAL occurrence of a
    * duplicated span (canonical = smallest (doc, pos), kept whole) and
    * reconstruct the cleaned text — Lee et al.'s "keep one copy of each
    * duplicated substring" as a distributed plan.
    *
    * Canonical selection is a PACKED-LONG min in the same hash aggregate
    * that counts occurrences (doc_id·2²⁴ + pos orders (doc, pos)
    * lexicographically while keeping the aggregate a HashAggregate — a
    * min-of-struct would plan a SortAggregate, the H6 lesson; pos < 2²⁴
    * and doc_id < 2³⁹ hold to ~550 B docs). Text reconstruction is
    * map-side: the per-doc mask joins back by id and the kept indices
    * compute as array_except(0..n−1, mask) — a HASH-SET difference,
    * O(n_tokens + mask) per document and order-preserving. The r16
    * filter-with-index lambda ran array_contains per TOKEN —
    * O(n_tokens × mask), quadratic in a document's duplicated-span
    * density: fine on a sparse-dup corpus, 3.5× the block on a dense
    * one (36s → 128s at 100× when the r17 corpus generation landed
    * denser spans — the per-doc mask is exactly the lane a data
    * property can blow up, so the engine must not be quadratic in it).
    * The document text itself never shuffles either way. */
  def dedupApply(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val spans = spanHashes(docs, idCol, textCol, w)
    val packed = col(idCol) * lit(1L << 24) + col("pos")
    val occ = spans
      .groupBy(col("h"))
      .agg(count(lit(1)).as("__n_occ"), min(packed).as("__canon"))
      .filter(col("__n_occ") >= 2)
    val masked = spans.join(occ, "h")
      .filter(packed =!= col("__canon"))
      .groupBy(col(idCol))
      .agg(collect_list(col("pos")).as("__ps"))
      .select(col(idCol),
        array_sort(array_distinct(flatten(
          transform(col("__ps"), p => sequence(p, p + (w - 1))))))
          .as("__mask"))
    docs.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .join(masked, Seq(idCol), "left")
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        transform(
          array_except(
            sequence(lit(0L), size(col("__toks")).cast("long") - 1L),
            coalesce(col("__mask"), array().cast("array<bigint>"))),
          i => element_at(col("__toks"), (i + 1L).cast("int"))).as("__clean"))
      .select(col(idCol), col("n_tokens"),
        size(col("__clean")).cast("long").as("n_kept"),
        array_join(col("__clean"), " ").as("clean_text"))
  }
}
