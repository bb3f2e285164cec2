package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared across operators.
  *
  * Everything here composes built-in codegen'd expressions (no Scala UDFs)
  * so the hot path stays inside whole-stage codegen, and every function has
  * an exact DuckDB-SQL twin so operators built on them stay oracle-checkable
  * (SURVEY.md §6).
  */
package object functions {

  /** Deterministic UUID-shaped id derived from any key column: md5 hex
    * grouped 8-4-4-4-12. Stand-in for the reference's UUID primary keys
    * (tap-redshift/src/sync.py:30-54 filters Pendo ids with len==36).
    * DuckDB twin: md5(CAST(k AS VARCHAR)) + substr/|| concatenation. */
  def uuidify(key: Column): Column = {
    val h = md5(key.cast("string"))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  /** UUID validity: exact length 36 + lowercase-hex 8-4-4-4-12 shape.
    * Mirrors sync.py:42 (`len(id) == 36`) + validators.uuid. */
  def uuidValid(id: Column): Column =
    length(id) === 36 &&
      id.rlike("^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")

  /** ISO-8601 second-precision formatting used in RECORD messages and
    * bookmark values (messages.py:351 isoformat + 'Z'). */
  def isoTimestamp(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Cosine similarity between two array<double> columns — fused-loop
    * custom codegen expression (bit-identical to the composable
    * zip_with/aggregate formulation, ~an order of magnitude faster on
    * all-pairs joins; see expressions.CosineSimilarity). */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(expressions.CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fused integer dot product over two array<bigint> columns — the int8
    * exact-scan scoring kernel (see expressions.DotProductLong). */
  def dotProductLong(a: Column, b: Column): Column =
    ColumnBridge.column(expressions.DotProductLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Fused double dot product over two array<double> columns — the
    * PCA-projected coarse-scan kernel (see expressions.DotProductDouble;
    * left-fold order identical to the zip_with/aggregate form). */
  def dotProductDouble(a: Column, b: Column): Column =
    ColumnBridge.column(expressions.DotProductDouble(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** One-pass k-lane MinHash signature of an array<bigint> of shingle
    * hashes (see expressions.MinHashSignature). */
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(expressions.MinHashSignature(
      ColumnBridge.expression(hashes), numHashes))

  /** 64-bit SimHash of an array<bigint> of token hashes (custom codegen
    * expression — graft.functions.expressions.SimHash64). */
  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(expressions.SimHash64(ColumnBridge.expression(tokenHashes)))

  /** Polynomial rolling-hash fingerprint of a string column (custom codegen
    * expression — graft.functions.expressions.PolyHash). */
  def polyhash(text: Column): Column =
    ColumnBridge.column(expressions.PolyHash(ColumnBridge.expression(text)))

  /** Fused w-token span-hash stream (D14): one polynomial hash per
    * w-token window of the token array, positions implied by index —
    * see expressions.SpanHashes for why this beats the HOF chain. */
  def spanHashes(tokens: Column, w: Int): Column =
    ColumnBridge.column(expressions.SpanHashes(
      ColumnBridge.expression(tokens), w))

  /** Hamming distance between two 64-bit signatures (built-in bit_count of
    * xor — already codegen'd, no custom expression needed). */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** Fused exact set-Jaccard ×1000 of two array<bigint> columns (one
    * sort-merge pass; see expressions.LongSetJaccard) — bit-identical to
    * the array_intersect/array_distinct formulation on long arrays. */
  def longSetJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(expressions.LongSetJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** [[longSetJaccard]] for inputs already sorted ascending (e.g.
    * graft.dedup.Dedup.hashedNgrams): merge-only, no per-pair sort.
    * Unsorted input silently computes the wrong value — the caller owns
    * the precondition. */
  def longSetJaccardSorted(a: Column, b: Column): Column =
    ColumnBridge.column(expressions.LongSetJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b), assumeSorted = true))

  /** Product-quantization encode: array<double> vector → array<bigint>
    * of m nearest-centroid ids, one fused loop (see expressions.PqEncode).
    * `codebooks` is the flattened m×k×dsub centroid matrix. */
  def pqEncode(emb: Column, codebooks: Array[Double], m: Int, k: Int,
      dsub: Int): Column =
    ColumnBridge.column(expressions.PqEncode(
      ColumnBridge.expression(emb), codebooks, m, k, dsub))

  /** Per-query ADC distance table (m·k squared-L2 entries — see
    * expressions.PqDistTable): built once per query row, then every
    * candidate costs m lookups via [[pqAdc]]. */
  def pqDistTable(qvec: Column, codebooks: Array[Double], m: Int, k: Int,
      dsub: Int): Column =
    ColumnBridge.column(expressions.PqDistTable(
      ColumnBridge.expression(qvec), codebooks, m, k, dsub))

  /** ADC approximate squared-L2 distance: Σⱼ table[j·k + codes[j]]
    * (see expressions.PqAdc). */
  def pqAdc(table: Column, codes: Column, k: Int): Column =
    ColumnBridge.column(expressions.PqAdc(
      ColumnBridge.expression(table), ColumnBridge.expression(codes), k))

  /** Bounded top-k aggregate over (score, id): keeps the k best pairs with
    * map-side partial reduction (see expressions.TopKByScore). Use inside
    * groupBy().agg(...); result is array<struct<sim, neighbor_id>> sorted
    * best-first. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(expressions.TopKByScore(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())

  /** Membership probe against a serialized Bloom filter (see
    * expressions.BloomMightContain): false ⇒ definitely absent. The
    * semi-join scale hatch for key sets too large to broadcast as hash
    * relations; composes into lambda functions and streaming filters.
    * The bytes are broadcast here (handle in the plan, bits fetched +
    * deserialized once per executor), deduplicated by content — repeated
    * construction from the same bytes (per micro-batch, per sync slice)
    * reuses one broadcast instead of accumulating copies. Probing several
    * columns against one filter works the same way; to control the
    * broadcast lifetime yourself, use the Broadcast overload. */
  def bloomMightContain(key: Column, bloomBytes: Array[Byte]): Column =
    bloomMightContain(key, expressions.BloomFilters.broadcastFor(bloomBytes))

  /** Morton (Z-order) sort key over N bigint columns (low 63/N bits
    * each; see expressions.InterleaveBits) — the multi-column clustering
    * primitive: sort by this before writing and parquet min/max stats
    * prune on ANY of the columns. */
  def zorder(cols: Column*): Column =
    ColumnBridge.column(expressions.InterleaveBits(
      cols.map(c => ColumnBridge.expression(c.cast("long")))))

  /** [[bloomMightContain]] over an already-broadcast filter. */
  def bloomMightContain(key: Column,
      bloomBc: org.apache.spark.broadcast.Broadcast[Array[Byte]]): Column =
    ColumnBridge.column(expressions.BloomMightContain(
      ColumnBridge.expression(key), bloomBc))

  /** KMV distinct-count sketch aggregate: exact below k, (k-1)/θ estimate
    * above, mergeable across arbitrary partitioning (see
    * expressions.KmvSketch). */
  def kmvDistinct(value: Column, k: Int = 1024): Column =
    ColumnBridge.column(expressions.KmvSketch(
      ColumnBridge.expression(value), k).toAggregateExpression())

  /** Misra–Gries heavy-hitters aggregate: map<term, est_count> bounded at
    * k counters — exact below capacity, under-estimates by ≤ n/(k+1)
    * above, mergeable (see expressions.FreqSketch). */
  def freqItems(value: Column, k: Int = 256): Column =
    ColumnBridge.column(expressions.FreqSketch(
      ColumnBridge.expression(value), k).toAggregateExpression())

  /** Elementwise sum of array<double> vectors with map-side partial
    * reduction — one dim-length buffer per (group, partition) crosses the
    * exchange, never per-element rows (see expressions.VectorSum). Mean
    * centroid = vectorSum(v) / count. */
  def vectorSum(vec: Column): Column =
    ColumnBridge.column(expressions.VectorSum(
      ColumnBridge.expression(vec)).toAggregateExpression())

  /** The KMV sketch itself as a sorted array<long> (sign-flipped hashes so
    * the signed sort order is the unsigned hash order) — the mergeable
    * set-valued form that feeds intersection estimators. */
  def kmvSketch(value: Column, k: Int = 1024): Column =
    ColumnBridge.column(expressions.KmvSketch(
      ColumnBridge.expression(value), k, asArray = true).toAggregateExpression())

  /** Jaccard similarity estimate (×1000) between two [[kmvSketch]]s built
    * with the same k: take X = the k smallest hashes of the union (a valid
    * KMV sketch of A∪B), count how many fall in both inputs —
    * J ≈ |X∩A∩B| / |X|. EXACT iff |A∪B| ≤ k (the union then survives the
    * slice whole and both sketches are complete hash sets — note this is
    * a bound on the UNION, stronger than each set alone being under k);
    * beyond it, a ~1/√k-error estimate. */
  def kmvJaccardX1000(a: Column, b: Column, k: Int = 1024): Column = {
    val unionK = slice(array_sort(array_union(a, b)), 1, k)
    val interK = array_intersect(unionK, array_intersect(a, b))
    when(size(unionK) === 0, lit(0L))
      .otherwise(floor((lit(1000) * size(interK)) / size(unionK)).cast("long"))
  }

  /** Distinct-count estimate from a [[kmvSketch]] array — including the
    * k-bounded union of SEVERAL sketches: `slice(array_sort(
    * array_distinct(flatten(...))), 1, k)` is itself a valid KMV sketch
    * of the union (the k smallest distinct hashes), which is what makes
    * per-partition/per-day sketches mergeable into rolling-window
    * distincts without touching raw keys again. Below saturation the
    * sketch IS the distinct hash set (estimate exact); at saturation,
    * (k-1)/θ with θ = the k-th minimum mapped to the unit interval
    * (Bar-Yossef et al. 2002 — the same formula engine/JoinEstimate
    * applies to its join-size sketches; hashes are stored sign-flipped
    * so the +0.5 recenters the signed range onto [0,1)). */
  def kmvEstimateDistinct(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(
        (lit((k - 1).toDouble) /
          (element_at(sk, k).cast("double") / 1.8446744073709552e19 + 0.5))
          .cast("long"))
}
