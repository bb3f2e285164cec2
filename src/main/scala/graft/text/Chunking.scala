package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking and corpus-frequency boilerplate removal — the
  * windowing steps between "curated corpus" and "training samples" in an
  * LLM data pipeline (SURVEY.md §2 F8/F9).
  *
  * Both operators are shuffle-free per document: chunking is a map-side
  * posexplode over window starts, and boilerplate removal adds exactly one
  * aggregation keyed on the unit hash (8-byte lanes) plus a join-back —
  * the document text itself never shuffles.
  */
object Chunking {

  /** Split each document into token windows of `size` tokens starting
    * every `stride` tokens (overlap = size - stride), the standard
    * training-sample windowing (HuggingFace `return_overflowing_tokens`
    * shape). The final window may be shorter; a window starts at every
    * multiple of `stride` below the token count, so every token lands in
    * at least one chunk.
    *
    * Output: idCol, chunk_id (0-based window index), n_tokens, chunk_text.
    * Entirely map-side — at 100 TB this is an embarrassingly parallel
    * projection whose output is ~(size/stride)× the input tokens.
    */
  def chunk(df: DataFrame, textCol: String, idCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    // tokens materialize as their own projection first (the
    // Dedup.wordNgrams lambda-CSE note: inlining split re-tokenizes per
    // window)
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), greatest(org.apache.spark.sql.functions.size(col("__toks")) - 1, lit(0)), lit(stride))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        org.apache.spark.sql.functions.size(slice(col("__toks"), col("col") + 1, lit(size)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("col") + 1, lit(size)), " ").as("chunk_text"))
  }

  /** Corpus-frequency boilerplate removal (the CCNet line-dedup shape with
    * a token-window unit): cut each document into NON-overlapping
    * `unit`-token chunks, count how many distinct documents each chunk
    * occurs in corpus-wide, and drop chunks seen in more than `maxDocFreq`
    * documents (headers, footers, navigation, license blocks). Real
    * deployments pick the unit to match their corpus's line/paragraph
    * structure; the operator only assumes a tokenizable text column.
    *
    * Output: idCol, n_units, n_kept, cleaned_text (kept chunks re-joined
    * in document order; empty string when everything was boilerplate).
    *
    * Scale shape: the frequency table aggregates xxhash64(unit) — 8-byte
    * keys, map-side partial counts — and joins back to the (id, hash)
    * unit list; document text rides only through the final per-document
    * regroup, which is keyed on the id like any per-doc aggregate.
    */
  def dropBoilerplate(df: DataFrame, textCol: String, idCol: String,
      unit: Int, maxDocFreq: Long): DataFrame = {
    val units = chunk(df, textCol, idCol, size = unit, stride = unit)
      .withColumn("__h", xxhash64(col("chunk_text")))
    // distinct (doc, hash) first: doc frequency, not occurrence count
    val freq = units.select(col(idCol), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__doc_freq"))
    units.join(freq, "__h")
      .withColumn("__keep", col("__doc_freq") <= maxDocFreq)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_units"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops the nulls from the when(); array_sort on the
        // (chunk_id, chunk_text) struct restores document order
        array_join(
          transform(
            array_sort(collect_list(when(col("__keep"),
              struct(col("chunk_id"), col("chunk_text"))))),
            s => s.getField("chunk_text")),
          " ").as("cleaned_text"))
  }
}
