package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking and corpus-frequency boilerplate removal — the
  * windowing steps between "curated corpus" and "training samples" in an
  * LLM data pipeline (SURVEY.md §2 F8/F9).
  *
  * Both operators are shuffle-free per document: chunking is a map-side
  * posexplode over window starts, and boilerplate removal aggregates
  * 16-byte unit keys and broadcasts the (small) over-threshold set back —
  * document text shuffles only in the final per-doc regroup.
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
    // window). Null text chunks to nothing — without the guard it would
    // survive as one null-text window (greatest(null,0)=0 keeps the doc),
    // which a SQL twin that iterates `range(0, len(t))` drops.
    df.where(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), greatest(org.apache.spark.sql.functions.size(col("__toks")) - 1, lit(0)), lit(stride))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        org.apache.spark.sql.functions.size(slice(col("__toks"), col("col") + 1, lit(size)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("col") + 1, lit(size)), " ").as("chunk_text"))
  }

  /** Sequence packing: assign token chunks to fixed-budget training
    * sequences — every sequence holds ~`budgetTokens` tokens (over/under
    * by less than one chunk), the step that turns a chunked corpus into
    * uniform training samples.
    *
    * Chunks pack in DETERMINISTIC CONTENT-HASH order (md5 of the chunk,
    * id tiebreaks): a stable pseudo-random interleave, so (a) the
    * assignment is reproducible across reruns, partitionings, and
    * engines, and (b) each sequence mixes documents/sources — the
    * shuffling training wants anyway. A chunk belongs to the sequence
    * where its running token count starts: `seq_id = cum_before div
    * budget`.
    *
    * Plan (the [[graft.target.Transform.assignBatches]] structure): range
    * partition + in-partition sort on the hash order, then per-partition
    * token totals → prefix offsets (one tiny collect of numPartitions
    * longs) → a single in-order pass assigns ids. Both jobs run over the
    * SAME RDD instance, so RangePartitioner's rdd-id-seeded sampling
    * draws ONE set of range bounds (two DataFrame actions could each
    * draw different bounds — the unsoundness assignBatches documents).
    * No stage holds more than one partition; there is no global window.
    */
  def packSequences(chunks: DataFrame, tokenCol: String, textCol: String,
      idCols: Seq[String], budgetTokens: Long,
      numPartitions: Option[Int] = None): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    // fail fast on the driver: the getLong in the per-partition passes
    // would otherwise ClassCastException mid-job on an int token column
    require(chunks.schema(tokenCol).dataType == org.apache.spark.sql.types.LongType,
      s"$tokenCol must be bigint, got ${chunks.schema(tokenCol).dataType.simpleString}")
    val spark = chunks.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val ordCols = col("__ord") +: idCols.map(col)
    val withOrd = chunks.withColumn("__ord", md5(col(textCol)))
    val ranged = withOrd.repartitionByRange(n, ordCols: _*)
      .sortWithinPartitions(ordCols: _*)
    val rdd = ranged.rdd // one instance — all jobs share its range bounds
    val tokIdx = ranged.schema.fieldIndex(tokenCol)
    // NULL token counts pack as 0 explicitly (the row still gets a seq_id,
    // it just doesn't consume budget) — getLong on a null cell would throw
    // an opaque NPE mid-job; both passes MUST read identically or the
    // prefix offsets go out of sync with the assignment pass
    val tokOf: org.apache.spark.sql.Row => Long =
      r => if (r.isNullAt(tokIdx)) 0L else r.getLong(tokIdx)
    val partSums = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.map(tokOf).sum))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val schema = ranged.schema.add("seq_id", org.apache.spark.sql.types.LongType,
      nullable = false)
    val rows = rdd.mapPartitionsWithIndex { case (i, it) =>
      var cum = bOffsets.value(i)
      it.map { r =>
        val seq = cum / budgetTokens
        cum += tokOf(r)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ seq)
      }
    }
    spark.createDataFrame(rows, schema).drop("__ord")
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
    * Scale shape: the frequency table aggregates a 128-bit unit key (two
    * independent xxhash64 lanes — at corpus scale a single 64-bit key
    * makes a cross-text collision near-certain around ~5e9 distinct
    * units, and a collision here would silently delete a rare unit
    * everywhere; 2^128 keeps that probability negligible at any
    * plausible corpus) with map-side partial counts. The units ABOVE the
    * threshold form the boilerplate set, which is small BY CONSTRUCTION
    * (≤ total-unit-occurrences / maxDocFreq distinct units) and
    * broadcasts as an anti-flag join — unit text never shuffles on the
    * hash key; the only text-bearing exchange is the final per-document
    * regroup, keyed on the id like any per-doc aggregate.
    */
  def dropBoilerplate(df: DataFrame, textCol: String, idCol: String,
      unit: Int, maxDocFreq: Long): DataFrame = {
    val units = chunk(df, textCol, idCol, size = unit, stride = unit)
      .withColumn("__h", xxhash64(col("chunk_text")))
      .withColumn("__h2", xxhash64(col("chunk_text"), lit(1)))
    // distinct (doc, key) first: doc frequency, not occurrence count
    val boiler = units.select(col(idCol), col("__h"), col("__h2")).distinct()
      .groupBy(col("__h"), col("__h2")).agg(count(lit(1)).as("__doc_freq"))
      .filter(col("__doc_freq") > maxDocFreq)
      .select(col("__h"), col("__h2"), lit(true).as("__boiler"))
    units.join(broadcast(boiler), Seq("__h", "__h2"), "left")
      .withColumn("__keep", col("__boiler").isNull)
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
