package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.polyhash

/** Text-analysis operators for training-data curation (SURVEY.md §2 F):
  * language ID, quality scoring, token counting, content fingerprinting.
  *
  * All features are built from length/replace arithmetic and regexes with
  * identical semantics in the DuckDB oracle dialect (SURVEY.md §6), and all
  * are map-side column expressions — no shuffle. The scalar arithmetic
  * participates in whole-stage codegen; the higher-order array folds
  * (repetition, entropy, BPE apply — Spark HOFs are CodegenFallback)
  * evaluate interpreted but remain per-row projections, so the scaling
  * shape is unchanged (measured linear in the 50× smokes).
  */
object TextAnalysis {

  /** Occurrences of `needle` in `hay` via length arithmetic (portable and
    * codegen'd; counts non-overlapping occurrences like replace does). */
  def countOccurrences(hay: Column, needle: String): Column =
    ((length(hay) - length(replace(hay, lit(needle), lit("")))) / needle.length).cast("long")

  /** Marker stopwords per language for the n-gram-free heuristic
    * (word-boundary padded so 'the' doesn't match 'other'). */
  val markers: Seq[(String, String)] = Seq(
    "en" -> "the", "de" -> "der", "fr" -> "le", "es" -> "el")

  /** F1: heuristic language ID — count language-marker stopwords, pick the
    * argmax with a fixed priority tie-break (en > de > fr > es). */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val padded = concat(lit(" "), col(textCol), lit(" "))
    val withHits = markers.foldLeft(df) { case (d, (lang, marker)) =>
      d.withColumn(s"${lang}_hits", countOccurrences(padded, s" $marker "))
    }
    withHits.withColumn("predicted_lang",
      when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits")
        && col("en_hits") >= col("es_hits"), "en")
        .when(col("de_hits") >= col("fr_hits") && col("de_hits") >= col("es_hits"), "de")
        .when(col("fr_hits") >= col("es_hits"), "fr")
        .otherwise("es"))
  }

  /** F2: quality features + integer-scaled score: word count, character
    * count, average word length (x100), stopword hits, score capped to
    * [0, 1500]. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nonSpace = length(replace(t, lit(" "), lit("")))
    df
      .withColumn("n_chars_text", length(t).cast("long"))
      .withColumn("n_words", (length(t) - nonSpace + 1).cast("long"))
      .withColumn("stop_hits",
        countOccurrences(concat(lit(" "), t, lit(" ")), " the ")
          + countOccurrences(concat(lit(" "), t, lit(" ")), " a "))
      .withColumn("avg_word_len_x100",
        ((nonSpace.cast("long") * 100L) / col("n_words")).cast("long"))
      .withColumn("quality_x1000",
        least(lit(1000L), col("n_words") * 5L) + least(lit(500L), col("stop_hits") * 20L))
  }

  /** F3: token counting — whitespace tokens and a BPE-ish regex token count
    * (letter runs / digit runs / single non-alphanumerics). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df
      .withColumn("ws_tokens",
        (length(t) - length(replace(t, lit(" "), lit(""))) + 1).cast("long"))
      .withColumn("re_tokens",
        size(regexp_extract_all(t, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long"))
  }

  /** F4: polynomial rolling-hash fingerprint (custom codegen expression),
    * plus a locality-insensitive prefix fingerprint for blocking. */
  def fingerprints(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      polyhash(col(textCol)).as("fingerprint"),
      polyhash(substring(col(textCol), 1, 64)).as("prefix_fingerprint"))

  /** F5: within-document repetition signals (the Gopher/MassiveText
    * repetition filters adapted to unpunctuated corpora): duplicate-word
    * fraction and the most-repeated bigram's share of all bigrams.
    * Entirely MAP-SIDE: the top-bigram count is a sort + one linear scan
    * over the doc's own bigram array via `aggregate` (longest equal run
    * of the sorted array = max multiplicity) — no explode, no
    * (doc, gram) shuffle, so the operator costs a projection even at
    * corpus scale. Integer x1000 fractions keep oracle parity exact. */
  /** Longest equal run of a SORTED string array = the max multiplicity of
    * any element — the no-explode core of the F5 repetition signals,
    * reusable wherever a per-row mode-count is needed. */
  def maxRunLength(sortedArr: Column): Column = {
    val runState = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    aggregate(sortedArr, runState,
      (acc, g) => {
        val run = when(g === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
  }

  def repetitionSignals(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), col("__toks"),
        graft.dedup.Dedup.ngramsFromTokens(col("__toks"), 2).as("__grams"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_words"),
        size(array_distinct(col("__toks"))).cast("long").as("n_distinct_words"),
        maxRunLength(array_sort(col("__grams"))).as("top_bigram_count"))
      .select(col(idCol), col("n_words"), col("n_distinct_words"),
        expr("CAST(1000 * (n_words - n_distinct_words) div n_words AS BIGINT)")
          .as("dup_word_frac_x1000"),
        col("top_bigram_count"),
        when(col("n_words") < 2, lit(0L))
          .otherwise(expr("CAST(1000 * top_bigram_count div (n_words - 1) AS BIGINT)"))
          .as("top_bigram_frac_x1000"))
  }

  /** F13: Shannon token entropy per document — the information-density
    * quality signal (low entropy ⇒ repetitive/boilerplate text; a common
    * Gopher/CCNet-family filter). H = ln(n) − (Σ c·ln c)/n over the token
    * frequency distribution, integer-scaled ×1000 with floor(x+0.5)
    * rounding for engine parity.
    *
    * Entirely map-side: the frequency sum folds over the SORTED token
    * array with the run-length aggregate (the repetitionSignals
    * structure) — no explode, no shuffle, scale-free. */
  def tokenEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val contrib = (run: Column) =>
      when(run > 0L, run.cast("double") * log(run.cast("double"))).otherwise(lit(0.0))
    val runState = struct(lit("").as("prev"), lit(0L).as("run"), lit(0.0).as("acc"))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("__toks"))).cast("long").as("n_types"),
        aggregate(array_sort(col("__toks")), runState,
          (acc, t) => {
            val same = t === acc("prev")
            struct(t.as("prev"),
              when(same, acc("run") + 1L).otherwise(lit(1L)).as("run"),
              when(same, acc("acc")).otherwise(acc("acc") + contrib(acc("run"))).as("acc"))
          },
          acc => acc("acc") + contrib(acc("run"))).as("__clnc"))
      .select(col(idCol), col("n_tokens"), col("n_types"),
        floor((log(col("n_tokens").cast("double")) -
          col("__clnc") / col("n_tokens").cast("double")) * 1000.0 + 0.5)
          .cast("long").as("entropy_x1000"))
  }

  /** F14: canonical text normalization — lowercase, strip non-alphanumeric
    * (ASCII scope; keep spaces), collapse whitespace runs, trim. The
    * standard pre-tokenization cleanup; pure projection, scale-free.
    * Patterns are Java-regex/RE2-portable (the F10 portability rule) so
    * the operator behaves identically under any engine's regex library. */
  /** Tokenizer APPLY: encode whitespace tokens against a (term, vocab_id)
    * dictionary — the step between vocabulary training (LlmOps.qVocab)
    * and model input. Out-of-vocabulary tokens encode as -1 ([UNK]).
    * Plan: posexplode keeps token order, the vocabulary broadcasts (it
    * is top-K bounded by construction), and the id sequence reassembles
    * in ONE doc-keyed aggregate (sorted by position inside the array —
    * no window). Output ids as a space-joined string: deterministic,
    * engine-comparable, and the exact inverse of the split it came from. */
  def encodeWithVocab(df: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(col("vocab_id"), lit(-1L)).as("id")))),
          x => x.getField("id").cast("string"))).as("token_ids"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("vocab_id").isNull, 1L).otherwise(0L)).as("n_unk"))
  }

  /** Bigram language-model scoring — mean log MLE conditional probability
    * of each document's bigrams under counts from the corpus itself:
    * avg over bigram instances of ln(c(w1 w2) / c(w1 ·)). The
    * KenLM-style "perplexity filter" quality signal: repetitive,
    * predictable text scores near 0, surprising token sequences go
    * negative. Every count is an MLE over the same corpus so no
    * smoothing is needed (every doc bigram has c ≥ 1), and
    * avg_logp ≤ 0 always (a bigram never outnumbers its own prefix).
    * Plan: gram instances carry xxhash64 keys (8-byte shuffles, never
    * gram text — counts over hashed keys equal counts over strings bar
    * collisions, the same contract as the hashed-shingle Jaccard
    * verify); ONE instance aggregate keyed (gram_hash, prefix_hash),
    * prefix totals derive from that DISTINCT-gram table (cheap sum over
    * distinct grams, not a second instance-wide count), and the per-doc
    * score joins instances to the count dimension on the gram hash —
    * co-partitioned, linear, no broadcast of unbounded vocabulary. */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // tokens materialize as an attribute FIRST: inlining split() into the
    // gram lambda re-tokenizes once per element_at (no CSE across lambda
    // boundaries — the Dedup.wordNgrams perf note)
    val grams = df.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol),
        explode(graft.dedup.Dedup.ngramsFromTokens(col("__toks"), 2)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gh"),
        xxhash64(substring_index(col("gram"), " ", 1)).as("wh"))
    // wh is functionally dependent on gh, so it rides the same aggregate
    val cg = grams.groupBy("gh", "wh").agg(count(lit(1)).as("c"))
    val cw = cg.groupBy("wh").agg(sum(col("c")).as("c1"))
    val dim = cg.join(cw, "wh").select(col("gh"), col("c"), col("c1"))
    grams.select(col(idCol), col("gh"))
      .join(dim, "gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("c").cast("double") / col("c1").cast("double"))), 3)
          .as("avg_logp"))
  }

  def normalize(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(col(idCol),
        trim(regexp_replace(
          regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""),
          "  +", " ")).as("norm_text"))
      .withColumn("n_chars", length(col("norm_text")).cast("long"))

  /** F21: BM25 relevance of every document to a fixed query-term set —
    * the standard retrieval/quality scorer (Robertson–Spärck Jones idf,
    * Okapi tf saturation with document-length normalization):
    * score(d) = Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
    *              · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Defaults k1 = 1.5, b = 0.75 are EXACTLY representable doubles (as
    * are 1−b and k1+1), so the only rounding in the formula is the ln
    * and the divisions themselves — evaluated in the same literal
    * shape by the oracle, with a final round(,4) absorbing last-ulp
    * libm differences (the bigramLogProb parity pattern).
    *
    * Plan: corpus statistics (N, avgdl, one df per query term) are ONE
    * aggregate row broadcast back onto the document scan; per-document
    * tf for the handful of query terms is an array filter over the
    * tokens already split for dl — the whole scorer is a single pass,
    * map-side after a scalar-dimension broadcast, no per-term explode
    * and no (doc, term) shuffle at any corpus size. */
  def bm25(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
    val stats = toks.agg(
      count(lit(1)).as("n_docs"),
      (avg(col("dl")).as("avgdl") +: terms.zipWithIndex.map { case (t, i) =>
        sum(array_contains(col("__toks"), t).cast("long")).as(s"__df_$i")
      }): _*)
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("__toks"), x => x === lit(t))).cast("double")
      val dfT = col(s"__df_$i").cast("double")
      val idf = log(lit(1.0) + (col("n_docs").cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    }.reduce(_ + _)
    toks.crossJoin(broadcast(stats))
      .select(col(idCol), col("dl"), round(score, 4).as("bm25"))
  }

  /** F27: the Gopher document-quality rule set (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", appendix A1.1 — the published filter
    * battery most web-corpus pipelines start from): word-count bounds,
    * mean-word-length bounds, symbol-to-word ratio ('#' and '...'),
    * bullet-line ratio, fraction of words containing an alphabetic
    * character, and a minimum count of distinct required stopwords.
    * Every feature is integer (ppm / x100) length-and-replace arithmetic
    * over ONE map-side projection — no shuffle, no explode; the word-level
    * predicates ride the `filter` HOF over the split array. Thresholds are
    * parameters so corpus-appropriate bounds stay in the caller's hands
    * (the paper's web defaults assume 50+-word pages). */
  def gopherRules(df: DataFrame, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minWordLenX100: Long = 300L, maxWordLenX100: Long = 1000L,
      maxSymbolPpm: Long = 100000L, maxBulletPpm: Long = 900000L,
      minAlphaPpm: Long = 800000L, minStopHits: Long = 2L): DataFrame = {
    val t = col(textCol)
    val padded = concat(lit(" "), t, lit(" "))
    // the paper's required-stopword set; a hit = the word OCCURS (distinct
    // membership, not occurrence count)
    val stopSet = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = stopSet.map(w =>
      when(countOccurrences(padded, s" $w ") > 0, 1L).otherwise(0L)).reduce(_ + _)
    // raw counts first, ratios via exact integer DIV (a `/` on two longs
    // is DOUBLE division in Spark SQL — a true quotient sitting just
    // below an integer can round up and truncate differently than the
    // oracle's floor-division `//`)
    df.filter(t.isNotNull)
      .withColumn("n_words", (countOccurrences(t, " ") + 1L).cast("long"))
      .withColumn("n_lines", (countOccurrences(t, "\n") + 1L).cast("long"))
      .withColumn("__nonspace", length(replace(t, lit(" "), lit(""))).cast("long"))
      .withColumn("__symbols", countOccurrences(t, "#") + countOccurrences(t, "..."))
      .withColumn("__bullets", countOccurrences(t, "\n- ")
        + when(t.startsWith("- "), 1L).otherwise(0L))
      .withColumn("__alpha_words",
        size(filter(split(t, " "), w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("mean_word_len_x100", expr("(__nonspace * 100) DIV n_words"))
      .withColumn("symbol_word_ppm", expr("(__symbols * 1000000) DIV n_words"))
      .withColumn("bullet_line_ppm", expr("(__bullets * 1000000) DIV n_lines"))
      .withColumn("alpha_word_ppm", expr("(__alpha_words * 1000000) DIV n_words"))
      .withColumn("stop_hits", stopHits)
      .drop("__nonspace", "__symbols", "__bullets", "__alpha_words")
      .withColumn("gopher_pass",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len_x100").between(minWordLenX100, maxWordLenX100) &&
          col("symbol_word_ppm") < maxSymbolPpm &&
          col("bullet_line_ppm") < maxBulletPpm &&
          col("alpha_word_ppm") >= minAlphaPpm &&
          col("stop_hits") >= minStopHits)
  }

  /** F28: character-class (script) composition — per-doc ppm of
    * alphabetic / digit / whitespace / other characters plus the dominant
    * class with a fixed tie priority (alpha > digit > space > other).
    * The cheap script-ID signal for routing multilingual corpora; one
    * map-side regexp-strip projection, no shuffle. */
  def scriptMix(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(pattern: String): Column =
      (length(t) - length(regexp_replace(t, pattern, ""))).cast("long")
    df.filter(t.isNotNull && length(t) > 0)
      .withColumn("n_chars_total", length(t).cast("long"))
      .withColumn("__alpha", cnt("[A-Za-z]"))
      .withColumn("__digit", cnt("[0-9]"))
      .withColumn("__space", cnt("[ ]"))
      .withColumn("alpha_ppm", expr("(__alpha * 1000000) DIV n_chars_total"))
      .withColumn("digit_ppm", expr("(__digit * 1000000) DIV n_chars_total"))
      .withColumn("space_ppm", expr("(__space * 1000000) DIV n_chars_total"))
      // remainder, so the four classes always sum to exactly 1e6 and the
      // DIV flooring of the first three can't leak into a negative
      .withColumn("other_ppm",
        lit(1000000L) - col("alpha_ppm") - col("digit_ppm") - col("space_ppm"))
      .drop("__alpha", "__digit", "__space")
      .withColumn("dominant",
        when(col("alpha_ppm") >= col("digit_ppm")
          && col("alpha_ppm") >= col("space_ppm")
          && col("alpha_ppm") >= col("other_ppm"), "alpha")
          .when(col("digit_ppm") >= col("space_ppm")
            && col("digit_ppm") >= col("other_ppm"), "digit")
          .when(col("space_ppm") >= col("other_ppm"), "space")
          .otherwise("other"))
  }

  /** F29: lexical-diversity metrics — type-token ratio and hapax-legomenon
    * ratio per document (the templated/boilerplate-text detector that
    * complements F5's repetition score: generated spam has LOW TTR, clean
    * prose sits in a stable band). Per-doc distinct/once-only word counts
    * come from ONE sorted array projection + adjacent-neighbor HOF scans —
    * O(L log L) per row, NO explode and NO (doc, term) shuffle at any
    * corpus size (the naive unnest+groupBy mirror the oracle runs would
    * shuffle every token). */
  def ttr(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    df.filter(t.isNotNull)
      .select(col(idCol), sort_array(split(t, " ")).as("__sorted"))
      .withColumn("n_tokens", size(col("__sorted")).cast("long"))
      .withColumn("n_types", size(array_distinct(col("__sorted"))).cast("long"))
      // hapax: words whose sorted neighbors both differ — exactly the
      // count-1 groups of the unnest+groupBy formulation. element_at is
      // 1-based and ANSI-strict (out-of-bounds THROWS, and boolean ops
      // don't short-circuit evaluation), so boundary probes clamp into
      // range — the clamped probe compares the word to itself, and the
      // position disjunct alone decides those edges
      .withColumn("n_hapax", size(filter(col("__sorted"), (w, i) =>
        (i === 0 ||
          element_at(col("__sorted"), greatest(i, lit(1))) =!= w) &&
          (i === size(col("__sorted")) - 1 ||
            element_at(col("__sorted"),
              least(i + 2, size(col("__sorted")))) =!= w))).cast("long"))
      .withColumn("ttr_ppm", expr("(n_types * 1000000) DIV n_tokens"))
      .withColumn("hapax_ppm", expr("(n_hapax * 1000000) DIV n_types"))
      .select(col(idCol), col("n_tokens"), col("n_types"), col("n_hapax"),
        col("ttr_ppm"), col("hapax_ppm"))
  }
}
