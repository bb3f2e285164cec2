package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: scrub emails, IPv4 addresses, and
  * long digit runs (credit-card/account-number shaped) with typed
  * placeholders, keeping a per-kind count for curation metrics.
  *
  * Pure map-side regexp projection (codegen'd `regexp_replace` /
  * `regexp_count`) — scale-free at 100 TB. Patterns avoid lookaround and
  * capture-group subtleties so Java regex (Spark) and RE2 (the DuckDB
  * oracle) agree character-for-character.
  */
object Redact {

  // (?i) — mixed-case addresses must not escape; open-ended digit run —
  // a capped {13,19} leaves the tail of a longer account number in the
  // clear (both flags/quantifiers behave identically in Java regex and
  // RE2, preserving oracle parity)
  val emailRe = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val ipv4Re = "\\b[0-9]{1,3}(?:\\.[0-9]{1,3}){3}\\b"
  val longNumRe = "[0-9]{13,}"

  val emailTag = "<EMAIL>"
  val ipv4Tag = "<IP>"
  val longNumTag = "<NUM>"

  /** Redact one pattern, returning (count, redacted) columns. Counts are
    * taken on the input of each stage so they equal the number of
    * replacements that stage performed. */
  private def stage(text: Column, re: String, tag: String): (Column, Column) =
    (regexp_count(text, lit(re)).cast("long"),
      regexp_replace(text, re, tag))

  /** Sequential email → IPv4 → long-number scrub of `textCol`.
    * Output: idCol, n_emails, n_ips, n_longnums, redacted_text.
    * Stage order matters: IPv4 runs on email-redacted text (an address
    * inside a hostname is not separately an IP), and digit runs last
    * (an IPv4 octet run never reaches 13 digits, but the order makes the
    * independence explicit). */
  def pii(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val (nEmails, t1) = stage(col(textCol), emailRe, emailTag)
    val step1 = df.select(col(idCol), nEmails.as("n_emails"), t1.as("__t1"))
    val (nIps, t2) = stage(col("__t1"), ipv4Re, ipv4Tag)
    val step2 = step1.select(col(idCol), col("n_emails"), nIps.as("n_ips"), t2.as("__t2"))
    val (nNums, t3) = stage(col("__t2"), longNumRe, longNumTag)
    step2.select(col(idCol), col("n_emails"), col("n_ips"),
      nNums.as("n_longnums"), t3.as("redacted_text"))
  }

  /** F10b: token-level LOSS MASK — which whitespace tokens contain PII
    * (any of the three patterns), as a '0'/'1' string aligned with the
    * token sequence plus counts. The step between redaction and the
    * trainer: replacing PII with tags (F10) still trains the model to
    * PREDICT the tag in context; masking those token positions out of
    * the loss is how the span is actually excluded. Token-contains
    * semantics (rlike = find, both engines), pure map-side projection —
    * the same scale-free shape as [[pii]]. NULL text yields no row
    * (callers filter; a mask over absent text is meaningless). */
  def lossMask(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val pat = s"$emailRe|$ipv4Re|$longNumRe"
    val toks = split(col(textCol), " ")
    val marks = transform(toks,
      t => when(t.rlike(pat), lit("1")).otherwise(lit("0")))
    df.where(col(textCol).isNotNull)
      .select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        size(filter(marks, m => m === "1")).cast("long").as("n_masked"),
        array_join(marks, "").as("mask_bits"))
  }
}
