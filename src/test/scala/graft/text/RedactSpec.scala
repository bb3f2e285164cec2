package graft.text

import graft.SparkSpec

class RedactSpec extends SparkSpec {

  private def run(text: String): (Long, Long, Long, String) = {
    import spark.implicits._
    val r = Redact.pii(Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id")
      .collect().head
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
  }

  test("emails, ips, and long digit runs redact with correct counts") {
    val (e, i, n, out) = run(
      "mail alice@example.com and bob.smith@sub.domain.org ip 10.0.3.77 card 4111111111111111 done")
    assert(e == 2L && i == 1L && n == 1L)
    assert(out == "mail <EMAIL> and <EMAIL> ip <IP> card <NUM> done")
  }

  test("clean text passes through unchanged with zero counts") {
    val (e, i, n, out) = run("no personal data in this row at all")
    assert(e == 0L && i == 0L && n == 0L)
    assert(out == "no personal data in this row at all")
  }

  test("an ipv4 octet run is not a long number; short digit runs survive") {
    val (e, i, n, out) = run("port 8080 and host 192.168.254.254 stay 123456789012 short")
    assert(e == 0L && i == 1L && n == 0L) // 12 digits < 13 → kept
    assert(out == "port 8080 and host <IP> stay 123456789012 short")
  }

  test("mixed-case emails redact; over-long digit runs redact whole") {
    val (e, i, n, out) = run(
      "write Alice.Smith@Gmail.COM acct 123456789012345678901 end")
    assert(e == 1L && i == 0L && n == 1L)
    assert(out == "write <EMAIL> acct <NUM> end") // no digit tail survives
  }

  test("null text yields null outputs, not a crash") {
    import spark.implicits._
    val out = Redact.pii(
      Seq((1L, null: String), (2L, "a@b.io")).toDF("doc_id", "text"),
      "text", "doc_id").orderBy("doc_id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(4))
    assert(out(1).getString(4) == "<EMAIL>")
  }

  test("loss mask marks exactly the PII-bearing tokens, aligned to the sequence") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact me at bob@example.com or 10.1.2.3 today"),
      (2L, "clean text with no pii at all"),
      (3L, "card 4111111111111111 expires")).toDF("doc_id", "text")
    val out = Redact.lossMask(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"), r.getAs[String]("mask_bits"))).toMap
    assert(out(1L) == ((7L, 2L, "0001010")), s"got ${out(1L)}")
    assert(out(2L) == ((7L, 0L, "0000000")))
    assert(out(3L) == ((3L, 1L, "010")))
    // mask length always equals the token count
    out.values.foreach { case (n, _, bits) => assert(bits.length == n) }
  }

  test("redaction is idempotent: placeholders do not re-match") {
    import spark.implicits._
    val once = Redact.pii(
      Seq((1L, "x a@b.io 10.1.2.3 4111111111111111")).toDF("doc_id", "text"),
      "text", "doc_id")
      .select("redacted_text").as[String].head()
    val twice = Redact.pii(
      Seq((1L, once)).toDF("doc_id", "text"), "text", "doc_id").collect().head
    assert(twice.getLong(1) == 0L && twice.getLong(2) == 0L && twice.getLong(3) == 0L)
    assert(twice.getString(4) == once)
  }
}
