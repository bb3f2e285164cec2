package graft.engine

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL") {
    val r = spark.sql(
      """SELECT polyhash('hello world') AS fp,
        |  simhash64(array(1L, 2L, 3L)) AS sh,
        |  cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
        |  size(minhash_signature(array(42L), 16)) AS mh_len,
        |  lsh_bucket(array(1.0d, -1.0d), 2, 4) AS bucket
        |""".stripMargin).first()
    val expected = "hello world".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => (h * 131L + (b & 0xffL)) % 2147483647L)
    assert(r.getAs[Long]("fp") == expected)
    assert(math.abs(r.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(r.getAs[Int]("mh_len") == 16)
    assert(r.getAs[Long]("bucket") >= 0L && r.getAs[Long]("bucket") < 16L)
  }

  test("scalar additions: long_set_jaccard and interleave_bits from SQL") {
    val r = spark.sql(
      """SELECT long_set_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  interleave_bits(0L, 0L) AS z0,
        |  interleave_bits(1L, 1L) AS z3
        |""".stripMargin).first()
    assert(r.getAs[Long]("j") == 500L) // |∩|=2, |∪|=4
    assert(r.getAs[Long]("z0") == 0L)
    assert(r.getAs[Long]("z3") == 3L) // low bits interleave to 0b11
  }

  test("aggregate additions work under GROUP BY from SQL") {
    spark.range(100).selectExpr("id % 3 AS g", "id", "CAST(id AS DOUBLE) AS s",
      "array(CAST(id AS DOUBLE), 1.0d) AS v")
      .createOrReplaceTempView("ext_agg_rows")
    val rows = spark.sql(
      """SELECT g, vector_sum(v) AS vs, topk_by_score(s, id, 2) AS top,
        |  kmv_distinct(id, 64) AS nd
        |FROM ext_agg_rows GROUP BY g ORDER BY g
        |""".stripMargin).collect()
    assert(rows.length == 3)
    val g0 = rows(0)
    // group 0 = ids 0,3,...,99: 34 rows; second vector lane sums the count
    assert(g0.getSeq[Double](1)(1) == 34.0)
    assert(g0.getAs[Long]("nd") == 34L) // exact below k
    val top = g0.getSeq[org.apache.spark.sql.Row](2)
    assert(top.map(_.getLong(1)) == Seq(99L, 96L)) // best two by score desc
  }

  test("non-literal k for minhash_signature is rejected clearly") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
