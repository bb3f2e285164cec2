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

  test("non-literal k for minhash_signature is rejected clearly") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
