package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FreqSpec extends SparkSpec {

  private val rng = new scala.util.Random(42) // reproducible shuffles

  private def summarize(terms: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    terms.toDF("t").repartition(parts)
      .agg(graft.functions.freqItems($"t", k).as("m"))
      .select(explode($"m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("below capacity the summary is EXACT and independent of partitioning") {
    val terms = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c") ++ Seq("d")
    val exact = terms.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    for (parts <- Seq(1, 3, 16)) {
      assert(summarize(rng.shuffle(terms), k = 8, parts) == exact,
        s"parts=$parts")
    }
  }

  test("over capacity: underestimates bounded by n/(k+1), heavy hitters guaranteed") {
    // 200 of "hot", 50 of "warm", 300 unique fillers — far past k=16
    val terms = rng.shuffle(
      Seq.fill(200)("hot") ++ Seq.fill(50)("warm") ++ (1 to 300).map(i => s"f$i"))
    val n = terms.size
    val k = 16
    val out = summarize(terms, k, parts = 8)
    val bound = n / (k + 1) + 1
    // anything with true count > n/(k+1) MUST survive (mergeable-summaries
    // guarantee holds across the partial/merge tree as well)
    assert(out.contains("hot"), s"hot (true 200, bound $bound) must be present")
    val truth = Map("hot" -> 200L, "warm" -> 50L).withDefaultValue(1L)
    out.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t over-counted: $est > ${truth(t)}")
      assert(truth(t) - est <= bound, s"$t under-counted past the bound")
    }
  }

  test("per-partition heavy hitters survive the capped (k+1)-th-largest-cut merge") {
    import spark.implicits._
    // drive merge() with pre-skewed partitions so merged counts collide
    // (update() is always weight-1; merges go through the sort-cut path)
    val left = Seq.fill(40)("x") ++ (1 to 20).map(i => s"l$i")
    val right = Seq.fill(40)("y") ++ (1 to 20).map(i => s"r$i")
    val out = (left ++ right).toDF("t").repartition(2, $"t")
      .agg(graft.functions.freqItems($"t", 4).as("m"))
      .select(explode($"m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("x") && out.contains("y"),
      "both partitions' heavy hitters must survive the capped merge")
    assert(out.size <= 4)
  }
}
