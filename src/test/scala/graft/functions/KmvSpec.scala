package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {

  test("exact below capacity: sketch equals count(distinct)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 7, s"v${i % 300}")).toDF("g", "v")
    val got = df.groupBy($"g").agg(kmvDistinct($"v", k = 1024).as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = df.groupBy($"g").agg(countDistinct($"v").as("d"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }

  test("estimate path: within 3σ of the truth at 100k distinct, k=1024") {
    import spark.implicits._
    val n = 100000
    val df = (1 to n).map(i => s"value-$i").toDF("v")
    val est = df.agg(kmvDistinct($"v", k = 1024)).first().getLong(0)
    val relErr = math.abs(est - n).toDouble / n
    // standard error ~ 1/sqrt(k-2) ≈ 3.1%; 3σ bound ≈ 9.4%
    assert(relErr < 0.094, s"estimate $est vs $n: relErr $relErr")
  }

  test("mergeable: estimate is IDENTICAL under any partitioning (k-min of union)") {
    import spark.implicits._
    val df = (1 to 50000).map(i => s"value-${i % 20000}").toDF("v")
    val estimates = Seq(1, 4, 97).map { p =>
      df.repartition(p).agg(kmvDistinct($"v", k = 512)).first().getLong(0)
    }
    assert(estimates.distinct.size == 1,
      s"KMV must be deterministic across partitionings, got $estimates")
  }

  test("sketch jaccard: exact below k, 3σ-bounded estimate above") {
    import spark.implicits._
    def jaccard(data: Seq[(String, String)], k: Int): Long = {
      val sks = data.toDF("s", "v").groupBy($"s")
        .agg(kmvSketch($"v", k).as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      Seq((sks("a"), sks("b"))).toDF("a", "b")
        .select(kmvJaccardX1000($"a", $"b", k)).first().getLong(0)
    }
    // exact regime: |A|=300, |B|=300, |A∩B|=100 → J = 100/500 = 0.200
    val small = (1 to 300).map(i => ("a", s"v$i")) ++
      (201 to 500).map(i => ("b", s"v$i"))
    assert(jaccard(small, k = 1024) == 200L)
    // estimate regime: |A|=|B|=20000, overlap 10000 → J = 1/3;
    // σ ≈ √(J(1-J)/k) ≈ 1.5% at k=1024 → 3σ ≈ 4.4%
    val big = (1 to 20000).map(i => ("a", s"v$i")) ++
      (10001 to 30000).map(i => ("b", s"v$i"))
    val est = jaccard(big, k = 1024) / 1000.0
    assert(math.abs(est - 1.0 / 3.0) < 0.05, s"estimate $est vs 0.333")
  }

  test("null and integer inputs handled") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (null, "c"), (2L, "d"))
      .toDF("id", "x")
    val d = df.agg(kmvDistinct($"id", k = 16)).first().getLong(0)
    assert(d == 2L) // nulls skipped, duplicates collapsed
  }
}
