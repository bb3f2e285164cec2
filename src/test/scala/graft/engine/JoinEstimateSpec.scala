package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C30 join-size estimation: the sketch estimate must land within KMV
  * error bounds of the EXACT join cardinality, and the exact-below-k
  * path must be exact. */
class JoinEstimateSpec extends SparkSpec {

  private def relErr(est: Long, exact: Long): Double =
    if (exact == 0) est.toDouble else math.abs(est - exact).toDouble / exact

  test("orders ⋈ lineitem estimate within 5% of the exact join size") {
    val orders = graft.sources.Tables.table(spark, sfDir, "orders")
    val lineitem = graft.sources.Tables.table(spark, sfDir, "lineitem")
    val est = JoinEstimate.estimateEquiJoin(
      orders, "o_orderkey", lineitem, "l_orderkey", k = 8192)
      .collect().head
    val exactRows = orders.join(lineitem,
      col("o_orderkey") === col("l_orderkey")).count()
    val exactCommon = orders.select(col("o_orderkey").as("k")).distinct()
      .join(lineitem.select(col("l_orderkey").as("k")).distinct(), "k")
      .count()
    assert(relErr(est.getAs[Long]("est_common_keys"), exactCommon) < 0.05,
      s"common keys: est=${est.getAs[Long]("est_common_keys")} exact=$exactCommon")
    assert(relErr(est.getAs[Long]("est_join_rows"), exactRows) < 0.05,
      s"join rows: est=${est.getAs[Long]("est_join_rows")} exact=$exactRows")
  }

  test("below sketch capacity every readout is exact") {
    import spark.implicits._
    // 100 keys per side, 60 shared; multiplicities 2 (left) x 3 (right)
    val a = (0 until 100).flatMap(k => Seq(k, k)).toDF("k")
    val b = (40 until 140).flatMap(k => Seq(k, k, k)).toDF("k")
    val est = JoinEstimate.estimateEquiJoin(a, "k", b, "k", k = 1024)
      .collect().head
    assert(est.getAs[Long]("n_a") == 200 && est.getAs[Long]("n_b") == 300)
    assert(est.getAs[Long]("est_distinct_a") == 100)
    assert(est.getAs[Long]("est_distinct_b") == 100)
    assert(est.getAs[Long]("est_common_keys") == 60)
    assert(est.getAs[Long]("est_join_rows") == 60L * 2 * 3)
  }

  test("disjoint keys estimate zero join rows") {
    import spark.implicits._
    val a = (0 until 500).toDF("k")
    val b = (1000 until 1500).toDF("k")
    val est = JoinEstimate.estimateEquiJoin(a, "k", b, "k", k = 256)
      .collect().head
    assert(est.getAs[Long]("est_common_keys") == 0)
    assert(est.getAs[Long]("est_join_rows") == 0)
  }

  test("skew-aware estimate recovers the viral-key join size") {
    import spark.implicits._
    val a = (Seq.fill(1000)(0) ++ (1 until 100)).toDF("k")
    val b = (Seq.fill(1000)(0) ++ (1 until 100)).toDF("k")
    val est = JoinEstimate.estimateEquiJoinSkewAware(a, "k", b, "k",
      k = 1024, kHH = 64).collect().head
    val exact = 1000L * 1000 + 99
    assert(est.getAs[Long]("hh_common_keys") == 1, "the hot key must surface")
    assert(relErr(est.getAs[Long]("est_join_rows"), exact) < 0.10,
      s"skew-aware: est=${est.getAs[Long]("est_join_rows")} exact=$exact")
  }

  test("skew-aware reduces to the uniform model on uniform keys") {
    val orders = graft.sources.Tables.table(spark, sfDir, "orders")
    val lineitem = graft.sources.Tables.table(spark, sfDir, "lineitem")
    val est = JoinEstimate.estimateEquiJoinSkewAware(
      orders, "o_orderkey", lineitem, "l_orderkey", k = 8192, kHH = 256)
      .collect().head
    val exactRows = orders.join(lineitem,
      col("o_orderkey") === col("l_orderkey")).count()
    assert(est.getAs[Long]("hh_common_keys") == 0,
      "uniform multiplicities sit below the MG noise floor")
    assert(relErr(est.getAs[Long]("est_join_rows"), exactRows) < 0.05)
  }

  test("skew-aware sizes the events self-join (sum of squared counts)") {
    val ev = graft.sources.Tables.table(spark, sfDir, "events")
    val est = JoinEstimate.estimateEquiJoinSkewAware(
      ev, "user_id", ev, "user_id", k = 8192, kHH = 256).collect().head
    val exact = ev.groupBy("user_id").count()
      .agg(sum(col("count") * col("count"))).collect().head.getLong(0)
    assert(relErr(est.getAs[Long]("est_join_rows"), exact) < 0.15,
      s"self-join: est=${est.getAs[Long]("est_join_rows")} exact=$exact")
  }

  test("uniform-multiplicity model is honest about skew (documented contract)") {
    import spark.implicits._
    // one viral key: 1000 copies on each side; 99 singleton shared keys.
    // exact join = 1000*1000 + 99; the uniform model spreads multiplicity
    // evenly and lands far below — the operator's documented limitation,
    // pinned here so the contract stays visible.
    val a = (Seq.fill(1000)(0) ++ (1 until 100)).toDF("k")
    val b = (Seq.fill(1000)(0) ++ (1 until 100)).toDF("k")
    val est = JoinEstimate.estimateEquiJoin(a, "k", b, "k", k = 1024)
      .collect().head
    val exact = 1000L * 1000 + 99
    assert(est.getAs[Long]("est_join_rows") < exact / 50,
      "skewed multiplicities must underestimate under the uniform model")
  }
}
