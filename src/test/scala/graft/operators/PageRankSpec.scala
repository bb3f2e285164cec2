package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  test("pagerank: star hub outranks leaves; symmetric nodes rank equal; mass conserved") {
    import spark.implicits._
    // star: hub 0 <-> leaves 1..6, plus an isolated edge pair 7 <-> 8
    val star = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L))) ++
      Seq((7L, 8L), (8L, 7L))
    val ranks = PageRank.rankPpb(star.toDF("src", "dst")).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_ppb")).toMap
    assert(ranks.size == 9)
    val leaves = (1L to 6L).map(ranks)
    assert(leaves.distinct.size == 1, "symmetric leaves must rank identically")
    assert(ranks(0L) > leaves.head * 3,
      s"hub must dominate its leaves: ${ranks(0L)} vs ${leaves.head}")
    assert(ranks(7L) == ranks(8L), "the detached pair is symmetric")
    val mass = ranks.values.sum
    // floor losses only: never above the unit mass, never leaking more
    // than (N + edges) ppb per iteration
    assert(mass <= 1000000000L && mass > 990000000L, s"mass $mass")
  }

  test("pagerank face: deterministic, every rank at least the damping base") {
    val a = graft.queries.Warehouse.qPageRank(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("rank_ppb")))
    val b = graft.queries.Warehouse.qPageRank(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("part"), r.getAs[Long]("rank_ppb")))
    assert(a.toSeq == b.toSeq, "integer iteration must be deterministic")
    assert(a.nonEmpty)
    val n = a.length.toLong
    val base = 150000000L / n
    assert(a.forall(_._2 >= base), "every node keeps its damping base")
    // a node's rank can exceed base only via in-edges; the graph is
    // undirected so every node has one — all ranks strictly above base
    assert(a.count(_._2 > base) > a.length / 2,
      "most co-purchase nodes should accumulate contributions")
  }
}
