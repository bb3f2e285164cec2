package graft.functions

import graft.SparkSpec
import graft.functions.expressions.InterleaveBits
import org.apache.spark.sql.functions._

class ZorderSpec extends SparkSpec {

  test("interleave matches the reference morton; clamps, nulls, and sign safety") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // lanes are 63/2 = 31 bits wide — bit 63 stays clear so keys never
    // go negative and signed sort follows the curve
    val rows = (1 to 200).map { i =>
      (i.toLong, rnd.nextLong().abs % (1L << 31), rnd.nextLong().abs % (1L << 31))
    }
    val got = rows.toDF("id", "x", "y")
      .select($"id", graft.functions.zorder($"x", $"y").as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, x, y) =>
      assert(got(id) == InterleaveBits.morton(Array(x, y), 31), s"id=$id")
      assert(got(id) >= 0L, s"id=$id key must be non-negative")
    }
    // max-lane values interleave to the largest key and stay non-negative
    val top = InterleaveBits(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal((1L << 31) - 1),
      org.apache.spark.sql.catalyst.expressions.Literal((1L << 31) - 1)))
      .eval(null).asInstanceOf[Long]
    assert(top > 0L && top == (1L << 62) - 1)
    // single column degenerates to a plain (63-bit) monotone key, not zero
    val single = Seq((5L, 5L), (9L, 9L)).toDF("id", "x")
      .select($"id", graft.functions.zorder($"x").as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single(5L) == 5L && single(9L) == 9L)
    // out-of-range clamps to the lane mask; null sorts first as 0
    val edge = Seq((1L, Some(-5L), Some(3L)), (2L, None, Some(3L)))
      .toDF("id", "x", "y")
      .select($"id", graft.functions.zorder($"x", $"y").as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edge(1L) == InterleaveBits.morton(Array(0L, 3L), 31))
    assert(edge(2L) == edge(1L))
  }

  test("z-sorted chunks bound BOTH axes; lexicographic sort leaves one unconstrained") {
    // 32x32 grid, 64-point chunks. Bounding AREAS tie (x-sort: 2 tight
    // columns = 2x32; z: an 8x8 block) — the pruning difference is the
    // per-axis balance: a predicate on y matches 1-in-4 z-chunks but
    // EVERY x-sorted chunk. Assert on the worst-axis span.
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    def spans(sorted: Seq[(Long, Long)]): Seq[(Long, Long)] =
      sorted.grouped(64).map { chunk =>
        val (xs, ys) = (chunk.map(_._1), chunk.map(_._2))
        (xs.max - xs.min + 1, ys.max - ys.min + 1)
      }.toSeq
    val zSpans = spans(pts.sortBy { case (x, y) => InterleaveBits.morton(Array(x, y), 31) })
    val xSpans = spans(pts.sortBy(identity))
    assert(zSpans.forall { case (sx, sy) => sx == 8L && sy == 8L },
      s"z-chunks must be 8x8 blocks, got ${zSpans.take(4)}")
    assert(xSpans.forall(_._2 == 32L), "x-sort leaves y spanning the full range")
  }
}
