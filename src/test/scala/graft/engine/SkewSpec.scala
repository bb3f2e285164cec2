package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation equals the direct aggregation") {
    import spark.implicits._
    // one hot key (90%) + long tail
    val df = ((1 to 9000).map(_ => ("hot", 1.0)) ++ (1 to 1000).map(i => (s"k${i % 50}", 2.0)))
      .toDF("k", "v").repartition(8)
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, col("k"), salts = 16,
      partials = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      merge = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val big = ((1 to 5000).map(_ => 1L) ++ (1 to 100).map(_.toLong)).toDF("k").repartition(8)
    val small = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k2", "v")
    val plain = big.join(small, big("k") === small("k2")).groupBy("k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (bigS, smallS) = Skew.saltForJoin(big, small, salts = 8)
    val saltedJoin = bigS.join(smallS,
      bigS("k") === smallS("k2") && bigS("__salt") === smallS("__salt_r"))
      .groupBy("k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(saltedJoin == plain)
  }

  test("resume drops streams before currently_syncing") {
    import graft.sources.Resolve
    val streams = Seq("a", "b", "c", "d")
    assert(Resolve.resumeStreams[String](streams, identity, Some("c")) == Seq("c", "d"))
    assert(Resolve.resumeStreams[String](streams, identity, None) == streams)
    assert(Resolve.resumeStreams[String](streams, identity, Some("zz")) == streams)
  }
}
