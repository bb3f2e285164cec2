package graft

/** Generic per-face timing probe: times named registered faces with the
  * bench action (Consume.rows + Materialized.release boundary hygiene),
  * one cold pass then `passes` warm passes, median + spread reported —
  * the same discipline as Bench.scala, scoped to a face list so a
  * regression hunt doesn't pay the full 280-face sweep per sample.
  *
  * `sbt "Test/runMain graft.FaceTimeProbe <dir> <passes> <face>[,<face>…]"`
  */
object FaceTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val faces = args.lift(2).map(_.split(",").toSeq)
      .getOrElse(Seq("q_epoch_independence", "q_embedding_neardup_lsh"))
    val spark = graft.engine.GraftSession.getOrCreate("face-time-probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    def one(name: String): Double = {
      val t0 = System.nanoTime()
      graft.engine.Consume.rows(SparkEntry.queries(name)(spark, dir))
      val dt = (System.nanoTime() - t0) / 1e9
      graft.engine.Materialized.release(spark)
      dt
    }
    faces.foreach { name =>
      val cold = one(name)
      val warm = (1 to passes).map(_ => one(name))
      val med = warm.sorted.apply(warm.size / 2)
      println(f"$name%-28s cold=$cold%6.2fs warm_med=$med%6.2fs " +
        f"spread=${warm.max - warm.min}%5.2fs passes=${warm.map(v => f"$v%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
