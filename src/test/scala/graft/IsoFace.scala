package graft
object IsoFace {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("iso-face")
    val dir = "/root/testdata/sf0.1"
    val name = args(0)
    val fn = SparkEntry.queries(name)
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.engine.Consume.rows(fn(spark, dir))
      println(f"pass$i ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
      graft.engine.Materialized.release(spark): Unit
    }
    spark.stop()
  }
}
