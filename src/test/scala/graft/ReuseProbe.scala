package graft
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_market_share")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.engine.GraftSession.getOrCreate(cores = 8)
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println(s"$name reused=" + "ReusedExchange".r.findAllIn(p).length +
      " scans=" + "Scan parquet".r.findAllIn(p).length)
    spark.stop()
  }
}
