package graft
object PqCascadeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.engine.GraftSession.getOrCreate("pqc-probe", cores = 8)
    spark.sparkContext.setLogLevel("WARN")
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val exact = sets(queries.LlmOps.qAnnTopK(spark, dir))
    for (kc <- Seq(50, 100, 200)) {
      val cas = sets(queries.LlmOps.qPqCascade(spark, dir, kCand = kc))
      val rec = exact.map { case (q, ex) => (ex & cas(q)).size.toDouble / ex.size }.sum / exact.size
      println(f"kCand=$kc recall@10=$rec%.3f")
    }
    spark.stop()
  }
}
