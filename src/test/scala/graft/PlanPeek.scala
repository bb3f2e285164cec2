package graft

import graft.engine.GraftSession

/** Ad-hoc plan inspection: `sbt "Test/runMain graft.PlanPeek <query> [sfdir]"`. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_ann_topk")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.getOrCreate(cores = 8)
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    spark.stop()
  }
}
