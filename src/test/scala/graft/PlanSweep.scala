package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** One-off probe: build EVERY registered query at sf0.001 and report which
  * physical plans contain (a) a partitionless Window — the single-node
  * sort the bench log warns about — or (b) a true CartesianProduct.
  * Feeds the RegistrySpec plan-contract sweep's whitelists.
  * Run: `sbt "Test/runMain graft.PlanSweep"`. */
object PlanSweep {
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Nil
    }
    p +: (p.children ++ p.subqueries ++ nested).flatMap(allNodes)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("plan-sweep", cores = 4)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val nodes = allNodes(df.queryExecution.executedPlan)
        val windows = nodes.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => "Window"
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
              if w.partitionSpec.isEmpty => "WindowGroupLimit"
        }
        val cartesian = nodes.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])
        if (windows.nonEmpty || cartesian)
          println(s"SWEEP $name windows=${windows.mkString(",")} cartesian=$cartesian")
      } catch {
        case e: Throwable => println(s"SWEEP $name BUILD-ERROR ${e.getMessage}")
      }
    }
    println("SWEEP done")
    spark.stop()
  }
}
