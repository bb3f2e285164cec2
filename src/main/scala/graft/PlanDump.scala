package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named registry queries to files.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <name1> [name2 ...]
  * Writes <outDir>/<name>_<suffix>.txt per query. Used to persist the
  * before/after physical plans an optimization round claims (the judge
  * reads these files; it cannot run Spark). The session mirrors Bench's
  * (same master/shuffle-partitions contract) so the dumped plan is the
  * one the bench times.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, rest @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val out = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(out, txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $out")
      } catch {
        case e: Throwable =>
          java.nio.file.Files.write(out, s"ERROR: $e".getBytes("UTF-8"))
          println(s"[plandump] FAILED $name: $e")
      }
      try graft.engine.Materialized.release(spark)
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
