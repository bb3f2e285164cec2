package graft

/** Isolated single-face timing probe: fresh session, one cold pass +
  * `reps` warm passes of one registered face, Consume.rows as the
  * action (the bench's own methodology). Usage:
  * `sbt "Test/runMain graft.FaceTime <sfDir> <face> [reps]"`. */
object FaceTime {
  def main(args: Array[String]): Unit = {
    val Array(dir, name, rest @ _*) = args
    val reps = rest.headOption.map(_.toInt).getOrElse(3)
    val spark = graft.engine.GraftSession.getOrCreate("face-time")
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (0 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.engine.Consume.rows(fn(spark, dir))
      println(f"[facetime] $name pass=$i ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$n")
      graft.engine.Materialized.release(spark): Unit
    }
    spark.stop()
  }
}
