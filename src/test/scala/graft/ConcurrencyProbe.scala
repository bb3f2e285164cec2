package graft

/** Paired same-JVM measurement for C44's session-frame reuse (two
  * consumers of the sessionize DAG: the +1 and −1 point legs). Run:
  * `sbt "Test/runMain graft.ConcurrencyProbe [dir]"`. */
object ConcurrencyProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("concurrency-probe")
    val dir = args.headOption.getOrElse("/tmp/graft-sf100x")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val sessions = queries.Warehouse.qSessionize(spark, dir)
    if (args.drop(1).headOption.contains("ckptfirst")) {
      val ckpt = t("checkpoint_build")(
        graft.engine.Materialized.checkpoint(sessions))
      t("peak_checkpoint_cold")(println("  hours=" +
        queries.Warehouse.peakConcurrency(ckpt).count()))
      t("peak_plain_after")(println("  hours=" +
        queries.Warehouse.peakConcurrency(sessions).count()))
    } else {
      t("sessionize_alone")(println("  sessions=" + sessions.count()))
      t("peak_plain")(println("  hours=" +
        queries.Warehouse.peakConcurrency(sessions).count()))
      val ckpt = graft.engine.Materialized.checkpoint(sessions)
      t("peak_checkpoint")(println("  hours=" +
        queries.Warehouse.peakConcurrency(ckpt).count()))
      t("peak_checkpoint_warm")(println("  hours=" +
        queries.Warehouse.peakConcurrency(ckpt).count()))
    }
    graft.engine.Materialized.release(spark)
    spark.stop()
  }
}
