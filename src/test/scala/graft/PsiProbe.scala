package graft

/** Paired measurement for C71's checkpoint decision: the base frame
  * feeds the cutoff-sample branch and the bin scan — materialize once
  * vs recompute per branch. Fresh JVM per run, both orders:
  * `sbt "Test/runMain graft.PsiProbe ckpt|plain [dir]"`. */
object PsiProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("ckpt")
    val dir = if (args.length > 1) args(1) else "/tmp/graft-sf100x"
    val spark = graft.engine.GraftSession.getOrCreate("psi-probe")
    val t0 = System.nanoTime()
    val n = queries.Warehouse.qPsi(spark, dir, materialize = mode == "ckpt")
      .count()
    println(f"PSI[$mode] ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    spark.stop()
  }
}
