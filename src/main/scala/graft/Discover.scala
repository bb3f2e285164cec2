package graft

import java.nio.file.{Files, Paths}

/** Discovery mode entry point — the engine's `tap-redshift -d >
  * catalog.json` (tap-redshift/src/__init__.py:24, discover.py:11).
  * Prints (or writes) the Singer catalog document for a warehouse dir.
  *
  * Usage: `sbt "runMain graft.Discover /root/testdata/sf0.001 [out.json]"`
  */
object Discover {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.engine.GraftSession.getOrCreate("graft-discover", cores = 4)
    val json = graft.sources.CatalogJson.render(spark, dir)
    args.lift(1) match {
      case Some(out) =>
        Files.writeString(Paths.get(out), json)
        println(s"catalog written to $out")
      case None => println(json)
    }
    spark.stop()
  }
}
