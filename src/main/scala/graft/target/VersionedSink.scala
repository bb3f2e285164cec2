package graft.target

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Versioned table sink — the ACTIVATE_VERSION semantics of the Singer
  * protocol (tap-redshift/src/messages.py:152-173: "the Target should
  * delete all previously seen data and replace it with the RECORDS whose
  * version matches").
  *
  * A stream's synced batch lands under stream=<name>/version=<n>;
  * activating a version atomically repoints the `current` marker and
  * drops older versions. Readers resolve through the marker, so a
  * full-table re-replication never serves a half-written table.
  */
object VersionedSink {

  def write(df: DataFrame, baseDir: String, stream: String, version: Long): Unit =
    df.write.mode("overwrite")
      .parquet(s"$baseDir/stream=$stream/version=$version")

  /** Activate: point `current` at the version and prune older ones. May
    * legally run BEFORE the version's data is written (the Singer
    * activate-at-sync-start ordering, sync.py:115-133): the marker then
    * points at a not-yet-existing dir — "truncated" — until the write
    * lands. */
  def activate(baseDir: String, stream: String, version: Long): Unit = {
    val streamDir = new java.io.File(s"$baseDir/stream=$stream")
    streamDir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$streamDir/current"), version.toString)
    Option(streamDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("version="))
      .filter(_.getName.stripPrefix("version=").toLong < version)
      .foreach(deleteRecursively)
  }

  def readCurrent(spark: SparkSession, baseDir: String, stream: String): DataFrame = {
    val version = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$baseDir/stream=$stream/current")).trim.toLong
    spark.read.parquet(s"$baseDir/stream=$stream/version=$version")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
