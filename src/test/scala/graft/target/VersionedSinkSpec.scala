package graft.target

import graft.SparkSpec

class VersionedSinkSpec extends SparkSpec {

  test("activate repoints current and prunes superseded versions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-versioned").toString
    VersionedSink.write(Seq((1L, "old")).toDF("id", "v"), dir, "accounts", 100L)
    VersionedSink.activate(dir, "accounts", 100L)
    assert(VersionedSink.readCurrent(spark, dir, "accounts")
      .collect().map(_.getString(1)).toSeq == Seq("old"))

    VersionedSink.write(Seq((1L, "new"), (2L, "new2")).toDF("id", "v"), dir, "accounts", 200L)
    // not yet activated: readers still see version 100
    assert(VersionedSink.readCurrent(spark, dir, "accounts").count() == 1L)
    VersionedSink.activate(dir, "accounts", 200L)
    assert(VersionedSink.readCurrent(spark, dir, "accounts").count() == 2L)
    // superseded version pruned
    assert(!new java.io.File(s"$dir/stream=accounts/version=100").exists())
  }
}
