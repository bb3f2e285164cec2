package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The explicit release hook for engine localCheckpoint blocks: exact
  * registration (the checkpointed RDD, not a persistent-map diff),
  * deterministic release, and no effect on frames it doesn't own. */
class MaterializedSpec extends SparkSpec {

  test("checkpoint registers the persisted RDD and release frees it") {
    val before = Materialized.release(spark) // drain whatever other suites left
    assert(before >= 0)
    val df = Materialized.checkpoint(
      spark.range(1000).select(col("id"), (col("id") * 2).as("v")))
    assert(df.count() == 1000)
    val liveIds = Materialized.live(spark)
    assert(liveIds.nonEmpty, "checkpointed block must be registered and persisted")
    assert(liveIds.forall(spark.sparkContext.getPersistentRDDs.contains))
    val n = Materialized.release(spark)
    assert(n >= liveIds.size, s"release must free the registered blocks (freed $n)")
    assert(Materialized.live(spark).isEmpty, "registry must be empty after release")
    assert(liveIds.forall(id => !spark.sparkContext.getPersistentRDDs.contains(id)),
      "released blocks must leave the context's persistent-RDD map")
  }

  test("release does not touch persist()-based frames it doesn't own") {
    Materialized.release(spark): Unit
    val cached = spark.range(500).select(col("id")).persist()
    assert(cached.count() == 500)
    val rddIds = spark.sparkContext.getPersistentRDDs.keySet
    Materialized.release(spark): Unit
    // the foreign cached frame survives the release untouched
    assert(spark.sparkContext.getPersistentRDDs.keySet == rddIds,
      "release must only unpersist blocks it registered")
    cached.unpersist(blocking = true): Unit
  }

  test("engine queries re-run clean after a release (fresh builds, same answer)") {
    val a = graft.queries.LlmOps.qDedupClusters(spark, sfDir).collect().toSeq
    Materialized.release(spark): Unit
    val b = graft.queries.LlmOps.qDedupClusters(spark, sfDir).collect().toSeq
    assert(a == b, "release must not change results of freshly-built queries")
  }
}
