package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit release hook for the engine's lineage-truncating
  * materializations (`localCheckpoint`).
  *
  * The engine materializes small intermediate frames (candidate-pair
  * sets, signature frames, cutoff tables) with `localCheckpoint` so a
  * multi-action consumer doesn't re-plan the producing DAG per action.
  * Those blocks are freed by Spark's ContextCleaner only when the JVM
  * garbage-collects the last reference — correct, but LAZY: a
  * long-lived session (a service scanning many corpora) can sit on
  * gigabytes of dead executor storage between GC cycles. This registry
  * records the persisted RDD behind every engine checkpoint and lets
  * the application free them deterministically at a unit-of-work
  * boundary.
  *
  * Contract for [[release]]: call it when no DataFrame returned by an
  * earlier engine call will be re-executed. A localCheckpointed frame
  * has NO lineage to recompute from — an action on one after its
  * release fails rather than silently recomputing (that is the
  * documented localCheckpoint trade; at cluster scale prefer reliable
  * `checkpoint()` for executor-loss tolerance). Frames managed by
  * [[IndexCache]] are persist()-based and recompute-safe; they are
  * governed by the cache's LRU bound, not this registry.
  */
object Materialized {

  // ids are scoped by SparkContext application id: RDD ids are small
  // integers that RESET when a context restarts, so an unscoped registry
  // carrying ids from a previous context could alias — and unpersist —
  // unrelated RDDs in the new one
  private val ids = scala.collection.mutable.LinkedHashSet[(String, Int)]()

  /** `df.localCheckpoint()` + register the persisted RDD for later
    * [[release]]. The checkpointed plan is a [[LogicalRDD]] leaf over
    * the persisted internal RDD, so registration is exact — no
    * before/after diffing of the context's persistent-RDD map (which
    * would race with concurrent persists from other threads). */
  def checkpoint(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint()
    val app = df.sparkSession.sparkContext.applicationId
    out.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd.id }
      .foreach(id => ids.synchronized { ids += ((app, id)); () })
    out
  }

  /** Registered checkpoint blocks currently persisted (test/ops probe). */
  def live(spark: SparkSession): Seq[Int] = {
    val app = spark.sparkContext.applicationId
    val persisted = spark.sparkContext.getPersistentRDDs
    ids.synchronized(ids.toSeq)
      .collect { case (`app`, id) if persisted.contains(id) => id }
  }

  /** Unpersist every checkpoint block registered under `spark`'s
    * context and still held by it, then drop those entries (entries
    * from other/old contexts are left alone — their ids are meaningless
    * here). Returns the number of RDDs released. Contract: call at a
    * unit-of-work boundary — a released localCheckpoint frame has no
    * lineage, so a concurrent consumer of the SAME engine frames would
    * fail rather than recompute (document per call site). */
  def release(spark: SparkSession): Int = {
    val app = spark.sparkContext.applicationId
    val persisted = spark.sparkContext.getPersistentRDDs
    val mine = ids.synchronized {
      val out = ids.toList.collect { case (`app`, id) => id }
      ids.filterInPlace(_._1 != app)
      out
    }
    val freed = mine.flatMap(persisted.get)
    freed.foreach(_.unpersist(blocking = false))
    freed.size
  }
}
