package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The session index memo is count-bounded LRU with release-on-evict:
  * under a cap it evicts the least-recently-USED entry (access refreshes
  * recency), releases exactly the evicted values, and a later request
  * for an evicted key rebuilds transparently. The Spark-side test pins
  * the deployment contract: eviction unpersists the cached frame, and
  * the rebuilt index answers the same query with the same result. */
class IndexCacheSpec extends AnyFunSuite {

  test("evicts LRU under cap, releases evicted, rebuilds transparently") {
    var released = List.empty[String]
    val c = new IndexCache[Int, String](2)(v => released ::= v)
    var builds = 0
    def build(k: Int): String = { builds += 1; s"v$k" }

    assert(c.getOrElseUpdate(1, build(1)) == "v1")
    assert(c.getOrElseUpdate(2, build(2)) == "v2")
    // touch 1 so 2 becomes the LRU entry
    assert(c.getOrElseUpdate(1, build(1)) == "v1")
    assert(builds == 2 && released.isEmpty)
    // inserting 3 must evict 2 (LRU), not 1 (recently touched)
    assert(c.getOrElseUpdate(3, build(3)) == "v3")
    assert(released == List("v2") && c.size == 2)
    // 1 survived without rebuild; 2 rebuilds transparently (evicting 3's LRU peer)
    assert(c.getOrElseUpdate(1, build(1)) == "v1" && builds == 3)
    assert(c.getOrElseUpdate(2, build(2)) == "v2" && builds == 4)
    assert(c.size == 2)
  }

  test("setCapacity shrink evicts immediately; clear releases everything") {
    var released = List.empty[Int]
    val c = new IndexCache[Int, Integer](4)(v => released ::= v.intValue())
    (1 to 4).foreach(k => c.getOrElseUpdate(k, Int.box(k * 10)))
    c.setCapacity(2)
    assert(released.sorted == List(10, 20) && c.size == 2)
    c.clear()
    assert(released.sorted == List(10, 20, 30, 40) && c.size == 0)
  }

  test("racing builders of one key converge on a single winner") {
    val c = new IndexCache[Int, Integer](4)(_ => ())
    val results = java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()
    val threads = (1 to 8).map { i =>
      new Thread(() => { results.add(c.getOrElseUpdate(7, Int.box(i))); () })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    // all callers observe ONE adopted value (losers released theirs)
    assert(results.size == 1 && c.size == 1)
  }

  test("ANN memo eviction unpersists the frame and the query rebuilds") {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.001"
    graft.queries.LlmOps.clearAnnIndexes()
    val lsh = graft.queries.LlmOps.annLshIndex(spark, dir)
    assert(lsh.storageLevel != StorageLevel.NONE)
    val before = graft.queries.LlmOps.qAnnLsh(spark, dir)
      .agg(count(lit(1)), sum(col("query_id")), sum(col("neighbor_id")))
      .collect()(0).toSeq
    // shrink to 0 to force total eviction — the persisted frame must be
    // released by the cache, not leak to ContextCleaner GC
    graft.queries.LlmOps.annIndexCache.setCapacity(0)
    assert(lsh.storageLevel == StorageLevel.NONE)
    graft.queries.LlmOps.annIndexCache.setCapacity(
      sys.env.getOrElse("SPARK_GRAFT_INDEX_CACHE_CAP", "64").toInt)
    // transparent rebuild: same query, same answer, fresh index
    val rebuilt = graft.queries.LlmOps.annLshIndex(spark, dir)
    assert(rebuilt.storageLevel != StorageLevel.NONE)
    val after = graft.queries.LlmOps.qAnnLsh(spark, dir)
      .agg(count(lit(1)), sum(col("query_id")), sum(col("neighbor_id")))
      .collect()(0).toSeq
    assert(after == before)
  }
}
