package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jdbc._
import graft.sync.Metrics

class JdbcSpec extends AnyFunSuite {

  test("partitioned read options: bounds + partition column + pushdown") {
    val cfg = JdbcSourceConfig(
      url = "jdbc:postgresql://warehouse:5439/analytics",
      table = "public.pendo_integration_account",
      user = "u", password = "p",
      partitionColumn = Some("last_updated_epoch"),
      lowerBound = Some("0"), upperBound = Some("1700000000"),
      numPartitions = 64)
    val opts = options(cfg)
    assert(opts("partitionColumn") == "last_updated_epoch")
    assert(opts("numPartitions") == "64")
    assert(opts("pushDownPredicate") == "true")
    assert(opts("fetchsize") == "10000")
  }

  test("unpartitioned read omits partitioning keys entirely") {
    val opts = options(JdbcSourceConfig("jdbc:x", "t", "u", "p"))
    assert(!opts.contains("partitionColumn") && !opts.contains("numPartitions"))
  }

  test("metric messages match the Singer shapes") {
    assert(Metrics.counterMessage("record_count", 331207,
      Seq("database" -> "dev", "table" -> "public.account")) ==
      """{"type": "counter", "metric": "record_count", "value": 331207, "tags": {"database": "dev", "table": "public.account"}}""")
    assert(Metrics.progressPct(1, 3) == 33.33)
    assert(Metrics.progressPct(0, 0) == 0.0)
    val t = new Metrics.JobTimer("job_duration", Seq("job_type" -> "sync_table"))
    val msg = t.finish()
    assert(msg.contains(""""metric": "job_duration"""") && msg.contains(""""status": "succeeded""""))
  }
}
