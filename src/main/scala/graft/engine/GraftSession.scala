package graft.engine

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Defaults are chosen for the local[32] test harness but every knob is the
  * one you would also set on a 1000-executor cluster: AQE re-plans shuffles
  * at runtime (coalesce + skew-join), shuffle partition count is sized to
  * the parallelism instead of Spark's legacy 200, and broadcast threshold is
  * left at default so small dimension tables broadcast automatically.
  */
object GraftSession {

  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
    // honor an externally submitted master (spark-submit --master yarn/k8s)
    // — only default to local[] when none was provided
    if (sys.props.get("spark.master").isEmpty && sys.env.get("SPARK_MASTER").isEmpty)
      b.master(s"local[$cores]")
    b
      .config("spark.sql.shuffle.partitions", cores)
      // testdata events.parquet carries TIMESTAMP(NANOS); see Tables.table
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata timestamps are isAdjustedToUTC=false; read them as the
      // session-UTC TIMESTAMP (LTZ) the whole engine and the DuckDB
      // oracle compare were built on, not TIMESTAMP_NTZ (see Tables.table)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // local-mode resilience for the big smoke heaps: a full-GC pause
      // (or a noisy-neighbor VM freeze) past the default 120s heartbeat
      // window kills the driver-executor and with it the whole context
      // (observed at the r15 100x sweep: "Removing executor driver with
      // no recent heartbeats: 121946 ms"). There is no real network in
      // local[] — a generous window only trades failure-detection
      // latency we don't need for survival of long stop-the-world
      // pauses. On a real cluster these stay at their defaults unless
      // the deployment overrides them.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
  }

  def getOrCreate(appName: String = "graft", cores: Int = 32): SparkSession = {
    val spark = builder(appName, cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
