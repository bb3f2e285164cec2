package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The foreign-session fixup contract in [[Tables.table]]: a session
  * arriving with non-UTC timezone (and NTZ inference on) must read the
  * temporal columns BIT-IDENTICALLY to the engine's own UTC sessions —
  * the fixup pins inferTimestampNTZ=false and session timeZone=UTC
  * INDEPENDENTLY (verdict r9 / ADVICE item: a non-UTC session reading
  * NTZ-written micros as LTZ would shift every wall-clock value by its
  * zone offset). */
class TablesSpec extends SparkSpec {

  test("non-UTC foreign session reads temporal columns bit-identically") {
    val utc = Tables.table(spark, sfDir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("ts").cast("date").cast("string").as("d"),
        hour(col("ts")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .sortBy(_._1)

    val foreign = spark.newSession()
    foreign.conf.set("spark.sql.session.timeZone", "America/New_York")
    foreign.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    val got = Tables.table(foreign, sfDir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("ts").cast("date").cast("string").as("d"),
        hour(col("ts")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      .sortBy(_._1)

    assert(foreign.conf.get("spark.sql.session.timeZone") == "UTC",
      "the fixup must pin the foreign session to UTC, not just flip NTZ")
    assert(got.toSeq == utc.toSeq,
      "a non-UTC caller must see the same instants, dates, and hours")
  }

  test("scan pushdown survives the foreign-session fixup") {
    // the fixup mutates confs before building the scan — the returned
    // frame must still prune columns and push predicates
    val df = Tables.table(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "event_type")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("event_type"),
      s"predicate must reach the parquet scan:\n$plan")
  }
}
