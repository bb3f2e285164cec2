package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Temporal / change-data operators — the capabilities a warehouse sync
  * needs once the source emits CHANGES rather than snapshots (the
  * reference's incremental replication, tap-redshift/src/sync.py:132-156,
  * is the extract half; these are the apply/merge half), plus
  * calendar-completion for downstream metrics.
  *
  * All three are one-shuffle-per-key plans: CDC apply is a single
  * max_by aggregate (map-side partial — the changelog never sorts
  * globally), SCD2 is two window passes over one exchange, gap-fill
  * joins a per-key calendar that is tiny AFTER aggregation regardless of
  * input scale.
  */
object Temporal {

  /** CDC changelog compaction: reduce an (op, key, payload, seq) change
    * stream to the current snapshot — keep each key's LATEST change and
    * drop keys whose latest op is a delete. The standard materialization
    * step for log-based replication (Debezium/DMS-style feeds).
    *
    * The changelog here derives deterministically from `events`: every
    * event upserts its user's profile, `error` events are tombstones.
    * Latest-per-key is a `max_by` over the (ts, event_id) order. Plan
    * shape: SortAggregate with a map-side PARTIAL (struct-valued
    * buffers aren't hash-aggregable), so each map partition sorts on
    * the grouping key locally and the shuffle carries one candidate
    * row per key per map partition — never the raw changelog, and
    * never a global sort (a window row_number would shuffle + sort
    * every change; the oracle states that equivalent form). The
    * packed-long HashAggregate trick (see qCurateE2e) doesn't apply
    * here: the carried payload (props string) doesn't fit in a long,
    * and a winners+join-back alternative would rescan the changelog —
    * one sorted scan is the better trade for wide payloads.
    */
  /** I4: TIME-TRAVEL snapshot series — the table's state AS OF several
    * checkpoints, reconstructed from the same CDC changelog in ONE scan
    * (the lakehouse `VERSION AS OF` read, answered from the log instead
    * of stored snapshots). Each event joins its ≤|checkpoints| future
    * checkpoints via a broadcast 4-row inequality join (bounded fanout —
    * the C33 grid pattern), then per (checkpoint, key) the I1 max_by
    * picks the last change before the checkpoint, tombstones drop, and
    * the per-checkpoint rollup reports live keys + value mass. Cost is
    * |checkpoints| × the I1 plan, NOT a per-checkpoint replay of the
    * log; at 100 TB a date-partitioned changelog additionally prunes
    * every partition newer than max(checkpoint). */
  def qSnapshotSeries(spark: SparkSession, dir: String,
      checkpoints: Seq[String] = Seq(
        "2024-01-08", "2024-01-15", "2024-01-22", "2024-01-29")): DataFrame = {
    import spark.implicits._
    val cps = checkpoints.toDF("cp_s").select(to_timestamp($"cp_s").as("cp"))
    val log = Tables.table(spark, dir, "events")
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "error", lit("D")).otherwise(lit("U")).as("op"),
        $"value")
    log.join(broadcast(cps), $"ts" < $"cp")
      .groupBy($"cp", $"user_id")
      .agg(max_by(struct($"op", $"value"), struct($"ts", $"event_id")).as("last"))
      .filter($"last.op" =!= "D")
      .groupBy($"cp")
      .agg(count(lit(1)).as("live_users"),
        round(sum($"last.value"), 2).as("total_value"))
      .select($"cp".cast("date").as("checkpoint"), $"live_users", $"total_value")
      .orderBy($"checkpoint")
  }

  def qCdcApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val log = Tables.table(spark, dir, "events")
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "error", lit("D")).otherwise(lit("U")).as("op"),
        $"value", $"props")
    log.groupBy($"user_id")
      .agg(max_by(
        struct($"op", $"ts", $"value", $"props"),
        struct($"ts", $"event_id")).as("last"))
      .filter($"last.op" =!= "D")
      .select($"user_id", $"last.ts".as("last_ts"),
        round($"last.value", 2).as("value"), $"last.props".as("props"))
      .orderBy($"user_id")
  }

  /** SCD type-2 history build: turn a change stream into validity
    * intervals — one row per (key, attribute-value) EPISODE with
    * [valid_from, valid_to) bounds, valid_to NULL while current. The
    * dimension-table shape every warehouse keeps for as-of-date joins.
    *
    * Change detection (lag ≠ current) and interval close (lead over the
    * change rows) are two window passes over the SAME key exchange — the
    * filter between them preserves partitioning and order, so the plan
    * has exactly one shuffle. Change detection is NULL-SAFE (`<=>`): a
    * transition to or from NULL is a real episode boundary, and a run of
    * NULLs is ONE episode — the null-unsafe `=!=` both drops the former
    * and splits the latter. */
  def scd2(df: DataFrame, keyCol: String, tsCol: String, seqCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    df.select(col(keyCol), col(tsCol), col(seqCol), col(attrCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__first", row_number().over(w) === 1)
      .filter(col("__first") || !(col(attrCol) <=> col("__prev")))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scd2(Tables.table(spark, dir, "events"), "user_id", "ts", "event_id", "props")
      .orderBy($"user_id", $"valid_from")
  }

  /** I5: SCD2 POINT-IN-TIME lookup — "which version was current at T"
    * against the I2 history, for a set of checkpoints: the dimension
    * read every as-of report and feature-backfill join performs on a
    * slowly-changing dimension. Containment is [valid_from, valid_to)
    * with the open current episode matching any later T. The checkpoint
    * dim is |cps| rows and broadcasts; the history side arrives already
    * reduced to episodes (change rows only, not the raw changelog), so
    * the inequality join's output is |matching keys| × |cps| — at
    * 100 TB the same lookup against a valid_from-sorted history file
    * prunes with min/max stats (G6's sort-key re-cluster). */
  def qScd2Asof(spark: SparkSession, dir: String,
      checkpoints: Seq[String] = Seq(
        "2024-01-08", "2024-01-15", "2024-01-22", "2024-01-29")): DataFrame = {
    import spark.implicits._
    val cps = checkpoints.toDF("cp_s").select(to_timestamp($"cp_s").as("cp"))
    val hist = scd2(Tables.table(spark, dir, "events"),
      "user_id", "ts", "event_id", "props")
    hist.join(broadcast(cps),
      $"valid_from" <= $"cp" && ($"valid_to".isNull || $"cp" < $"valid_to"))
      .select($"cp".cast("date").as("checkpoint"), $"user_id", $"props",
        $"valid_from")
      .orderBy($"checkpoint", $"user_id")
  }

  /** Time-series gap fill: complete each key's hourly metric series over
    * its own [min, max] span — missing buckets appear with n=0 and the
    * last observed value carried forward (LOCF), the shape dashboards and
    * feature pipelines need before any rolling computation.
    *
    * The calendar explodes from the per-key bounds AFTER aggregation:
    * its size is keys × buckets regardless of fact-table scale, and the
    * left join back to the (equally post-aggregation-sized) hourly rows
    * is a join between two small sides at any input size — the 100 TB
    * cost stays in the one groupBy shuffle. */
  def qFillGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.table(spark, dir, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
    val calendar = hourly.groupBy($"event_type")
      .agg(min($"h").as("__lo"), max($"h").as("__hi"))
      .select($"event_type",
        explode(sequence($"__lo", $"__hi", expr("INTERVAL 1 HOUR"))).as("h"))
    val w = Window.partitionBy($"event_type").orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar.join(hourly, Seq("event_type", "h"), "left")
      .select($"event_type", $"h",
        coalesce($"n", lit(0L)).as("n"),
        $"sum_value",
        // the first bucket is min(h), which has data — LOCF never NULL
        last($"sum_value", ignoreNulls = true).over(w).as("locf_value"))
      .orderBy($"event_type", $"h")
  }

  /** I8: NET-EFFECT change-log compaction — collapse a batch of CDC ops
    * per key to the single op a downstream apply needs (the compacted-
    * topic / Debezium batch-reduce contract, the missing half of I1
    * which applies a log but never shrinks one): I1's op convention
    * extended with the creation op (signup = I, error = D, else U).
    * Net rule from each key's FIRST and LAST batch op:
    * I…D → NONE (born and deleted inside the batch — emit nothing),
    * I…≠D → I carrying the last payload, ≠I…D → D (payload nulled),
    * otherwise → U with the last payload. `n_ops` reports the collapse
    * factor. ONE min_by/max_by hash aggregate on the key — no window,
    * no sort, map-side combinable: exactly the shape a log compactor
    * needs at 100 TB (state per key is two structs, not the op list). */
  def qCdcCompact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val log = Tables.table(spark, dir, "events")
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "signup", lit("I"))
          .when($"event_type" === "error", lit("D"))
          .otherwise(lit("U")).as("op"),
        $"value", $"props")
    log.groupBy($"user_id")
      .agg(count(lit(1)).as("n_ops"),
        min_by($"op", struct($"ts", $"event_id")).as("__first_op"),
        max_by(struct($"op", $"ts", $"value", $"props"),
          struct($"ts", $"event_id")).as("__last"))
      .withColumn("net_op",
        when($"__first_op" === "I" && $"__last.op" === "D", "NONE")
          .when($"__first_op" === "I", "I")
          .when($"__last.op" === "D", "D")
          .otherwise("U"))
      .filter($"net_op" =!= "NONE")
      .select($"user_id", $"net_op", $"n_ops",
        $"__last.ts".as("last_ts"),
        when($"net_op" === "D", lit(null))
          .otherwise(round($"__last.value", 2)).as("value"),
        when($"net_op" === "D", lit(null))
          .otherwise($"__last.props").as("props"))
      .orderBy($"user_id")
  }
}
