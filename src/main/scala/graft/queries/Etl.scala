package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Streams
import graft.sources.{Discovery, Resolve, Tables}
import graft.sync.{Bookmarks, MessageParser, Messages, Sync}
import graft.target.Transform
import graft.functions._

/** Oracle-checked query faces of the ETL operators (SURVEY.md §2 A/B
  * blocks). Each function wires an operator from graft.sync / graft.target /
  * graft.sources to the synthetic warehouse so the DuckDB oracle can verify
  * exact semantics.
  */
object Etl {

  /** A1: catalog discovery (type mapping + inclusion + replication keys). */
  def qDiscoverCatalog(spark: SparkSession, dir: String): DataFrame =
    Discovery.discoverCatalog(spark, dir)

  /** A18: schema DRIFT report — live re-discovery vs a stored catalog
    * (the tap re-runs discovery per invocation and merges it with the
    * persisted catalog's selections — discover.py:17-97 /
    * resolve.py:10-56; this face reports what CHANGED so selection
    * review is explicit instead of silent). The baseline here is a
    * deterministic mutation of the live catalog — two columns retired,
    * one integer type widened, one legacy column only the baseline
    * knows — and every (table, column) difference classifies as
    * added / removed / type_changed. Catalog-sized frames throughout:
    * this reads parquet FOOTERS, never data. */
  def qSchemaDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val current = Discovery.discoverCatalog(spark, dir)
      .select(col("table_name"), col("column_name"), col("sql_type"))
    val baseline = current
      .filter(!col("column_name").isin("c_mktsegment", "l_tax"))
      .withColumn("sql_type",
        when(col("column_name") === "p_size", lit("bigint"))
          .otherwise(col("sql_type")))
      .unionAll(Seq(("events", "legacy_ip", "string"))
        .toDF("table_name", "column_name", "sql_type"))
    current.withColumnRenamed("sql_type", "current_type")
      .join(baseline.withColumnRenamed("sql_type", "baseline_type"),
        Seq("table_name", "column_name"), "full_outer")
      .withColumn("change",
        when(col("baseline_type").isNull, "added")
          .when(col("current_type").isNull, "removed")
          .when(col("current_type") =!= col("baseline_type"), "type_changed")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .select(col("table_name"), col("column_name"), col("change"),
        col("baseline_type"), col("current_type"))
      .orderBy("table_name", "column_name")
  }

  /** A19: FUNCTIONAL-DEPENDENCY profile — does column A determine
    * column B? The warehouse-side constraint discovery behind key
    * detection, denormalization safety, and "is this join key actually
    * a key" (the reference trusts the catalog's declared keys,
    * discover.py:60; at 100 TB you VERIFY them). For each candidate
    * (lhs → rhs) over a declared pair set: one hash aggregation on the
    * LHS key counting distinct RHS values per group (map-side partial,
    * |groups| state), then a |groups|-sized reduction to (n_groups,
    * n_violating, max_rhs_per_group); fd holds iff no group sees >1 rhs.
    * One exchange per candidate pair, nothing quadratic, and the per-
    * pair frames union into one report. */
  def qFdProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def check(table: String, lhs: String, rhs: String): DataFrame =
      Tables.table(spark, dir, table)
        .groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("__k"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when($"__k" > 1L, 1L).otherwise(0L)).as("n_violating"),
          max($"__k").as("max_rhs_per_group"))
        .select(lit(table).as("rel"), lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          $"n_groups", $"n_violating",
          $"max_rhs_per_group",
          // CASE-shaped so an EMPTY relation (sum → NULL) yields 0 like
          // the oracle's CASE, not a NULL boolean cast
          when($"n_violating" === 0L, 1).otherwise(0).as("fd_holds"))
    Seq(
      check("orders", "o_orderkey", "o_custkey"),      // PK ⇒ holds
      check("orders", "o_custkey", "o_orderstatus"),   // repeat buyers ⇒ no
      check("lineitem", "l_orderkey", "l_linestatus"),   // multi-line orders ⇒ no
      check("lineitem", "l_partkey", "l_suppkey"),     // parts multi-sourced ⇒ no
      check("customer", "c_custkey", "c_nationkey"),   // PK ⇒ holds
      check("nation", "n_nationkey", "n_regionkey")    // dim PK ⇒ holds
    ).reduce(_.unionAll(_))
      .orderBy($"rel", $"lhs", $"rhs")
  }

  /** A2: column selection — selected ∩ available ∪ automatic. The pkey is
    * 'automatic' so it appears even though not selected. */
  def qSelectColumns(spark: SparkSession, dir: String): DataFrame =
    Resolve.select(spark, dir, "customer", Set("c_name", "c_acctbal", "c_nationkey"))
      .orderBy("c_custkey")

  /** A3: FULL_TABLE replication of the accounts stream, fixed version. */
  def qFullTableSync(spark: SparkSession, dir: String): DataFrame =
    Sync.fullTable(spark, dir, Streams.accounts, version = 1L)
      .orderBy("accountId")

  /** A4: INCREMENTAL replication of the visitors stream: bookmark filter +
    * broadcast semi-join against "active" account keys + ordered batch. */
  def qIncrementalSync(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val active = Tables.table(spark, dir, "customer")
      .filter($"c_acctbal" > 1000.0).select($"c_custkey")
    Sync.incremental(spark, dir, Streams.visitors,
      bookmark = Some("1998-01-01"), activeKeys = active,
      joinColumn = "o_custkey", limit = 1000)
  }

  /** A4b: the active-entity semi-join of A4 at the scale where the entity
    * set no longer broadcasts: Bloom bits prefilter the fact scan
    * map-side, the exact left-semi join removes the false positives —
    * result identical to the plain semi-join (which is what the oracle
    * states). See graft.engine.BloomSemiJoin. */
  def qBloomSync(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val active = Tables.table(spark, dir, "customer")
      .filter($"c_acctbal" > 5000.0).select($"c_custkey")
    graft.engine.BloomSemiJoin.semiJoin(
      Tables.table(spark, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice"),
      "o_custkey", active, "c_custkey",
      expectedItems = 200000L, fpp = 0.03)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** A22: Bloom-prefilter QUALITY audit — the two numbers behind A13's
    * semi-join economics, measured on its own traffic: (a) the hard
    * contract, zero FALSE NEGATIVES (an active row the filter drops is
    * silent data loss — the row must be 0, not probabilistically small),
    * and (b) the observed false-positive rate over the truly-inactive
    * probe stream vs the configured fpp (false positives are the wasted
    * rows the later exact semi-join re-drops — the knob that decides
    * whether the prefilter pays for itself at a given selectivity). One
    * pass over the fact with the filter broadcast and a broadcast-joined
    * activity flag; output is ONE row. The filter is sized to the ACTUAL
    * active count (expectedItems ≤ 0 → count it) — an audit against a
    * grossly oversized filter reads 0 observed fpp and proves nothing;
    * sized-to-set, the observed rate must land at the configured fpp,
    * which is what gives the band teeth. [R]→[O] in round 15: the
    * filter's per-key verdict (membership bit per DISTINCT probe key —
    * the pass bit is key-functional) PINS as an artifact stamped
    * against BOTH source tables (the spark-sketch bit layout is the one
    * lane with no SQL replay), and the oracle replays everything around
    * it: the probe stream, the activity recomputation (which makes
    * FN = 0 an oracle-checked equality, not a spec assertion), every
    * count, and the ppm arithmetic. BloomSpec still pins the zero-FN
    * contract and the fpp band independently.
    * Ref: tap sync.py's key-prefilter economics (A13). */
  def qBloomFpr(spark: SparkSession, dir: String,
      expectedItems: Long = 0L, fpp: Double = 0.03): DataFrame = {
    import spark.implicits._
    val verdicts = LlmOps.pinnedFrameTables(spark, dir, Seq("orders", "customer"),
        s"bloom_verdicts_acct5000_i${expectedItems}_f${(fpp * 1e6).round}") {
      val active = Tables.table(spark, dir, "customer")
        .filter($"c_acctbal" > 5000.0).select($"c_custkey")
      val sized = if (expectedItems > 0) expectedItems
        else math.max(1L, active.count())
      val bytes = graft.engine.BloomSemiJoin.buildBloom(
        active, "c_custkey", sized, fpp)
      Tables.table(spark, dir, "orders").select($"o_custkey").distinct()
        .select($"o_custkey",
          graft.functions.bloomMightContain($"o_custkey", bytes)
            .cast("long").as("pass"))
    }
    val active = Tables.table(spark, dir, "customer")
      .filter($"c_acctbal" > 5000.0).select($"c_custkey")
    val flagged = Tables.table(spark, dir, "orders")
      .select($"o_custkey")
      .join(verdicts, "o_custkey")
      .join(broadcast(active.select($"c_custkey",
        lit(1L).as("is_active"))), $"o_custkey" === $"c_custkey", "left")
      .select($"pass", coalesce($"is_active", lit(0L)).as("is_active"))
    flagged.agg(
        count(lit(1)).as("n_probes"),
        sum(when($"is_active" === 0L, 1L).otherwise(0L)).as("n_negative_probes"),
        sum(when($"is_active" === 0L && $"pass" === 1L, 1L).otherwise(0L))
          .as("n_false_positives"),
        sum(when($"is_active" === 1L && $"pass" === 0L, 1L).otherwise(0L))
          .as("n_false_negatives"))
      .select(col("*"),
        expr("CAST(CASE WHEN n_negative_probes = 0 THEN 0 ELSE" +
          " (CAST(n_false_positives AS DECIMAL(38,0)) * 1000000)" +
          " DIV n_negative_probes END AS BIGINT)").as("observed_fpp_ppm"),
        lit((fpp * 1e6).round).as("configured_fpp_ppm"))
  }

  /** A5: UUID derivation + validity filter (the fetch_uuids len==36 path).
    * Keys divisible by 7 get a truncated (invalid) id — the filter must
    * drop exactly those. */
  def qUuidFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val withUuid = Tables.table(spark, dir, "customer")
      .withColumn("uuid_raw", uuidify($"c_custkey"))
      .withColumn("uuid",
        when($"c_custkey" % 7 === 0, substring($"uuid_raw", 1, 35)).otherwise($"uuid_raw"))
    withUuid.filter(uuidValid($"uuid"))
      .select($"c_custkey", $"uuid")
      .orderBy($"c_custkey")
  }

  /** A6: per-stream VOLUME counts. */
  def qVolumeCounts(spark: SparkSession, dir: String): DataFrame =
    Sync.volumes(spark, dir).orderBy("stream")

  /** A7: bookmark computation — max(replication_key) per incremental
    * stream, ISO-formatted. */
  def qBookmarkState(spark: SparkSession, dir: String): DataFrame = {
    val streams = Seq(Streams.visitors,
      Streams.visitors.copy(streamName = "warehouse_event", sourceTable = "events",
        replicationKey = Some("ts")))
    Bookmarks.computeBookmarks(spark, dir, streams).orderBy("stream")
  }

  /** A8: RECORD message JSON lines for the accounts stream. */
  def qRowToRecord(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Tables.table(spark, dir, "customer").orderBy("c_custkey")
    Messages.recordMessages(src, stream = "warehouse_account", version = 1L,
      timeExtracted = "2026-01-01T00:00:00Z",
      fields = Seq(
        "accountId" -> $"c_custkey",
        "account_name" -> $"c_name",
        "account_balance" -> format_string("%.2f", $"c_acctbal")))
      .orderBy("message")
  }

  /** A8b/B-side: Singer message round-trip — RECORD lines built by the
    * tap side are parsed, validated, and their payloads extracted by the
    * target side. Proves the two message layers agree byte-for-byte. */
  def qParseMessages(spark: SparkSession, dir: String): DataFrame = {
    val lines = qRowToRecord(spark, dir).withColumnRenamed("message", "line")
    val parsed = MessageParser.withValidity(MessageParser.parse(lines))
      .filter(col("problem").isNull)
    MessageParser.records(parsed, "warehouse_account", 1L,
      Seq("accountId", "account_name", "account_balance"))
      .orderBy("accountId")
  }

  /** B1: nested-record flattening with `__` separators (struct built from
    * events, then flattened back to columns). */
  def qFlatten(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nested = Tables.table(spark, dir, "events").select(
      $"event_id",
      struct($"user_id".as("id"), struct($"event_type".as("name")).as("kind")).as("user"),
      $"value")
    Transform.flatten(nested).orderBy("event_id")
  }

  /** B2: field mapping + int→string dtype coercion for the accounts
    * stream. */
  def qFieldMapping(spark: SparkSession, dir: String): DataFrame =
    Transform.applyFieldMappings(Tables.table(spark, dir, "customer"), Streams.accounts)
      .orderBy("accountId")

  /** B3: bulk-update payload construction {pkey, values:{...}}. */
  def qPayloadShape(spark: SparkSession, dir: String): DataFrame = {
    val mapped = Transform.applyFieldMappings(
      Tables.table(spark, dir, "customer")
        .withColumn("c_acctbal", format_string("%.2f", col("c_acctbal"))),
      Streams.accounts)
    Transform.shapePayloads(mapped, "accountId").orderBy("accountId")
  }

  /** B4: batch assignment + per-batch record/byte accounting. */
  def qBatchAssign(spark: SparkSession, dir: String): DataFrame = {
    val payloads = qPayloadShape(spark, dir)
    Transform.batchStats(Transform.assignBatches(payloads, "accountId", maxRecords = 500))
  }

  /** B9: PUSH PLAN — the pre-flight schedule estimate for an API sync
    * (what ops asks before hitting run: how many requests, how long at
    * the rate limit, how heavy per request): per event kind, records →
    * ceil-div batches at the sink's 500-record cap, wall-second
    * estimate at the token bucket's 10 req/s, mean payload bytes per
    * batch from the props column. One aggregate of pure integer
    * arithmetic — B4/B5's constants read as a PLAN instead of
    * executed; the number a capacity review wants before the sink ever
    * opens a connection. */
  def qPushPlan(spark: SparkSession, dir: String,
      batchSize: Long = 500L, reqPerSec: Long = 10L): DataFrame = {
    Tables.table(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_records"),
        sum(length(col("props")).cast("long")).as("__bytes"))
      .select(col("event_type").as("kind"), col("n_records"),
        expr(s"(n_records + ${batchSize - 1}) DIV $batchSize").as("n_batches"),
        expr(s"((n_records + ${batchSize - 1}) DIV $batchSize" +
          s" + ${reqPerSec - 1}) DIV $reqPerSec").as("est_seconds"),
        expr(s"__bytes DIV ((n_records + ${batchSize - 1}) DIV $batchSize)")
          .as("avg_batch_bytes"))
      .orderBy("kind")
  }

  /** B6: schema/constraint validation — violation counts GENERATED from
    * each stream's declared record schema (StreamDef.recordSchema, Draft4
    * semantics via graft.target.Validation; the reference validates every
    * record with Draft4Validator, target-pendo/src/__init__.py:523). One
    * aggregate pass per source table. */
  def qSchemaValidate(spark: SparkSession, dir: String): DataFrame =
    Streams.all
      .filter(_.recordSchema.nonEmpty)
      .map(s => graft.target.Validation.violationCounts(
        Tables.table(spark, dir, s.sourceTable), s.sourceTable, s.recordSchema))
      .reduce(_.unionAll(_))
      .orderBy("check_name")

  /** A14: per-column data profile — row count, null count, distinct count
    * for every column in one pass (the source-assessment step before
    * wiring a sync; discover.py introspects types, this introspects
    * content). One aggregate job; the multi-distinct plans through one
    * Expand (factor = #columns). At 100 TB swap countDistinct for
    * approx_count_distinct / kmvDistinct — same plan, bounded state;
    * exact here because the oracle is exact. */
  def qProfile(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.table(spark, dir, "documents")
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val stackArgs = cols
      .map(c => s"'$c', __n, __n - __nn_$c, __nd_$c").mkString(", ")
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, n, n_nulls, n_distinct)")
      .orderBy("column_name")
  }

  /** A21: REPLICATION-KEY candidate audit — the measurement behind the
    * tap's key choices (tap-redshift must pick a primary key for
    * FULL_TABLE dedup and a replication key for INCREMENTAL bookmarks;
    * discovery reports what the warehouse DECLARES — this face measures
    * what the data actually SUPPORTS): per column of the orders stream,
    * exact distinct/null/top-frequency counts and an is_key verdict
    * (zero nulls ∧ distinct == rows). One stack-unpivot then ONE
    * (column, value) shuffle serves all three statistics simultaneously
    * — vs qProfile's per-column count-distinct expand, this shape adds
    * top_freq for free because the per-value counts are materialized
    * anyway. Values compare as strings (cast is injective per column, so
    * distinct/top counts are format-independent). At 100 TB the stacked
    * exchange is |cols|× the table — the approx path swaps in the C33b
    * per-column KMV sketches; this face is the exact gate-scale form.
    * Ref: tap-redshift/src/discover.py (key_properties), sync.py:209
    * (replication_key bookmark). */
  def qKeyCandidates(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.table(spark, dir, "orders")
    val cols = df.columns.toSeq
    val stackArgs = cols.map(c => s"'$c', CAST(`$c` AS STRING)").mkString(", ")
    val stacked = df.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column_name, v)")
    stacked.groupBy(col("column_name"), col("v"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("column_name"))
      .agg(
        sum(col("__c")).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("__c"))), lit(0L)).as("n_nulls"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        coalesce(max(when(col("v").isNotNull, col("__c"))), lit(0L)).as("top_freq"))
      .withColumn("is_key",
        (col("n_nulls") === 0L && col("n_distinct") === col("n_rows")).cast("int"))
      .orderBy("column_name")
  }

  /** A20: catalog-wide PII incidence audit — F10's redaction patterns
    * lifted from one text column to EVERY string column of EVERY
    * warehouse table (the data-governance sweep run before granting
    * access: "which columns carry emails / IPs / long digit runs, and
    * in how many rows"). The schema walk is driver-side metadata; per
    * table ONE aggregate computes every (column × kind) hit count
    * simultaneously (conditional sums, stack-unpivoted), and the
    * per-table one-row frames union — at 100 TB the audit costs one
    * scan of each table, never more, and no row ever shuffles. Zero
    * counts are reported, not dropped: "no PII found in a scanned
    * column" is the result access review needs. */
  def qPiiReport(spark: SparkSession, dir: String): DataFrame = {
    import graft.text.Redact
    val kinds = Seq("email" -> Redact.emailRe, "ipv4" -> Redact.ipv4Re,
      "longnum" -> Redact.longNumRe)
    val perTable = Tables.all.flatMap { t =>
      val df = Tables.table(spark, dir, t)
      val strCols = df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
      if (strCols.isEmpty) None
      else {
        val aggs = strCols.toSeq.flatMap(c => kinds.map { case (k, re) =>
          coalesce(sum(when(col(c).rlike(re), 1L).otherwise(0L)), lit(0L))
            .as(s"__${k}_$c") })
        val stackArgs = strCols.toSeq.flatMap(c => kinds.map { case (k, _) =>
          s"'$c', '$k', __${k}_$c" }).mkString(", ")
        Some(df
          .agg(count(lit(1)).as("__n"), aggs: _*)
          .selectExpr(s"'$t' AS table_name",
            s"stack(${strCols.length * kinds.size}, $stackArgs)" +
              " AS (column_name, kind, n_hits)",
            "__n AS n_rows"))
      }
    }
    perTable.reduce(_.unionAll(_))
      .select(col("table_name"), col("column_name"), col("kind"),
        col("n_rows"), col("n_hits"))
      .orderBy("table_name", "column_name", "kind")
  }

  /** A16: referential-integrity audit — orphan counts for every foreign
    * key in the star schema (the data-quality gate a sync pipeline runs
    * before declaring a snapshot consistent; complements B6's per-column
    * schema validation with CROSS-TABLE checks). NULL foreign keys count
    * as orphans on both engines (membership NULL and NOT EXISTS agree).
    *
    * Plan shape: the BIGGEST fact table is scanned ONCE for all three of
    * its FK checks — a narrow 3-key projection picks up a membership
    * verdict per referenced table (part/supplier keys broadcast; orders
    * keys, too big to broadcast at scale, via one key-partitioned left
    * join carrying ~3 longs + 2 booleans per row), and one conditional
    * aggregate counts all three orphan kinds simultaneously, unpivoted to
    * the per-relation rows. The earlier anti-join-per-relation form was
    * individually optimal per check but rescanned lineitem three times —
    * at 100 TB the scan IS the cost, so one pass for all verdicts wins.
    * The two small-table checks stay broadcast left-antis. Build sides
    * keep a distinct() so a (corrupt) duplicated PK can't multiply fact
    * rows and corrupt the audit itself. */
  def qIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.table(spark, dir, n)
    val liCounts = t("lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .join(broadcast(t("part").select(col("p_partkey")).distinct()
        .withColumn("__in_part", lit(true))),
        col("l_partkey") === col("p_partkey"), "left")
      .join(broadcast(t("supplier").select(col("s_suppkey")).distinct()
        .withColumn("__in_supp", lit(true))),
        col("l_suppkey") === col("s_suppkey"), "left")
      .join(t("orders").select(col("o_orderkey")).distinct()
        .withColumn("__in_ord", lit(true)),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        // coalesce: an empty fact table must audit as 0 orphans, not NULL
        coalesce(sum(when(col("__in_ord").isNull, 1L).otherwise(0L)), lit(0L))
          .as("ord_orphans"),
        coalesce(sum(when(col("__in_part").isNull, 1L).otherwise(0L)), lit(0L))
          .as("part_orphans"),
        coalesce(sum(when(col("__in_supp").isNull, 1L).otherwise(0L)), lit(0L))
          .as("supp_orphans"))
      .select(expr(
        """stack(3,
          |  'lineitem.l_orderkey->orders', ord_orphans,
          |  'lineitem.l_partkey->part', part_orphans,
          |  'lineitem.l_suppkey->supplier', supp_orphans)
          |  AS (relation, n_orphans)""".stripMargin))
    val smallChecks = Seq(
      ("customer.c_nationkey->nation",
        t("customer").select(col("c_nationkey").as("k")),
        t("nation").select(col("n_nationkey").as("k"))),
      ("orders.o_custkey->customer",
        t("orders").select(col("o_custkey").as("k")),
        t("customer").select(col("c_custkey").as("k"))))
    // broadcast FORCED: the customer key set sits just past the 10 MB
    // autoBroadcast threshold at 50× (1.5M longs), so the o_custkey
    // check silently degraded to a sort-merge anti-join shuffling every
    // orders key — measured 3.4s of the audit's 3.8s (IntegrityProbe).
    // A key-only build side this slim broadcasts fine well beyond that;
    // a dim too big even for that (100M+ keys) flips to the A13 Bloom
    // prefilter hatch instead.
    smallChecks.map { case (name, fact, dim) =>
      fact.join(broadcast(dim.distinct()), Seq("k"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_orphans"))
    }.reduce(_ unionAll _).unionAll(liCounts).orderBy("relation")
  }

  /** A15: typed extraction from a semi-structured payload column — the
    * JSON `props` blob decodes against an EXPLICIT schema (from_json), a
    * validity flag marks rows whose payload failed to parse or lacked the
    * field, and the typed value feeds a per-type aggregate. The
    * schema-on-read step every event pipeline has between ingest and
    * warehouse. Declared schema (never schema inference) keeps this a
    * pure map-side projection: at 100 TB, `spark.read.json`-style
    * inference is a full extra pass over the data; from_json with a
    * declared struct is free and whole-stage-codegen'd. Malformed rows
    * degrade to NULL (PERMISSIVE), they never kill the job. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.table(spark, dir, "events")
      .select($"event_id", $"event_type",
        from_json($"props", "k BIGINT", Map.empty[String, String])
          .getField("k").as("k"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        count($"k").as("n_valid"),
        sum($"k").as("sum_k"),
        round(avg($"k"), 4).as("avg_k"))
      .orderBy($"event_type")
  }
}
