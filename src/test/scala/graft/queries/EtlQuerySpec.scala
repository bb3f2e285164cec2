package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Query-level ETL cases that don't fit the sink/state suites — currently
  * the semi-structured payload decode (A15). */
class EtlQuerySpec extends SparkSpec {
  import spark.implicits._

  test("json extract: every synthetic props payload parses to a typed k") {
    val rows = Etl.qJsonExtract(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_valid") == r.getAs[Long]("n"),
        "synthetic props are all well-formed JSON with k")
    }
  }

  test("malformed and schema-less payloads degrade to NULL, never fail the job") {
    val df = Seq(
      (1L, """{"k": 7}"""),   // valid
      (2L, """{"j": 7}"""),   // field absent
      (3L, """not json"""),   // malformed
      (4L, null),             // null payload
      (5L, """{"k": "7"}"""), // QUOTED numeric: typed BIGINT decode rejects
      (6L, """{"k": 7.5}""")  // float where BIGINT declared: rejects
    ).toDF("id", "props")
    val parsed = df.select($"id",
      from_json($"props", "k BIGINT", Map.empty[String, String])
        .getField("k").as("k"))
      .orderBy("id")
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
    // the quoted/float rejections are pinned because the DuckDB oracle
    // mirrors them with a json_type guard (SparkEntry q_json_extract /
    // q_corr) — if from_json's coercion behavior ever changes, the
    // oracle must change with it
    assert(parsed.toSeq == Seq(Some(7L), None, None, None, None, None))
  }

  test("schema drift: exactly the four planted drifts, each correctly classified") {
    val out = Etl.qSchemaDrift(spark, sfDir).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[String]("column_name"),
        r.getAs[String]("change"))).toSet
    assert(out == Set(
      ("customer", "c_mktsegment", "added"),
      ("lineitem", "l_tax", "added"),
      ("part", "p_size", "type_changed"),
      ("events", "legacy_ip", "removed")), s"got $out")
  }

  test("fd profile: PKs hold, bookkeeping consistent, one pair brute-force verified") {
    val rows = Etl.qFdProfile(spark, sfDir).collect()
    assert(rows.length == 6)
    val byKey = rows.map(r => (r.getAs[String]("rel"), r.getAs[String]("lhs"),
      r.getAs[String]("rhs")) -> r).toMap
    // declared primary keys must hold with exactly one rhs per group
    Seq(("orders", "o_orderkey", "o_custkey"),
      ("customer", "c_custkey", "c_nationkey"),
      ("nation", "n_nationkey", "n_regionkey")).foreach { k =>
      val r = byKey(k)
      assert(r.getAs[Int]("fd_holds") == 1 && r.getAs[Long]("n_violating") == 0L
        && r.getAs[Long]("max_rhs_per_group") == 1L, s"PK $k must hold")
    }
    rows.foreach { r =>
      assert((r.getAs[Long]("n_violating") == 0L) == (r.getAs[Int]("fd_holds") == 1))
      assert(r.getAs[Long]("max_rhs_per_group") >= 1L)
      assert(r.getAs[Long]("n_violating") <= r.getAs[Long]("n_groups"))
    }
    // brute-force one non-trivial pair from the raw rows
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
    val groups = li.distinct.groupBy(_._1).map { case (k, v) => k -> v.length }
    val r = byKey(("lineitem", "l_partkey", "l_suppkey"))
    assert(r.getAs[Long]("n_groups") == groups.size.toLong)
    assert(r.getAs[Long]("n_violating") == groups.values.count(_ > 1).toLong)
    assert(r.getAs[Long]("max_rhs_per_group") == groups.values.max.toLong)
  }

  test("pii report: every string column audited three ways, counts match direct scans") {
    import org.apache.spark.sql.functions._
    val out = Etl.qPiiReport(spark, sfDir).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[String]("column_name"),
        r.getAs[String]("kind")) -> (r.getAs[Long]("n_rows"), r.getAs[Long]("n_hits")))
      .toMap
    // coverage: every string column of every table appears exactly ×3
    graft.sources.Tables.all.foreach { t =>
      val df = graft.sources.Tables.table(spark, sfDir, t)
      val strCols = df.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
      strCols.foreach { c =>
        Seq("email", "ipv4", "longnum").foreach { k =>
          assert(out.contains((t, c, k)), s"missing audit row ($t, $c, $k)") }
        assert(out((t, c, "email"))._1 == df.count(), s"$t n_rows")
      }
    }
    assert(out.size == out.keys.map(k => (k._1, k._2)).toSet.size * 3)
    // spot parity against direct scans (the oracle covers all 51)
    val ev = graft.sources.Tables.table(spark, sfDir, "events")
    assert(out(("events", "props", "longnum"))._2 ==
      ev.filter(col("props").rlike(graft.text.Redact.longNumRe)).count())
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    assert(out(("documents", "text", "email"))._2 ==
      docs.filter(col("text").rlike(graft.text.Redact.emailRe)).count())
  }

  test("push plan: ceil-div batch and schedule arithmetic, consistent with the corpus") {
    val out = Etl.qPushPlan(spark, sfDir).collect()
    val ev = graft.sources.Tables.table(spark, sfDir, "events")
    assert(out.map(_.getAs[Long]("n_records")).sum == ev.count())
    out.foreach { r =>
      val (n, b, sec) = (r.getAs[Long]("n_records"), r.getAs[Long]("n_batches"),
        r.getAs[Long]("est_seconds"))
      assert(b == (n + 499) / 500, "ceil-div batches")
      assert(sec == (b + 9) / 10, "ceil-div seconds at 10 req/s")
      assert(r.getAs[Long]("avg_batch_bytes") > 0L)
    }
  }

  test("key candidates (A21): every column's stats recompute, verdict consistent") {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.table(spark, sfDir, "orders")
    val out = graft.queries.Etl.qKeyCandidates(spark, sfDir).collect()
    assert(out.map(_.getAs[String]("column_name")).toSet == orders.columns.toSet)
    val n = orders.count()
    out.foreach { r =>
      val c = r.getAs[String]("column_name")
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == orders.filter(col(c).isNull).count())
      assert(r.getAs[Long]("n_distinct") ==
        orders.filter(col(c).isNotNull).select(c).distinct().count())
      assert(r.getAs[Long]("top_freq") ==
        orders.filter(col(c).isNotNull).groupBy(col(c)).count()
          .agg(max("count")).first().getLong(0))
      assert((r.getAs[Int]("is_key") == 1) ==
        (r.getAs[Long]("n_nulls") == 0L && r.getAs[Long]("n_distinct") == n))
    }
    // the order key must actually be flagged as a key candidate
    assert(out.find(_.getAs[String]("column_name") == "o_orderkey")
      .get.getAs[Int]("is_key") == 1)
  }
}
