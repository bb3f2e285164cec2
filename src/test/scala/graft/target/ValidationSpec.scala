package graft.target

import graft.SparkSpec
import graft.catalog.{FieldRule, Streams}

class ValidationSpec extends SparkSpec {

  private def counts(df: org.apache.spark.sql.DataFrame, table: String,
      rules: Seq[FieldRule]): Map[String, Long] =
    Validation.violationCounts(df, table, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("generated checks enforce Draft4 semantics per rule type") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), "ok", "42", "O"),
      (None, "this name is far far too long", "not-a-number", "X"),
      (Some(-5L), "fine", "7", "F")).toDF("id", "name", "n_str", "status")
    val rules = Seq(
      FieldRule("id", required = true, minimum = Some(0.0)),
      FieldRule("name", maxLength = Some(10L)),
      FieldRule("n_str", jsonType = Some("integer")),
      FieldRule("status", enumVals = Seq("O", "F", "P")))
    val out = counts(df, "t", rules)
    assert(out("t.id.not_null") == 1L)
    assert(out("t.id.min_0") == 1L)      // null id does NOT violate minimum
    assert(out("t.name.max_length_10") == 1L)
    assert(out("t.n_str.type_integer") == 1L)
    assert(out("t.status.enum_OFP") == 1L)
  }

  test("SQL-special characters in field names and enum values stay data") {
    import spark.implicits._
    // a quoted/backticked column name and an enum value with a single
    // quote: the stacked output is built from typed Columns, so these
    // must flow through as data, never break expression parsing
    val df = Seq(("it's", "a'b")).toDF("wei'rd", "status")
    val rules = Seq(
      FieldRule("wei'rd", maxLength = Some(3L)),
      FieldRule("status", enumVals = Seq("a'b", "c\"d")))
    val out = counts(df, "t", rules)
    assert(out("t.wei'rd.max_length_3") == 1L)
    assert(out("t.status.enum_a'bc\"d") == 0L)
  }

  test("editing the stream schema changes the generated checks") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("c_custkey", "c_name")
    val base = Seq(FieldRule("c_custkey", required = true))
    val edited = base :+ FieldRule("c_name", maxLength = Some(1L))
    assert(counts(df, "customer", base).keySet ==
      Set("customer.c_custkey.not_null"))
    assert(counts(df, "customer", edited).keySet ==
      Set("customer.c_custkey.not_null", "customer.c_name.max_length_1"))
  }

  test("registered stream schemas drive q_schema_validate's check set") {
    val names = graft.queries.Etl.qSchemaValidate(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    val expected = Streams.all.flatMap(s =>
      s.recordSchema.flatMap(r => Validation.checksFor(s.sourceTable, r).map(_._1))).toSet
    assert(names == expected)
    assert(names.contains("orders.o_orderstatus.enum_OFP"))
  }
}
