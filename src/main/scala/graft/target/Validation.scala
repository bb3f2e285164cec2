package graft.target

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.catalog.FieldRule

/** Schema-driven record validation — the Spark form of the reference's
  * Draft4Validator pass over every record (target-pendo/src/__init__.py:523).
  *
  * The reference walks each record dict in Python against the stream's JSON
  * schema; here the declared schema ([[graft.catalog.FieldRule]]) is
  * COMPILED once into violation predicates, and all counts come back from a
  * single map-side-aggregated pass over the table (one job, no per-rule
  * scans). Editing the stream's `recordSchema` changes the generated checks
  * — there is no hand-listed rule set.
  */
object Validation {

  private def num(d: Double): String =
    if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString

  /** Expand one field's rule set into (check_name, violation_predicate)
    * pairs. Draft4 semantics: a missing (null) value only violates
    * `required` — typed/range/length checks pass on null. */
  def checksFor(table: String, r: FieldRule): Seq[(String, Column)] = {
    val c = col(r.field)
    val prefix = s"$table.${r.field}"
    val required =
      if (r.required) Seq(s"$prefix.not_null" -> c.isNull) else Nil
    // for string-carried values a declared type means "parses as" —
    // try_cast failure on a present value is the violation
    val typed = r.jsonType.collect {
      case "integer" => s"$prefix.type_integer" -> (c.isNotNull && c.try_cast("bigint").isNull)
      case "number"  => s"$prefix.type_number" -> (c.isNotNull && c.try_cast("double").isNull)
    }.toSeq
    val maxLen = r.maxLength.map(n =>
      s"$prefix.max_length_$n" -> (c.isNotNull && length(c) > n)).toSeq
    val min = r.minimum.map(m =>
      s"$prefix.min_${num(m)}" -> (c.isNotNull && c < m)).toSeq
    val max = r.maximum.map(m =>
      s"$prefix.max_${num(m)}" -> (c.isNotNull && c > m)).toSeq
    val enums =
      if (r.enumVals.nonEmpty)
        Seq(s"$prefix.enum_${r.enumVals.mkString}" ->
          (c.isNotNull && !c.isin(r.enumVals.map(v => v: Any): _*)))
      else Nil
    required ++ typed ++ maxLen ++ min ++ max ++ enums
  }

  /** Violation counts for every declared rule, in ONE aggregate pass:
    * (check_name, violations) rows. */
  def violationCounts(df: DataFrame, table: String, rules: Seq[FieldRule]): DataFrame = {
    val checks = rules.flatMap(checksFor(table, _))
    require(checks.nonEmpty, s"stream over $table declares no schema rules")
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"__v$i")
    }
    // typed Columns, not an interpolated selectExpr: check names derive
    // from field/enum values, and a quote or other SQL-special character
    // in them must stay data, not become syntax
    val stackArgs = lit(checks.size) +: checks.zipWithIndex.flatMap {
      case ((name, _), i) => Seq(lit(name), col(s"__v$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(stack(stackArgs: _*).as(Seq("check_name", "violations")))
  }
}
