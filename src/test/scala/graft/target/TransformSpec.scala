package graft.target

import graft.SparkSpec
import graft.catalog.Streams
import graft.sources.Resolve
import org.apache.spark.sql.functions._

class TransformSpec extends SparkSpec {

  test("flatten handles deep nesting and stringifies arrays") {
    import spark.implicits._
    val df = Seq((1L, ("a", (2L, Seq(1, 2, 3))))).toDF("id", "outer")
      .select($"id", $"outer._1".as("name"),
        struct($"outer._2._1".as("x"), $"outer._2._2".as("xs")).as("inner"))
      .select($"id", struct($"name", $"inner").as("payload"))
    val flat = Transform.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "payload__name", "payload__inner__x", "payload__inner__xs"))
    val row = flat.first()
    assert(row.getAs[String]("payload__inner__xs") == "[1,2,3]")
    assert(row.getAs[Long]("payload__inner__x") == 2L)
  }

  test("field mapping coerces only string-typed target attributes") {
    val mapped = Transform.applyFieldMappings(
      graft.sources.Tables.table(spark, sfDir, "customer"), Streams.accounts)
    val types = mapped.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("accountId") == "string")     // bigint → string (coerced)
    assert(types("nation_key") == "int")       // numeric target attr untouched
    assert(types("account_balance") == "double")
  }

  test("payload shape nests all non-key attrs under values") {
    import spark.implicits._
    val df = Seq(("k1", "v1", 2)).toDF("pk", "a", "b")
    val shaped = Transform.shapePayloads(df, "pk")
    assert(shaped.columns.toSeq == Seq("pk", "payload"))
    assert(shaped.first().getAs[String]("payload") ==
      """{"pk":"k1","values":{"a":"v1","b":"2"}}""")
  }

  test("batch assignment: ceil(n/max) batches, all full except last") {
    import spark.implicits._
    val df = (1 to 1234).map(i => f"k$i%06d").toDF("pk").withColumn("payload", lit("{}"))
    val stats = Transform.batchStats(Transform.assignBatches(df, "pk", 500)).collect()
    assert(stats.map(_.getAs[Long]("batch_id")).toSeq == Seq(0L, 1L, 2L))
    assert(stats.map(_.getAs[Long]("n_records")).toSeq == Seq(500L, 500L, 234L))
  }

  test("resolve: selected∩available ∪ automatic, unsupported dropped") {
    val inclusions = Seq("pk" -> "automatic", "a" -> "available",
      "b" -> "available", "u" -> "unsupported")
    assert(Resolve.desiredColumns(Set("a", "u", "ghost"), inclusions) == Seq("pk", "a"))
    assert(Resolve.desiredColumns(Set.empty, inclusions) == Seq("pk"))
  }
}
