package graft.target

import graft.SparkSpec
import graft.target.ApiSink._
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class ApiSinkSpec extends SparkSpec {

  private def cfg(maxRecords: Int = 10) = SinkConfig(
    Endpoint("https://example.invalid", "account"),
    maxRecords = maxRecords, maxAttempts = 3,
    callsPerPeriod = 1000000, periodMillis = 1000L, parallelism = 1)

  test("endpoint url matches the reference path shape") {
    assert(Endpoint("https://example.invalid", "visitor").url ==
      "https://example.invalid/api/v1/metadata/visitor/custom/value")
    assertThrows[IllegalArgumentException](Endpoint("x", "nope"))
  }

  test("sink batches by max_records and posts every record exactly once") {
    RecordingPoster.reset()
    import spark.implicits._
    val df = (1 to 57).map(i => s"""{"id":$i}""").toDF("payload").repartition(3)
    val m = push(df, new RecordingPoster(), cfg(maxRecords = 10))
    val calls = RecordingPoster.calls.asScala.toSeq
    assert(m.records.value == 57L)
    assert(calls.flatMap(_._2).sorted == (1 to 57).map(i => s"""{"id":$i}""").sorted)
    assert(calls.forall(_._2.size <= 10))
    assert(calls.forall(_._1.endsWith("/api/v1/metadata/account/custom/value")))
  }

  test("transient 5xx retries with backoff then succeeds") {
    RecordingPoster.reset()
    import spark.implicits._
    val df = Seq("""{"id":1}""").toDF("payload").coalesce(1)
    val m = push(df, new RecordingPoster(transientFailures = 2), cfg())
    assert(m.retries.value == 2L)
    assert(m.updated.value == 1L)
  }

  test("rejected records are surfaced via failed counts") {
    RecordingPoster.reset()
    import spark.implicits._
    val df = (1 to 20).map(i => s"""{"id":$i}""").toDF("payload").coalesce(1)
    val m = push(df, new RecordingPoster(rejectId = _.contains(""""id":7""")), cfg(maxRecords = 50))
    assert(m.failed.value == 1L)
    assert(m.updated.value == 19L)
  }

  test("4xx gives up immediately (no retries)") {
    RecordingPoster.reset()
    import spark.implicits._
    object FourOhFour extends HttpPoster {
      override def post(url: String, batch: Seq[String]): PostResult = {
        RecordingPoster.calls.add(url -> batch)
        PostResult(400, 0, batch.size, Seq.empty)
      }
    }
    val df = Seq("""{"id":1}""", """{"id":2}""").toDF("payload").coalesce(1)
    val m = push(df, FourOhFour, cfg())
    assert(RecordingPoster.calls.size() == 1) // single attempt, no backoff loop
    assert(m.retries.value == 0L)
  }
}
