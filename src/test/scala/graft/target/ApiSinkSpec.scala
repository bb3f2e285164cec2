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

  test("PUT leg: bulk update rides the same batching/limits, verb reaches the transport") {
    RecordingPoster.reset()
    import spark.implicits._
    val df = (1 to 25).map(i => s"""{"id":$i,"v":2}""").toDF("payload").coalesce(1)
    val m = push(df, new RecordingPoster(), cfg(maxRecords = 10).copy(method = "PUT"))
    assert(m.records.value == 25L && m.updated.value == 25L)
    val verbs = RecordingPoster.verbs.asScala.toSeq
    assert(verbs.nonEmpty && verbs.forall(_ == "PUT"), s"got $verbs")
    assert(RecordingPoster.calls.asScala.forall(_._2.size <= 10))
  }

  test("DELETE leg: removal batches keep backoff + dead-letter capture on failure") {
    RecordingPoster.reset()
    import spark.implicits._
    val df = (1 to 8).map(i => s"""{"id":$i}""").toDF("payload").coalesce(1)
    val dir = java.nio.file.Files.createTempDirectory("graft-del").toString
    // id 3's delete is rejected server-side — it must land in the
    // dead-letter table with the same pkey capture as the POST path
    val m = push(df, new RecordingPoster(rejectId = _.contains(""""id":3""")),
      cfg(maxRecords = 50).copy(method = "DELETE"), deadLetterDir = Some(dir))
    assert(RecordingPoster.verbs.asScala.forall(_ == "DELETE"))
    assert(m.updated.value == 7L && m.failed.value == 1L)
    assert(m.failedRecords(spark).map(_.payload) == Seq("""{"id":3}"""))
  }

  test("an unknown verb is rejected at config construction (request.py's closed set)") {
    assertThrows[IllegalArgumentException](cfg().copy(method = "PATCH"))
  }

  test("HttpPoster default send() throws for PUT/DELETE instead of silently POSTing") {
    // a POST-only stub must never quietly POST on a delete job — that
    // re-creates the entities the job was meant to remove
    object PostOnly extends HttpPoster {
      override def post(url: String, jsonBatch: Seq[String]): PostResult =
        PostResult(200, jsonBatch.size, 0L, Nil)
    }
    assert(PostOnly.send("POST", "u", Seq("{}"), Map.empty).status == 200)
    assertThrows[UnsupportedOperationException](
      PostOnly.send("PUT", "u", Seq("{}"), Map.empty))
    assertThrows[UnsupportedOperationException](
      PostOnly.send("DELETE", "u", Seq("{}"), Map.empty))
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

  test("4xx gives up immediately (no retries) and captures the batch as failed") {
    RecordingPoster.reset()
    import spark.implicits._
    object FourOhFour extends HttpPoster {
      override def post(url: String, batch: Seq[String]): PostResult = {
        RecordingPoster.calls.add(url -> batch)
        PostResult(400, 0, batch.size, Seq.empty)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-dl").toString
    val df = Seq("""{"id":1}""", """{"id":2}""").toDF("payload").coalesce(1)
    val m = push(df, FourOhFour, cfg(), deadLetterDir = Some(s"$dir/dl"))
    assert(RecordingPoster.calls.size() == 1) // single attempt, no backoff loop
    assert(m.retries.value == 0L)
    assert(m.failed.value == 2L) // give-up counts the whole batch as failed
    assert(m.failedRecords(spark).map(_.payload).sorted ==
      Seq("""{"id":1}""", """{"id":2}"""))
    assert(m.terminalErrors == Seq("BadRequest(400): Bad Request"))
  }

  test("429 retries with backoff honoring Retry-After, then succeeds") {
    RecordingPoster.reset()
    import spark.implicits._
    val df = Seq("""{"id":1}""").toDF("payload").coalesce(1)
    var slept = Seq.empty[Long]
    // drive postWithRetry directly so the sleep is observable
    val m = metrics(df)
    val poster = new RecordingPoster(
      transientFailures = 2, transientStatus = 429, retryAfterMillis = Some(7000L))
    val failed = postWithRetry(
      poster, "u", Seq(SinkRecord("1", """{"id":1}""")), cfg(), m,
      ms => slept = slept :+ ms)
    assert(failed.isEmpty)
    assert(m.retries.value == 2L)
    assert(m.updated.value == 1L)
    assert(slept == Seq(7000L, 7000L)) // Retry-After (7s) > expo backoff (1s, 2s)
  }

  test("rate-limit headers round-trip into metrics (client.py rate_limit_details)") {
    RecordingPoster.reset()
    import spark.implicits._
    // a throttled run: two 429s (Retry-After 7s, remaining 0) then a 2xx
    // that still carries the remaining-quota header
    val df = Seq("""{"id":1}""").toDF("payload").coalesce(1)
    val poster = new RecordingPoster(
      transientFailures = 2, transientStatus = 429,
      retryAfterMillis = Some(7000L), rateLimitRemaining = Some(0L))
    // postWithRetry directly (injected sleep) so the test doesn't wait out
    // the honored 7s Retry-After
    val m = metrics(df)
    val failed = postWithRetry(
      poster, "u", Seq(SinkRecord("1", """{"id":1}""")), cfg(), m, _ => ())
    assert(failed.isEmpty)
    val obs = m.rateLimitObservations
    assert(obs.size == 3)
    assert(obs.take(2).forall(o =>
      o.status == 429 && o.retryAfterMillis.contains(7000L) && o.remaining.contains(0L)))
    // last-seen detail is the final response's state, not the first 429's
    val last = m.rateLimitDetails.get
    assert(last.status == 200 && last.retryAfterMillis.isEmpty)
    // a run with no throttle headers records nothing
    RecordingPoster.reset()
    val clean = push(df, new RecordingPoster(), cfg())
    assert(clean.rateLimitDetails.isEmpty)
  }

  test("429 exhaustion after maxAttempts fails the batch (not an infinite loop)") {
    import spark.implicits._
    val m = metrics(Seq("x").toDF("payload"))
    val always429 = new HttpPoster {
      override def post(url: String, b: Seq[String]): PostResult =
        PostResult(429, 0, 0, Seq.empty)
    }
    val batch = Seq(SinkRecord("a", "pa"), SinkRecord("b", "pb"))
    val failed = postWithRetry(always429, "u", batch, cfg(), m, _ => ())
    assert(failed == batch)
    assert(m.retries.value == 2L) // maxAttempts=3 → 2 backoffs
    assert(m.failed.value == 2L)
  }

  test("rejected records are captured as dead letters with pkey ids across partitions") {
    RecordingPoster.reset()
    import spark.implicits._
    // (pkey, payload) shape as produced by Transform.shapePayloads; the
    // stub rejects by payload body, the sink must still key capture by id
    val df = (1 to 40).map(i => (i, s"""{"id":$i}"""))
      .toDF("c_custkey", "payload").repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("graft-dl").toString
    val m = push(
      df,
      new RecordingPoster(rejectId = p => p.contains(""""id":7""") || p.contains(""""id":23""")),
      cfg(maxRecords = 5), deadLetterDir = Some(s"$dir/dl"))
    assert(m.failed.value == 2L)
    assert(m.updated.value == 38L)
    assert(m.deadLetterCount.value == 2L)
    assert(m.failedRecords(spark).map(_.id).sorted == Seq("23", "7"))
    assert(m.failedRecords(spark).map(_.payload).sorted ==
      Seq("""{"id":23}""", """{"id":7}"""))
  }

  test("pushWithRetries re-pushes dead letters until they succeed") {
    RecordingPoster.reset()
    import spark.implicits._
    // rejects id 7 on the first call that contains it, accepts afterwards
    object FlakyPoster extends HttpPoster {
      override def post(url: String, batch: Seq[String]): PostResult = {
        val n = RecordingPoster.calls.size()
        RecordingPoster.calls.add(url -> batch)
        val failed = if (n == 0) batch.filter(_.contains(""""id":7""")) else Seq.empty
        PostResult(200, batch.size - failed.size, failed.size, failed)
      }
    }
    val df = (1 to 10).map(i => (i, s"""{"id":$i}""")).toDF("pk", "payload").coalesce(1)
    val dir = java.nio.file.Files.createTempDirectory("graft-dl").toString
    val m = pushWithRetries(df, FlakyPoster, cfg(maxRecords = 50), s"$dir/dl", retryRounds = 2)
    assert(m.failedRecords(spark).isEmpty) // retry round drained the dead letters
    assert(m.deadLetterCount.value == 0L)
    assert(RecordingPoster.calls.size() == 2)
    val retried = RecordingPoster.calls.asScala.toSeq.last._2
    assert(retried == Seq("""{"id":7}""")) // only the failed record re-pushed
  }

  test("mass failure lands in the dead-letter table, not driver memory, and a retry drains it") {
    RecordingPoster.reset()
    import spark.implicits._
    // every batch fails on the first push (sustained outage), then recovers:
    // capture must flow executor-side into parquet, and the retry round must
    // be driven from that table — the reference's set-aside-for-retry
    // semantics (__init__.py:272-281) at cluster scale
    object Outage extends HttpPoster {
      override def post(url: String, batch: Seq[String]): PostResult = {
        val recovered = RecordingPoster.calls.asScala.exists(_._1 == "round2-marker")
        RecordingPoster.calls.add((if (recovered) url else "down") -> batch)
        if (recovered) PostResult(200, batch.size, 0, Seq.empty)
        else PostResult(503, 0, batch.size, Seq.empty)
      }
    }
    val n = 5000
    val df = (1 to n).map(i => (i, s"""{"id":$i}""")).toDF("pk", "payload").repartition(8)
    val dir = java.nio.file.Files.createTempDirectory("graft-dl").toString
    val m1 = push(df, Outage, cfg(maxRecords = 500).copy(maxAttempts = 1),
      deadLetterDir = Some(s"$dir/round_0"))
    // all records captured in the parquet table; driver holds only counters
    assert(m1.deadLetterCount.value == n.toLong)
    val table = spark.read.parquet(s"$dir/round_0")
    assert(table.count() == n.toLong)
    assert(table.columns.sorted.toSeq == Seq("id", "payload"))
    // retry round reads the table (not driver state) and drains it
    RecordingPoster.calls.add("round2-marker" -> Seq.empty)
    val m2 = push(spark.read.parquet(s"$dir/round_0"), Outage,
      cfg(maxRecords = 500), Some("id"), Some(s"$dir/round_1"))
    assert(m2.deadLetterCount.value == 0L)
    assert(m2.updated.value == n.toLong)
    assert(spark.read.parquet(s"$dir/round_1").count() == 0L)
  }

  test("unmatched server failedIds are surfaced in errors, not silently dropped") {
    RecordingPoster.reset()
    import spark.implicits._
    object GhostIds extends HttpPoster {
      override def post(url: String, batch: Seq[String]): PostResult =
        PostResult(200, batch.size - 1, 1, Seq("no-such-record"))
    }
    val df = Seq((1, """{"id":1}"""), (2, """{"id":2}""")).toDF("pk", "payload").coalesce(1)
    val m = push(df, GhostIds, cfg(maxRecords = 50))
    assert(m.failed.value == 1L)        // server said one failed...
    assert(m.deadLetterCount.value == 0L) // ...but nothing matched for capture
    assert(m.terminalErrors.exists(_.startsWith("UnmatchedFailedIds(1): no-such-record")))
  }

  test("configured headers reach the poster on every call") {
    import spark.implicits._
    HeaderSpyState.seen.clear()
    // static-holder state: the poster instance is serialized to executor
    // tasks, so instance fields would mutate a deserialized copy
    object HeaderSpy extends HttpPoster {
      override def post(url: String, b: Seq[String]): PostResult =
        post(url, b, Map.empty)
      override def post(url: String, b: Seq[String],
          headers: Map[String, String]): PostResult = {
        HeaderSpyState.seen.add(headers)
        PostResult(200, b.size, 0, Seq.empty)
      }
    }
    val df = (1 to 25).map(i => s"""{"id":$i}""").toDF("payload").repartition(2)
    val m = push(df, HeaderSpy,
      cfg(maxRecords = 10).copy(headers = Map("X-Pendo-Integration-Key" -> "k-42")))
    assert(m.updated.value == 25L)
    assert(HeaderSpyState.seen.asScala.nonEmpty)
    assert(HeaderSpyState.seen.asScala.forall(_ == Map("X-Pendo-Integration-Key" -> "k-42")))
  }

  test("typed error taxonomy matches the reference's exception classes") {
    assert(ApiError.of(401).isInstanceOf[ApiError.Authentication])
    assert(ApiError.of(403).isInstanceOf[ApiError.Authentication])
    assert(ApiError.of(404).isInstanceOf[ApiError.ResourceNotFound])
    assert(ApiError.of(500).isInstanceOf[ApiError.Server])
    assert(ApiError.of(502).isInstanceOf[ApiError.BadGateway])
    assert(ApiError.of(503).isInstanceOf[ApiError.ServiceUnavailable])
    assert(ApiError.of(400).isInstanceOf[ApiError.BadRequest])
    assert(ApiError.of(418).isInstanceOf[ApiError.Http])
    val rl = ApiError.of(429, Some(1234L))
    assert(rl match {
      case r: ApiError.RateLimited => r.retryAfterMillis.contains(1234L)
      case _ => false
    })
    // retry policy: transient statuses retry, permanent 4xx gives up
    assert(Seq(408, 429, 500, 502, 503, 599).forall(ApiError.retryable))
    assert(!Seq(400, 401, 403, 404, 418).exists(ApiError.retryable))
  }
}

/** Static holder for header-spy observations: executor tasks get a
  * deserialized copy of the poster, so only JVM-static state is visible
  * back on the driver in local mode (same pattern as RecordingPoster). */
object HeaderSpyState {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, String]]()
}
