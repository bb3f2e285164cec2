package graft.target

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Real HTTP transport for [[ApiSink]] over the JDK 11+ HttpClient — the
  * engine's client.py/request.py (target-pendo/src/client.py:7-17,
  * request.py:36-64): JSON-array batch POST, standard header set plus the
  * caller's headers (integration key), connect/read timeouts, and
  * bulk-response parsing into [[ApiSink.PostResult]] (`total`/`updated`/
  * `failed` counts and per-record `errors[].id`, __init__.py:272-281).
  *
  * Serializable by construction: only the config fields ship to executors;
  * the client itself is a transient lazy (one per executor JVM). Transport
  * exceptions (connect refuse, read timeout) propagate — the sink's
  * postWithRetry maps them to a retryable 599.
  */
final case class JavaHttpPoster(
    defaultHeaders: Map[String, String] = Map.empty,
    connectTimeoutMillis: Int = 10000,
    readTimeoutMillis: Int = 300000) extends ApiSink.HttpPoster {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMillis.toLong))
    .build()

  @transient private lazy val mapper = new ObjectMapper()

  override def post(url: String, jsonBatch: Seq[String]): ApiSink.PostResult =
    post(url, jsonBatch, Map.empty)

  override def post(url: String, jsonBatch: Seq[String],
      headers: Map[String, String]): ApiSink.PostResult =
    send("POST", url, jsonBatch, headers)

  /** PUT/DELETE share the POST path verbatim (request.py:46-49 branches
    * once on membership in {POST, PUT, DELETE} and sends the same JSON
    * body) — the JDK client's generic `.method` carries the body on all
    * three, including DELETE (entity bulk-removal APIs take the id list
    * in the body, exactly the reference's delete leg). */
  override def send(method: String, url: String, jsonBatch: Seq[String],
      headers: Map[String, String]): ApiSink.PostResult = {
    val builder = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(readTimeoutMillis.toLong))
      .header("Content-Type", "application/json")
      .header("Accept", "application/json")
    (defaultHeaders ++ headers).foreach { case (k, v) => builder.header(k, v) }
    val req = builder
      .method(method,
        HttpRequest.BodyPublishers.ofString(jsonBatch.mkString("[", ",", "]")))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    val retryAfterMillis = resp.headers().firstValue("Retry-After")
      .map[Option[Long]](v => v.toLongOption.map(_ * 1000L)).orElse(None)
    // remaining-quota header, either common spelling (rate_limit_details'
    // input — servers disagree on the hyphenation)
    val remaining = Seq("X-Rate-Limit-Remaining", "X-RateLimit-Remaining")
      .flatMap(h => resp.headers().firstValue(h)
        .map[Option[Long]](_.toLongOption).orElse(None).toSeq)
      .headOption
    parseBody(resp.statusCode(), resp.body(), jsonBatch.size, retryAfterMillis,
      remaining)
  }

  /** Bulk-response fields, tolerantly: a 2xx with no parseable body counts
    * the whole batch as updated (nothing reported failed); `errors[].id`
    * carries the per-record rejections. */
  private def parseBody(status: Int, body: String, batchSize: Int,
      retryAfterMillis: Option[Long],
      rateLimitRemaining: Option[Long] = None): ApiSink.PostResult = {
    val parsed = Try(mapper.readTree(body)).toOption.filter(_ != null).filter(_.isObject)
    val failedIds = parsed.flatMap(n => Option(n.get("errors")))
      .map(_.elements().asScala.flatMap(e => Option(e.get("id")).map(_.asText())).toSeq)
      .getOrElse(Seq.empty)
    val failed = parsed.flatMap(n => Option(n.get("failed")).map(_.asLong()))
      .getOrElse(failedIds.size.toLong)
    val updated = parsed.flatMap(n => Option(n.get("updated")).map(_.asLong()))
      .getOrElse(if (status / 100 == 2) batchSize.toLong - failed else 0L)
    ApiSink.PostResult(status, updated, failed, failedIds, retryAfterMillis,
      rateLimitRemaining)
  }
}
