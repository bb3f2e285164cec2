package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import scala.jdk.CollectionConverters._

/** Target-side active-entity fetch — the reference's `fetch_uuids`
  * (tap-redshift/src/sync.py:30-54): query the target's aggregation
  * endpoint for the ids of entities that have activity, keep only
  * UUID-shaped ones, and feed the result into the incremental sync's
  * semi-join ([[graft.sync.Sync.incrementalSlice]]) so only rows the
  * target already knows about are extracted and pushed.
  *
  * Faithful to the reference's wire shape: an aggregation *pipeline*
  * request — `source` (the entity), a server-side `filter` on
  * `len(<pkey>) == 36`, a `select` of just the pkey — POSTed to
  * `<base>/api/v1/aggregation`, then a client-side UUID re-validation of
  * each returned id (sync.py:52 `validators.uuid`; here the same
  * length-36 + hex-shape predicate as [[graft.functions.uuidValid]]).
  *
  * Scale note: this is a deliberate driver-side call. The active-id set
  * is exactly the build side of the incremental semi-join — bounded,
  * broadcast-sized by design (and the reference likewise materializes it
  * as a Python list from one response). What must scale is the OTHER side
  * of that join (the fact scan), which stays fully distributed; an active
  * set too large to hold here should flip the sync to its Bloom-prefilter
  * hatch (`bloomPrefilter` in incrementalSlice) rather than paginate this
  * fetch.
  */
object ApiSource {

  /** The aggregation request body (sync.py:40-44, byte-shape parity). */
  def aggregationBody(entity: String, pkey: String): String =
    s"""{"response":{"mimeType":"application/json"},""" +
      s""""request":{"pipeline":[{"source":{"$entity":null}},""" +
      s"""{"filter":"len($pkey) == 36"},""" +
      s"""{"select": {"$pkey":"$pkey"}}]}}"""

  /** POST the aggregation query, parse `results[].<pkey>`. Transport or
    * non-2xx failures throw — an unknown active set must fail the sync
    * loudly, not silently sync nothing. */
  def fetchIds(baseUrl: String, entity: String, pkey: String,
      headers: Map[String, String] = Map.empty,
      connectTimeoutMillis: Int = 10000,
      readTimeoutMillis: Int = 300000): Seq[String] = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(connectTimeoutMillis.toLong))
      .build()
    val builder = HttpRequest.newBuilder(URI.create(s"$baseUrl/api/v1/aggregation"))
      .timeout(Duration.ofMillis(readTimeoutMillis.toLong))
      .header("Content-Type", "application/json")
      .header("Accept", "application/json")
    headers.foreach { case (k, v) => builder.header(k, v) }
    val req = builder
      .POST(HttpRequest.BodyPublishers.ofString(
        aggregationBody(entity, pkey), StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"aggregation fetch failed: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
    val root = new ObjectMapper().readTree(resp.body())
    val results = Option(root.get("results"))
      .filter(_.isArray)
      .map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
    results.flatMap(r => Option(r.get(pkey)).map(_.asText()))
  }

  /** The fetched ids as a one-column DataFrame (column named `pkey`),
    * UUID-validated Spark-side with the same predicate the A5 filter
    * uses, ready to be the build side of the incremental semi-join. */
  def fetchActiveKeys(spark: SparkSession, baseUrl: String, entity: String,
      pkey: String, headers: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    fetchIds(baseUrl, entity, pkey, headers).toDF(pkey)
      .filter(graft.functions.uuidValid(col(pkey)))
      .distinct()
  }
}
