package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sync.Bookmarks
import graft.target.JavaHttpPoster
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** End-to-end CLI run: JSON config/catalog/state files in, a REAL HTTP
  * round-trip to an in-JVM server through [[JavaHttpPoster]] (headers,
  * timeouts, bulk-response parsing), state file out — the whole
  * `tap -c config -s state --catalog catalog | target -c target` flow as
  * one driven process. */
class RunSpec extends SparkSpec {

  /** Local bulk-update endpoint: accepts every record, records the
    * request path/headers/body. */
  private class Recorder extends HttpHandler {
    val requests = new ConcurrentLinkedQueue[(String, String, String)]() // path, intKey, body
    override def handle(ex: HttpExchange): Unit = {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      requests.add((ex.getRequestURI.getPath,
        Option(ex.getRequestHeaders.getFirst("X-Pendo-Integration-Key")).getOrElse(""),
        body))
      val n = "\"values\":\\{".r.findAllIn(body).length // one values obj per record
      val resp = s"""{"total":$n,"updated":$n,"failed":0}"""
        .getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length.toLong)
      ex.getResponseBody.write(resp)
      ex.close()
    }
  }

  private def writeConfigs(dir: String): (String, String) = {
    val tap = s"""{
      |"host":"localhost","port":"5439","dbname":"warehouse",
      |"user":"u","password":"p","start_date":"1992-01-01T00:00:00Z",
      |"schema":"public","target_integration_key":"test-key-123"}""".stripMargin
    val target = """{
      |"integration_key":"test-key-123",
      |"customer":{
      |  "key_properties":["c_custkey"],"primary_key":"accountId",
      |  "replication_method":"FULL_TABLE",
      |  "field_mappings":{"accountId":"c_custkey","account_name":"c_name"}},
      |"orders":{
      |  "key_properties":["o_orderkey"],"primary_key":"visitorId",
      |  "replication_method":"INCREMENTAL","replication_key":["o_orderdate"],
      |  "field_mappings":{"visitorId":"o_orderkey","total_price":"o_totalprice"}}
      |}""".stripMargin
    Files.writeString(Paths.get(s"$dir/tap.json"), tap)
    Files.writeString(Paths.get(s"$dir/target.json"), target)
    (s"$dir/tap.json", s"$dir/target.json")
  }

  test("end-to-end run: config files in, HTTP out with auth header, state file advanced") {
    val tmp = Files.createTempDirectory("graft-run").toString
    val (tapPath, targetPath) = writeConfigs(tmp)
    val recorder = new Recorder
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", recorder)
    server.start()
    try {
      val args = Run.parseArgs(Seq(
        "-c", tapPath, "--target-config", targetPath,
        "--data-dir", sfDir, "--landing-dir", s"$tmp/landing",
        "--base-url", s"http://127.0.0.1:${server.getAddress.getPort}",
        "--out-state", s"$tmp/state.json"))
      val st = Run.sync(spark, args, JavaHttpPoster())
      val reqs = recorder.requests.asScala.toSeq
      // full-table customers went to the account endpoint, orders (no
      // "visitor" in the stream name → accounts entity) too; every
      // request carried the integration key from the config file
      assert(reqs.nonEmpty)
      assert(reqs.forall(_._2 == "test-key-123"))
      assert(reqs.forall(_._1 == "/api/v1/metadata/account/custom/value"))
      val records = reqs.map(r => "\"values\":\\{".r.findAllIn(r._3).length).sum
      assert(records == 150 + 1500) // sf0.001 customer + orders counts
      // state advanced: orders bookmark = max o_orderdate, flushed to disk
      val saved = Bookmarks.load(s"$tmp/state.json")
      assert(saved == st)
      assert(st.currentlySyncing.isEmpty)
      val bm = st.bookmark("orders")
      assert(bm.replicationKey.contains("o_orderdate"))
      assert(bm.replicationKeyValue.exists(_.startsWith("2001")))
      // landing table activated for the full-table stream
      assert(Files.exists(Paths.get(s"$tmp/landing/stream=customer/current")))
      // a second run from the saved state re-pushes the full table but
      // nothing incremental (bookmark did its job)
      recorder.requests.clear()
      val args2 = args.copy(state = Some(s"$tmp/state.json"))
      Run.sync(spark, args2, JavaHttpPoster())
      val records2 = recorder.requests.asScala.toSeq.map(r => "\"values\":\\{".r.findAllIn(r._3).length).sum
      assert(records2 == 150) // full-table only; zero incremental re-push
    } finally server.stop(0)
  }

  test("catalog selection restricts the synced streams") {
    val tmp = Files.createTempDirectory("graft-run").toString
    val (tapPath, targetPath) = writeConfigs(tmp)
    // a hand-edited catalog: only `customer` selected
    val catalog = """{"streams":[
      |{"stream":"customer","metadata":[{"breadcrumb":[],"metadata":{"selected":true}}]},
      |{"stream":"orders","metadata":[{"breadcrumb":[],"metadata":{"selected":false}}]}
      |]}""".stripMargin
    Files.writeString(Paths.get(s"$tmp/catalog.json"), catalog)
    val recorder = new Recorder
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", recorder)
    server.start()
    try {
      val args = Run.parseArgs(Seq(
        "-c", tapPath, "--target-config", targetPath, "--catalog", s"$tmp/catalog.json",
        "--data-dir", sfDir, "--landing-dir", s"$tmp/landing",
        "--base-url", s"http://127.0.0.1:${server.getAddress.getPort}"))
      Run.sync(spark, args, JavaHttpPoster())
      val records = recorder.requests.asScala.toSeq.map(r => "\"values\":\\{".r.findAllIn(r._3).length).sum
      assert(records == 150) // customers only; orders deselected
    } finally server.stop(0)
  }

  test("chunked CLI run flushes resumable state between chunks") {
    val tmp = Files.createTempDirectory("graft-run").toString
    val (tapPath, targetPath) = writeConfigs(tmp)
    val recorder = new Recorder
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", recorder)
    server.start()
    try {
      val args = Run.parseArgs(Seq(
        "-c", tapPath, "--target-config", targetPath,
        "--data-dir", sfDir, "--landing-dir", s"$tmp/landing",
        "--base-url", s"http://127.0.0.1:${server.getAddress.getPort}",
        "--out-state", s"$tmp/state.json", "--chunk-rows", "400"))
      Run.sync(spark, args, JavaHttpPoster())
      val records = recorder.requests.asScala.toSeq.map(r => "\"values\":\\{".r.findAllIn(r._3).length).sum
      assert(records == 150 + 1500) // chunking loses nothing
      assert(Bookmarks.load(s"$tmp/state.json").bookmark("orders")
        .replicationKeyValue.exists(_.startsWith("2001")))
    } finally server.stop(0)
  }

  test("active-entity set fetched over HTTP drives the incremental semi-join " +
      "(sync.py:30-54 fetch_uuids parity)") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft-run").toString
    // warehouse variant whose join column is UUID-shaped, like the
    // reference's Redshift tables keyed by Pendo visitor uuids
    val dataDir = s"$tmp/data"
    spark.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("o_uuid", graft.functions.uuidify(col("o_orderkey")))
      .write.parquet(s"$dataDir/orders.parquet")
    val (tapPath, _) = writeConfigs(tmp)
    val target = """{
      |"integration_key":"test-key-123",
      |"orders":{
      |  "key_properties":["o_orderkey"],"primary_key":"visitorId",
      |  "replication_method":"INCREMENTAL","replication_key":["o_orderdate"],
      |  "field_mappings":{"visitorId":"o_uuid","total_price":"o_totalprice"}}
      |}""".stripMargin
    Files.writeString(Paths.get(s"$tmp/target.json"), target)
    // the "target's" known-active entities: 7 real order uuids + one
    // junk id the client-side UUID validation must drop
    val active = spark.read.parquet(s"$dataDir/orders.parquet")
      .filter(col("o_orderkey") % 97 === 0).limit(7)
      .select(col("o_uuid")).collect().map(_.getString(0)).toSeq
    val aggBodies = new ConcurrentLinkedQueue[(String, String)]() // intKey, body
    val aggregation = new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        aggBodies.add((
          Option(ex.getRequestHeaders.getFirst("X-Pendo-Integration-Key")).getOrElse(""),
          body))
        val ids = (active :+ "not-a-uuid-but-thirty-six-chars-long")
          .map(u => s"""{"visitorId":"$u"}""").mkString(",")
        val resp = s"""{"results":[$ids]}""".getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, resp.length.toLong)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    }
    val recorder = new Recorder
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/v1/aggregation", aggregation)
    server.createContext("/api/v1/metadata", recorder)
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val args = Run.parseArgs(Seq(
        "-c", tapPath, "--target-config", s"$tmp/target.json",
        "--data-dir", dataDir, "--landing-dir", s"$tmp/landing",
        "--base-url", base, "--active-url", base,
        "--join-column", "o_uuid", "--out-state", s"$tmp/state.json"))
      Run.sync(spark, args, JavaHttpPoster())
      // the aggregation request carried the auth header and the
      // reference's pipeline body (source -> len==36 filter -> select)
      val aggs = aggBodies.asScala.toSeq
      assert(aggs.size == 1)
      assert(aggs.head._1 == "test-key-123")
      assert(aggs.head._2.contains(""""filter":"len(visitorId) == 36""""))
      // stream name "orders" has no "visitor" → accounts entity, keyed
      // by the config's primary_key
      assert(aggs.head._2.contains(""""source":{"accounts":null}"""))
      // exactly the 7 valid active uuids' orders were extracted and
      // pushed — the junk id contributed nothing
      val pushed = recorder.requests.asScala.toSeq
        .map(r => "\"values\":\\{".r.findAllIn(r._3).length).sum
      assert(pushed == 7)
      val pushedUuids = recorder.requests.asScala.toSeq
        .flatMap(r => "\"visitorId\":\"([0-9a-f-]{36})\"".r
          .findAllMatchIn(r._3).map(_.group(1)))
      assert(pushedUuids.toSet == active.toSet)
    } finally server.stop(0)
  }

  test("parseArgs: parsed_args.py surface and unknown-flag rejection") {
    val a = Run.parseArgs(Seq("-c", "cfg.json", "-s", "st.json", "-l", "42",
      "--catalog", "cat.json", "--active-keys", "customer:c_custkey",
      "--join-column", "o_custkey", "--activate-first"))
    assert(a.config == "cfg.json" && a.state.contains("st.json"))
    assert(a.limit.contains(42) && a.catalog.contains("cat.json"))
    assert(a.activeKeys.contains(("customer", "c_custkey")))
    assert(a.joinColumn.contains("o_custkey") && a.activateFirst)
    assert(Run.parseArgs(Seq("-d")).discover)
    assertThrows[IllegalArgumentException](Run.parseArgs(Seq("-c", "x", "--nope")))
    assertThrows[IllegalArgumentException](Run.parseArgs(Seq("-l", "1")))
  }
}
