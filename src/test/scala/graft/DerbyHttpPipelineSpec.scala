package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.catalog.Streams
import graft.sync.{Bookmarks, SyncState}
import graft.target.{ApiSink, JavaHttpPoster}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.DriverManager
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** The full deployment topology in one scenario: a LIVE warehouse (Derby
  * over JDBC, standing in for Redshift) extracted through the chunked
  * incremental sync — bookmark filter pushed into the warehouse query,
  * active-key semi-join, per-chunk state flush — pushed through the REAL
  * HTTP transport (JavaHttpPoster against an in-process server), with a
  * kill after two committed chunks and a resume from the last durably
  * flushed state. The other e2e runs (RunSpec/PipelineSpec) source from
  * the parquet warehouse; this one proves the JDBC leg end-to-end:
  * no record lost, no committed record re-pushed. */
class DerbyHttpPipelineSpec extends SparkSpec {

  private val dbUrl = "jdbc:derby:memory:graftpipe;create=true"
  private val derbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  // 60 orders across 6 replication-key dates (10 per date), custkeys 1-5;
  // custkey 5 will NOT be in the active set (its 12 orders must never push)
  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(dbUrl)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE orders_live (
          |  "o_orderkey" BIGINT NOT NULL PRIMARY KEY,
          |  "o_custkey" BIGINT,
          |  "o_orderstatus" VARCHAR(1),
          |  "o_totalprice" DOUBLE,
          |  "o_orderpriority" VARCHAR(15),
          |  "o_orderdate" TIMESTAMP)""".stripMargin)
      val ps = conn.prepareStatement("INSERT INTO orders_live VALUES (?, ?, ?, ?, ?, ?)")
      (1 to 60).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setLong(2, (i % 5 + 1).toLong)
        ps.setString(3, Seq("O", "F", "P")(i % 3))
        ps.setDouble(4, i * 100.0)
        ps.setString(5, s"${i % 5 + 1}-NORMAL")
        ps.setTimestamp(6, java.sql.Timestamp.valueOf(
          f"1996-03-${(i - 1) / 10 + 1}%02d 00:00:00"))
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  private class BulkRecorder extends HttpHandler {
    val bodies = new ConcurrentLinkedQueue[String]()
    override def handle(ex: HttpExchange): Unit = {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      bodies.add(body)
      val n = "\"values\":\\{".r.findAllIn(body).length
      val resp = s"""{"total":$n,"updated":$n,"failed":0}""".getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length.toLong)
      ex.getResponseBody.write(resp)
      ex.close()
    }
    def visitorIds: Seq[String] =
      bodies.asScala.toSeq.flatMap("\"visitorId\":\"(\\d+)\"".r
        .findAllMatchIn(_).map(_.group(1)))
  }

  test("Derby → chunked incremental sync → real HTTP sink survives a kill+resume " +
      "with no loss and no re-push") {
    seeded
    import spark.implicits._
    val jdbcSrc = graft.sources.Jdbc.read(spark, graft.sources.Jdbc.JdbcSourceConfig(
      url = dbUrl, table = "orders_live", user = "", password = "",
      partitionColumn = Some("o_orderkey"),
      lowerBound = Some("1"), upperBound = Some("61"),
      numPartitions = 4, driver = derbyDriver))
    // the bookmark's replication-key predicate must reach the warehouse
    val pushedDown = jdbcSrc
      .filter(org.apache.spark.sql.functions.col("o_orderdate") >
        org.apache.spark.sql.functions.lit("1996-03-02T00:00:00"))
      .queryExecution.executedPlan.toString
    assert(pushedDown.contains("PushedFilters") && pushedDown.contains("o_orderdate"),
      s"replication-key filter must push into the JDBC scan:\n$pushedDown")

    val active = Seq(1L, 2L, 3L, 4L).toDF("custkey") // custkey 5 inactive
    val recorder = new BulkRecorder
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", recorder)
    server.start()
    try {
      val cfg = ApiSink.SinkConfig(
        ApiSink.Endpoint(s"http://127.0.0.1:${server.getAddress.getPort}", "visitor"),
        maxRecords = 7, maxAttempts = 3,
        callsPerPeriod = 1000000, periodMillis = 1000L, parallelism = 1)
      val state0 = Bookmarks.buildState(SyncState(), Streams.all)
      var flushed = Seq.empty[SyncState]
      // phase 1 — the "crash": two committed chunks, then the loop dies.
      // chunkRows=10 cuts inside date groups, so alignToBookmark withholds
      // each chunk's partial boundary group for the next chunk
      val r1 = Pipeline.runIncrementalChunked(spark, "unused-dir", Streams.visitors,
        active, "o_custkey", JavaHttpPoster(), cfg, state0,
        chunkRows = 10, onStateFlush = s => flushed = flushed :+ s,
        maxChunks = 2, nowMs = 1L, source = Some(jdbcSrc))
      assert(r1.chunks == 2 && !r1.exhausted && flushed.size == 2)
      val phase1 = recorder.visitorIds
      assert(phase1.nonEmpty && phase1.size.toLong == r1.totalRecords)
      assert(phase1.distinct.size == phase1.size, "within-phase duplicate push")
      // phase 2 — resume purely from the last durably flushed state
      recorder.bodies.clear()
      val r2 = Pipeline.runIncrementalChunked(spark, "unused-dir", Streams.visitors,
        active, "o_custkey", JavaHttpPoster(), cfg, flushed.last,
        chunkRows = 10, nowMs = 2L, source = Some(jdbcSrc))
      assert(r2.exhausted)
      val phase2 = recorder.visitorIds
      // no committed record re-pushed, and nothing lost: the union is
      // exactly the active-custkey orders in the live database
      assert((phase1.toSet intersect phase2.toSet).isEmpty, "re-push after resume")
      val expected = (1 to 60).filter(i => (i % 5 + 1) != 5L).map(_.toString).toSet
      assert((phase1.toSet union phase2.toSet) == expected)
      // the inactive custkey's orders never crossed the wire
      assert((1 to 60).filter(i => (i % 5 + 1) == 5L)
        .forall(i => !phase1.contains(i.toString) && !phase2.contains(i.toString)))
      // bookmark landed on the final replication-key value
      assert(r2.state.bookmark("warehouse_visitor").replicationKeyValue
        .contains("1996-03-06T00:00:00.000000"))
    } finally server.stop(0)
  }
}
