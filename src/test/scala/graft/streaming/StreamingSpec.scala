package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  test("windowed counts over a stream match the batch twin") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Events.Event]
    val events = (1 to 100).map(i =>
      Events.Event(i.toLong, ts(i.toLong), i % 5L, s"type${i % 3}", i * 1.0))
    input.addData(events: _*)
    val query = Events.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("win_counts")
        .select("window_start", "event_type", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = events.toDF()
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .select($"w.start", $"event_type", $"n", $"sum_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
    } finally query.stop()
  }

  test("hopping windows over a stream match the batch sliding twin") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Events.Event]
    val events = (1 to 100).map(i =>
      Events.Event(i.toLong, ts(i.toLong), i % 5L, s"type${i % 3}", i * 1.0))
    input.addData(events: _*)
    val query = Events.hoppingCounts(input.toDF())
      .writeStream.format("memory").queryName("hop_counts")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("hop_counts").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = events.toDF()
        .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .select($"w.start", $"event_type", $"n", $"sum_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      // each event contributes to exactly 2 windows
      assert(streamed.toSeq.map(_._3).sum == 2L * events.length)
    } finally query.stop()
  }

  test("streaming sessionization emits gap-separated sessions") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Events.Event]
    val query = Events.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session 1: user 1, events at t0, t5, t10; then a 40-min gap opens
      // session 2 at t50 — emitting session 1 within the same user
      input.addData(
        Events.Event(1, ts(0), 1L, "view", 1.0),
        Events.Event(2, ts(5), 1L, "view", 1.0),
        Events.Event(3, ts(10), 1L, "view", 1.0))
      query.processAllAvailable()
      input.addData(Events.Event(4, ts(50), 1L, "view", 1.0))
      query.processAllAvailable()
      // push the watermark far ahead so the open session times out
      input.addData(Events.Event(5, ts(500), 2L, "view", 1.0))
      query.processAllAvailable()
      input.addData(Events.Event(6, ts(1000), 3L, "view", 1.0))
      query.processAllAvailable()
      val sessions = spark.table("sessions").as[Events.Session].collect()
        .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 3L)
      assert(sessions(0).session_start == ts(0) && sessions(0).session_end == ts(10))
      assert(sessions(1).n_events == 1L && sessions(1).session_start == ts(50))
    } finally query.stop()
  }

  test("transformWithState sessionization matches the fMGWS semantics") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    Events.useRocksDbState(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("tws-ckpt").toString
    val input = MemoryStream[Events.Event]
    val query = Events.sessionizeTws(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("tws_sessions")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(
        Events.Event(1, ts(0), 1L, "view", 1.0),
        Events.Event(2, ts(5), 1L, "view", 1.0),
        Events.Event(3, ts(10), 1L, "view", 1.0))
      query.processAllAvailable()
      input.addData(Events.Event(4, ts(50), 1L, "view", 1.0))
      query.processAllAvailable()
      input.addData(Events.Event(5, ts(500), 2L, "view", 1.0))
      query.processAllAvailable()
      input.addData(Events.Event(6, ts(1000), 3L, "view", 1.0))
      query.processAllAvailable()
      val sessions = spark.table("tws_sessions").as[Events.Session].collect()
        .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
      // same scenario and same expectations as the fMGWS test above
      assert(sessions.length == 2)
      assert(sessions(0).n_events == 3L)
      assert(sessions(0).session_start == ts(0) && sessions(0).session_end == ts(10))
      assert(sessions(1).n_events == 1L && sessions(1).session_start == ts(50))
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming dedup drops repeated event ids across micro-batches") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Events.Event]
    val query = Events.dedupStream(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData(
        Events.Event(1, ts(0), 1L, "view", 1.0),
        Events.Event(1, ts(0), 1L, "view", 1.0),  // same-batch dup
        Events.Event(2, ts(1), 1L, "view", 1.0))
      query.processAllAvailable()
      input.addData(Events.Event(1, ts(2), 1L, "view", 9.9)) // cross-batch dup
      input.addData(Events.Event(3, ts(3), 2L, "click", 1.0))
      query.processAllAvailable()
      val ids = spark.table("deduped").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("file-stream source with RocksDB state matches the batch aggregate") {
    val sparkSession = spark
    import sparkSession.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-filestream").toString
    val events = (1 to 60).map(i =>
      Events.Event(i.toLong, ts(i.toLong), i % 5L, s"type${i % 3}", i * 1.0))
    // two separate parquet drops — the file source lists flat files, so
    // stage each write and move its part files into the watched dir
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$dir/stage-$name"
      df.coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.move(f.toPath,
            java.nio.file.Paths.get(s"$dir/in", s"$name-$i.parquet"))
        }
    }
    drop(events.take(30).toDF(), "drop1")
    drop(events.drop(30).toDF(), "drop2")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    Events.useRocksDbState(spark)
    try {
      val stream = Events.fileStream(spark, s"$dir/in",
        events.toDF().schema, maxFilesPerTrigger = 1)
      val query = Events.windowedCounts(stream)
        .writeStream.format("memory").queryName("file_win")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("complete").start()
      try {
        query.processAllAvailable()
        val streamed = spark.table("file_win")
          .select("window_start", "event_type", "n", "sum_value").collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
        val batch = events.toDF()
          .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
          .select($"w.start", $"event_type", $"n", $"sum_value").collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
        assert(streamed == batch)
      } finally query.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("JSONL file-stream ingest: declared schema, streamed rows match batch read") {
    val sparkSession = spark
    import sparkSession.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-stream").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang").limit(40)
    graft.sources.TextFormats.writeJsonlSharded(docs, s"$dir/in", targetBytes = 8 * 1024)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").json(s"$dir/in")
      // the stateless curation column runs unchanged on the stream
      .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
    val query = stream.writeStream.format("memory").queryName("jsonl_in")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("jsonl_in")
        .select($"doc_id", $"text", $"lang", $"n_tokens")
        .orderBy("doc_id").collect().toSeq
      val batch = docs
        .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
        .orderBy("doc_id").collect().toSeq
      assert(streamed == batch)
    } finally query.stop()
  }

  test("temperature corpus-mixing gate filters a stream against static language stats") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.sources.Tables.table(spark, sfDir, "documents")
    val budget = 15000L
    // keep_ppm dimension from the STATIC corpus; the stream gate is a
    // stateless stream-static broadcast join + content-hash predicate
    val stats = graft.curation.Curation
      .temperatureStats(corpus, "lang", "text", budget)
    val input = MemoryStream[(Long, String, String)]
    val docs = corpus.select($"doc_id", $"lang", $"text").limit(200)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    input.addData(docs.toIndexedSeq: _*)
    val gated = input.toDF().toDF("doc_id", "lang", "text")
      .join(broadcast(stats), "lang")
      .filter(graft.curation.Curation.temperatureKeep("text"))
      .select($"doc_id")
    val query = gated.writeStream.format("memory").queryName("temp_gate")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("temp_gate").collect().map(_.getLong(0)).toSet
      val batch = graft.curation.Curation.temperatureSample(
        corpus, "lang", "text", "doc_id", budget)
        .collect().map(_.getLong(0)).toSet
        .intersect(docs.map(_._1).toSet)
      assert(streamed == batch, "stream keep set ≡ batch keep set on the same docs")
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("stream-stream interval join enriches events within the window") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[Events.Event]
    val meta = MemoryStream[(Long, Timestamp, String)]
    val metaDf = meta.toDF().toDF("m_user_id", "m_ts", "segment")
    val query = Events.enrichStream(events.toDF(), metaDf, "user_id",
        intervalMinutes = 30)
      .select($"event_id", $"segment")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      events.addData(
        Events.Event(1, ts(0), 7L, "view", 1.0),   // meta at t10 → within 30m
        Events.Event(2, ts(0), 8L, "view", 1.0),   // meta at t100 → outside
        Events.Event(3, ts(5), 9L, "view", 1.0))   // no meta at all
      meta.addData((7L, ts(10), "gold"), (8L, ts(100), "late"))
      query.processAllAvailable()
      // advance both watermarks so joined results finalize
      events.addData(Events.Event(99, ts(500), 1L, "view", 1.0))
      meta.addData((1L, ts(500), "wm"))
      query.processAllAvailable()
      val out = spark.table("enriched").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out.contains((1L, "gold")))
      assert(!out.exists(_._1 == 2L)) // outside the interval
      assert(!out.exists(_._1 == 3L)) // unmatched
    } finally query.stop()
  }

  test("streaming push drives the batch ApiSink per micro-batch") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.target.ApiSink
    ApiSink.RecordingPoster.reset()
    val input = MemoryStream[String]
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val cfg = ApiSink.SinkConfig(ApiSink.Endpoint("https://example.invalid", "visitor"),
      maxRecords = 10, callsPerPeriod = 1000000, periodMillis = 1000L, parallelism = 1)
    val query = Events.pushStream(
      input.toDF().withColumnRenamed("value", "payload"),
      new ApiSink.RecordingPoster(), cfg, dir).start()
    try {
      input.addData((1 to 25).map(i => s"""{"id":$i}"""): _*)
      query.processAllAvailable()
      val posted = ApiSink.RecordingPoster.calls.size()
      assert(posted >= 3) // 25 records / max 10 per batch, per partition
    } finally query.stop()
  }

  test("curation columns run unchanged on a stream (split, repetition gate)") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the curation operators are stateless Column expressions, so the SAME
    // code drives a streaming ingest filter: assign splits and gate on a
    // repetition signal as documents arrive
    val input = MemoryStream[(Long, String)]
    val docs = Seq(
      (1L, "a clean document with varied words"),
      (2L, "rep rep rep rep rep rep"), // repetition-gated out
      (3L, "another ordinary text sample here"))
    input.addData(docs: _*)
    // BPE apply is a pure column chain too — segment the first word
    // in-stream with merges trained on the static corpus
    val merges = graft.queries.LlmOps.bpeMerges(spark, sfDir)
    val streamed = input.toDF().toDF("doc_id", "text")
      .withColumn("split", graft.curation.Curation.assignSplit(
        "text", Seq("train" -> 8, "val" -> 1, "test" -> 1)))
      .withColumn("__toks", split($"text", " "))
      .withColumn("dup_frac",
        expr("CAST(1000 * (size(__toks) - size(array_distinct(__toks))) div size(__toks) AS BIGINT)"))
      .filter($"dup_frac" < 500)
      .withColumn("first_word_bpe", concat_ws(" ",
        graft.text.Bpe.applyMerges(element_at($"__toks", 1), merges)))
      .select("doc_id", "split", "first_word_bpe")
    val query = streamed.writeStream.format("memory")
      .queryName("curated").outputMode("append").start()
    try {
      query.processAllAvailable()
      val out = spark.table("curated").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.keySet == Set(1L, 3L)) // the repeated doc is gated out
      // split agrees with the batch assignment (content-keyed determinism)
      val batch = docs.toDF("doc_id", "text")
        .select($"doc_id", graft.curation.Curation.assignSplit(
          "text", Seq("train" -> 8, "val" -> 1, "test" -> 1)).as("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.forall { case (id, s) => batch(id) == s })
      // BPE segmentation ran in-stream and round-trips
      val bpe = spark.table("curated").collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      val firstWord = docs.toMap
      assert(bpe.forall { case (id, seg) =>
        seg.replace(" ", "") == firstWord(id).split(" ").head + "</w>" })
    } finally query.stop()
  }

  test("corpus-state card maintains itself as a streaming aggregate (complete mode)") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // H13's mergeable state IS a streaming aggregation: the same
    // state() expressions (incl. the KMV TypedImperativeAggregates) run
    // under continuous update, and after all batches the live card must
    // equal the batch card over the same rows
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val streamed = graft.curation.CorpusState.state(
      input.toDF().toDF("doc_id", "text", "lang"), "text")
    val query = streamed.writeStream.format("memory")
      .queryName("live_card").outputMode("complete").start()
    try {
      val (h1, h2) = docs.splitAt(docs.length / 2)
      input.addData(h1: _*); query.processAllAvailable()
      input.addData(h2: _*); query.processAllAvailable()
      val live = graft.curation.CorpusState.render(spark.table("live_card"))
        .collect().map(r => r.getString(0) -> r.getAs[Long]("value")).toMap
      val batch = graft.curation.CorpusState.render(
        graft.curation.CorpusState.state(
          docs.toSeq.toDF("doc_id", "text", "lang"), "text"))
        .collect().map(r => r.getString(0) -> r.getAs[Long]("value")).toMap
      assert(live == batch, s"live card $live must equal batch card $batch")
    } finally query.stop()
  }

  test("learned quality gate scores a stream with the batch-trained coefficients") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // H10 end-to-end on a stream: the model trains once on the static
    // corpus; its coefficients fold into a pure Column, so the identical
    // features → sigmoid expression gates documents as they arrive (no
    // state, no watermark, no model object per row)
    val model = graft.queries.LlmOps.qualityClfModel(spark, sfDir)
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog while the sun sets over " +
        "a quiet river and the evening wind moves through a line of tall trees " +
        "carrying the scent of rain across the open field toward a distant farm " +
        "where the lights glow warm against the fading sky and a dog barks"),
      (2L, "z"),
      (3L, "rep rep rep rep rep rep rep rep"))
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.curation.QualityModel.features(df, "text", "doc_id")
        .withColumn("p", graft.curation.QualityModel.scoreColumn(model))
        .filter($"p" >= 0.5).select("doc_id")
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val query = gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qgate").outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("qgate").collect().map(_.getLong(0)).toSet
      val batch = gate(docs.toDF("doc_id", "text")).collect().map(_.getLong(0)).toSet
      assert(streamed == batch, "stream gate must equal the batch gate")
      assert(batch == Set(1L), s"only the quality doc passes, got $batch")
    } finally query.stop()
  }

  test("streaming simhash near-dup flagging against a static corpus index") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the corpus index is built ONCE (batch side); incoming documents are
    // flagged by a stream-static equi-join on the banded signature keys —
    // stateless on the stream, so near-dups of already-ingested data are
    // caught at ingest time
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"),
      (101L, "an entirely different corpus document about database engines and joins"))
      .toDF("doc_id", "text")
    val index = graft.dedup.SimHash.bandedIndex(corpus, "text", "doc_id")
    val input = MemoryStream[(Long, String)]
    input.addData(
      // near-dup of corpus doc 100 (one word changed)
      (1L, "the quick brown fox jumps over the lazy cat again and again today"),
      // novel document
      (2L, "completely unrelated text with fresh vocabulary and nothing shared"))
    val flagged = graft.dedup.SimHash.matchesAgainst(
      index, input.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val query = flagged.writeStream.format("memory")
      .queryName("neardup_flags").outputMode("append").start()
    try {
      query.processAllAvailable()
      val matches = spark.table("neardup_flags").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(matches == Set((1L, 100L)))
    } finally query.stop()
  }

  test("streaming IMAGE near-dup flagging against a static dHash index (G3d x G8): stream == batch pairs") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.ImageDedup
    import graft.dedup.SimHash
    // static corpus: planted group 1 members (16, 17 — pairwise hamming 1)
    // plus a background scatter (5); index built ONCE from the decoded
    // dHash signatures — the G8 shape with the G3d signature family
    val corpus = ImageDedup.syntheticPlantedImageTable(
      Seq(16L, 17L, 5L).toDF("doc_id"), "doc_id")
    val index = SimHash.bandedIndexFromSigs(
      ImageDedup.dHash(corpus).filter($"ok").select("doc_id", "phash"),
      "doc_id", "phash")
    // stream: the group's third member (18 — hamming 2 of 16, 3 of 17)
    // and an unrelated background image (100) that must NOT flag
    val arriving = ImageDedup.syntheticPlantedImageTable(
      Seq(18L, 100L).toDF("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    val input = MemoryStream[(Long, Array[Byte])]
    input.addData(arriving.toIndexedSeq: _*)
    def flags(media: org.apache.spark.sql.DataFrame) =
      SimHash.matchesAgainstSigs(index,
        ImageDedup.dHash(media).filter($"ok").select("doc_id", "phash"),
        "doc_id", "phash")
    val query = flags(input.toDF().toDF("doc_id", "payload"))
      .writeStream.format("memory").queryName("img_flags")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("img_flags").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batch = flags(arriving.toSeq.toDF("doc_id", "payload")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed == batch, "stream flags must equal the batch flags")
      assert(batch == Set((18L, 16L, 2), (18L, 17L, 3)),
        s"planted member flags against its group only, got $batch")
    } finally query.stop()
  }

  test("streaming AUDIO near-dup flagging against a static envelope-hash index (G3h x G8): stream == batch pairs") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.Binary
    import graft.dedup.SimHash
    // static corpus: two identical-profile siblings of group 0 (ids 0, 1 —
    // hamming 0) and a member of a far group (background); the arriving
    // perturbed sibling (id 7: one +12000 segment edit, <= 2 contour
    // bits) must flag against BOTH siblings, the background must not
    val corpus = Binary.syntheticSegmentedAudioTable(
      Seq(0L, 1L, 800L).toDF("doc_id"), "doc_id")
    val index = SimHash.bandedIndexFromSigs(
      Binary.audioEnvelopeHash(corpus).filter($"ok").select("doc_id", "ehash"),
      "doc_id", "ehash")
    val arriving = Binary.syntheticSegmentedAudioTable(
      Seq(7L, 900L).toDF("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload")))
    val input = MemoryStream[(Long, Array[Byte])]
    input.addData(arriving.toIndexedSeq: _*)
    def flags(media: org.apache.spark.sql.DataFrame) =
      SimHash.matchesAgainstSigs(index,
        Binary.audioEnvelopeHash(media).filter($"ok").select("doc_id", "ehash"),
        "doc_id", "ehash")
    val query = flags(input.toDF().toDF("doc_id", "payload"))
      .writeStream.format("memory").queryName("audio_flags")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("audio_flags").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batch = flags(arriving.toSeq.toDF("doc_id", "payload")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed == batch, "stream flags must equal the batch flags")
      assert(streamed.map(t => (t._1, t._2)) == Set((7L, 0L), (7L, 1L)),
        s"perturbed sibling flags against both group members only, got $streamed")
      assert(streamed.forall(t => t._3 >= 1 && t._3 <= 2),
        "one segment edit moves at most its two boundary contour bits")
    } finally query.stop()
  }

  test("streaming decontamination gate drops holdout-overlapping docs at ingest") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the holdout Bloom is built ONCE from the static benchmark suite;
    // the gate is then a stateless Column predicate on the stream — no
    // join, no state store, the 100 TB shape of decontamination-at-ingest
    val holdout = Seq((100L, "secret benchmark question text appears here"))
      .toDF("doc_id", "text")
    val bloom = graft.curation.Curation.holdoutGramBloom(
      holdout, "text", n = 4, expectedGrams = 1000L)
    val input = MemoryStream[(Long, String)]
    input.addData(
      (1L, "totally clean training document number one"),
      (2L, "contains secret benchmark question text inside"), // 4-gram leak
      (3L, "yet another clean and boring sample"))
    val gated = input.toDF().toDF("doc_id", "text")
      .withColumn("__toks", split($"text", " "))
      .filter(graft.curation.Curation.contaminationGate($"__toks", bloom, n = 4))
      .select("doc_id")
    val query = gated.writeStream.format("memory")
      .queryName("decon_gate").outputMode("append").start()
    try {
      query.processAllAvailable()
      val kept = spark.table("decon_gate").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L))
    } finally query.stop()
  }

  test("streaming shard assignment routes docs identically to the batch shuffle") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    input.addData(1L to 300L: _*)
    val query = graft.queries.Mix.assignShard(input.toDF().toDF("doc_id"), "doc_id")
      .writeStream.format("memory").queryName("shard_assign")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("shard_assign")
        .select("doc_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = graft.queries.Mix.assignShard(
          (1L to 300L).toDF("doc_id"), "doc_id")
        .select("doc_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed == batch,
        "arrival-time shard routing must equal the batch assignment")
      assert(streamed.values.toSet.size > 16, "docs spread across shards")
    } finally query.stop()
  }

  test("streaming domain-mix gate keeps exactly the batch face's selection") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // trained half: thresholds from the reference corpus (batch-side)
    val thr = graft.queries.Mix.domainMixThresholds(spark, sfDir, sampleMod = 16L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val query = input.toDF().toDF("doc_id", "source")
      .filter(graft.queries.Mix.domainMixGate(
        thr, org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source")))
      .writeStream.format("memory").queryName("mix_gate")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("mix_gate")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val batch = graft.queries.Mix.qDomainMixApprox(spark, sfDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch,
        "arrival-time gating must equal the batch rebalancing selection")
      // unknown source fails closed
      val unknown = spark.range(1).select(
        graft.queries.Mix.domainMixGate(thr,
          org.apache.spark.sql.functions.lit(1L),
          org.apache.spark.sql.functions.lit("src_never_seen")))
        .head().getBoolean(0)
      assert(!unknown, "unknown sources must fail closed")
    } finally query.stop()
  }

  test("streaming percentile quality gate (H3's continuous face): stream == batch keep set") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // trained half batch-side: per-language 25th-percentile cutoffs
    val cuts = graft.queries.LlmOps.qualityGateCutoffs(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    input.addData(docs: _*)
    val query = graft.text.TextAnalysis.qualityScore(
        input.toDF().toDF("doc_id", "lang", "text"), "text")
      .filter(graft.queries.LlmOps.qualityGateColumn(cuts,
        org.apache.spark.sql.functions.col("quality_x1000"),
        org.apache.spark.sql.functions.col("lang")))
      .select("doc_id")
      .writeStream.format("memory").queryName("h3_gate")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("h3_gate").collect().map(_.getLong(0)).toSet
      val batch = graft.queries.LlmOps.qQualityGate(spark, sfDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch,
        "arrival-time percentile gating must equal the batch keep set")
      assert(streamed.nonEmpty && streamed.size < docs.length,
        "the gate must actually gate (drop the bottom quartile per language)")
      // unknown language fails closed
      val unknown = spark.range(1).select(
        graft.queries.LlmOps.qualityGateColumn(cuts,
          org.apache.spark.sql.functions.lit(999999L),
          org.apache.spark.sql.functions.lit("lang_never_seen")))
        .head().getBoolean(0)
      assert(!unknown, "unknown languages must fail closed")
    } finally query.stop()
  }

  test("streaming cdc apply: advances emit, out-of-order is ignored, tombstones delete") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Events.CdcChange]
    val query = Events.cdcApplyStream(input.toDS())
      .writeStream.format("memory").queryName("cdc_current")
      .outputMode("update").start()
    def emitted(): Array[Events.CdcCurrent] =
      spark.table("cdc_current").as[Events.CdcCurrent].collect()
    try {
      input.addData(
        Events.CdcChange(1L, ts(0), 1L, "U", 1.0, "v1"),
        Events.CdcChange(1L, ts(10), 2L, "U", 2.0, "v2"), // same batch: latest wins
        Events.CdcChange(2L, ts(0), 3L, "U", 9.0, "a"))
      query.processAllAvailable()
      val b1 = emitted()
      assert(b1.length == 2, "one emission per advanced key")
      assert(b1.find(_.user_id == 1L).get.props == "v2")
      input.addData(
        Events.CdcChange(1L, ts(5), 4L, "U", 5.0, "stale"), // below high-water: ignored
        Events.CdcChange(2L, ts(20), 5L, "D", 0.0, ""),     // tombstone
        Events.CdcChange(3L, ts(1), 6L, "U", 7.0, "new"))
      query.processAllAvailable()
      val all = emitted()
      assert(all.length == 4, "stale delivery must not emit")
      // materialized snapshot = last emission per key, tombstones removed
      val snapshot = all.groupBy(_.user_id)
        .map { case (k, v) => k -> v.maxBy(c => (c.last_ts.getTime, c.event_id)) }
        .filter(!_._2.deleted)
      assert(snapshot.keySet == Set(1L, 3L))
      assert(snapshot(1L).props == "v2", "user 1 must keep v2, not the stale v")
    } finally query.stop()
  }

  test("streaming attribution matches the batch face and carries state across batches") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the real sf0.001 event stream, delivered time-ordered in two
    // batches (the cross-batch contract an upstream watermark provides)
    // delivery order must sort by the SAME key the attribution semantics
    // use — microseconds, not Timestamp.getTime's milliseconds, or two
    // same-millisecond events could cross the batch split out of order
    def micros(t: Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    val events = graft.sources.Tables.table(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Events.Event].collect()
      .sortBy(e => (micros(e.ts), e.event_id))
    val input = MemoryStream[Events.Event]
    val query = Events.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    try {
      val (b1, b2) = events.splitAt(events.length / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val streamed = spark.table("attribution").as[Events.Attribution]
        .collect()
        .map(a => a.purchase_id ->
          (a.attributed_click_id, a.lag_us, a.attributed)).toMap
      val batch = graft.queries.Warehouse.qAttribution(spark, sfDir).collect()
        .map { r =>
          r.getAs[Long]("purchase_id") ->
            (Option(r.getAs[java.lang.Long]("attributed_click_id")).map(_.longValue),
              Option(r.getAs[java.lang.Long]("lag_us")).map(_.longValue),
              r.getAs[Boolean]("attributed"))
        }.toMap
      assert(streamed.size == batch.size, "one verdict per purchase")
      assert(streamed == batch, "stream must reproduce the batch attribution")
      // the batch boundary must not lose state: at least one purchase in
      // b2 attributes to a click delivered in b1
      val b2Purchases = b2.filter(_.event_type == "purchase").map(_.event_id).toSet
      val b1Clicks = b1.filter(_.event_type == "click").map(_.event_id).toSet
      assert(streamed.exists { case (pid, (click, _, att)) =>
        att && b2Purchases(pid) && click.exists(b1Clicks) },
        "no purchase crossed the batch boundary — split not exercising state")
    } finally query.stop()
  }

  test("streaming cusum matches the batch detector with the same offline-fit mu, state crossing batches") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch reference: the C45b face (computes mu from the full series —
    // the offline parameter fit the stream receives as a Map)
    val batch = graft.queries.Warehouse.qChangepointByType(spark, sfDir).collect()
    val daily = batch.map(r => Events.DailyCount(
      r.getAs[String]("event_type"), r.getAs[java.sql.Date]("d"),
      r.getAs[Long]("y"))).sortBy(d => (d.d.getTime, d.event_type))
    // replicate the batch mu fit: (1000*sum) DIV count per type
    val mu = daily.groupBy(_.event_type).map { case (t, rs) =>
      t -> 1000L * rs.map(_.y).sum / rs.length }
    val input = MemoryStream[Events.DailyCount]
    val query = Events.cusumStream(input.toDS(), mu)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = daily.splitAt(daily.length / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val streamed = spark.table("cusum_stream").as[Events.CusumPoint]
        .collect()
        .map(p => (p.event_type, p.d.toString) ->
          (p.s_pos_x1000, p.s_neg_x1000, p.alarm_up, p.alarm_down)).toMap
      val expect = batch.map { r =>
        (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("d").toString) ->
          (r.getAs[Long]("s_pos_x1000"), r.getAs[Long]("s_neg_x1000"),
            r.getAs[Int]("alarm_up") == 1, r.getAs[Int]("alarm_down") == 1)
      }.toMap
      assert(streamed.size == expect.size, "one point per (type, day)")
      assert(streamed == expect, "stream must reproduce the batch CUSUM lanes")
      // each type's series straddles the split: the carried (s+, s-)
      // state is what makes the post-split points match
      val typesInBoth = b1.map(_.event_type).toSet intersect b2.map(_.event_type).toSet
      assert(typesInBoth.nonEmpty, "split must cross every type's series")
    } finally query.stop()
  }

  test("streaming fixed sample: the heap aggregate converges to the batch sample") {
    // G16: H22's bounded-heap aggregate runs UNCHANGED as a Complete-
    // mode streaming aggregate — the k-smallest-hash set is arrival-
    // order-independent, so after any batch split the stream's current
    // sample equals the batch face over the data seen so far
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ids = graft.sources.Tables.table(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val input = MemoryStream[Long]
    val query = input.toDS().toDF("doc_id")
      .agg(graft.queries.Mix.sampleFixedAgg(
        org.apache.spark.sql.functions.col("doc_id"), 37).as("sample"))
      .writeStream.format("memory").queryName("sample_stream")
      .outputMode("complete").start()
    try {
      val (b1, b2) = ids.splitAt(ids.length / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val streamed = spark.table("sample_stream").collect().head
        .getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1)).toSet
      val batch = graft.queries.Mix.qSampleFixed(spark, sfDir, k = 37)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(streamed == batch,
        "streamed sample must equal the batch draw over the same corpus")
    } finally query.stop()
  }

  test("streaming heavy hitters: complete-mode Misra-Gries equals the batch top-20") {
    // G18: vocab at this sf sits below the k=4096 capacity, so the
    // sketch is EXACT counts and arrival-order-independent — the live
    // top-k must equal F16 over the same corpus after any batch split
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val texts = graft.sources.Tables.table(spark, sfDir, "documents")
      .where(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("text").collect().map(_.getString(0)).toSeq
    val input = MemoryStream[String]
    val query = Events.heavyHittersStream(input.toDS().toDF("text"), "text")
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      val (b1, b2) = texts.splitAt(texts.length / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val m = spark.table("hh_stream").collect().head
        .getAs[Map[String, Long]]("m")
      val streamedTop = m.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      val batch = graft.queries.LlmOps.qHeavyHitters(spark, sfDir).collect()
        .map(r => (r.getAs[String]("term"), r.getAs[Long]("est_count"))).toSeq
      assert(streamedTop == batch,
        "streamed top-20 must equal the batch F16 face")
    } finally query.stop()
  }

  test("streaming ewma reproduces the batch recursion with state crossing batches") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    // per-type daily counts from the real corpus; the batch reference is
    // C64's exact integer recursion replayed per type in plain Scala
    val daily = graft.queries.Warehouse.qChangepointByType(spark, sfDir).collect()
      .map(r => Events.DailyCount(r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("d"), r.getAs[Long]("y")))
      .sortBy(d => (d.d.getTime, d.event_type))
    val expect = daily.groupBy(_.event_type).toSeq.flatMap { case (t, rs) =>
      var s = -1L
      rs.sortBy(_.d.getTime).toSeq.map { r =>
        val dev = if (s < 0) 0L else 1000L * r.y - s
        s = if (s < 0) 1000L * r.y else (1000L * r.y + s) / 2
        (t, r.d.toString) -> (s, dev)
      }
    }
    val input = MemoryStream[Events.DailyCount]
    val query = Events.ewmaStream(input.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = daily.splitAt(daily.length / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val streamed = spark.table("ewma_stream").as[Events.EwmaPoint].collect()
        .map(p => (p.event_type, p.d.toString) -> (p.ewma_x1000, p.dev_x1000))
        .toMap
      assert(streamed.size == expect.size)
      assert(streamed == expect.toMap,
        "stream must reproduce the exact integer EWMA recursion")
    } finally query.stop()
  }

  test("streaming content-dedup gate (G17) mirrors D8's incremental semantics") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Events.IngestDoc]
    val query = Events.contentDedupStream(input.toDS())
      .writeStream.format("memory").queryName("content_gate")
      .outputMode("append").start()
    def kept(): Set[Long] =
      spark.table("content_gate").as[Events.KeptDoc].collect().map(_.doc_id).toSet
    try {
      // batch 1 = D8's accumulated corpus, with an in-batch dup (keep-min)
      input.addData(
        Events.IngestDoc(2L, "delta epsilon zeta", "s0"),
        Events.IngestDoc(0L, "alpha beta gamma", "s0"),
        Events.IngestDoc(6L, "alpha beta gamma", "s0"),  // in-batch dup of 0
        Events.IngestDoc(4L, "eta theta iota", "s0"))
      query.processAllAvailable()
      assert(kept() == Set(0L, 2L, 4L), "in-batch dup resolves to min doc_id")
      // batch 2 = D8's new batch: 1 and 5 duplicate admitted content,
      // 3 and 7 are novel — the DedupSpec incremental plant, replayed
      input.addData(
        Events.IngestDoc(1L, "alpha beta gamma", "s1"),
        Events.IngestDoc(3L, "fresh new content", "s1"),
        Events.IngestDoc(5L, "eta theta iota", "s1"),
        Events.IngestDoc(7L, "another novel doc", "s1"))
      query.processAllAvailable()
      assert(kept() == Set(0L, 2L, 4L, 3L, 7L),
        "cross-batch dups drop; novel content admits — D8's exact kept set")
      // the admitted hash equals the batch engine's md5 lane
      val h = spark.table("content_gate").as[Events.KeptDoc].collect()
        .find(_.doc_id == 0L).get.content_hash
      val batchH = Seq(("alpha beta gamma")).toDF("text")
        .select(org.apache.spark.sql.functions.md5($"text")).first().getString(0)
      assert(h == batchH, "state key is the same md5 hex as batch D1/D8")
    } finally query.stop()
  }

  test("streaming EMBEDDING near-dup flagging against a static LSH bucket index " +
      "(G20): stream == batch == the pair face's cross pairs") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ann.Ann
    // planted clusters (the AnnSpec regime): 15 bases x 6 members; the
    // static index is built ONCE from the corpus's hyperplane buckets
    val rng = new scala.util.Random(11)
    val dims = 16
    val bases = (0 until 15).map(_ => Array.fill(dims)(rng.nextGaussian()))
    val corpus = bases.zipWithIndex.flatMap { case (base, c) =>
      (0 until 6).map(m =>
        (c * 10L + m, base.map(x => x + 0.03 * rng.nextGaussian()).toSeq))
    }.toDF("vec_id", "embedding")
    val index = Ann.bucketCorpus(corpus, "vec_id", "embedding", dims, planes = 8)
    // arriving: one fresh member per planted cluster 0..4 (must flag to
    // co-cluster members only) + one novel random vector (must not flag)
    val arriving = (0 until 5).map { c =>
      (1000L + c, bases(c).map(x => x + 0.03 * rng.nextGaussian()).toSeq)
    } :+ (2000L, Array.fill(dims)(rng.nextGaussian()).toSeq)
    def flags(df: org.apache.spark.sql.DataFrame) =
      Ann.nearDupFlags(index, df, "vec_id", "embedding",
        tau = 0.95, dims = dims, planes = 8, probeBits = 1)
    val input = MemoryStream[(Long, Seq[Double])]
    input.addData(arriving: _*)
    val query = flags(input.toDF().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("emb_flags")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("emb_flags").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = flags(arriving.toDF("vec_id", "embedding")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, "stream flags must equal the batch flags")
      // the gate IS the registered pair face's candidate+verify on the
      // union corpus, restricted to (corpus, arriving) cross pairs:
      // probeBits=1 collision is symmetric (ham(b_a,b_c) <= 1 either
      // way), so the one-directional stream probe loses nothing
      val cross = Ann.nearDupPairsLsh(
          corpus.unionAll(arriving.toDF("vec_id", "embedding")),
          "vec_id", "embedding", tau = 0.95, dims = dims,
          planes = 8, probeBits = 1)
        .filter($"id_b" >= 1000L && $"id_a" < 1000L)
        .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
      assert(batch == cross,
        s"gate flags must equal the batch pair face's cross pairs: " +
          s"flags ${batch.size}, cross ${cross.size}")
      // planted expectations: the novel vector never flags; arriving
      // members flag only within their own cluster, with LSH recall
      assert(!batch.exists(_._1 == 2000L), "novel vector must not flag")
      assert(batch.forall { case (a, c) => c / 10 == a - 1000L },
        "flags must stay within the arriving member's own cluster")
      assert(batch.map(_._1).size >= 4,
        s"at least 4 of 5 planted arrivals must flag, got ${batch.map(_._1)}")
    } finally query.stop()
  }

  test("streaming DSIR gate (G21): arrival-time keep set equals the batch H31 " +
      "composition; unknown-bucket grams contribute lambda=0") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.queries.Mix
    // batch truth: the H31 face's per-doc importance (pinned λ model)
    val batch = Mix.dsirImportance(spark, sfDir, "en", 4096)
      .select("doc_id", "importance_x1e6").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .filter($"text".isNotNull).select($"doc_id", $"text")
      .orderBy("doc_id").limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    // median sampled importance as the gate threshold — keep AND drop
    // both nonempty, so the equivalence below has two-sided teeth
    val sampled = docs.flatMap(d => batch.get(d._1)).sorted
    val thr = sampled(sampled.length / 2)
    def gate(df: org.apache.spark.sql.DataFrame) =
      Mix.dsirScored(spark, sfDir, df)
        .filter($"n_feats" >= 1L && $"importance_x1e6" >= thr)
        .select("doc_id")
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val query = gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dsir_gate")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("dsir_gate").collect().map(_.getLong(0)).toSet
      val expect = docs.filter(d => batch.get(d._1).exists(_ >= thr)).map(_._1).toSet
      assert(streamed == expect,
        "stream keep set must equal the batch importance+threshold composition")
      assert(streamed.nonEmpty && streamed.size < docs.size,
        "threshold must split the sample (keep and drop both nonempty)")
    } finally query.stop()
    // λ=0 teeth: find a bucket the fit never populated (guaranteed at
    // this SF: far fewer distinct grams than buckets), then craft a
    // two-word doc whose single bigram hashes there — its importance
    // must read EXACTLY 0 with the gram still counted as a feature
    val present = Mix.dsirLambda(spark, sfDir, "en", 4096)
      .select("bkt").collect().map(_.getLong(0)).toSet
    assert(present.size < 4096,
      "teeth need an unpopulated λ bucket; raise `buckets` if testdata grew")
    val cands = (0 until 400).map(i => (i.toLong, s"zqx$i wvu$i")).toDF("doc_id", "text")
    // score the candidates exactly as the gate does
    val scoredCands = Mix.dsirScored(spark, sfDir, cands)
      .select("doc_id", "n_feats", "importance_x1e6").collect()
    // verify the gate scores against the explicit left-join replay with
    // coalesce(λ, 0) — the exact unknown-bucket semantic, on real plans
    val replayed = cands.limit(50)
      .select($"doc_id", org.apache.spark.sql.functions.explode(
        graft.dedup.Dedup.ngramsFromTokens(
          org.apache.spark.sql.functions.split($"text", " "), 2)).as("gram"))
      .select($"doc_id", org.apache.spark.sql.functions.pmod(
        graft.functions.polyhash($"gram"), lit(4096L)).as("bkt"))
      .join(Mix.dsirLambda(spark, sfDir, "en", 4096)
        .select($"bkt", $"lam_x1e6"), Seq("bkt"), "left")
      .groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.coalesce($"lam_x1e6", lit(0L)))
        .as("replay_x1e6"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scoredMap = scoredCands.map(r => r.getLong(0) -> r.getLong(2)).toMap
    replayed.foreach { case (id, v) =>
      assert(scoredMap(id) == v,
        s"gate score for candidate $id must equal the λ=0 left-join replay")
    }
    val missed = cands.limit(50)
      .select($"doc_id", org.apache.spark.sql.functions.explode(
        graft.dedup.Dedup.ngramsFromTokens(
          org.apache.spark.sql.functions.split($"text", " "), 2)).as("gram"))
      .select(org.apache.spark.sql.functions.pmod(
        graft.functions.polyhash($"gram"), lit(4096L)).as("bkt"))
      .collect().map(_.getLong(0)).count(b => !present.contains(b))
    assert(missed > 0,
      "the candidate set must exercise at least one unknown bucket " +
        "(vocabulary is synthetic — widen the candidate range if this trips)")
  }

  test("streaming IVF probe gate (G22): stream flags == batch flags; " +
      "candidate set == the E3 probe's own; novelty reads as sub-tau cosine") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ann.Ivf
    // planted clusters (the G20 fixture): 15 bases x 6 members; the
    // static index is the E3 coarse quantizer built ONCE on the corpus
    val rng = new scala.util.Random(11)
    val dims = 16
    val bases = (0 until 15).map(_ => Array.fill(dims)(rng.nextGaussian()))
    val corpus = bases.zipWithIndex.flatMap { case (base, c) =>
      (0 until 6).map(m =>
        (c * 10L + m, base.map(x => x + 0.03 * rng.nextGaussian()).toSeq))
    }.toDF("vec_id", "embedding")
    val idx = Ivf.buildIndex(corpus, "vec_id", "embedding", nCells = 8)
    val centers = idx.centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1).toSeq
    val arriving = (0 until 5).map { c =>
      (1000L + c, bases(c).map(x => x + 0.03 * rng.nextGaussian()).toSeq)
    } :+ (2000L, Array.fill(dims)(rng.nextGaussian()).toSeq)
    def flags(df: org.apache.spark.sql.DataFrame) =
      Ivf.ivfNearDupFlags(idx, centers, df, "vec_id", "embedding",
        tau = 0.95, nprobe = 2)
    val input = MemoryStream[(Long, Seq[Double])]
    input.addData(arriving: _*)
    val query = flags(input.toDF().toDF("vec_id", "embedding"))
      .writeStream.format("memory").queryName("ivf_flags")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("ivf_flags").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = flags(arriving.toDF("vec_id", "embedding")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, "stream flags must equal the batch flags")
      // candidate-set equivalence with the registered E3 face's probe:
      // at tau = -1 every probed candidate survives, and ivfTopK at
      // k >= corpus over the SAME nprobe ranks exactly that set (the
      // map-side sorted-literal probe must pick the aggregate's cells)
      val arrDF = arriving.toDF("vec_id", "embedding")
      val gateCands = Ivf.ivfNearDupFlags(idx, centers, arrDF,
          "vec_id", "embedding", tau = -1.0, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val faceCands = Ivf.ivfTopK(
          arrDF.select($"vec_id".as("query_id"),
            graft.ann.Ann.asDouble($"embedding").as("qvec")),
          idx, k = 1000, nprobe = 2)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .toSet
      assert(gateCands == faceCands,
        s"gate candidates must equal the E3 probe's candidate set: " +
          s"gate ${gateCands.size}, face ${faceCands.size}")
      // planted expectations: arrivals flag only within their own
      // cluster; the novel vector probes cells (IVF never misses) but
      // crosses tau nowhere
      assert(!batch.exists(_._1 == 2000L), "novel vector must not flag")
      assert(gateCands.exists(_._1 == 2000L),
        "novel vector must still probe candidates (sub-tau, not absent)")
      assert(batch.forall { case (a, c) => c / 10 == a - 1000L },
        "flags must stay within the arriving member's own cluster")
      assert(batch.map(_._1).size >= 4,
        s"at least 4 of 5 planted arrivals must flag, got ${batch.map(_._1)}")
    } finally query.stop()
  }
}
