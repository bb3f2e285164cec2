package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** JSONL/CSV ingest + sized JSONL export round-trips. */
class TextFormatsSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toString
    d
  }

  test("jsonl round-trip: sharded export re-reads to the same rows") {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val out = tmpDir("jsonl")
    val shards = TextFormats.writeJsonlSharded(docs, out, targetBytes = 64 * 1024)
    val files = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.endsWith(".txt"))
    assert(files.length == shards, "one file per shard")
    assert(shards > 1, "64k target over the corpus must split")
    // every shard lands near the target (the whole point of sizing)
    val sizes = files.map(f => Files.size(Paths.get(f)))
    assert(sizes.forall(s => s < 3 * 64 * 1024), s"oversized shard: ${sizes.toSeq}")
    // cache before corrupt-only predicates: Spark disallows raw-file
    // queries that reference ONLY the corrupt record column
    val back = TextFormats.readJsonl(spark, out,
      "doc_id BIGINT, text STRING, lang STRING").cache()
    back.count()
    assert(back.filter(col("_corrupt").isNotNull).count() == 0)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.select(col("doc_id"), col("text"), col("lang"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("jsonl read: malformed lines degrade to _corrupt, never fail") {
    val dir = tmpDir("badjsonl")
    Files.write(Paths.get(dir, "part-0.txt"), java.util.Arrays.asList(
      """{"id": 1, "t": "ok"}""",
      """not json at all""",
      """{"id": 3, "t": "fine"}"""))
    val df = TextFormats.readJsonl(spark, dir, "id BIGINT, t STRING").cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt").isNotNull).count() == 1)
    assert(df.filter(col("_corrupt").isNull).select(sum(col("id")))
      .first().getLong(0) == 4L)
  }

  test("csv read: declared schema, header, quoted delimiter survives") {
    val dir = tmpDir("csv")
    Files.write(Paths.get(dir, "data.csv"), java.util.Arrays.asList(
      "id,name,score",
      "1,\"alpha, quoted\",3.5",
      "2,beta,4.0"))
    val df = TextFormats.readCsv(spark, dir, "id BIGINT, name STRING, score DOUBLE")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "alpha, quoted")
    assert(rows(1).getDouble(2) == 4.0)
  }

  test("orc round-trip: timestamps and float arrays survive bit-exact") {
    val events = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val emb = graft.sources.Tables.table(spark, sfDir, "embeddings")
    val eOut = tmpDir("orc-events"); val mOut = tmpDir("orc-emb")
    TextFormats.writeOrc(events, eOut)
    TextFormats.writeOrc(emb, mOut)
    assert(TextFormats.readOrc(spark, eOut).exceptAll(events).isEmpty
      && events.exceptAll(TextFormats.readOrc(spark, eOut)).isEmpty,
      "event rows (incl. micros timestamps) must round-trip")
    assert(TextFormats.readOrc(spark, mOut).exceptAll(emb).isEmpty
      && emb.exceptAll(TextFormats.readOrc(spark, mOut)).isEmpty,
      "embedding rows (array<float>) must round-trip")
  }

  test("orc scans push filters and prune columns like parquet") {
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val out = tmpDir("orc-push")
    TextFormats.writeOrc(docs, out)
    val q = TextFormats.readOrc(spark, out)
      .filter(col("doc_id") > 400L).select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,400)"),
      s"predicate must reach the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"scan must read only the projected columns:\n$plan")
    assert(q.count() == docs.filter(col("doc_id") > 400L).count())
  }

  test("empty input exports a single empty shard without failing") {
    val out = tmpDir("jsonl-empty")
    val empty = graft.sources.Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") < 0)
    val shards = TextFormats.writeJsonlSharded(empty, out)
    assert(shards == 1)
    assert(TextFormats.readJsonl(spark, out, "doc_id BIGINT").count() == 0)
  }
}
