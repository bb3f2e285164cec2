package graft

import org.apache.spark.sql.functions._

/** Head-to-head of the q_curate_e2e keep-min formulations on an amplified
  * dir: `sbt "Test/runMain graft.CurateProbe /tmp/graft-sf50x"`. Same
  * gate→normalize→hash prefix, three aggregation shapes:
  * packed-long min (HashAggregate), min_by struct (SortAggregate), and
  * row_number window (full-row shuffle + sort). */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("curate-probe")
    val dir = args.headOption.getOrElse("/tmp/graft-sf50x")
    val minQuality = 300L

    def hashed() = {
      val gated = graft.text.TextAnalysis.qualityScore(
        graft.sources.Tables.table(spark, dir, "documents")
          .filter(col("text").isNotNull), "text")
        .filter(col("quality_x1000") >= minQuality)
        .select(col("doc_id"), col("text"), col("quality_x1000"))
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "  +", " "))
      gated.select(col("doc_id"), col("quality_x1000"), md5(norm).as("h"),
        pmod(graft.functions.polyhash(norm), lit(10L)).as("ph"))
    }

    def time(name: String)(thunk: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = thunk
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2fs  n=$n")
    }

    // two passes each: first is cold (plan compile), report both
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      time("packed-min") {
        hashed()
          .select(col("h"), (shiftleft(col("doc_id"), 15)
            .bitwiseOR(shiftleft(col("quality_x1000"), 4))
            .bitwiseOR(col("ph"))).as("packed"))
          .groupBy(col("h")).agg(min(col("packed")).as("p"))
          .count()
      }
      time("min_by-struct") {
        hashed()
          .groupBy(col("h"))
          .agg(min_by(struct(col("doc_id"), col("quality_x1000"), col("ph")),
            col("doc_id")).as("r"))
          .count()
      }
      time("window") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
        hashed().withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).count()
      }
    }
    spark.stop()
  }
}
