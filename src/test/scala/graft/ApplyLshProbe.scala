package graft

import org.apache.spark.sql.functions._

/** Stage-level timing probe for the embedding-LSH dedup APPLY face
  * (`q_dedup_apply_lsh`, the r7 verdict's one perf-weak item): splits the
  * pipeline into candidate-gen/verify (the part shared with
  * `q_embedding_neardup_lsh`), pair persist, connected components, the
  * anti-join apply, and the presentation sort, so the unexplained
  * 1.72s→3.97s r5→r7 drift is attributable to a stage.
  *
  * `sbt "Test/runMain graft.ApplyLshProbe [dir] [passes]"` — defaults to
  * sf0.1 and 3 warm passes (median reported; pass 1 separately as cold).
  */
object ApplyLshProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.GraftSession.getOrCreate("apply-lsh-probe")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)

    def emb = graft.sources.Tables.table(spark, dir, "embeddings")
    def lshPairs = graft.ann.Ann.nearDupPairsLsh(
      emb, "vec_id", "embedding", tau = 0.35, dims = 64, planes = 8, probeBits = 1)

    val stages: Seq[(String, () => Long)] = Seq(
      "pairs (cand+verify, no persist)" -> (() => lshPairs.count()),
      "pairs persist+count" -> { () =>
        val p = lshPairs.persist(); val n = p.count(); p.unpersist(); n
      },
      "cc over persisted pairs" -> { () =>
        val p = lshPairs.persist(); p.count()
        val n = graft.dedup.Dedup.connectedComponents(p).count()
        p.unpersist(); n
      },
      "keepCanonical (no orderBy)" -> { () =>
        val p = lshPairs.persist(); p.count()
        val n = graft.dedup.Dedup.keepCanonical(
          emb.select(col("vec_id")), "vec_id", p).count()
        p.unpersist(); n
      },
      "full qDedupApplyLsh" -> (() =>
        graft.queries.LlmOps.qDedupApplyLsh(spark, dir).count()),
      "apply via localCheckpoint" -> { () =>
        // candidate variant: truncate lineage at the (tiny) pair set so
        // cc probe/collect and the anti-join plan one-stage jobs instead
        // of re-planning the full LSH DAG per action
        val p = lshPairs.localCheckpoint()
        graft.dedup.Dedup.keepCanonical(
          emb.select(col("vec_id")), "vec_id", p)
          .orderBy("vec_id").count()
      },
      "sibling q_embedding_neardup_lsh" -> (() =>
        graft.queries.LlmOps.qEmbeddingNearDupLsh(spark, dir).count()),
      "sketch_jaccard (F6b re-measure)" -> (() =>
        graft.queries.LlmOps.qSketchJaccard(spark, dir).count()))

    def time(thunk: () => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = thunk()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // cold pass then `passes` warm passes, per stage
    stages.foreach { case (name, thunk) =>
      val (cold, n) = time(thunk)
      val warm = (1 to passes).map(_ => time(thunk)._1).sorted
      val med = warm(warm.size / 2)
      println(f"$name%-34s cold=$cold%6.2fs warm_med=$med%6.2fs " +
        f"spread=[${warm.head}%.2f..${warm.last}%.2f] n=$n")
    }
    spark.stop()
  }
}
