package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed candidate-pair generation shared by the LSH-family dedup
  * operators (MinHash bands, SimHash chunks): self-join rows that share a
  * bucket key, with a hard cap on degenerate buckets.
  *
  * A bucket of B members contributes B² clique pairs — one boilerplate-heavy
  * bucket can dwarf (or OOM) the whole job at corpus scale. Buckets above
  * `maxBucketSize` emit STAR pairs instead: every member paired with the
  * bucket's minimum id. Clone clusters keep their recall (each member still
  * reaches a canonical representative, and transitively the cluster) at B−1
  * output rows per bucket instead of B².
  *
  * Plan shape: ONE window pass over the bucket key computes both the bucket
  * size and the canonical min id, so the banded input is exchanged once and
  * Spark's ReusedExchange covers every branch (sizes/small/big previously
  * re-derived the explode three times). The only other wide op is the
  * small-bucket self-join, keyed on the bucket key.
  */
object Buckets {

  /** Distinct (id_a, id_b) pairs (id_a < id_b) of rows sharing a bucket.
    * `keyCols` name the bucket key columns in `banded`; `idCol` the member
    * id. */
  def cappedSelfJoin(
      banded: DataFrame, keyCols: Seq[String], idCol: String,
      maxBucketSize: Int): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
    val sized = banded.select(
      (keyCols.map(col) :+ col(idCol)) ++ Seq(
        count(lit(1)).over(w).as("__n"),
        min(col(idCol)).over(w).as("__min_id")): _*)

    val small = sized.filter(col("__n") <= maxBucketSize)
    val l = small.select(keyCols.map(col) :+ col(idCol).as("id_a"): _*)
    val r = small.select(
      keyCols.map(c => col(c).as(s"__r_$c")) :+ col(idCol).as("id_b"): _*)
    val cliquePairs = l.join(r,
        keyCols.map(c => col(c) === col(s"__r_$c")).reduce(_ && _) &&
          col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))

    val starPairs = sized.filter(col("__n") > maxBucketSize)
      .filter(col(idCol) =!= col("__min_id"))
      .select(col("__min_id").as("id_a"), col(idCol).as("id_b"))

    cliquePairs.unionAll(starPairs).distinct()
  }
}
