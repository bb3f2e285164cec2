package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.bloomMightContain

/** Bloom-prefiltered semi-join — the incremental-sync active-entity filter
  * at the scale where the entity set no longer broadcasts as a hash
  * relation (tap-redshift/src/sync.py:132-156 pushes the Pendo id set into
  * the warehouse query as `pkey = ANY(uuid_set)`; this is the same
  * pushdown with Bloom bits standing in for the literal set).
  *
  * Shape: aggregate the dim keys into one Bloom filter (distributed
  * partial filters, OR-merged — `DataFrameStatFunctions.bloomFilter`),
  * probe the fact side map-side (no shuffle, filter runs at the scan), and
  * let only the surviving sliver pay the exact semi-join that removes the
  * false positives. Result is EXACTLY the semi-join — the Bloom stage is
  * a transparent prefilter, so the operator stays oracle-checkable.
  */
object BloomSemiJoin {

  /** Serialized Bloom filter over `dim.keyCol` (bigint or string). */
  def buildBloom(dim: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = dim.stat.bloomFilter(keyCol, expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Map-side membership prefilter: keeps every fact row whose key the
    * filter might contain (superset of the exact match set). */
  def prefilter(fact: DataFrame, keyCol: String, bloomBytes: Array[Byte]): DataFrame =
    fact.filter(bloomMightContain(col(keyCol), bloomBytes))

  /** Exact semi-join via Bloom prefilter + residual left-semi join. With a
    * selective filter the exact join sees orders of magnitude fewer probe
    * rows; its build side is the deduplicated key column only. */
  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bytes = buildBloom(dim, dimKey, expectedItems, fpp)
    val pre = prefilter(fact, factKey, bytes)
    val dimKeys = dim.select(col(dimKey)).distinct()
    // dataset-qualified references: factKey and dimKey may share a name
    pre.join(dimKeys, pre(factKey) === dimKeys(dimKey), "left_semi")
  }
}
