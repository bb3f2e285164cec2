package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries frequent-items summary (heavy hitters) as a mergeable
  * TypedImperativeAggregate — the bounded-memory answer to "what are the
  * top terms" when the term domain is too large to GROUP BY (single-pass
  * over 100 TB, state capped at `k` counters per group regardless of
  * vocabulary size).
  *
  * State: at most k (term, count) counters. Update: increment if present;
  * insert if below capacity; otherwise decrement EVERY counter (dropping
  * zeros) — the classic MG step, amortized O(1) because each global
  * decrement is paid for by k prior increments. Merge (Agarwal et al.
  * 2012, "Mergeable Summaries"): add counts pointwise, then subtract the
  * (k+1)-th largest count from all and drop non-positives — the result
  * is again a valid MG summary of the union.
  *
  * Guarantees: every reported count UNDER-estimates the true count by at
  * most n/(k+1) (n = total items in the group), and any item with true
  * count > n/(k+1) is guaranteed present. Below capacity — fewer than k
  * distinct terms ever seen, so no decrement fires anywhere — counts are
  * EXACT and the output is independent of partitioning: that regime is
  * the DuckDB-oracle check (plain GROUP BY count), the same
  * exact-regime pattern as [[KmvSketch]].
  *
  * Output: map<term, est_count>. Explode + order for top-N consumption.
  */
case class FreqSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_items requires string input, got ${other.simpleString(10)}")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, Long], t: String): Unit = {
    buf.get(t) match {
      case Some(c) => buf.update(t, c + 1L)
      case None if buf.size < k => buf.update(t, 1L)
      case None =>
        // classic MG step: decrement every counter, drop zeros, discard
        // the arrival — amortized O(1), each sweep consumes k increments
        buf.mapValuesInPlace((_, c) => c - 1L).filterInPlace((_, c) => c > 0L)
    }
    ()
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow):
      mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives → ≤ k
      // survivors, still a valid MG summary of the union
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      buf.mapValuesInPlace((_, c) => c - cut).filterInPlace((_, c) => c > 0L)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic map order (term-sorted) so results compare stably
    val sorted = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1)): Array[Any]),
      new GenericArrayData(sorted.map(_._2): Array[Any]))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val byteArrays = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(4 + byteArrays.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(byteArrays(i).length)
      bb.put(byteArrays(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren(0))
}
