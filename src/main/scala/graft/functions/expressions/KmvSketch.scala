package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Aggregation state for [[KmvSketch]]: the bounded max-heap of kept
  * hashes plus a HashSet mirror for O(1) duplicate rejection — without
  * it, every candidate insert scans the whole up-to-k heap (O(rows·k)
  * at k=8192 is billions of comparisons on a large group). */
final class KmvBuffer {
  // PriorityQueue dequeues the MAXIMUM under its ordering; with the
  // UNSIGNED ascending order the head is the largest kept hash — the one
  // to evict. Unsigned compare keeps the unit-interval mapping monotone
  // (hashes span the full 64-bit range).
  val heap: mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long](KmvBuffer.unsignedAsc)
  val members: mutable.HashSet[Long] = mutable.HashSet.empty[Long]
}

object KmvBuffer {
  val unsignedAsc: Ordering[Long] = new Ordering[Long] {
    override def compare(a: Long, b: Long): Int = java.lang.Long.compareUnsigned(a, b)
  }
}

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate — the mergeable cardinality sketch
  * (Bar-Yossef et al. 2002; the theta-sketch family's simplest member).
  *
  * State: the k smallest 64-bit hashes of the values seen, as a bounded
  * max-heap. If the k-th smallest hash maps to position θ = kth/2^64 of
  * the unit interval, the estimate is (k-1)/θ. Standard error ≈
  * 1/√(k-2) — k=1024 gives ~3%. Exactly-k-or-fewer longs of state make
  * the partial (map-side) buffer constant-size, so the exchange carries
  * `partitions × k` longs per group where approx_count_distinct-style
  * accuracy is wanted with MERGEABILITY across arbitrary re-partitioning
  * — union of sketches = sketch of union, proven in the spec.
  *
  * vs HLL (Spark's approx_count_distinct): KMV supports set
  * INTERSECTION estimates (Jaccard between sketches by hash overlap,
  * the MinHash connection) and exact counts below k (θ path not taken —
  * buffer holds every distinct hash). Hashing: xxhash64 of the value's
  * string form, matching `xxhash64(cast(v as string))` semantics.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    /** true → return the sketch itself (sorted array of kept hashes,
      * sign-flipped so SIGNED ascending == unsigned ascending; feeds
      * array_union/array_intersect set estimators like kmvJaccardX1000)
      * instead of the cardinality estimate. */
    asArray: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  require(k > 2, "k must exceed 2 (estimate uses (k-1)/theta)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (asArray) ArrayType(LongType, containsNull = false) else LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_distinct requires string/int/bigint input, got $other")
    }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer

  private def hashOf(v: Any): Long = v match {
    case s: UTF8String => org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(s, StringType, 42L)
    case l: Long => org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(l, LongType, 42L)
    case i: Int => org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(i.toLong, LongType, 42L)
  }

  private def add(buf: KmvBuffer, h: Long): Unit =
    if (!buf.members.contains(h)) {
      if (buf.heap.size < k) {
        buf.heap.enqueue(h)
        buf.members.add(h); ()
      } else if (java.lang.Long.compareUnsigned(h, buf.heap.head) < 0) {
        buf.members.remove(buf.heap.dequeue())
        buf.heap.enqueue(h)
        buf.members.add(h); ()
      }
    }

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) add(buf, hashOf(v))
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    other.heap.foreach(add(buf, _))
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    if (asArray)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        buf.heap.toArray.map(_ ^ Long.MinValue).sorted)
    else if (buf.heap.size < k) buf.heap.size.toLong // exact below capacity
    else {
      // theta = kth smallest hash as a fraction of 2^64 (unsigned)
      val kth = buf.heap.head
      val theta = math.max(
        ((kth >>> 1).toDouble * 2.0 + (kth & 1L).toDouble) / 1.8446744073709552e19,
        java.lang.Double.MIN_VALUE)
      math.round((k - 1).toDouble / theta)
    }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.heap.size * 8)
    bb.putInt(buf.heap.size)
    buf.heap.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val h = bb.getLong
      buf.heap.enqueue(h)
      buf.members.add(h)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0))
}
