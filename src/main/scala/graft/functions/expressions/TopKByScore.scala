package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded top-k aggregate: keeps the k best (score, id) pairs, ordered by
  * score DESC with id ASC tiebreak — the aggregate form of
  * `row_number() OVER (ORDER BY score DESC, id) <= k`.
  *
  * Why not the window: ranking N·Q scored rows through a window shuffles
  * ALL of them before the rank filter drops everything past k. As a
  * TypedImperativeAggregate the partial (map-side) aggregation already
  * reduces each partition to ≤k entries per group, so the exchange carries
  * `partitions × k` rows per group instead of N — the per-partition
  * bounded-heap → merge pattern, run by ObjectHashAggregateExec.
  *
  * Result: array<struct<sim double, neighbor_id bigint>> sorted best-first
  * (explode + pos+1 reproduces the window's rank exactly, ties included).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_by_score requires (double, bigint), got $other")
    }

  /** Best-first total order matching `ORDER BY score DESC, id ASC` in
    * Spark SQL exactly, NaN included: java.lang.Double.compare ranks NaN
    * above +Infinity, so under DESC a NaN score sorts FIRST — same as the
    * window this aggregate replaces. (A naive (-score, id) tuple key would
    * instead evict NaN rows.) The priority queue dequeues the maximum =
    * the WORST element under this ordering. */
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // descending, NaN greatest
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def add(
      buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending by (-score, id) == best first
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
