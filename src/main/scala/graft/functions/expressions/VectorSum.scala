package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise sum of array<double> vectors — the mergeable aggregate
  * behind per-group centroids (mean = sum / count).
  *
  * Why not posexplode + groupBy(group, pos) + sum: that plan works but its
  * exchange carries groups × dim ROWS and pays a per-element shuffle-write;
  * as a TypedImperativeAggregate the map-side partial is ONE dim-length
  * buffer per (group, partition), merged buffer-at-a-time — the natural
  * vector-reduction shape (what MLlib's summarizers do internally).
  * Runs under ObjectHashAggregateExec with partial + final phases.
  *
  * Null arrays are skipped; null ELEMENTS are treated as 0 (consistent
  * with sum() skipping nulls elementwise). Mismatched dimensions fail fast
  * with a clear error — silently zip-truncating would corrupt centroids.
  * Groups with no non-null input evaluate to NULL.
  */
case class VectorSum(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vec.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_sum requires array<double>, got $other")
    }

  /** Empty array = "no input yet" sentinel (a real zero-length vector sums
    * to the same thing, so the conflation is harmless). */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def addInto(buf: Array[Double], v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val target =
      if (buf.length == 0) new Array[Double](n)
      else if (buf.length == n) buf
      else throw new IllegalArgumentException(
        s"vector_sum: inconsistent dimensions ${buf.length} vs $n")
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) target(i) += v.getDouble(i)
      i += 1
    }
    target
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = vec.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.length == 0) buf
    else if (buf.length == 0) other
    else if (buf.length != other.length)
      throw new IllegalArgumentException(
        s"vector_sum: inconsistent dimensions ${buf.length} vs ${other.length}")
    else {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSum =
    copy(vec = newChildren(0))
}
