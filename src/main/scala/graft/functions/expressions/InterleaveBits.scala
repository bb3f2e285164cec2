package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{Block, CodegenContext, EmptyBlock, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving of N non-negative long columns into one
  * 64-bit sort key: bit b of input j lands at output position
  * `b*N + (N-1-j)` — walking the key in sort order visits the
  * space-filling Z-curve, so rows close in the key are close in EVERY
  * dimension.
  *
  * This is the data-layout primitive behind multi-column clustering
  * (the lakehouse `ZORDER BY`): range-partition + sort by the Z-value
  * before writing and each parquet file covers a small hyper-rectangle of
  * the space — min/max row-group stats then prune scans on ANY of the
  * interleaved columns, where a lexicographic sort prunes only its
  * leading column.
  *
  * Each input uses the low `63/N` bits — bit 63 stays clear, so keys are
  * always non-negative and the signed sort never wraps the curve (caller
  * buckets values into that range — see
  * `graft.sources.Partitioned.zorderKey` for the min/max normalizing
  * wrapper); out-of-range values clamp, preserving order. Null inputs
  * clamp to 0 (sort first).
  */
case class InterleaveBits(children: Seq[Expression]) extends Expression {

  require(children.nonEmpty && children.size <= 8,
    s"interleave_bits takes 1-8 columns, got ${children.size}")

  // 63 usable bits, not 64: bit 63 is the sign bit — a lane bit landing
  // there would make upper-half keys NEGATIVE and signed sort would break
  // the Z-curve at the wrap (and for N=1, (1L << 64) masks to 1L << 0,
  // zeroing the mask entirely)
  val bitsPer: Int = 63 / children.size
  val mask: Long = (1L << bitsPer) - 1L

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits requires bigint inputs, got ${children.map(_.dataType.simpleString(10))}")

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val vs = new Array[Long](n)
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      vs(j) = if (v == null) 0L
        else math.min(math.max(v.asInstanceOf[Long], 0L), mask)
      j += 1
    }
    InterleaveBits.morton(vs, bitsPer)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val vs = ctx.freshName("vs")
    val childCode = evals.map(_.code).foldLeft(EmptyBlock: Block)(_ + _)
    val loads = evals.zipWithIndex.map { case (e, j) =>
      s"$vs[$j] = ${e.isNull} ? 0L : Math.min(Math.max(${e.value}, 0L), ${mask}L);"
    }.mkString("\n")
    ev.copy(isNull = FalseLiteral, code = childCode + code"""
      |long[] $vs = new long[$n];
      |$loads
      |long ${ev.value} =
      |  graft.functions.expressions.InterleaveBits.morton($vs, $bitsPer);
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}

object InterleaveBits {
  /** Interleave the low `bitsPer` bits of each lane, MSB-first — shared by
    * the interpreted and generated paths (and tests' reference calls). */
  def morton(vs: Array[Long], bitsPer: Int): Long = {
    var z = 0L
    var b = bitsPer - 1
    while (b >= 0) {
      var k = 0
      while (k < vs.length) {
        z = (z << 1) | ((vs(k) >>> b) & 1L)
        k += 1
      }
      b -= 1
    }
    z
  }
}
