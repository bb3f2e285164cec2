package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact set-Jaccard (×1000, floor) of two array<bigint> columns as one
  * fused sort-merge — semantically identical to
  * `1000 * |distinct(a) ∩ distinct(b)| / |distinct(a) ∪ distinct(b)|`
  * (graft.dedup.Dedup.jaccardX1000 over long arrays, and DuckDB's
  * list_intersect/list_distinct formulation) but in one pass: the
  * composable form materializes three intermediate arrays per pair
  * (distinct×2, concat) plus hash sets inside array_intersect, and on a
  * near-dup verify stage the per-pair cost IS the stage cost. Here both
  * arrays are cloned once, primitively sorted, and a dual-pointer merge
  * counts distincts and intersections with zero further allocation. */
object JaccardKernel {
  /** 0 when both sets are empty (two too-short docs are NOT duplicates —
    * 0/0 must not read as similarity 1). */
  def jaccardX1000(xs: Array[Long], ys: Array[Long]): Long = {
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    jaccardX1000Sorted(xs, ys)
  }

  /** Merge-only variant for inputs already sorted ASCENDING (signed) —
    * e.g. Dedup.hashedNgrams output, sorted once per document instead of
    * once per candidate pair. Unsorted input silently produces wrong
    * results; callers own the precondition. */
  def jaccardX1000Sorted(xs: Array[Long], ys: Array[Long]): Long = {
    var i = 0; var j = 0
    var da = 0L; var db = 0L; var inter = 0L
    while (i < xs.length || j < ys.length) {
      if (j >= ys.length || (i < xs.length && xs(i) < ys(j))) {
        val v = xs(i); da += 1
        while (i < xs.length && xs(i) == v) i += 1
      } else if (i >= xs.length || ys(j) < xs(i)) {
        val v = ys(j); db += 1
        while (j < ys.length && ys(j) == v) j += 1
      } else {
        val v = xs(i); da += 1; db += 1; inter += 1
        while (i < xs.length && xs(i) == v) i += 1
        while (j < ys.length && ys(j) == v) j += 1
      }
    }
    val union = da + db - inter
    if (union == 0L) 0L else 1000L * inter / union
  }
}

case class LongSetJaccard(left: Expression, right: Expression,
    /** inputs pre-sorted ascending (signed) → skip the per-pair sort */
    assumeSorted: Boolean = false) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_set_jaccard requires (array<bigint>, array<bigint>), got $other")
    }

  private def kernel: String = if (assumeSorted) "jaccardX1000Sorted" else "jaccardX1000"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toLongArray()
    val ys = b.asInstanceOf[ArrayData].toLongArray()
    if (assumeSorted) JaccardKernel.jaccardX1000Sorted(xs, ys)
    else JaccardKernel.jaccardX1000(xs, ys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.expressions.JaccardKernel.$kernel(
         |  $a.toLongArray(), $b.toLongArray());
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSetJaccard =
    copy(left = newLeft, right = newRight)
}
