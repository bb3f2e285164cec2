package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Random-hyperplane LSH bucket id for an array<double> embedding: bit p of
  * the result is the sign of the dot product with fixed pseudo-random plane
  * p. One fused loop over (planes × dims) — the composable per-plane
  * element_at chain builds a ~planes×dims-node expression tree and
  * re-walks the array per plane.
  */
case class LshBucket(child: Expression, dims: Int, planes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bucket requires array<double>, got ${other.simpleString(10)}")
    }

  /** Flattened [planes][dims] matrix of fixed splitmix64-derived components
    * in [-1, 1) — deterministic across runs and engines. */
  private lazy val planeMatrix: Array[Double] = {
    val m = new Array[Double](planes * dims)
    var p = 0
    while (p < planes) {
      var d = 0
      while (d < dims) {
        m(p * dims + d) = LshBucket.component(p, d)
        d += 1
      }
      p += 1
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(dims, arr.numElements())
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += arr.getDouble(d) * planeMatrix(p * dims + d)
        d += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("planeMatrix", planeMatrix, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = java.lang.Math.min($dims, $arr.numElements());
         |${ev.value} = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += $arr.getDouble($d) * $mat[$p * $dims + $d];
         |  }
         |  if ($dot >= 0) ${ev.value} |= (1L << $p);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  /** Deterministic pseudo-random plane component for (plane, dim) in
    * [-1, 1) — splitmix64 over the coordinate. */
  def component(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 7919L + dim.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }
}
