package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash over an array of 64-bit token hashes.
  *
  * For each bit position b, tallies +1/-1 across token hashes depending on
  * whether bit b is set; the output has bit b set iff the tally is >= 0.
  * Documents differing by a few tokens land within small hamming distance
  * (compare with `bit_count(a ^ b)`).
  *
  * Implemented as a native Catalyst expression with whole-stage codegen
  * (a Scala UDF here would box every array element on the hot path; this
  * runs as a tight primitive loop inside the generated stage).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<bigint>, got ${other.simpleString(10)}")
    }

  @inline private def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var result = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) result |= (1L << b)
      b += 1
    }
    result
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val counts = ctx.addMutableState("int[]", "simhashCounts", v => s"$v = new int[64];")
    nullSafeCodeGen(ctx, ev, arr => {
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      s"""
         |java.util.Arrays.fill($counts, 0);
         |final int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $h = $arr.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (((($h >>> $b) & 1L) == 1L) ? 1 : -1);
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] >= 0) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
