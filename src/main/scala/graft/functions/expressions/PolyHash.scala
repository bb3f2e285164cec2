package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint:
  * h = fold over utf-8 bytes of (h * B + byte) mod M, with M = 2^31 - 1
  * (Mersenne; h*B stays < 2^62, no overflow) and B = 131.
  *
  * The classic Rabin–Karp content fingerprint — stable across engines and
  * cheap enough to compute inline during a scan. Native codegen expression:
  * the loop runs over the string's raw bytes inside the generated stage.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  final val M: Long = 2147483647L
  final val B: Long = 131L

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"polyhash requires string, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * B + (bytes(i) & 0xffL)) % M
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $bytes = $str.getBytes();
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value} = (${ev.value} * ${B}L + ($bytes[$i] & 0xffL)) % ${M}L;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
