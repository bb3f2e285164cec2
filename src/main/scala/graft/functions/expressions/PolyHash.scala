package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint:
  * h = fold over Unicode CODE POINTS of (h * B + cp) mod M, with
  * M = 2^31 - 1 (Mersenne; h*B + cp stays < 2^39, no overflow) and B = 131.
  *
  * The classic Rabin–Karp content fingerprint — stable across engines:
  * folding over code points (not UTF-8 bytes or UTF-16 units) is what a
  * character-indexed SQL oracle computes (`ascii(substr(text, i, 1))`
  * walks characters), so parity holds for non-ASCII text too. Native
  * codegen expression: the loop decodes the string's UTF-8 bytes in place
  * inside the generated stage — no String allocation.
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

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val b0 = ctx.freshName("b0")
      val cp = ctx.freshName("cp")
      val len = ctx.freshName("len")
      s"""
         |final byte[] $bytes = $str.getBytes();
         |${ev.value} = 0L;
         |int $i = 0;
         |while ($i < $bytes.length) {
         |  final int $b0 = $bytes[$i] & 0xff;
         |  int $cp; int $len = 1;
         |  if ($b0 < 0x80) { $cp = $b0; }
         |  else if (($b0 & 0xe0) == 0xc0) { $cp = $b0 & 0x1f; $len = 2; }
         |  else if (($b0 & 0xf0) == 0xe0) { $cp = $b0 & 0x0f; $len = 3; }
         |  else { $cp = $b0 & 0x07; $len = 4; }
         |  for (int $j = 1; $j < $len && $i + $j < $bytes.length; $j++) {
         |    $cp = ($cp << 6) | ($bytes[$i + $j] & 0x3f);
         |  }
         |  ${ev.value} = (${ev.value} * ${B}L + $cp) % ${M}L;
         |  $i += $len;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val M: Long = 2147483647L
  final val B: Long = 131L

  /** The interpreted hash — shared with [[SpanHashes]] so the per-token
    * lane of the fused span fold is bit-identical to `polyhash(token)`. */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; len = 2 }
      else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < bytes.length) {
        cp = (cp << 6) | (bytes(i + j) & 0x3f); j += 1
      }
      h = (h * B + cp) % M
      i += len
    }
    h
  }
}
