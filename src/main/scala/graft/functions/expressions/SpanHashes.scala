package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused w-token span-hash stream for exact-substring dedup (D14):
  * given a token array, emit one polynomial hash per w-token window —
  * `out(p) = fold over tokens p..p+w−1 of (h·B + polyhash(tok)) mod M`,
  * positions implied by array index (posexplode downstream).
  *
  * Replaces the composable HOF chain `transform(sequence(0, n−w), p →
  * aggregate(slice(hs, p+1, w), fold))`, which allocates a w-element
  * slice copy plus a boxed fold PER SPAN inside interpreted lambda
  * dispatch — measured 7.8s of q_span_dedup's 11s at sf0.1 for ~236k
  * spans (~4 µs/fold-step, all interpreter overhead). Here: one
  * primitive long[] of token hashes per document, one tight O(n·w)
  * loop, one output allocation. The per-token lane is
  * [[PolyHash.hashUtf8]], so span hashes are bit-identical to the HOF
  * formulation and the DuckDB oracle's character-fold replay.
  *
  * Eval-only (CodegenFallback): the expression is itself the fused
  * loop — per-ROW fallback dispatch (one per document) is noise next
  * to the per-span work it eliminates.
  */
case class SpanHashes(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(w >= 1, s"span width must be >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_hashes requires array<string>, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      // containsNull inputs (e.g. arrays built by transform over nullable
      // columns): a null token hashes to the fixed 0 lane instead of
      // NPE-ing — deterministic, and distinct from every real token's
      // polyhash with probability 1 − 2⁻⁶¹ per token
      val s = arr.getUTF8String(i)
      th(i) = if (s == null) 0L else PolyHash.hashUtf8(s)
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    var p = 0
    while (p <= n - w) {
      var h = 0L
      var k = 0
      while (k < w) {
        h = (h * PolyHash.B + th(p + k)) % PolyHash.M
        k += 1
      }
      out(p) = h
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}
