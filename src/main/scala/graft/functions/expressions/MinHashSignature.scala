package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-lane MinHash signature over an array of 64-bit shingle hashes, in ONE
  * pass: for each input hash, all k lane values (rotate-left(1 + j mod 63)
  * XOR a fixed splitmix64 constant — a per-lane bijection) update their
  * minima. The composable formulation (k × array_min(transform(...)))
  * allocates k intermediate arrays per document; this allocates one output.
  *
  * Lane constants match graft.dedup.MinHashLsh.splitmix64 — signatures are
  * interchangeable between the two implementations.
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<bigint>, got ${other.simpleString(10)}")
    }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private lazy val laneXor: Array[Long] = Array.tabulate(numHashes)(j => splitmix64(j.toLong))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val rot = 1 + (j % 63)
        val v = ((h << rot) | (h >>> (64 - rot))) ^ laneXor(j)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xorRef = ctx.addReferenceObj("laneXor", laneXor, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val rot = ctx.freshName("rot")
      val v = ctx.freshName("v")
      s"""
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    final int $rot = 1 + ($j % 63);
         |    final long $v = (($h << $rot) | ($h >>> (64 - $rot))) ^ $xorRef[$j];
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
