package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization kernels (Jégou et al. 2011, "Product Quantization
  * for Nearest Neighbor Search") as fused codegen expressions.
  *
  * The three hot loops of a PQ pipeline — encode a vector to m codebook
  * ids, build a query's per-subspace distance table, and score a candidate
  * by table lookup (ADC) — each run as one primitive loop inside
  * whole-stage codegen. The codebooks ride along as a flattened
  * `double[m·k·dsub]` reference object (a few KB — 8 subspaces × 256
  * centroids × 8 dims ≈ 128 KB worst case), shipped once per executor
  * with the generated class, never per row.
  */
object Pq {
  /** Shared shape validation: codebooks length must be m·k·dsub. */
  private[expressions] def requireShape(codebooks: Array[Double], m: Int,
      k: Int, dsub: Int): Unit =
    require(codebooks.length == m * k * dsub,
      s"codebooks length ${codebooks.length} != m*k*dsub = ${m * k * dsub}")
}

/** array<double> (length ≥ m·dsub) → array<bigint> of m codebook ids:
  * per subspace j, the index of the nearest (squared-L2) of the k
  * centroids. Ties break to the LOWEST id (strict `<`), so the encoding
  * is deterministic across engines and runs. */
case class PqEncode(child: Expression, codebooks: Array[Double],
    m: Int, k: Int, dsub: Int) extends UnaryExpression {

  Pq.requireShape(codebooks, m, k, dsub)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<double>, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val codes = new Array[Long](m)
    var j = 0
    while (j < m) {
      var best = 0L; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d2 = 0.0
        var d = 0
        while (d < dsub) {
          val diff = x.getDouble(j * dsub + d) - codebooks((j * k + c) * dsub + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c.toLong }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val d2 = ctx.freshName("d2"); val diff = ctx.freshName("diff")
      s"""
         |final long[] $codes = new long[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  long $best = 0L; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d2 = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      final double $diff = $x.getDouble($j * $dsub + $d) - $cb[($j * $k + $c) * $dsub + $d];
         |      $d2 += $diff * $diff;
         |    }
         |    if ($d2 < $bestD) { $bestD = $d2; $best = (long) $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Query vector → its ADC distance table: array<double> of m·k entries,
  * entry j·k+c = squared L2 distance of query subvector j to centroid
  * (j, c). Built ONCE per query row; every candidate afterwards costs m
  * array lookups ([[PqAdc]]) instead of m·dsub multiplies — the
  * asymmetric-distance split that makes PQ scanning memory-bound rather
  * than compute-bound. */
case class PqDistTable(child: Expression, codebooks: Array[Double],
    m: Int, k: Int, dsub: Int) extends UnaryExpression {

  Pq.requireShape(codebooks, m, k, dsub)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_dist_table requires array<double>, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val table = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var d2 = 0.0
        var d = 0
        while (d < dsub) {
          val diff = x.getDouble(j * dsub + d) - codebooks((j * k + c) * dsub + d)
          d2 += diff * diff
          d += 1
        }
        table(j * k + c) = d2
        c += 1
      }
      j += 1
    }
    new GenericArrayData(table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val table = ctx.freshName("table")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val d2 = ctx.freshName("d2"); val diff = ctx.freshName("diff")
      s"""
         |final double[] $table = new double[${m * k}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d2 = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      final double $diff = $x.getDouble($j * $dsub + $d) - $cb[($j * $k + $c) * $dsub + $d];
         |      $d2 += $diff * $diff;
         |    }
         |    $table[$j * $k + $c] = $d2;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($table);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

/** (dist table array<double>, codes array<bigint>) → approximate squared
  * L2 distance: Σⱼ table[j·k + codes[j]]. The PQ scan inner loop — m
  * lookups per candidate. */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires (array<double>, array<bigint>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val table = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var sum = 0.0
    var j = 0
    while (j < m) {
      sum += table.getDouble(j * k + codes.getLong(j).toInt)
      j += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val sum = ctx.freshName("sum")
      s"""
         |final int $m = $b.numElements();
         |double $sum = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $sum += $a.getDouble($j * $k + (int) $b.getLong($j));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(left = newLeft, right = newRight)
}
