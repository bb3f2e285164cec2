package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter (Spark's
  * `org.apache.spark.util.sketch.BloomFilter` bit array, serialized):
  * `false` ⇒ definitely absent, `true` ⇒ present with ≥ (1 - fpp)
  * confidence.
  *
  * This is the semi-join scale hatch: when the build side's key set is too
  * large to broadcast as a hash relation (a billion 36-byte UUIDs ≫ the
  * broadcast threshold) but its Bloom bits still fit comfortably in an
  * executor (n=1e9, fpp=0.03 ≈ 0.9 GB), the probe side filters map-side
  * against the shared filter and only the surviving sliver pays the exact
  * join — the same runtime-row-level-filtering idea Spark applies
  * automatically to shuffle joins, made explicit and composable (usable
  * inside lambda functions, streaming filters, and sinks).
  *
  * The filter deserializes ONCE per executor: the bytes live in the plan,
  * the `BloomFilter` object is a lazy val materialized on first eval and
  * shipped to generated code as a reference object.
  *
  * Supports bigint keys (hashed with the sketch's putLong hash) and string
  * keys (putBinary over UTF-8 bytes — matches
  * `DataFrameStatFunctions.bloomFilter` on a string column).
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires bigint or string, got ${other.simpleString(10)}")
    }

  @transient lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => filter.mightContainLong(input.asInstanceOf[Long])
    case StringType => filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, v => s"$bf.mightContainLong($v)")
      case StringType =>
        defineCodeGen(ctx, ev, v => s"$bf.mightContainBinary($v.getBytes())")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  // Array[Byte] has reference equality; compare filter content so plan
  // canonicalization (e.g. ReuseExchange) sees identical probes as equal
  override def equals(other: Any): Boolean = other match {
    case BloomMightContain(c, b) =>
      c == child && java.util.Arrays.equals(b, bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}
