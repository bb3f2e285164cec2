package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Executor-global filter cache keyed by broadcast id: the serialized bits
  * travel as a broadcast (fetched once per executor), and the DESERIALIZED
  * `BloomFilter` is also materialized once per executor here — not per
  * task, which is what a plan-embedded byte array or a per-instance lazy
  * val would cost (each task deserializes the task binary, so anything
  * reachable from the expression tree is rebuilt per task; at the ~GB
  * filter sizes this operator exists for, per-task deserialization IS the
  * job's runtime).
  *
  * Values are SoftReferences, so a long-lived executor that has seen many
  * distinct filters sheds the cold ones under memory pressure instead of
  * growing without bound; tasks actively probing hold a strong reference
  * (the codegen'd mutable state / the expression's lazy val), so an
  * in-use filter is never collected mid-task. Cleared entries are pruned
  * on the next miss. */
object BloomFilters {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.ref.SoftReference[BloomFilter]]()

  def filterFor(bc: Broadcast[Array[Byte]]): BloomFilter = {
    val ref = cache.get(bc.id)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit
    else {
      val it = cache.entrySet().iterator()
      while (it.hasNext) if (it.next().getValue.get() == null) it.remove()
      // two tasks racing a miss both deserialize; last put wins — harmless
      val f = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bc.value))
      cache.put(bc.id, new java.lang.ref.SoftReference(f))
      f
    }
  }

  /** Driver-side broadcast dedup: probe Columns are often re-constructed
    * from the same serialized filter (per micro-batch, per
    * incrementalSlice call) — without dedup every construction ships and
    * caches a fresh copy of identical bits. Key = content digest +
    * application id (a restarted SparkContext must not resurrect a dead
    * handle). Distinct filters still accumulate for the app's lifetime —
    * callers cycling many genuinely different filters should broadcast
    * themselves and unpersist when done. */
  private val broadcasts =
    new java.util.concurrent.ConcurrentHashMap[String, Broadcast[Array[Byte]]]()

  def broadcastFor(bytes: Array[Byte]): Broadcast[Array[Byte]] = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val digest = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes))
    broadcasts.computeIfAbsent(s"${sc.applicationId}:${bytes.length}:$digest",
      _ => sc.broadcast(bytes))
  }
}

/** Membership probe against a pre-built Bloom filter (Spark's
  * `org.apache.spark.util.sketch.BloomFilter` bit array, broadcast as
  * serialized bytes): `false` ⇒ definitely absent, `true` ⇒ present with
  * ≥ (1 - fpp) confidence.
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
  * The expression carries only the broadcast HANDLE; bits ship via the
  * broadcast mechanism and deserialize once per executor (see
  * [[BloomFilters]]).
  *
  * Supports bigint keys (hashed with the sketch's putLong hash) and string
  * keys (putBinary over UTF-8 bytes — matches
  * `DataFrameStatFunctions.bloomFilter` on a string column).
  */
case class BloomMightContain(child: Expression, bloomBc: Broadcast[Array[Byte]])
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

  @transient private lazy val filter: BloomFilter = BloomFilters.filterFor(bloomBc)

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => filter.mightContainLong(input.asInstanceOf[Long])
    case StringType => filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      "org.apache.spark.broadcast.Broadcast")
    // lazy per-generated-class handle; the heavy lifting (fetch +
    // deserialize) happens once per executor inside BloomFilters
    val f = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter", "bloomFilter")
    val probe = child.dataType match {
      case LongType => (v: String) => s"$f.mightContainLong($v)"
      case StringType => (v: String) => s"$f.mightContainBinary($v.getBytes())"
    }
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($f == null) {
         |  $f = graft.functions.expressions.BloomFilters.filterFor($bcRef);
         |}
         |${ev.value} = ${probe(v)};
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
