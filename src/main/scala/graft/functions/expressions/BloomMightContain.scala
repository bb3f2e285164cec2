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
  * The cache is a small LRU of STRONG references (`maxFilters` entries):
  * a count bound, not a GC-driven one — soft references would be cleared
  * under exactly the heap pressure a resident GB-scale filter creates,
  * degrading back to per-task deserialization. A job cycling more than
  * `maxFilters` distinct filters per executor re-pays deserialization on
  * the evicted ones; that is the documented trade for bounded memory.
  *
  * Keys include the application id: in a shared JVM (local mode, tests)
  * a restarted SparkContext reissues broadcast ids from 0, and a bare
  * bc.id key would silently serve the PREVIOUS app's bits. */
object BloomFilters {
  private val maxFilters = 4
  private val cache = new java.util.LinkedHashMap[String, BloomFilter](8, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, BloomFilter]): Boolean =
      size() > maxFilters
  }

  def filterFor(bc: Broadcast[Array[Byte]]): BloomFilter = {
    val appId = Option(org.apache.spark.SparkEnv.get)
      .map(_.conf.get("spark.app.id", "?")).getOrElse("?")
    val key = s"$appId:${bc.id}"
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    // deserialize OUTSIDE the lock: a GB-scale read must not block other
    // filters' probes; two tasks racing a miss both deserialize and the
    // first put wins — harmless duplicate work, transient duplicate heap
    val f = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bc.value))
    cache.synchronized {
      val prev = cache.get(key)
      if (prev != null) prev
      else { cache.put(key, f); f }
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
