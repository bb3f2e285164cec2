package graft.catalog

/** Stream registry — the engine analog of the reference's STREAMS config
  * (tap-redshift/src/streams.py:12-50): per-stream source table, key
  * properties, target entity + primary key, replication method/key, and the
  * target-attribute → source-column field mappings.
  */
/** One Draft4-style constraint set for a source column — the declarative
  * form of what the reference's Draft4Validator enforces per record
  * (target-pendo/src/__init__.py:523): required/type/maxLength/minimum/
  * maximum/enum. Checks are GENERATED from these (see
  * graft.target.Validation), never hand-listed. */
final case class FieldRule(
    field: String,
    required: Boolean = false,
    jsonType: Option[String] = None,
    maxLength: Option[Long] = None,
    minimum: Option[Double] = None,
    maximum: Option[Double] = None,
    enumVals: Seq[String] = Nil)

final case class StreamDef(
    streamName: String,
    sourceTable: String,
    targetEntity: String,   // "accounts" | "visitors"
    keyProperties: Seq[String],
    targetPrimaryKey: String,
    replicationMethod: ReplicationMethod,
    replicationKey: Option[String],
    /** target attribute -> source column (streams.py `field_mappings`) */
    fieldMappings: Seq[(String, String)],
    /** target attributes whose Pendo-side type is string (drives int→string
      * coercion, target-pendo/src/__init__.py:543-547) */
    stringTyped: Set[String],
    /** declared record schema: Draft4-style constraints on source columns
      * (the stream's validation contract; empty = no declared schema) */
    recordSchema: Seq[FieldRule] = Nil)

sealed trait ReplicationMethod
object ReplicationMethod {
  case object FullTable extends ReplicationMethod
  case object Incremental extends ReplicationMethod
}

object Streams {

  /** Accounts stream over the customer table (FULL_TABLE, like the
    * reference's pendo_integration_account). */
  val accounts: StreamDef = StreamDef(
    streamName = "warehouse_account",
    sourceTable = "customer",
    targetEntity = "accounts",
    keyProperties = Seq("c_custkey"),
    targetPrimaryKey = "accountId",
    replicationMethod = ReplicationMethod.FullTable,
    replicationKey = None,
    fieldMappings = Seq(
      "accountId" -> "c_custkey",
      "account_name" -> "c_name",
      "nation_key" -> "c_nationkey",
      "account_balance" -> "c_acctbal",
      "market_segment" -> "c_mktsegment"),
    stringTyped = Set("accountId", "account_name", "market_segment"),
    recordSchema = Seq(
      FieldRule("c_custkey", required = true),
      FieldRule("c_acctbal", minimum = Some(0.0)),
      FieldRule("c_name", maxLength = Some(25L))))

  /** Visitors stream over the orders table (INCREMENTAL on o_orderdate,
    * like the reference's pendo_integration_visitor on last_updated). */
  val visitors: StreamDef = StreamDef(
    streamName = "warehouse_visitor",
    sourceTable = "orders",
    targetEntity = "visitors",
    keyProperties = Seq("o_orderkey"),
    targetPrimaryKey = "visitorId",
    replicationMethod = ReplicationMethod.Incremental,
    replicationKey = Some("o_orderdate"),
    fieldMappings = Seq(
      "visitorId" -> "o_orderkey",
      "customer_key" -> "o_custkey",
      "order_status" -> "o_orderstatus",
      "total_price" -> "o_totalprice",
      "order_priority" -> "o_orderpriority"),
    stringTyped = Set("visitorId", "order_status", "order_priority"),
    recordSchema = Seq(
      FieldRule("o_orderstatus", enumVals = Seq("O", "F", "P"))))

  val all: Seq[StreamDef] = Seq(accounts, visitors)
}
