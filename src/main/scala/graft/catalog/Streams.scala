package graft.catalog

/** Stream registry — the engine analog of the reference's STREAMS config
  * (tap-redshift/src/streams.py:12-50): per-stream source table, key
  * properties, target entity + primary key, replication method/key, and the
  * target-attribute → source-column field mappings.
  */
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
    stringTyped: Set[String])

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
    stringTyped = Set("accountId", "account_name", "market_segment"))

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
    stringTyped = Set("visitorId", "order_status", "order_priority"))

  val all: Seq[StreamDef] = Seq(accounts, visitors)
}
