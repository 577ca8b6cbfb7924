package graft.eth

import org.apache.spark.sql.types._

/** Schema registry: the six tables of the reference data model, as Spark
  * `StructType`s (ref: scripts/schema.cql:1-102), plus the raw record shapes
  * produced by extraction and the CSV-dialect column orders
  * (ref: scripts/eth_csv_export.py:33-115).
  *
  * The reference drives its write path off the live table schema
  * (scripts/eth_cassandra_streaming.py:248-260); here the `StructType` *is*
  * the contract, and [[projectTo]] reproduces the "project to exactly the
  * table's columns" discipline.
  */
object EthSchemas {

  /** varint (arbitrary-precision) columns: wei values, difficulties, gas
    * prices. Decimal(38,0) covers every realistic value (total ether supply
    * has 27 digits); full uint256 would need hex-string fallback (SURVEY §1.2).
    */
  val Varint: DecimalType = DecimalType(38, 0)

  /** `block` table (ref: scripts/schema.cql:5-27). */
  val block: StructType = StructType(Seq(
    StructField("block_id_group", IntegerType, nullable = false),
    StructField("block_id", IntegerType, nullable = false),
    StructField("block_hash", BinaryType),
    StructField("parent_hash", BinaryType),
    StructField("nonce", BinaryType),
    StructField("sha3_uncles", BinaryType),
    StructField("logs_bloom", BinaryType),
    StructField("transactions_root", BinaryType),
    StructField("state_root", BinaryType),
    StructField("receipts_root", BinaryType),
    StructField("miner", BinaryType),
    StructField("difficulty", Varint),
    StructField("total_difficulty", Varint),
    StructField("size", IntegerType),
    StructField("extra_data", BinaryType),
    StructField("gas_limit", IntegerType),
    StructField("gas_used", IntegerType),
    StructField("base_fee_per_gas", LongType),
    StructField("timestamp", IntegerType),
    StructField("transaction_count", ShortType)))

  /** `transaction` table (ref: scripts/schema.cql:29-53); receipt_* columns
    * are landed by the enrichment join (J1). */
  val transaction: StructType = StructType(Seq(
    StructField("tx_hash_prefix", StringType, nullable = false),
    StructField("tx_hash", BinaryType, nullable = false),
    StructField("nonce", IntegerType),
    StructField("block_hash", BinaryType),
    StructField("block_id", IntegerType),
    StructField("transaction_index", ShortType),
    StructField("from_address", BinaryType),
    StructField("to_address", BinaryType),
    StructField("value", Varint),
    StructField("gas", IntegerType),
    StructField("gas_price", Varint),
    StructField("input", BinaryType),
    StructField("block_timestamp", IntegerType),
    StructField("max_fee_per_gas", LongType),
    StructField("max_priority_fee_per_gas", LongType),
    StructField("transaction_type", LongType),
    StructField("receipt_cumulative_gas_used", Varint),
    StructField("receipt_gas_used", Varint),
    StructField("receipt_contract_address", BinaryType),
    StructField("receipt_root", BinaryType),
    StructField("receipt_status", LongType),
    // bigint per the contract (ref: scripts/schema.cql:51) — NOT varint like
    // gas_price/receipt_cumulative_gas_used/receipt_gas_used (:39,:47,:48)
    StructField("receipt_effective_gas_price", LongType)))

  /** `trace` table (ref: scripts/schema.cql:55-77). */
  val trace: StructType = StructType(Seq(
    StructField("block_id_group", IntegerType, nullable = false),
    StructField("block_id", IntegerType, nullable = false),
    StructField("trace_index", IntegerType, nullable = false),
    StructField("tx_hash", BinaryType),
    StructField("transaction_index", ShortType),
    StructField("from_address", BinaryType),
    StructField("to_address", BinaryType),
    StructField("value", Varint),
    StructField("input", BinaryType),
    StructField("output", BinaryType),
    StructField("trace_type", StringType),
    StructField("call_type", StringType),
    StructField("reward_type", StringType),
    StructField("gas", IntegerType),
    StructField("gas_used", IntegerType),
    StructField("subtraces", IntegerType),
    StructField("trace_address", StringType),
    StructField("error", StringType),
    StructField("status", ShortType),
    StructField("trace_id", StringType)))

  /** `log` table (ref: scripts/schema.cql:90-102). */
  val log: StructType = StructType(Seq(
    StructField("block_id_group", IntegerType, nullable = false),
    StructField("block_id", IntegerType, nullable = false),
    StructField("log_index", IntegerType, nullable = false),
    StructField("tx_hash", BinaryType),
    StructField("address", BinaryType),
    StructField("data", BinaryType),
    StructField("topics", ArrayType(BinaryType)),
    StructField("topic0", BinaryType)))

  /** `exchange_rates` table (ref: scripts/schema.cql:79-82). */
  val exchangeRates: StructType = StructType(Seq(
    StructField("date", StringType, nullable = false),
    StructField("fiat_values", MapType(StringType, FloatType))))

  /** `configuration` table (ref: scripts/schema.cql:84-88). */
  val configuration: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("block_bucket_size", IntegerType),
    StructField("tx_prefix_length", IntegerType)))

  /** CSV-dialect column orders — byte-for-byte the reference's per-table
    * header lists, in the reference's pinned order (BLOCK_HEADER
    * ref: scripts/eth_csv_export.py:33-54, TX_HEADER :56-78, TRACE_HEADER
    * :80-101, LOGS_HEADER :103-114). The CSV path keeps hex strings instead
    * of binary; transactions carry no `block_id_group` (only blocks, traces
    * and logs do, matching the reference headers exactly). Columns the
    * engine's source does not supply are still written (empty), because the
    * reference's DictWriter emits every header field. */
  val csvBlockColumns: Seq[String] = Seq(
    "parent_hash", "nonce", "sha3_uncles", "logs_bloom", "transactions_root",
    "state_root", "receipts_root", "miner", "difficulty", "total_difficulty",
    "size", "extra_data", "gas_limit", "gas_used", "timestamp",
    "transaction_count", "base_fee_per_gas", "block_id", "block_id_group",
    "block_hash")

  val csvTransactionColumns: Seq[String] = Seq(
    "nonce", "transaction_index", "from_address", "to_address", "value",
    "gas", "gas_price", "input", "block_timestamp", "block_hash",
    "max_fee_per_gas", "max_priority_fee_per_gas", "transaction_type",
    "receipt_cumulative_gas_used", "receipt_gas_used",
    "receipt_contract_address", "receipt_root", "receipt_status",
    "receipt_effective_gas_price", "tx_hash", "tx_hash_prefix", "block_id")

  val csvTraceColumns: Seq[String] = Seq(
    "transaction_index", "from_address", "to_address", "value", "input",
    "output", "trace_type", "call_type", "reward_type", "gas", "gas_used",
    "subtraces", "trace_address", "error", "status", "trace_id",
    "trace_index", "tx_hash", "block_id", "block_id_group")

  val csvLogColumns: Seq[String] = Seq(
    "block_id_group", "block_id", "block_hash", "address", "data", "topics",
    "topic0", "tx_hash", "log_index", "transaction_index")

  /** Blob (0x-hex encoded) columns per raw stream — the per-table lists the
    * binary dialect converts (ref: block scripts/eth_cassandra_streaming.py:378-389,
    * tx :414-422, trace :448, log :331-337). */
  val blockBlobColumns: Seq[String] = Seq(
    "block_hash", "parent_hash", "nonce", "sha3_uncles", "logs_bloom",
    "transactions_root", "state_root", "receipts_root", "miner", "extra_data")

  val transactionBlobColumns: Seq[String] = Seq(
    "tx_hash", "block_hash", "from_address", "to_address", "input",
    "receipt_contract_address", "receipt_root")

  val traceBlobColumns: Seq[String] = Seq(
    "tx_hash", "from_address", "to_address", "input", "output")

  val logBlobColumns: Seq[String] = Seq(
    "tx_hash", "address", "data")

  /** All six tables by name, for DDL-registry style access (K5). */
  val tables: Map[String, StructType] = Map(
    "block" -> block,
    "transaction" -> transaction,
    "trace" -> trace,
    "log" -> log,
    "exchange_rates" -> exchangeRates,
    "configuration" -> configuration)

  /** K5, DDL form: render a table's registry entry as a `CREATE TABLE`
    * statement (the engine-side equivalent of the reference executing
    * scripts/schema.cql statement-by-statement via
    * scripts/eth_cassandra_streaming.py:306-320's DDL executor). */
  def toDdl(name: String, st: StructType): String =
    st.fields.map(f => s"${f.name} ${f.dataType.sql}")
      .mkString(s"CREATE TABLE $name (", ", ", ")")

  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.col

  /** Project a frame to exactly the target table's columns, in order —
    * the Spark equivalent of the reference's introspected-column INSERT
    * (ref: scripts/eth_cassandra_streaming.py:248-260). Missing columns are
    * an error; extras are dropped. */
  def projectTo(df: DataFrame, table: StructType): DataFrame =
    df.select(table.fieldNames.map(col).toIndexedSeq: _*)
}
