package graft.eth

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ColumnFns._

/** The transform core: per-stream `DataFrame => DataFrame` formatters, one
  * per raw record stream, mirroring the reference's `ingest_*` functions
  * (ref: scripts/eth_cassandra_streaming.py:323-467, binary dialect) and
  * `format_*` functions (ref: scripts/eth_csv_export.py:263-349, CSV
  * dialect). Encoding is a parameter of the transform, not two code paths
  * (SURVEY §7.4): both dialects share rename/derive logic and differ only in
  * value encoding.
  */
object EthTransforms {

  /** Output encoding dialect. */
  sealed trait Dialect {
    /** Separator for the flattened `trace_address` array. */
    def traceAddressSep: String
    /** Default for `topic0` when `topics` is empty/null. */
    def topic0Default: Option[String]
    /** Whether 0x-hex columns are decoded to BinaryType. */
    def binaryBlobs: Boolean
  }

  /** Cassandra-keyspace flavor: binary blobs, `topic0` defaults to "0x"
    * (null is illegal for a clustering key — ref:
    * scripts/eth_cassandra_streaming.py:352-354), `,`-joined trace_address. */
  case object BinaryDialect extends Dialect {
    val traceAddressSep = ","
    val topic0Default: Option[String] = Some("0x")
    val binaryBlobs = true
  }

  /** CSV-export flavor: hex strings kept as-is, `topic0` stays null
    * (ref: scripts/eth_csv_export.py:339-340), `|`-joined trace_address
    * (ref: scripts/eth_csv_export.py:311-315). */
  case object CsvDialect extends Dialect {
    val traceAddressSep = "|"
    val topic0Default: Option[String] = None
    val binaryBlobs = false
  }

  private def encodeBlobs(df: DataFrame, cols: Seq[String], d: Dialect): DataFrame =
    if (!d.binaryBlobs) df
    else cols.filter(df.columns.contains).foldLeft(df) { (acc, c) =>
      acc.withColumn(c, hexToBinary(col(c)))
    }

  /** Blocks: drop type tag, `number`->`block_id`, `hash`->`block_hash`,
    * derive bucket, encode blobs
    * (ref: scripts/eth_cassandra_streaming.py:323-402 `ingest_blocks`;
    * scripts/eth_csv_export.py:263-276 `format_blocks`). */
  def formatBlocks(raw: DataFrame, dialect: Dialect = CsvDialect,
                   bucketSize: Long = BlockBucketSize): DataFrame = {
    val renamed = raw
      .drop("type")
      .withColumnRenamed("number", "block_id")
      .withColumnRenamed("hash", "block_hash")
      .withColumn("block_id_group", blockIdGroup(col("block_id"), bucketSize))
    encodeBlobs(renamed, EthSchemas.blockBlobColumns, dialect)
  }

  /** Transactions: `hash`->`tx_hash`, `block_number`->`block_id`, derive
    * `tx_hash_prefix` from the hex hash *before* any binary encoding
    * (ref: scripts/eth_cassandra_streaming.py:404-435 `ingest_transactions`;
    * scripts/eth_csv_export.py:278-296 `format_transactions`). */
  def formatTransactions(raw: DataFrame, dialect: Dialect = CsvDialect,
                         prefixLen: Int = TxHashPrefixLen): DataFrame = {
    val renamed = raw
      .drop("type")
      .withColumnRenamed("hash", "tx_hash")
      .withColumnRenamed("block_number", "block_id")
      .withColumn("tx_hash_prefix", txHashPrefix(col("tx_hash"), prefixLen))
    encodeBlobs(renamed, EthSchemas.transactionBlobColumns, dialect)
  }

  /** Traces: renames, bucket, flatten `trace_address` with the dialect
    * separator (null passthrough — ref:
    * scripts/eth_cassandra_streaming.py:438-467 `ingest_traces`;
    * scripts/eth_csv_export.py:298-318 `format_traces`). */
  def formatTraces(raw: DataFrame, dialect: Dialect = CsvDialect,
                   bucketSize: Long = BlockBucketSize): DataFrame = {
    val renamed = raw
      .drop("type")
      .withColumnRenamed("transaction_hash", "tx_hash")
      .withColumnRenamed("block_number", "block_id")
      .withColumn("block_id_group", blockIdGroup(col("block_id"), bucketSize))
      .withColumn("trace_address",
        when(col("trace_address").isNotNull,
          array_join(col("trace_address").cast("array<string>"),
            dialect.traceAddressSep)))
    encodeBlobs(renamed, EthSchemas.traceBlobColumns, dialect)
  }

  /** Logs: renames, bucket, `topic0 = topics[0]` with dialect default,
    * elementwise topic encoding
    * (ref: scripts/eth_cassandra_streaming.py:323-366 `ingest_logs`;
    * scripts/eth_csv_export.py:320-349 `format_logs`). */
  def formatLogs(raw: DataFrame, dialect: Dialect = CsvDialect,
                 bucketSize: Long = BlockBucketSize): DataFrame = {
    val head = try_element_at(col("topics"), lit(1))
    val topic0 = dialect.topic0Default match {
      case Some(d) => coalesce(head, lit(d))
      case None    => head
    }
    val renamed = raw
      .drop("type")
      .withColumnRenamed("transaction_hash", "tx_hash")
      .withColumnRenamed("block_number", "block_id")
      .withColumn("block_id_group", blockIdGroup(col("block_id"), bucketSize))
      .withColumn("topic0", topic0)
    val encoded = encodeBlobs(renamed, EthSchemas.logBlobColumns, dialect)
    if (dialect.binaryBlobs)
      encoded
        .withColumn("topic0", hexToBinary(col("topic0")))
        .withColumn("topics", transform(col("topics"), t => hexToBinary(t)))
    else
      // CSV flavor renders topics as a JSON-ish string
      // (ref: scripts/eth_csv_export.py:342-344).
      encoded.withColumn("topics", to_json(col("topics")))
  }

  /** Per-transaction call-tree rollup over raw traces: the internal-call
    * structure downstream analytics read off `trace_address` (depth =
    * path length; a trace's PARENT is the trace whose address is its
    * path minus the last hop — the geth/parity call-tree encoding the
    * reference exports verbatim). Reward traces (null tx hash) are
    * block-level, not part of any tx's tree, and are excluded. Returns
    * per tx: n_calls, max_depth (root call = depth 0), n_failed, and
    * n_linked — how many non-root traces have their parent present (on
    * a complete export n_linked = count(depth >= 1); a shortfall is a
    * truncated-trace export, the data-quality signal this rollup
    * exists to surface).
    *
    * Scale shape: depth/failure stats are ONE map-side-combined
    * aggregate. The parent link is a self equi-join on
    * (tx_hash, parent_path_string) — both sides hash-partition on the
    * tx hash (high-cardinality, even spread), candidate sets are
    * per-tx (bounded by per-tx trace counts), no window, no broadcast
    * of anything corpus-sized. */
  def traceCallTree(raw: DataFrame): DataFrame = {
    val t = raw
      .filter(col("transaction_hash").isNotNull)
      .select(col("block_number"), col("transaction_hash").as("tx_hash"),
        coalesce(col("trace_address"), array().cast("array<int>")).as("__ta"),
        col("error"))
      .withColumn("__path", array_join(col("__ta").cast("array<string>"), ","))
      .withColumn("__depth", size(col("__ta")))
    val stats = t.groupBy(col("block_number"), col("tx_hash"))
      .agg(count(lit(1)).as("n_calls"),
        max(col("__depth")).as("max_depth"),
        sum(when(col("error").isNotNull, 1L).otherwise(0L)).as("n_failed"))
    val parents = t.select(col("tx_hash").as("__ptx"), col("__path").as("__ppath"))
    val linked = t.filter(col("__depth") >= 1)
      .withColumn("__parent",
        array_join(slice(col("__ta"), lit(1), size(col("__ta")) - 1)
          .cast("array<string>"), ","))
      .join(parents, col("__parent") === col("__ppath") &&
        col("tx_hash") === col("__ptx"), "left_semi")
      .groupBy(col("tx_hash").as("__lt"))
      .agg(count(lit(1)).as("n_linked"))
    stats.join(linked, col("tx_hash") === col("__lt"), "left")
      .select(col("block_number"), col("tx_hash"), col("n_calls"),
        col("max_depth"), col("n_failed"),
        coalesce(col("n_linked"), lit(0L)).as("n_linked"))
  }
}
