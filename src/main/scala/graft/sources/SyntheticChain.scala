package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 source `graft-chain`: a deterministic synthetic Ethereum
  * chain, the engine's stand-in for the reference's batched JSON-RPC export
  * jobs (ref: scripts/eth_cassandra_streaming.py:107-180 — ExportBlocksJob /
  * ExportReceiptsJob / ExportTracesJob). Zero-egress: rows are generated,
  * not fetched, but the *planning* is the real thing — one Spark input
  * partition per `batchSize` block slice, exactly the reference's
  * micro-batch window (50 blocks/RPC batch, ref: :586), so extraction
  * parallelism is cluster-wide instead of `max_workers=5` threads.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-chain")
  *     .option("stream", "transaction")   // block|transaction|receipt|log|trace
  *     .option("start", 0).option("end", 999)
  *     .option("batchSize", 50)
  *     .load()
  * }}}
  *
  * Determinism: every value derives from the block id / record index via
  * md5 ([[graft.llm.Similarity.md5LongJvm]]-style), so any range re-read is
  * byte-identical — the property the reference's resume logic (T2) relies on.
  */
class SyntheticChain extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-chain"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticChain.schemaFor(options.getOrDefault("stream", "block"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticChainTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticChain {
  val Streams: Seq[String] = Seq("block", "transaction", "receipt", "log", "trace")

  /** Raw-extract schemas (pre-rename, hex-string flavor — FIXTURES.md §1). */
  def schemaFor(stream: String): StructType = stream match {
    case "block" => StructType(Seq(
      StructField("type", StringType, nullable = false),
      StructField("number", IntegerType, nullable = false),
      StructField("hash", StringType, nullable = false),
      StructField("parent_hash", StringType, nullable = false),
      StructField("miner", StringType, nullable = false),
      StructField("difficulty", DecimalType(38, 0), nullable = false),
      StructField("gas_used", IntegerType, nullable = false),
      StructField("timestamp", IntegerType, nullable = false),
      StructField("transaction_count", ShortType, nullable = false)))
    case "transaction" => StructType(Seq(
      StructField("type", StringType, nullable = false),
      StructField("hash", StringType, nullable = false),
      StructField("block_number", IntegerType, nullable = false),
      StructField("transaction_index", ShortType, nullable = false),
      StructField("from_address", StringType, nullable = false),
      StructField("to_address", StringType, nullable = true), // null = contract creation
      StructField("value", DecimalType(38, 0), nullable = false),
      StructField("gas", IntegerType, nullable = false),
      StructField("max_fee_per_gas", LongType, nullable = true))) // null = legacy tx
    case "receipt" => StructType(Seq(
      StructField("type", StringType, nullable = false),
      StructField("transaction_hash", StringType, nullable = false),
      StructField("cumulative_gas_used", LongType, nullable = false),
      StructField("gas_used", LongType, nullable = false),
      StructField("contract_address", StringType, nullable = true),
      StructField("status", LongType, nullable = true))) // null pre-Byzantium
    case "log" => StructType(Seq(
      StructField("type", StringType, nullable = false),
      StructField("block_number", IntegerType, nullable = false),
      StructField("log_index", IntegerType, nullable = false),
      StructField("transaction_hash", StringType, nullable = false),
      StructField("address", StringType, nullable = false),
      StructField("topics", ArrayType(StringType), nullable = true),
      StructField("data", StringType, nullable = true)))
    case "trace" => StructType(Seq(
      StructField("type", StringType, nullable = false),
      StructField("block_number", IntegerType, nullable = false),
      StructField("trace_index", IntegerType, nullable = false),
      StructField("transaction_hash", StringType, nullable = true), // null = reward trace
      StructField("trace_type", StringType, nullable = false),
      StructField("trace_address", ArrayType(IntegerType), nullable = true),
      StructField("error", StringType, nullable = true)))
    case other => throw new IllegalArgumentException(
      s"unknown stream '$other' (expected one of ${Streams.mkString(", ")})")
  }

  private[sources] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic tx count per block: 1..3. */
  def txCount(block: Long): Int = (block % 3).toInt + 1
}

private class SyntheticChainTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  private val stream = options.getOrDefault("stream", "block")
  override def name(): String = s"graft-chain/$stream"
  override def schema(): StructType = SyntheticChain.schemaFor(stream)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new SyntheticChainScan(stream,
      options.getLong("start", 0L),
      options.getLong("end", 999L),
      options.getLong("batchSize", 50L))
}

private class SyntheticChainScan(stream: String, start: Long, end: Long,
                                 batchSize: Long) extends Scan with Batch {
  override def readSchema(): StructType = SyntheticChain.schemaFor(stream)
  override def toBatch: Batch = this

  /** One input partition per block slice — the reference's RPC batch window
    * becomes Spark's unit of parallelism. */
  override def planInputPartitions(): Array[InputPartition] =
    graft.eth.Ingest.planRanges(start, end, batchSize)
      .map { case (lo, hi) => BlockSlice(lo, hi): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ChainReaderFactory(stream)

  /** Streaming form (the reference's primary mode — continuous ingest with
    * resume, ref: scripts/eth_cassandra_streaming.py T1/T2): offsets are
    * block numbers; `end` plays the chain tip. Checkpointed offsets give
    * exactly-once progress tracking on top of the source's determinism. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ChainMicroBatchStream(stream, start, end, batchSize)
}

/** Offset = next block to read, serialized as its decimal string. */
private case class BlockOffset(next: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = next.toString
}

private class ChainMicroBatchStream(stream: String, start: Long, tip: Long,
                                    batchSize: Long)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = BlockOffset(start)
  override def latestOffset(): Offset = BlockOffset(tip + 1)
  override def deserializeOffset(json: String): Offset = BlockOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(startOff: Offset, endOff: Offset): Array[InputPartition] = {
    val lo = startOff.asInstanceOf[BlockOffset].next
    val hi = endOff.asInstanceOf[BlockOffset].next - 1
    if (hi < lo) Array.empty
    else graft.eth.Ingest.planRanges(lo, hi, batchSize)
      .map { case (a, b) => BlockSlice(a, b): InputPartition }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChainReaderFactory(stream)
}

private case class BlockSlice(lo: Long, hi: Long) extends InputPartition

private class ChainReaderFactory(stream: String) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[BlockSlice]
    new ChainReader(stream, s.lo, s.hi)
  }
}

/** Generates the slice's rows. All derivations are pure functions of
  * (block, index) so re-reads are identical. Edge cases from FIXTURES.md §2
  * are woven in deterministically: contract creations (to_address null every
  * 7th tx), legacy txs (null max_fee every 5th), pre-Byzantium receipts
  * (null status every 11th), reward traces (null tx_hash + trace_address),
  * empty/multi topics, failed traces. */
private class ChainReader(stream: String, lo: Long, hi: Long)
  extends PartitionReader[InternalRow] {
  import SyntheticChain.{md5Hex, txCount}

  private var block = lo
  private var idx = 0
  private var current: InternalRow = _

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)
  private def hash(kind: String, block: Long, i: Int): String =
    "0x" + md5Hex(s"$kind-$block-$i") + md5Hex(s"$kind-$block-$i-b")

  private def recordsInBlock: Int = stream match {
    case "block" => 1
    case "transaction" | "receipt" => txCount(block)
    case "log" => txCount(block) * 2 // 2 logs per tx
    case "trace" => txCount(block) + 1 // +1 reward trace
  }

  override def next(): Boolean = {
    while (block <= hi && idx >= recordsInBlock) { block += 1; idx = 0 }
    if (block > hi) return false
    current = make(block, idx)
    idx += 1
    true
  }

  private def make(b: Long, i: Int): InternalRow = stream match {
    case "block" =>
      InternalRow(utf8("block"), b.toInt, utf8(hash("blk", b, 0)),
        utf8(hash("blk", b - 1, 0)), utf8("0x" + md5Hex(s"miner-${b % 5}").take(40)),
        org.apache.spark.sql.types.Decimal(BigDecimal(2).pow(18) + b, 38, 0),
        (b % 30000000).toInt, (1438269988 + b * 13).toInt, txCount(b).toShort)
    case "transaction" =>
      val creation = (b + i) % 7 == 0
      val legacy = (b + i) % 5 == 0
      InternalRow(utf8("transaction"), utf8(hash("tx", b, i)), b.toInt, i.toShort,
        utf8("0x" + md5Hex(s"from-$b-$i").take(40)),
        if (creation) null else utf8("0x" + md5Hex(s"to-$b-$i").take(40)),
        org.apache.spark.sql.types.Decimal(BigDecimal(10).pow(20) + b * 1000 + i, 38, 0),
        21000 + i, if (legacy) null else java.lang.Long.valueOf(30000000000L + b))
    case "receipt" =>
      val creation = (b + i) % 7 == 0
      val preByzantium = (b + i) % 11 == 0
      InternalRow(utf8("receipt"), utf8(hash("tx", b, i)),
        21000L * (i + 1), 21000L + i,
        if (creation) utf8("0x" + md5Hex(s"ca-$b-$i").take(40)) else null,
        if (preByzantium) null else java.lang.Long.valueOf((b + i) % 2))
    case "log" =>
      val nTopics = ((b + i) % 5).toInt // 0..4 topics, incl. empty
      val topics = if (nTopics == 0) new GenericArrayData(Array.empty[Any])
        else new GenericArrayData(
          (0 until nTopics).map(t => utf8("0x" + md5Hex(s"topic-$t-${(b + i) % 3}")): Any).toArray)
      InternalRow(utf8("log"), b.toInt, i, utf8(hash("tx", b, i / 2)),
        utf8("0x" + md5Hex(s"addr-${(b + i) % 11}").take(40)), topics,
        utf8("0x" + md5Hex(s"data-$b-$i")))
    case "trace" =>
      val reward = i == txCount(b) // last trace of each block is the reward
      val failed = !reward && (b + i) % 13 == 0
      val addr = if (reward || i == 0) null
        else new GenericArrayData((0 until (i % 3 + 1)).map(x => (x * 2) % 3: Any).toArray)
      InternalRow(utf8("trace"), b.toInt, i,
        if (reward) null else utf8(hash("tx", b, i)),
        utf8(if (reward) "reward" else "call"), addr,
        if (failed) utf8("out of gas") else null)
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
