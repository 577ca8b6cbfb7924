package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.eth.EthTransforms._

/** Edge cases the reference special-cases (SURVEY §5.2): empty `topics`,
  * null `trace_address`, contract-creation null `to_address`, null-preserving
  * hex decode, and the two output dialects. */
class EthTransformsSpec extends SparkSpec {
  import spark.implicits._

  private val rawLogs = Seq(
    (1500, 0, Seq("0xaabb", "0xccdd"), "log"),
    (1501, 1, Seq.empty[String], "log"), // empty topics
    (2500, 2, null.asInstanceOf[Seq[String]], "log")) // null topics
    .toDF("block_number", "log_index", "topics", "type")

  test("formatLogs binary dialect: topic0 defaults to 0x (empty binary), topics decoded") {
    val out = formatLogs(rawLogs, BinaryDialect)
      .select("block_id", "block_id_group", "topic0", "topics")
      .orderBy("block_id").collect()
    // row 0: topic0 = bytes of aabb
    assert(out(0).getAs[Array[Byte]]("topic0").toSeq == Seq(0xaa.toByte, 0xbb.toByte))
    assert(out(0).getInt(1) == 1)
    // empty topics -> default "0x" -> empty byte array, NOT null (Cassandra
    // key-column contract, ref: eth_cassandra_streaming.py:352-354)
    assert(out(1).getAs[Array[Byte]]("topic0") != null)
    assert(out(1).getAs[Array[Byte]]("topic0").isEmpty)
    // null topics -> also default
    assert(out(2).getAs[Array[Byte]]("topic0") != null)
    assert(out(2).getInt(1) == 2)
  }

  test("formatLogs CSV dialect: topic0 stays null, topics rendered as JSON") {
    val out = formatLogs(rawLogs, CsvDialect)
      .select("block_id", "topic0", "topics").orderBy("block_id").collect()
    assert(out(0).getString(1) == "0xaabb")
    assert(out(0).getString(2) == """["0xaabb","0xccdd"]""")
    assert(out(1).isNullAt(1)) // CSV flavor: no default (ref: eth_csv_export.py:339-340)
    assert(out(1).getString(2) == "[]")
    assert(out(2).isNullAt(1))
  }

  private val rawTraces = Seq(
    (10, 0, Seq(0, 2), "trace"),
    (11, 1, null.asInstanceOf[Seq[Int]], "trace")) // null trace_address
    .toDF("block_number", "trace_index", "trace_address", "type")

  test("formatTraces joins trace_address with the dialect separator, null passthrough") {
    val csv = formatTraces(rawTraces, CsvDialect)
      .select("block_id", "trace_address").orderBy("block_id").collect()
    assert(csv(0).getString(1) == "0|2")
    assert(csv(1).isNullAt(1))
    val bin = formatTraces(rawTraces, BinaryDialect)
      .select("block_id", "trace_address").orderBy("block_id").collect()
    assert(bin(0).getString(1) == "0,2")
  }

  private val rawTxs = Seq(
    ("0xdeadbeef00", 5, "0xaa11", "tx"),
    ("0xfeedface11", 6, null, "tx")) // contract creation: null to_address
    .toDF("hash", "block_number", "to_address", "type")

  test("formatTransactions: prefix from hex hash; binary dialect preserves nulls") {
    val out = formatTransactions(rawTxs, BinaryDialect)
      .select("block_id", "tx_hash_prefix", "tx_hash", "to_address")
      .orderBy("block_id").collect()
    assert(out(0).getString(1) == "deadb") // hash[2:7]
    assert(out(0).getAs[Array[Byte]]("tx_hash").toSeq ==
      Seq(0xde, 0xad, 0xbe, 0xef, 0x00).map(_.toByte))
    assert(out(0).getAs[Array[Byte]]("to_address").toSeq == Seq(0xaa.toByte, 0x11.toByte))
    assert(out(1).isNullAt(3)) // null to_address survives decode
  }

  test("formatTransactions CSV dialect keeps hex strings") {
    val out = formatTransactions(rawTxs, CsvDialect)
      .select("tx_hash").orderBy("block_id").collect()
    assert(out(0).getString(0) == "0xdeadbeef00")
  }

  test("formatBlocks renames, buckets and drops the type tag") {
    val raw = Seq((999, "0xabcd", "block"), (1000, "0xef01", "block"))
      .toDF("number", "hash", "type")
    val out = formatBlocks(raw, CsvDialect).orderBy("block_id")
    assert(!out.columns.contains("type"))
    val rows = out.select("block_id", "block_id_group", "block_hash").collect()
    assert(rows(0) == Row(999, 0, "0xabcd"))
    assert(rows(1) == Row(1000, 1, "0xef01"))
  }

  test("traceCallTree: depths, parent links, orphans, reward exclusion") {
    import spark.implicits._
    // tx A: root + [0] + [0,1] (full chain); tx B: root + ORPHAN [2,0]
    // (parent [2] absent); reward trace: null tx hash, excluded
    val traces = Seq(
      ("A", Some(Seq.empty[Int]), None: Option[String]),
      ("A", Some(Seq(0)), None),
      ("A", Some(Seq(0, 1)), Some("out of gas")),
      ("B", None, None), // raw root arrives as NULL trace_address
      ("B", Some(Seq(2, 0)), None))
      .toDF("transaction_hash", "trace_address", "error")
      .withColumn("block_number", lit(7))
      .union(Seq(("__reward", None: Option[Seq[Int]], None: Option[String]))
        .toDF("transaction_hash", "trace_address", "error")
        .withColumn("block_number", lit(7))
        .withColumn("transaction_hash", lit(null: String)))
    val out = graft.eth.EthTransforms.traceCallTree(traces)
      .orderBy("tx_hash").collect()
    assert(out.length == 2) // reward trace spawns no tx row
    val a = out(0); val b = out(1)
    assert(a.getAs[String]("tx_hash") == "A" && a.getAs[Long]("n_calls") == 3L
      && a.getAs[Int]("max_depth") == 2 && a.getAs[Long]("n_failed") == 1L
      && a.getAs[Long]("n_linked") == 2L) // both non-roots have parents
    assert(b.getAs[String]("tx_hash") == "B" && b.getAs[Long]("n_calls") == 2L
      && b.getAs[Int]("max_depth") == 2 && b.getAs[Long]("n_linked") == 0L)
  }
}
