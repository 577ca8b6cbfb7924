package graft.sources.rpc

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.sources.SyntheticChain.{md5Hex, txCount}

/** Deterministic JSON-RPC "node": serves `eth_getBlockByNumber`,
  * `eth_getBlockReceipts`, and `trace_block` for the SAME synthetic chain
  * [[graft.sources.SyntheticChain]] generates directly — every value
  * derives from the identical md5 formulas, so
  * `graft-rpc` (wire decode) ≡ `graft-chain` (direct generate) is an
  * assertable equivalence (RpcSourceSpec) and the existing DuckDB stream
  * oracles cover the RPC path too.
  *
  * Wire fidelity notes (public Ethereum JSON-RPC conventions):
  *   - quantities are minimal 0x-hex;
  *   - a legacy tx carries NO `maxFeePerGas` member (absent, not null);
  *   - a pre-Byzantium receipt carries `root` instead of `status`;
  *   - a contract creation has `to: null` and a receipt `contractAddress`;
  *   - `trace_block` traces carry `type`/`traceAddress`/`error` with the
  *     block reward as a final `type: "reward"` trace without
  *     `transactionHash` (the OpenEthereum dialect ethereum-etl speaks).
  *
  * Batch responses are deliberately returned in REVERSE id order:
  * JSON-RPC servers may answer a batch in any order, and the shuffled
  * fixture proves the client really re-keys by id.
  */
object SyntheticRpcServer {

  private def hash(kind: String, block: Long, i: Int): String =
    "0x" + md5Hex(s"$kind-$block-$i") + md5Hex(s"$kind-$block-$i-b")
  private def q(n: BigInt): String = RpcCodec.hexQty(n)
  private def q(n: Long): String = RpcCodec.hexQty(BigInt(n))

  private def txObject(b: Long, i: Int): ObjectNode = {
    val creation = (b + i) % 7 == 0
    val legacy = (b + i) % 5 == 0
    val o = RpcCodec.newObject()
    o.put("hash", hash("tx", b, i))
    o.put("blockNumber", q(b))
    o.put("transactionIndex", q(i.toLong))
    o.put("from", "0x" + md5Hex(s"from-$b-$i").take(40))
    if (creation) o.putNull("to") else o.put("to", "0x" + md5Hex(s"to-$b-$i").take(40))
    o.put("value", q(BigInt(10).pow(20) + b * 1000 + i))
    o.put("gas", q(21000L + i))
    if (!legacy) o.put("maxFeePerGas", q(30000000000L + b))
    o
  }

  private def block(b: Long, fullTxs: Boolean): ObjectNode = {
    val o = RpcCodec.newObject()
    o.put("number", q(b))
    o.put("hash", hash("blk", b, 0))
    o.put("parentHash", hash("blk", b - 1, 0))
    o.put("miner", "0x" + md5Hex(s"miner-${b % 5}").take(40))
    o.put("difficulty", q(BigInt(2).pow(18) + b))
    o.put("gasUsed", q(b % 30000000))
    o.put("timestamp", q(1438269988L + b * 13))
    val txs = o.putArray("transactions")
    (0 until txCount(b)).foreach { i =>
      if (fullTxs) txs.add(txObject(b, i)) else txs.add(hash("tx", b, i))
    }
    o
  }

  private def logObject(b: Long, li: Int): ObjectNode = {
    val o = RpcCodec.newObject()
    o.put("blockNumber", q(b))
    o.put("logIndex", q(li.toLong))
    o.put("transactionHash", hash("tx", b, li / 2))
    o.put("address", "0x" + md5Hex(s"addr-${(b + li) % 11}").take(40))
    val topics = o.putArray("topics")
    (0 until ((b + li) % 5).toInt).foreach { t =>
      topics.add("0x" + md5Hex(s"topic-$t-${(b + li) % 3}"))
    }
    o.put("data", "0x" + md5Hex(s"data-$b-$li"))
    o
  }

  private def receipts(b: Long): JsonNode = {
    val arr = RpcCodec.newArray()
    (0 until txCount(b)).foreach { i =>
      val creation = (b + i) % 7 == 0
      val preByzantium = (b + i) % 11 == 0
      val o = RpcCodec.newObject()
      o.put("transactionHash", hash("tx", b, i))
      o.put("cumulativeGasUsed", q(21000L * (i + 1)))
      o.put("gasUsed", q(21000L + i))
      if (creation) o.put("contractAddress", "0x" + md5Hex(s"ca-$b-$i").take(40))
      else o.putNull("contractAddress")
      if (preByzantium) o.put("root", hash("rt", b, i))
      else o.put("status", q((b + i) % 2))
      val logs = o.putArray("logs")
      Seq(2 * i, 2 * i + 1).foreach(li => logs.add(logObject(b, li)))
      arr.add(o)
    }
    arr
  }

  private def traces(b: Long): JsonNode = {
    val arr = RpcCodec.newArray()
    (0 to txCount(b)).foreach { i =>
      val reward = i == txCount(b)
      val failed = !reward && (b + i) % 13 == 0
      val o = RpcCodec.newObject()
      o.put("blockNumber", q(b))
      o.put("type", if (reward) "reward" else "call")
      if (!reward) o.put("transactionHash", hash("tx", b, i))
      if (reward || i == 0) o.putNull("traceAddress")
      else {
        val ta = o.putArray("traceAddress")
        (0 until (i % 3 + 1)).foreach(x => ta.add((x * 2) % 3))
      }
      if (failed) o.put("error", "out of gas")
      arr.add(o)
    }
    arr
  }

  /** Handle one batch request body, returning the batch response body.
    * `tip` is the chain height `eth_blockNumber` reports — the streaming
    * tests' stand-in for a growing chain. */
  def handle(requestBody: String, tip: Long = 999L): String = {
    val req = RpcCodec.read(requestBody)
    require(req.isArray, "synthetic node only accepts batch requests")
    val out = RpcCodec.newArray()
    // reverse order: clients must re-key by id, not trust arrival order
    (req.size - 1) to 0 by -1 foreach { k =>
      val r = req.get(k)
      val id = r.path("id").asLong
      val method = r.path("method").asText
      val params = r.get("params")
      val el = RpcCodec.newObject()
      el.put("jsonrpc", "2.0")
      el.put("id", id)
      method match {
        case "eth_blockNumber" =>
          el.put("result", q(tip))
        case "eth_getBlockByNumber" =>
          el.set("result",
            block(RpcCodec.parseQty(params.get(0)).toLong, params.get(1).asBoolean))
        case "eth_getBlockReceipts" =>
          el.set("result", receipts(RpcCodec.parseQty(params.get(0)).toLong))
        case "trace_block" =>
          el.set("result", traces(RpcCodec.parseQty(params.get(0)).toLong))
        case other =>
          val err = el.putObject("error")
          err.put("code", -32601L)
          err.put("message", s"method not found: $other")
      }
      out.add(el)
    }
    RpcCodec.write(out)
  }
}
