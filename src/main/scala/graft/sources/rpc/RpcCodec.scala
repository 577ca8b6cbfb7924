package graft.sources.rpc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Ethereum JSON-RPC wire codec — the encode/decode half of the live-node
  * connector (the capability the reference delegates to `ethereum-etl`'s
  * batched providers, ref: scripts/eth_cassandra_streaming.py:97-105
  * `get_batch_work_executor` / `ThreadLocalProxy`).
  *
  * Pure functions over strings/Jackson nodes (Jackson ships with Spark);
  * no Spark types here, so the codec is unit-testable without a session
  * and usable from both the DSv2 reader and the test fixture server.
  *
  * Methods covered (the set the reference's export jobs need):
  *   - `eth_getBlockByNumber(num, fullTxs)` — blocks + transactions
  *   - `eth_getBlockReceipts(num)`          — receipts + logs
  *   - `trace_block(num)`                   — traces (OpenEthereum/Erigon
  *     dialect, what ethereum-etl's ExportTracesJob speaks)
  *
  * JSON-RPC 2.0 batching: one HTTP POST carries an ARRAY of requests (the
  * reference's `--batch-size` window); responses may arrive in any order
  * and are re-keyed by id ([[parseBatchResponse]]). Per-element `error`
  * members fail loudly with the server's code/message — a silently
  * dropped block would corrupt resume-by-max-block.
  */
object RpcCodec {

  private val mapper = new ObjectMapper()

  /** Quantity encoding per the Ethereum JSON-RPC spec: minimal hex, 0x
    * prefix ("0x0" for zero — never "0x", never leading zeros). */
  def hexQty(n: BigInt): String = {
    require(n >= 0, s"quantities are unsigned, got $n")
    "0x" + n.toString(16)
  }

  /** Quantity decoding, null-safe on JSON null/missing. */
  def parseQty(node: JsonNode): BigInt = {
    require(node != null && !node.isNull, "missing quantity")
    val s = node.asText()
    require(s.startsWith("0x"), s"quantity must be 0x-hex, got '$s'")
    BigInt(s.drop(2), 16)
  }

  private def request(id: Long, method: String, params: Any*): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("jsonrpc", "2.0")
    o.put("id", id)
    o.put("method", method)
    val ps = o.putArray("params")
    params.foreach {
      case s: String => ps.add(s)
      case b: Boolean => ps.add(b)
      case other => throw new IllegalArgumentException(s"unsupported param $other")
    }
    o
  }

  /** One batched request body: element id i carries block `lo + i`, so the
    * response re-keying can map ids straight back to block numbers. */
  def batchRequest(method: String, lo: Long, hi: Long,
                   extraParam: Option[Boolean] = None): String = {
    require(hi >= lo, s"empty range [$lo, $hi]")
    val arr = mapper.createArrayNode()
    (lo to hi).foreach { b =>
      val params: Seq[Any] = extraParam match {
        case Some(flag) => Seq(hexQty(BigInt(b)), flag)
        case None => Seq(hexQty(BigInt(b)))
      }
      arr.add(request(b - lo, method, params: _*))
    }
    mapper.writeValueAsString(arr)
  }

  def blocksRequest(lo: Long, hi: Long, fullTxs: Boolean): String =
    batchRequest("eth_getBlockByNumber", lo, hi, Some(fullTxs))
  def receiptsRequest(lo: Long, hi: Long): String =
    batchRequest("eth_getBlockReceipts", lo, hi)
  def tracesRequest(lo: Long, hi: Long): String =
    batchRequest("trace_block", lo, hi)

  /** Single-element `eth_blockNumber` batch — the chain-tip poll behind
    * streaming's `latestOffset` (the reference polls the same method via
    * web3 for its tip checks). */
  def blockNumberRequest(): String = {
    val arr = mapper.createArrayNode()
    arr.add(request(0, "eth_blockNumber"))
    mapper.writeValueAsString(arr)
  }

  /** Parse the [[blockNumberRequest]] response into the tip block number. */
  def parseBlockNumber(body: String): Long =
    parseQty(parseBatchResponse(body, 0 until 1).head).toLong

  /** Parse a batch response into results ordered by request id. Fails
    * loudly on transport-level garbage, on any per-element `error`
    * member, and on missing ids (a node quietly skipping one block of a
    * batch must not read as an empty block). */
  def parseBatchResponse(body: String, expectedIds: Range): IndexedSeq[JsonNode] = {
    val root = mapper.readTree(body)
    require(root != null && root.isArray,
      s"expected a JSON-RPC batch array, got: ${body.take(120)}")
    val byId = (0 until root.size()).map(root.get).map { el =>
      val err = el.get("error")
      if (err != null && !err.isNull)
        throw new RuntimeException("JSON-RPC error " +
          s"(id=${el.get("id")}): code=${err.path("code").asLong} " +
          s"message=${err.path("message").asText}")
      el.path("id").asLong -> el.get("result")
    }.toMap
    expectedIds.map { id =>
      byId.getOrElse(id.toLong,
        throw new RuntimeException(s"batch response missing id $id"))
    }.toIndexedSeq
  }

  /** Nullable text member: absent or JSON null -> None. */
  def optText(node: JsonNode, field: String): Option[String] = {
    val v = node.get(field)
    if (v == null || v.isNull) None else Some(v.asText())
  }

  /** Nullable quantity member: absent or JSON null -> None. */
  def optQty(node: JsonNode, field: String): Option[BigInt] = {
    val v = node.get(field)
    if (v == null || v.isNull) None else Some(parseQty(v))
  }

  def qty(node: JsonNode, field: String): BigInt = {
    val v = node.get(field)
    require(v != null && !v.isNull, s"missing quantity field '$field'")
    parseQty(v)
  }

  def text(node: JsonNode, field: String): String = {
    val v = node.get(field)
    require(v != null && !v.isNull, s"missing field '$field'")
    v.asText()
  }

  def arr(node: JsonNode, field: String): IndexedSeq[JsonNode] = {
    val v = node.get(field)
    require(v != null && v.isArray, s"missing array field '$field'")
    (0 until v.size()).map(v.get)
  }

  private[rpc] def newObject(): ObjectNode = mapper.createObjectNode()
  private[rpc] def newArray(): ArrayNode = mapper.createArrayNode()
  private[rpc] def write(n: JsonNode): String = mapper.writeValueAsString(n)
  private[graft] def read(s: String): JsonNode = mapper.readTree(s)
}
