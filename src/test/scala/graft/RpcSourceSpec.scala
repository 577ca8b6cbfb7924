package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.sources.rpc._

/** The JSON-RPC connector: codec laws, batch re-keying, retry behavior,
  * and — the load-bearing assertion — stream-by-stream equivalence of
  * `graft-rpc` (wire encode → synthetic node → wire decode) with
  * `graft-chain` (direct generation), which puts the whole codec under
  * the same DuckDB oracles that pin the chain streams. The HTTP transport
  * is exercised end-to-end against a loopback JDK HttpServer. */
class RpcSourceSpec extends SparkSpec {

  test("quantity codec: minimal hex, round trip, rejects non-0x") {
    assert(RpcCodec.hexQty(BigInt(0)) == "0x0")
    assert(RpcCodec.hexQty(BigInt(26)) == "0x1a")
    val big = BigInt(10).pow(20) + 12345
    assert(RpcCodec.parseQty(RpcCodec.read("\"" + RpcCodec.hexQty(big) + "\"")) == big)
    intercept[IllegalArgumentException] {
      RpcCodec.parseQty(RpcCodec.read("\"26\""))
    }
    intercept[IllegalArgumentException] { RpcCodec.hexQty(BigInt(-1)) }
  }

  test("batch responses are re-keyed by id; missing ids and error members fail loudly") {
    // the synthetic node answers in REVERSE order by design
    val body = SyntheticRpcServer.handle(RpcCodec.blocksRequest(5, 7, fullTxs = false))
    val results = RpcCodec.parseBatchResponse(body, 0 until 3)
    // re-keyed: result k is block 5 + k despite reversed arrival
    (0 until 3).foreach { k =>
      assert(RpcCodec.qty(results(k), "number").toLong == 5L + k)
    }
    intercept[RuntimeException] {
      RpcCodec.parseBatchResponse(body, 0 until 4) // id 3 never requested
    }
    // per-element error member (unknown method) raises with code/message
    val errBody = SyntheticRpcServer.handle(
      RpcCodec.batchRequest("eth_bogusMethod", 0, 0))
    val e = intercept[RuntimeException] {
      RpcCodec.parseBatchResponse(errBody, 0 until 1)
    }
    assert(e.getMessage.contains("-32601"))
  }

  test("retry transport: transient failures retried, permanent failure rethrows last") {
    class Flaky(failFirst: Int) extends RpcTransport {
      val calls = new AtomicInteger(0)
      override def post(body: String): String = {
        if (calls.incrementAndGet() <= failFirst)
          throw new java.io.IOException(s"transient ${calls.get()}")
        "ok"
      }
    }
    val f2 = new Flaky(2)
    assert(RetryingTransport(f2, attempts = 3, backoffMs = 1).post("x") == "ok")
    assert(f2.calls.get() == 3)
    val f9 = new Flaky(9)
    val e = intercept[java.io.IOException] {
      RetryingTransport(f9, attempts = 3, backoffMs = 1).post("x")
    }
    assert(e.getMessage == "transient 3" && f9.calls.get() == 3)
  }

  private def chainDf(format: String, stream: String, extra: Map[String, String] = Map.empty) = {
    val base = spark.read.format(format)
      .option("stream", stream).option("start", 0).option("end", 120)
      .option("batchSize", 25)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("graft-rpc ≡ graft-chain for every stream (synthetic transport)") {
    graft.sources.SyntheticChain.Streams.foreach { stream =>
      val rpc = chainDf("graft-rpc", stream, Map("transport" -> "synthetic"))
      val direct = chainDf("graft-chain", stream)
      assert(rpc.schema == direct.schema, s"$stream schema")
      val n = direct.count()
      assert(rpc.count() == n, s"$stream count")
      assert(rpc.exceptAll(direct).count() == 0
        && direct.exceptAll(rpc).count() == 0,
        s"$stream rows diverge between rpc decode and direct generation")
    }
  }

  test("streaming read: micro-batches cover the range once, rows match the batch path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rpc_stream").toString
    val q = spark.readStream.format("graft-rpc")
      .option("stream", "block").option("start", 0).option("end", 120)
      .option("batchSize", 25).option("transport", "synthetic").load()
      .writeStream.format("memory").queryName("rpc_stream_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      val got = spark.table("rpc_stream_out")
      assert(got.count() == 121L)
      val direct = chainDf("graft-chain", "block")
      assert(got.exceptAll(direct).count() == 0
        && direct.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("omitted end: batch and streaming reads follow the polled eth_blockNumber tip") {
    // no `end` option — the scan must size itself from the node's tip
    val batch = spark.read.format("graft-rpc")
      .option("stream", "block").option("start", 0)
      .option("batchSize", 25).option("transport", "synthetic")
      .option("tip", 60).load()
    assert(batch.count() == 61L)
    val dir = java.nio.file.Files.createTempDirectory("graft_rpc_tip").toString
    val q = spark.readStream.format("graft-rpc")
      .option("stream", "block").option("start", 0)
      .option("batchSize", 25).option("transport", "synthetic")
      .option("tip", 60).load()
      .writeStream.format("memory").queryName("rpc_tip_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      assert(spark.table("rpc_tip_out").count() == 61L)
    } finally q.stop()
  }

  test("HTTP transport end-to-end against a loopback node") {
    val requests = new AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (exchange: com.sun.net.httpserver.HttpExchange) => {
      requests.incrementAndGet()
      val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      val resp = SyntheticRpcServer.handle(body)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, resp.length)
      val out = exchange.getResponseBody
      try out.write(resp) finally out.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
      val rpc = chainDf("graft-rpc", "transaction", Map("url" -> url))
      val direct = chainDf("graft-chain", "transaction")
      assert(rpc.exceptAll(direct).count() == 0
        && direct.exceptAll(rpc).count() == 0)
      // 121 blocks / 25-block batches = 5 slices = 5 batched POSTs per scan;
      // >= because exceptAll planned the scan twice
      assert(requests.get() >= 5, s"expected batched POSTs, saw ${requests.get()}")
    } finally server.stop(0)
  }
}
