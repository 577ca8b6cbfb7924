package graft

import graft.eth.Enrich

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def txs = Seq(("0xaa", 1), ("0xbb", 2), ("0xcc", 3))
    .toDF("tx_hash", "block_id")
  private def receipts = Seq(("0xaa", 21000L), ("0xbb", 42000L))
    .toDF("transaction_hash", "receipt_gas_used")

  test("J1 raises when a transaction has no receipt (reference contract)") {
    val e = intercept[Enrich.MissingReceiptException] {
      Enrich.enrichTransactions(txs, receipts)
    }
    assert(e.missing == 1)
  }

  test("J1 enriches every matched transaction; requireReceipt=false keeps nulls") {
    val out = Enrich.enrichTransactions(txs, receipts, requireReceipt = false)
      .orderBy("block_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("receipt_gas_used") == 21000L)
    assert(out(2).isNullAt(out(2).fieldIndex("receipt_gas_used")))
  }

  test("J1 with full receipts passes the cardinality check") {
    val full = receipts.union(Seq(("0xcc", 1L)).toDF("transaction_hash", "receipt_gas_used"))
    assert(Enrich.enrichTransactions(txs, full).count() == 3)
  }

  test("duplicate receipts are rejected (fan-out guard)") {
    val dup = receipts.union(Seq(("0xaa", 1L)).toDF("transaction_hash", "receipt_gas_used"))
    val e = intercept[Enrich.DuplicateReceiptException] {
      Enrich.enrichTransactions(txs, dup, requireReceipt = false)
    }
    assert(e.dupes == 1)
  }

  test("null receipt hashes are not misreported as duplicates") {
    val withNull = receipts.union(
      Seq((null.asInstanceOf[String], 0L)).toDF("transaction_hash", "receipt_gas_used"))
    // no DuplicateReceiptException — the null key surfaces as a missing
    // receipt on the join side instead
    val out = Enrich.enrichTransactions(txs, withNull, requireReceipt = false)
    assert(out.count() == 3)
  }

  test("observation-based J1 validation is single-pass and still throws") {
    val obs = new org.apache.spark.sql.Observation()
    val out = Enrich.enrichTransactions(txs, receipts,
      requireReceipt = false, missingObs = Some(obs))
    out.count() // the terminal action the metric piggybacks on
    val e = intercept[Enrich.MissingReceiptException] {
      Enrich.assertNoMissingReceipts(obs)
    }
    assert(e.missing == 1)
    // clean case: no exception
    val obs2 = new org.apache.spark.sql.Observation()
    val full = receipts.union(Seq(("0xcc", 1L)).toDF("transaction_hash", "receipt_gas_used"))
    Enrich.enrichTransactions(txs, full, requireReceipt = false,
      missingObs = Some(obs2)).count()
    Enrich.assertNoMissingReceipts(obs2)
  }

  test("J2 lands block_timestamp on each tx") {
    val blocks = Seq((1, 1000), (2, 2000), (3, 3000)).toDF("block_id", "timestamp")
    val out = Enrich.withBlockTimestamp(txs, blocks).orderBy("block_id").collect()
    assert(out.map(_.getAs[Int]("block_timestamp")).toSeq == Seq(1000, 2000, 3000))
  }

  test("J1 plan broadcasts the receipts side (no tx-side shuffle)") {
    val plan = Enrich.enrichTransactions(txs, receipts, requireReceipt = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in plan:\n$plan")
  }
}
