package graft.eth

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Enrichment joins (SURVEY §2.3).
  *
  * J1 is the reference's single real join: every transaction merged with its
  * receipt (ref: ethereum-etl `enrich_transactions`, called at
  * scripts/eth_cassandra_streaming.py:628 and scripts/eth_csv_export.py:544).
  * The reference implements it as an in-memory hash join that *raises* when a
  * transaction lacks a receipt; we reproduce that contract with a broadcast
  * left join plus a single null-count aggregate (one pass, no second join).
  */
object Enrich {

  /** Raised when the J1 cardinality contract is violated. */
  final class MissingReceiptException(val missing: Long)
    extends RuntimeException(
      s"$missing transaction(s) have no matching receipt (J1 contract: every tx must have exactly one receipt)")

  /** J1: merge each transaction with its receipt on tx hash.
    *
    * The receipts side is one micro-batch (bounded, small) — broadcast hash
    * join, never a shuffle of the tx side. `receiptCols` are landed under
    * their `receipt_*` names (ref: scripts/schema.cql:46-51).
    *
    * @param requireReceipt when true (reference behavior), throw
    *                       [[MissingReceiptException]] if any tx is missing a
    *                       receipt; when false, keep nulls (left join).
    */
  def enrichTransactions(
      txs: DataFrame,
      receipts: DataFrame,
      txHashCol: String = "tx_hash",
      receiptTxHashCol: String = "transaction_hash",
      requireReceipt: Boolean = true): DataFrame = {

    val receiptSide = receipts.withColumnRenamed(receiptTxHashCol, "__receipt_tx_hash")
    val joined = txs.join(
      broadcast(receiptSide),
      txs(txHashCol) === receiptSide("__receipt_tx_hash"),
      "left")

    if (requireReceipt) {
      // Single bounded-metadata aggregate, not a per-row driver loop.
      val missing = joined.filter(col("__receipt_tx_hash").isNull).count()
      if (missing > 0) throw new MissingReceiptException(missing)
    }
    joined.drop("__receipt_tx_hash")
  }

  /** J2: denormalize `block.timestamp` onto each transaction as
    * `block_timestamp` (ref: the landed column at scripts/schema.cql:42 and
    * CSV header scripts/eth_csv_export.py:65 — ethereum-etl does this at
    * export time). Blocks side is small per batch -> broadcast. */
  def withBlockTimestamp(
      txs: DataFrame,
      blocks: DataFrame,
      blockIdCol: String = "block_id",
      timestampCol: String = "timestamp"): DataFrame = {
    val blockSide = blocks
      .select(col(blockIdCol).as("__b_block_id"),
        col(timestampCol).as("block_timestamp"))
    txs.join(broadcast(blockSide), txs(blockIdCol) === blockSide("__b_block_id"), "left")
      .drop("__b_block_id")
  }
}
