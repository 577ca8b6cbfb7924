package graft.eth

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Enrichment joins (SURVEY §2.3).
  *
  * J1 is the reference's single real join: every transaction merged with its
  * receipt (ref: ethereum-etl `enrich_transactions`, called at
  * scripts/eth_cassandra_streaming.py:628 and scripts/eth_csv_export.py:544).
  * The reference implements it as an in-memory hash join that *raises* when a
  * transaction lacks a receipt; we reproduce that contract with a broadcast
  * left join plus validation.
  */
object Enrich {

  /** Raised when the J1 cardinality contract is violated. */
  final class MissingReceiptException(val missing: Long)
    extends RuntimeException(
      s"$missing transaction(s) have no matching receipt (J1 contract: every tx must have exactly one receipt)")

  /** Raised when the receipts side itself contains duplicate hashes —
    * a left join would silently fan transactions out. */
  final class DuplicateReceiptException(val dupes: Long)
    extends RuntimeException(
      s"$dupes duplicate receipt hash(es) in the receipts batch (J1 contract: exactly one receipt per tx)")

  /** J1: merge each transaction with its receipt on tx hash.
    *
    * The receipts side is one micro-batch (bounded, small) — broadcast hash
    * join, never a shuffle of the tx side. `receiptCols` are landed under
    * their `receipt_*` names (ref: scripts/schema.cql:46-51).
    *
    * Contract enforcement ("exactly one receipt per tx"):
    *   - `checkDuplicates=true` (default) verifies the *small* receipts side
    *     has one row per non-null hash (one eager aggregate over the
    *     micro-batch; null hashes are NOT counted as duplicates — they
    *     simply never match and surface as missing receipts). Pipelines that
    *     instead dedupe receipts by PK upfront (replayed rows are
    *     byte-identical, T4) pass `false` and skip the extra scan;
    *   - `requireReceipt=true` eagerly verifies no tx lacks a receipt. This
    *     costs a second evaluation of the join (count + downstream use), so
    *     large pipelines should instead pass an [[Observation]] via
    *     `missingObs` and check [[assertNoMissingReceipts]] after their
    *     terminal action — single pass, validation piggybacks on the real
    *     job.
    *
    * PIPELINE DEFAULT: fused pipelines must not call this with the eager
    * defaults — both default-on checks add an extra job per micro-batch
    * that is easy to forget in a larger DAG. Use
    * [[enrichTransactionsPipelined]] (PK-dedup + Observation, zero extra
    * jobs), which is what [[EthPipeline]] runs.
    */
  def enrichTransactions(
      txs: DataFrame,
      receipts: DataFrame,
      txHashCol: String = "tx_hash",
      receiptTxHashCol: String = "transaction_hash",
      requireReceipt: Boolean = true,
      missingObs: Option[Observation] = None,
      checkDuplicates: Boolean = true): DataFrame = {

    if (checkDuplicates) {
      // non-null count vs distinct count: a null hash is a missing-receipt
      // problem, not a duplicate
      val Array(nonNull, distinct) = receipts
        .agg(count(col(receiptTxHashCol)), countDistinct(col(receiptTxHashCol)))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
      if (nonNull != distinct) throw new DuplicateReceiptException(nonNull - distinct)
    }

    val receiptSide = receipts.withColumnRenamed(receiptTxHashCol, "__receipt_tx_hash")
    val joined = txs.join(
      broadcast(receiptSide),
      txs(txHashCol) === receiptSide("__receipt_tx_hash"),
      "left")

    val observed = missingObs match {
      case Some(obs) => joined.observe(obs,
        sum(when(col("__receipt_tx_hash").isNull, 1L).otherwise(0L)).as("missing_receipts"))
      case None => joined
    }

    if (requireReceipt) {
      // eager validation: bounded-metadata aggregate (costs one extra
      // evaluation of the join — see scaladoc for the single-pass variant)
      val missing = joined.filter(col("__receipt_tx_hash").isNull).count()
      if (missing > 0) throw new MissingReceiptException(missing)
    }
    observed.drop("__receipt_tx_hash")
  }

  /** The pipeline-default J1: single-pass contract enforcement with ZERO
    * extra jobs per micro-batch. Duplicate receipts are collapsed by PK
    * (replayed rows are byte-identical — T4 idempotence makes the
    * dropDuplicates semantics-preserving, not lossy) instead of the eager
    * count/countDistinct scan, and the missing-receipt check rides the
    * caller's Observation, validated by [[assertNoMissingReceipts]] after
    * the terminal action. This is what [[EthPipeline]] runs; prefer it in
    * any fused DAG. */
  def enrichTransactionsPipelined(
      txs: DataFrame,
      receipts: DataFrame,
      missingObs: Observation,
      txHashCol: String = "tx_hash",
      receiptTxHashCol: String = "transaction_hash"): DataFrame =
    enrichTransactions(txs, receipts.dropDuplicates(receiptTxHashCol),
      txHashCol, receiptTxHashCol,
      requireReceipt = false, missingObs = Some(missingObs),
      checkDuplicates = false)

  /** Read the missing-receipt count recorded by an [[Observation]] passed to
    * [[enrichTransactions]], after a terminal action has run. Throws the
    * reference's contract violation if any transaction lacked a receipt. */
  def assertNoMissingReceipts(obs: Observation): Unit = {
    val missing = obs.get.getOrElse("missing_receipts", 0L) match {
      case null => 0L // sum over an empty frame
      case v: Number => v.longValue()
    }
    if (missing > 0) throw new MissingReceiptException(missing)
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
