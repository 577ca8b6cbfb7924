package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Bloom-prefiltered equi-join — explicit runtime row-level filtering
  * (the move Spark's own `spark.sql.optimizer.runtimeFilter.*` makes
  * opportunistically, here as a first-class operator the caller
  * controls): build a Bloom filter over the SMALL side's join keys (one
  * linear scan collapsing to a ≤ bits/64-word table), push the probe
  * into the BIG side as a pure codegen predicate evaluated AT THE SCAN,
  * then run the ordinary join on the survivors.
  *
  * Why it matters at 100 TB: a selective dimension (1% of orders) joined
  * against a fact table normally shuffles the ENTIRE fact side — the
  * Bloom probe drops ~99% of fact rows before the exchange for the cost
  * of k hashes per row, no extra shuffle, no false negatives (the join
  * itself removes the Bloom's false positives, so the result is exactly
  * the plain join's). The filter ships as a plan literal (8 KiB at 2^16
  * bits), not a broadcast relation.
  *
  * When NOT to use it: a small side too big for its false-positive rate
  * at the chosen `bits` (the probe stops rejecting anything), or a
  * non-selective join (nothing to reject). Both degrade to the plain
  * join's cost plus k hashes/row — never worse than a constant factor.
  */
object BloomJoin {

  /** Inner equi-join of `big` ⋈ `small` on `keyCol`, Bloom-prefiltered.
    * Result is EXACTLY `big.join(small, keyCol)` — the Bloom stage only
    * prunes rows that provably cannot match. */
  def bloomFilteredJoin(big: DataFrame, small: DataFrame, keyCol: String,
                        bits: Int = 1 << 16, numHashes: Int = 4): DataFrame = {
    val filter = TextAnalysis.bloomBuild(
      small.select(col(keyCol).cast("string").as("__k")), "__k", bits, numHashes)
    val pre = big.filter(
      TextAnalysis.bloomMightContain(filter, bits, numHashes,
        col(keyCol).cast("string")))
    pre.join(small, keyCol)
  }
}
