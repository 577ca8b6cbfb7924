package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColumnFns.md5Long

/** Deterministic sampling operators for training-data pipelines.
  *
  * Everything here is a pure function of the row's id — content- and
  * partitioning-independent — so the same document lands in the same
  * sample on every run, cluster, and engine (`rand()`-based sampling
  * cannot promise any of that, and breaks replay/idempotence contracts).
  */
object Sampling {

  /** Stratified deterministic sampling: keep a row iff
    * `hash(id) mod granularity < rate(stratum) * granularity`, with the
    * per-stratum rate looked up from `rates` (columns: `stratum`, `rate`)
    * and `defaultRate` for strata absent from the table.
    *
    * The classic data-mixing knob: up-weight curated sources, down-sample
    * boilerplate-heavy ones, at per-stratum precision of 1/granularity.
    *
    * Scale shape: `rates` is stratum-cardinality (tiny) -> broadcast left
    * join; the data side streams through one scan + filter with no
    * shuffle, so the operator composes with any downstream partitioning.
    * The hash is the engine's cross-engine md5 ([[md5Long]]), making the
    * kept set reproducible in SQL oracles and across replays.
    */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: DataFrame, defaultRate: Double = 0.0,
                 granularity: Long = 1000000L): DataFrame = {
    require(granularity > 0, s"granularity must be positive, got $granularity")
    require(defaultRate >= 0.0 && defaultRate <= 1.0,
      s"defaultRate must be in [0,1], got $defaultRate")
    val r = rates.select(col("stratum").as("__stratum"), col("rate").as("__rate"))
    val threshold = round(coalesce(col("__rate"), lit(defaultRate)) * granularity)
      .cast("long")
    df.join(broadcast(r), df(strataCol) === col("__stratum"), "left")
      .filter(pmod(md5Long(col(idCol).cast("string")), lit(granularity)) < threshold)
      .drop("__stratum", "__rate")
  }

  /** Per-row weighted deterministic sampling: keep a row iff
    * `hash(id) mod granularity < round(weight * granularity)`, with the
    * weight a per-row COLUMN in [0,1] (vs [[stratified]]'s per-stratum
    * lookup) — the shape quality-weighted corpus sampling takes, where
    * each document's keep probability comes from its own quality score.
    *
    * Scale shape: one scan, one codegen'd filter, no shuffle, no join —
    * composes with any partitioning. Same cross-engine hash as the rest
    * of the sampling family, so the kept set is replay- and
    * oracle-stable. Weights outside [0,1] are clamped.
    */
  def weighted(df: DataFrame, idCol: String,
               weight: org.apache.spark.sql.Column,
               granularity: Long = 1000000L): DataFrame = {
    require(granularity > 0, s"granularity must be positive, got $granularity")
    val threshold = round(
      greatest(least(weight, lit(1.0)), lit(0.0)) * granularity).cast("long")
    df.filter(
      pmod(md5Long(col(idCol).cast("string")), lit(granularity)) < threshold)
  }

  /** Deterministic sequence packing: assign each document a (shard,
    * pack_idx, pack_offset) placement in the concat-and-chunk layout
    * pretraining uses — all documents of a shard concatenated in id order,
    * the token stream cut every `seqLen` tokens; a document's pack is the
    * chunk its first token lands in.
    *
    * Sharding is what makes this scale: a single global concatenation
    * order would force the running token sum through ONE task, so the
    * stream is first split into `shards` independent streams by id hash
    * (content-independent, deterministic) and the cumulative sum is a
    * window per shard — `shards` parallel running sums, each a bounded
    * partition. Placements are reproducible across runs/clusters/engines:
    * every ingredient is a pure function of (id, tokenCount).
    */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: String,
                    seqLen: Long, shards: Int = 64): DataFrame = {
    require(seqLen > 0 && shards > 0,
      s"seqLen and shards must be positive, got $seqLen / $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(md5Long(col(idCol).cast("string")), lit(shards)))
      .withColumn("tokens_before", coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      .withColumn("pack_idx", expr(s"tokens_before div $seqLen"))
      .withColumn("pack_offset", expr(s"tokens_before % $seqLen"))
  }
}
