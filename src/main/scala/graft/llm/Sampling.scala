package graft.llm

import org.apache.spark.sql.DataFrame
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
}
