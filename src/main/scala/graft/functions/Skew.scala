package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation helpers.
  *
  * At 100 TB a handful of hot keys (a popular contract address, an exchange
  * wallet) can pin a single reducer. Salting splits each key's rows across
  * `salts` sub-aggregations, then merges the partials — two shuffles of
  * bounded-cardinality data instead of one shuffle with a straggler. AQE
  * skew-join handling covers joins; this covers aggregations.
  */
object Skew {

  /** Two-phase salted sum: exactly `df.groupBy(keys).sum(valueCol)` but with
    * each key's rows spread over `salts` partial aggregates first. The salt
    * derives from the row *position* (`monotonically_increasing_id`), not
    * row content — a hot key whose rows all carry the same value (the
    * classic flood: millions of identical transfers) still spreads evenly.
    * Salt choice affects only intermediate layout, never the result.
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                salts: Int): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy((keyCols :+ "__salt").map(col).toIndexedSeq: _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
