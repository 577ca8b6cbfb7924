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
    * is the *input partition id* — deterministic under task retry (a
    * recomputed partition gets the same id, unlike `rand()` or
    * `monotonically_increasing_id`, which would re-salt recomputed rows and
    * double-count across a shuffle retry), and independent of row content,
    * so a hot key flooding identical values still spreads across as many
    * salts as input partitions hold it.
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                salts: Int): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy((keyCols :+ "__salt").map(col).toIndexedSeq: _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a deterministic
    * salt (input partition id — retry-stable, content-independent), the
    * right side is replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows spread over `salts` reducers instead of
    * pinning one. Result set is identical to `left.join(right, keyCols,
    * joinType)`. Cost: |right| × salts extra rows through the shuffle, so use
    * for big-skewed ⋈ small-to-medium where broadcast doesn't fit but one
    * reducer per hot key is the bottleneck. (AQE skew-join splitting covers
    * the same ground reactively; this is the explicit form for when the skew
    * is known ahead of time.)
    *
    * Supported joinTypes: "inner", "left" — per-left-row multiplicities are
    * preserved because every left row carries exactly one salt and every
    * right row appears exactly once per salt value.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                     salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    require(joinType == "inner" || joinType == "left",
      s"saltedEquiJoin supports inner/left, got $joinType")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedEquiJoin: inputs already carry a __salt column (it would be" +
        " silently overwritten and dropped)")
    val l = left.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, (keyCols :+ "__salt").toIndexedSeq, joinType).drop("__salt")
  }
}
