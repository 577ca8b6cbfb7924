package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Skew mitigation helpers.
  *
  * At 100 TB a handful of hot keys (a popular contract address, an exchange
  * wallet) can pin a single reducer. Salting splits each key's rows across
  * `salts` sub-aggregations, then merges the partials — two shuffles of
  * bounded-cardinality data instead of one shuffle with a straggler. AQE
  * skew-join handling covers joins; this covers aggregations.
  */
object Skew {

  /** Deterministic per-row salt, derived from ROW CONTENT (all hashable
    * columns) plus the input partition id.
    *
    * Why content and not partition id alone: an input already clustered by
    * the hot key — read back from a bucketed sink, or downstream of a
    * key aggregation — holds every row of that key in ONE partition, so a
    * partition-id salt gives them all the same value and the mechanism
    * silently does nothing in exactly the layouts where skew is most
    * common. Hashing the row's columns spreads a hot key by its varying
    * payload regardless of physical layout.
    *
    * Why the partition id is still mixed in: rows that are bit-identical
    * (same key, same payload) hash alike, and a flood of identical rows is
    * a real skew shape; the partition id separates identical rows that sit
    * in different input partitions. Both ingredients are retry-stable — a
    * recomputed partition has the same id and the same content (unlike
    * `rand()`/`monotonically_increasing_id`, which re-salt recomputed rows
    * and corrupt counts across a shuffle retry) — provided the input plan
    * is deterministic, the same precondition every Spark shuffle already
    * relies on. Map-bearing columns are excluded (Spark forbids hashing
    * maps at ANY nesting depth — array<map<...>> and struct fields
    * included), so the check recurses.
    */
  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case ArrayType(et, _) => containsMap(et)
    case StructType(fields) => fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  private[graft] def rowSalt(df: DataFrame, salts: Int): Column = {
    val hashable = df.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    pmod(hash((spark_partition_id() +: hashable): _*), lit(salts))
  }

  /** Two-phase salted sum: exactly `df.groupBy(keys).sum(valueCol)` but with
    * each key's rows spread over `salts` partial aggregates first. The salt
    * is content-derived ([[rowSalt]]), so the spread survives inputs already
    * clustered by the key.
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                salts: Int): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", rowSalt(df, salts))
      .groupBy((keyCols :+ "__salt").map(col).toIndexedSeq: _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a deterministic
    * content-derived salt ([[rowSalt]] — retry-stable, layout-independent),
    * the right side is replicated once per salt value, and the join key
    * becomes (key, salt) — a hot key's rows spread over `salts` reducers
    * instead of pinning one. Result set is identical to `left.join(right,
    * keyCols, joinType)`. Cost: |right| × salts extra rows through the
    * shuffle, so use for big-skewed ⋈ small-to-medium where broadcast
    * doesn't fit but one reducer per hot key is the bottleneck. (AQE
    * skew-join splitting covers the same ground reactively; this is the
    * explicit form for when the skew is known ahead of time.)
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
    val l = left.withColumn("__salt", rowSalt(left, salts))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, (keyCols :+ "__salt").toIndexedSeq, joinType).drop("__salt")
  }
}
