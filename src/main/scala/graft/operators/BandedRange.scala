package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe value-RANGE frame counting: `count(*) OVER (PARTITION BY g
  * ORDER BY v RANGE BETWEEN W PRECEDING AND CURRENT ROW)` without the
  * window — Spark plans that window as one task per distinct `g`, which
  * for a low-cardinality group key (5 order priorities) means five tasks
  * each sorting ~N/5 of the corpus. The banded equi-join form below keeps
  * every stage keyed on corpus-cardinality keys.
  *
  * Shape (integer `v`, inclusive window `[v − W, v]`):
  *
  *   1. distinct-value compression: one hash aggregate to
  *      (g, v) → cnt. All rows sharing (g, v) share the answer, so
  *      everything downstream is sized by DISTINCT values, not rows.
  *   2. band bucketing with width exactly W: floor((v−W)/W) = floor(v/W) − 1,
  *      so every in-window peer value lives in the value's own bucket or
  *      the one below — a fan-out of exactly 2 probes per distinct value.
  *   3. probe equi-join on (g, bucket) + the residual BETWEEN filter, then
  *      re-aggregate per (g, v). Per-probe match width is ≤ W + 1 distinct
  *      integer values by construction — bounded work per value, no
  *      range-join quadratic blowup, no skewed exchange.
  *   4. broadcast-free add-back: join the per-(g, v) counts onto the rows
  *      (corpus-cardinality key, balanced shuffle or AQE-picked strategy).
  *
  * NULL semantics match the SQL window: rows with a NULL order value are
  * all PEERS of each other within their group (they ride a per-group
  * count, not the band machinery), and NULL group keys are ordinary
  * groups (every join here is null-safe — a plain equi-join would
  * silently drop those rows).
  *
  * At 100 TB the distinct-value table grows sub-linearly (bounded by the
  * value domain), and every join key above has corpus-scale cardinality —
  * the plan has no single-task stage to hit. */
object BandedRange {

  /** Append `outCol` = the number of rows in the same `groupCols` group
    * whose integer `valueCol` lies in `[valueCol − w, valueCol]`
    * (inclusive — the RANGE BETWEEN w PRECEDING AND CURRENT ROW frame
    * under a count aggregate). `w` must be positive; values within `w`
    * of Long.MinValue would wrap in the frame-bound subtraction and are
    * outside the contract.
    *
    * ADAPTIVE DISPATCH (r15, hardened r16): below `smallInputBytes` —
    * judged by [[GlobalRank.isSmall]]'s trustworthy-upper-bound walk
    * (leaf-scan bytes with the in-memory expansion factor, pinned
    * actual block-manager bytes; join-derived inputs fail toward the
    * banded branch) — the operator takes Spark's native RANGE window:
    * one exchange + one sort, optimal while the whole input fits
    * comfortably in a handful of tasks, and the exact semantic
    * reference the banded form is property-tested against. Above the
    * bound (or with no trustworthy bound) it takes the banded
    * equi-join form below — the plan that survives a low-cardinality
    * group key at 100 TB (the window is one task per distinct group).
    * Both branches are exact and return identical rows; pass
    * `smallInputBytes = 0` to pin the banded plan (the scale gates and
    * PropertiesSpec do). */
  def peersWithin(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  w: Long, outCol: String,
                  smallInputBytes: Long = 64L << 20): DataFrame = {
    require(w > 0, s"window width must be positive, got $w")
    if (GlobalRank.isSmall(df, smallInputBytes)) {
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCols.map(col).toIndexedSeq: _*)
        .orderBy(col(valueCol).cast("long"))
        .rangeBetween(-w, org.apache.spark.sql.expressions.Window.currentRow)
      return df.withColumn(outCol, count(lit(1)).over(win))
    }
    val gCols = groupCols.map(col)
    val gAliased = groupCols.zipWithIndex
      .map { case (c, i) => col(c).as(s"__br_g$i") }
    def gMatch = groupCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__br_g$i") }
    // exact integer FLOOR division (subtract the non-negative pmod first,
    // then truncating `div` on the exact multiple) — `floor(v / w)` would
    // route through double division and drift above 2^53, and bare `div`
    // truncates toward zero, breaking the bucket invariant for negatives
    val bucket = expr(s"(__br_v - pmod(__br_v, ${w}L)) div ${w}L")
    // 1. distinct-value compression (non-null values; nulls ride below)
    val vals = df.filter(col(valueCol).isNotNull)
      .groupBy(gCols :+ col(valueCol).cast("long").as("__br_v"): _*)
      .agg(count(lit(1)).as("__br_cnt"))
    // 2.+3. two bucket probes per distinct value, residual range filter,
    // per-value re-aggregation (map-side combinable: key is (g, v))
    val probes = vals.select(gCols :+ col("__br_v").as("__br_tv") :+
        explode(array(bucket - 1, bucket)).as("__br_b"): _*)
    val sources = vals.select(gAliased :+ col("__br_v").as("__br_sv") :+
      col("__br_cnt") :+ bucket.as("__br_b2"): _*)
    val counts = probes
      .join(sources, ((col("__br_b") === col("__br_b2")) +: gMatch).reduce(_ && _))
      .filter(col("__br_sv").between(col("__br_tv") - w, col("__br_tv")))
      .groupBy(gCols :+ col("__br_tv"): _*)
      .agg(sum(col("__br_cnt")).cast("long").as(outCol))
      .select(gAliased :+ col("__br_tv") :+ col(outCol): _*)
    // SQL RANGE-frame null semantics: null order keys are peers of each
    // other — their count is the group's null count
    val nullCounts = df.filter(col(valueCol).isNull)
      .groupBy(gCols: _*).agg(count(lit(1)).cast("long").as(outCol))
      .select(gAliased :+ lit(null).cast("long").as("__br_tv") :+
        col(outCol): _*)
    // 4. add-back on the corpus-cardinality (g, v) key, null-safe
    val addCond = ((col("__br_tvl") <=> col("__br_tv")) +: gMatch).reduce(_ && _)
    df.withColumn("__br_tvl", col(valueCol).cast("long"))
      .join(counts.unionByName(nullCounts), addCond)
      .drop("__br_tvl" +: "__br_tv" +: groupCols.indices.map(i => s"__br_g$i"): _*)
  }
}
