package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT global ranking: the two-phase alternative to
  * `row_number().over(Window.orderBy(...))`, which Spark executes by
  * moving the ENTIRE input through one task (WindowExec warns exactly
  * this) — the classic 100-TB cliff hiding inside a correct small-scale
  * plan.
  *
  * Phase shape (all declarative, all codegen'd):
  *
  *   1. `repartitionByRange(orderCols)` — range-shuffle so partition i
  *      holds a contiguous slice of the total order (RangePartitioner
  *      boundaries from a deterministic-seed sample; slice boundaries
  *      don't affect the result, only balance). `localCheckpoint(true)`
  *      pins the partitioning so the two consumers below can NEVER see
  *      different boundaries (cheaper and stricter than relying on
  *      exchange reuse).
  *   2. per-partition `row_number()` over a window PARTITIONED by
  *      `spark_partition_id()` — 32…N concurrent sorts of one slice
  *      each, never a single task.
  *   3. per-partition counts → cumulative offsets: an aggregate with ≤
  *      one row PER PARTITION, then an unpartitioned running-sum window
  *      over that dimension-sized frame (the one place a global window
  *      is legitimate: its input is already ≤ numShufflePartitions
  *      rows).
  *   4. broadcast the offsets back onto the slices:
  *      `global_rank = offset(pid) + local_rank`.
  *
  * The ranks are IDENTICAL to the single-task form for a total order
  * (callers pass a unique tiebreak column, so the order is total) —
  * same oracles keep passing — but the plan survives a 1000-executor
  * 100-TB input: two distributed shuffles of the narrow projection
  * instead of one all-to-one-task sort.
  */
object GlobalRank {

  /** Append `rnCol` = the exact 1-based global row number of each row
    * under the total order `orderCols` (callers must include a unique
    * tiebreak column so the order is total — otherwise ties are broken
    * by partition placement). */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column],
                      rnCol: String): DataFrame = {
    require(orderCols.nonEmpty, "globalRowNumber needs at least one order column")
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(nParts, orderCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .localCheckpoint(true)
    val local = ranged.withColumn("__gr_lrn", row_number()
      .over(Window.partitionBy(col("__gr_pid")).orderBy(orderCols: _*))
      .cast("long"))
    // one row per shuffle partition — dimension-sized by construction,
    // so the running-sum window below is NOT a corpus-sized global sort
    val offsets = ranged.groupBy(col("__gr_pid"))
      .agg(count(lit(1)).as("__gr_cnt"))
      .withColumn("__gr_off", coalesce(
        sum(col("__gr_cnt")).over(Window.orderBy(col("__gr_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gr_pid"), col("__gr_off"))
    local.join(broadcast(offsets), Seq("__gr_pid"))
      .withColumn(rnCol, col("__gr_off") + col("__gr_lrn"))
      .drop("__gr_pid", "__gr_lrn", "__gr_off")
  }

  /** Grouped form of [[globalRowNumber]]: exact 1-based row number WITHIN
    * each group under the total order `orderCols` — the scale-safe
    * replacement for `row_number().over(Window.partitionBy(lowCardCol)
    * .orderBy(...))` when the partition key has FAR fewer distinct values
    * than the cluster has cores (e.g. 5 order priorities): Spark plans
    * that as one task per key, each sorting ~N/5 of the corpus — the same
    * 100-TB cliff as the global window, five times over.
    *
    * Same two-phase shape, group-aware: range-shuffle on (group, order)
    * so every partition holds a contiguous slice of ONE OR MORE groups'
    * total orders; per-(pid, group) local row numbers (balanced concurrent
    * sorts); per-(pid, group) counts → per-group running offsets over the
    * pid axis (the offsets table is ≤ nParts + Σ|groups| rows — each
    * partition spans a contiguous group range, so it meets at most
    * (its groups) keys); broadcast add-back on (pid, group).
    *
    * Contract: intended for group cardinality ≪ parallelism (the offsets
    * ride a broadcast). High-cardinality groups don't need this — the
    * plain partitioned window is already balanced there. */
  def groupedRowNumber(df: DataFrame, groupCols: Seq[String],
                       orderCols: Seq[Column], rnCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupedRowNumber needs group columns" +
      " (use globalRowNumber for the ungrouped form)")
    require(orderCols.nonEmpty, "groupedRowNumber needs at least one order column")
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val gCols = groupCols.map(col)
    val ranged = df.repartitionByRange(nParts, gCols ++ orderCols: _*)
      .withColumn("__gg_pid", spark_partition_id())
      .localCheckpoint(true)
    val local = ranged.withColumn("__gg_lrn", row_number()
      .over(Window.partitionBy(col("__gg_pid") +: gCols: _*).orderBy(orderCols: _*))
      .cast("long"))
    // ≤ nParts + #groups rows (contiguous group ranges per partition);
    // the running sum below is per-GROUP over the pid axis — both
    // dimensions bounded, never a corpus-sized window
    val offsets = ranged.groupBy(col("__gg_pid") +: gCols: _*)
      .agg(count(lit(1)).as("__gg_cnt"))
      .withColumn("__gg_off", coalesce(
        sum(col("__gg_cnt")).over(Window.partitionBy(gCols: _*)
          .orderBy(col("__gg_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gg_pid").as("__gg_pid2") +:
        groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__gg_g$i") } :+
        col("__gg_off"): _*)
    // NULL-SAFE add-back: a plain equi-join would silently DROP every row
    // whose group key is null (null ≠ null) — the ranks for the null
    // group are as real as any other's
    val cond = (col("__gg_pid") === col("__gg_pid2")) +:
      groupCols.zipWithIndex.map { case (c, i) => col(c) <=> col(s"__gg_g$i") }
    local.join(broadcast(offsets), cond.reduce(_ && _))
      .withColumn(rnCol, col("__gg_off") + col("__gg_lrn"))
      .drop("__gg_pid" +: "__gg_pid2" +: "__gg_lrn" +: "__gg_off" +:
        groupCols.indices.map(i => s"__gg_g$i"): _*)
  }

  /** Tie-aware `rank` / `dense_rank` within groups, from the grouped
    * two-phase row number — never a per-group single-task sort:
    *
    *   - `rank`  = min row number over the row's PEER set (rows equal on
    *     `peerCols` within the group) — exactly SQL rank's "1 + rows
    *     strictly before".
    *   - `dense_rank` = the peer set's own row number in peer-set order —
    *     a second (much smaller) grouped ranking over the distinct-peer
    *     table.
    *
    * `orderCols` must be `peerCols` with sort direction plus a unique
    * tiebreak (any total order consistent with the peer order gives the
    * same tie-aware ranks). Adds `rankCol`/`denseRankCol`; the peer
    * aggregation and add-back join key on (group, peer) — corpus-
    * cardinality keys, balanced shuffles. */
  def groupedRankDense(df: DataFrame, groupCols: Seq[String],
                       peerCols: Seq[String], orderCols: Seq[Column],
                       rankCol: String, denseRankCol: String): DataFrame = {
    val rn = groupedRowNumber(df, groupCols, orderCols, "__gr_rn")
    val peers = rn.groupBy((groupCols ++ peerCols).map(col): _*)
      .agg(min(col("__gr_rn")).as(rankCol))
    val keys = groupCols ++ peerCols
    val dense = groupedRowNumber(peers, groupCols,
        Seq(col(rankCol)), denseRankCol)
      .select(keys.zipWithIndex.map { case (c, i) => col(c).as(s"__gr_k$i") } :+
        col(rankCol) :+ col(denseRankCol): _*)
    // NULL-SAFE add-back (groupBy treats null as a key; a plain equi-join
    // would drop every row whose group or peer value is null)
    val cond = keys.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__gr_k$i") }.reduce(_ && _)
    rn.join(dense, cond)
      .drop("__gr_rn" +: keys.indices.map(i => s"__gr_k$i"): _*)
  }

  /** Grouped form of [[globalPrefixSum]]: exact inclusive prefix sum of
    * `valueCol` WITHIN each group under the total order `orderCols` —
    * the scale-safe replacement for `sum().over(Window.partitionBy(
    * lowCardCol).orderBy(...))` when the partition key has far fewer
    * distinct values than the cluster has cores. Same two-phase shape as
    * [[groupedRowNumber]] with DECIMAL(38,0) sums in place of counts;
    * the add-back join is null-safe for the same reason. */
  def groupedPrefixSum(df: DataFrame, groupCols: Seq[String],
                       orderCols: Seq[Column], valueCol: String,
                       cumCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupedPrefixSum needs group columns" +
      " (use globalPrefixSum for the ungrouped form)")
    require(orderCols.nonEmpty, "groupedPrefixSum needs at least one order column")
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val gCols = groupCols.map(col)
    val ranged = df.repartitionByRange(nParts, gCols ++ orderCols: _*)
      .withColumn("__gs_pid", spark_partition_id())
      .localCheckpoint(true)
    val local = ranged.withColumn("__gs_lcs",
      sum(col(valueCol).cast("decimal(38,0)"))
        .over(Window.partitionBy(col("__gs_pid") +: gCols: _*)
          .orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, 0)))
    val offsets = ranged.groupBy(col("__gs_pid") +: gCols: _*)
      .agg(sum(col(valueCol).cast("decimal(38,0)")).as("__gs_tot"))
      .withColumn("__gs_off", coalesce(
        sum(col("__gs_tot")).over(Window.partitionBy(gCols: _*)
          .orderBy(col("__gs_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L).cast("decimal(38,0)")))
      .select(col("__gs_pid").as("__gs_pid2") +:
        groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__gs_g$i") } :+
        col("__gs_off"): _*)
    val cond = (col("__gs_pid") === col("__gs_pid2")) +:
      groupCols.zipWithIndex.map { case (c, i) => col(c) <=> col(s"__gs_g$i") }
    local.join(broadcast(offsets), cond.reduce(_ && _))
      .withColumn(cumCol, col("__gs_off") + col("__gs_lcs"))
      .drop("__gs_pid" +: "__gs_pid2" +: "__gs_lcs" +: "__gs_off" +:
        groupCols.indices.map(i => s"__gs_g$i"): _*)
  }

  /** Append `cumCol` = the exact inclusive prefix sum of `valueCol` under
    * the total order `orderCols` — [[globalRowNumber]]'s two-phase shape
    * with sums in place of counts: range-shuffle, per-slice running sums
    * (pid-partitioned window, never one task), per-slice totals →
    * dimension-sized offset window, broadcast add-back. Sums ride
    * DECIMAL(38,0) so corpus-scale weights can't wrap; the result is
    * identical to the single-task `sum().over(Window.orderBy(...))` form.
    * The primitive behind cumulative-share curves and systematic /
    * PPS sampling ([[graft.llm.Sampling.ppsSystematic]]). */
  def globalPrefixSum(df: DataFrame, orderCols: Seq[Column],
                      valueCol: String, cumCol: String): DataFrame = {
    require(orderCols.nonEmpty, "globalPrefixSum needs at least one order column")
    val nParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(nParts, orderCols: _*)
      .withColumn("__gp_pid", spark_partition_id())
      .localCheckpoint(true)
    val local = ranged.withColumn("__gp_lcs",
      sum(col(valueCol).cast("decimal(38,0)"))
        .over(Window.partitionBy(col("__gp_pid")).orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, 0)))
    val offsets = ranged.groupBy(col("__gp_pid"))
      .agg(sum(col(valueCol).cast("decimal(38,0)")).as("__gp_tot"))
      .withColumn("__gp_off", coalesce(
        sum(col("__gp_tot")).over(Window.orderBy(col("__gp_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L).cast("decimal(38,0)")))
      .select(col("__gp_pid"), col("__gp_off"))
    local.join(broadcast(offsets), Seq("__gp_pid"))
      .withColumn(cumCol, col("__gp_off") + col("__gp_lcs"))
      .drop("__gp_pid", "__gp_lcs", "__gp_off")
  }
}
