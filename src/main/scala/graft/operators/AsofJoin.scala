package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join, backward and forward: for each left row, attach the latest
  * right row whose timestamp is <= the left row's (backward) or the earliest
  * whose timestamp is >= it (forward), per key — the generalized form
  * of the reference's timestamp->block watermark lookup
  * (ref: scripts/eth_cassandra_streaming.py:199-216, which is the k=1 scalar
  * case over the block table).
  *
  * Spark has no ASOF JOIN operator; the composition below expresses it with
  * built-ins in ONE shuffle:
  *
  *   tag left(1)/right(0) -> unionByName -> window over (key) ordered by
  *   (ts, side) -> last non-null right value at-or-before each row -> keep
  *   left rows.
  *
  * Why not a range join (`l.ts >= r.ts` + per-left top-1)? That is O(|L|·|R|)
  * per key before the window prunes it. The union+window form is
  * O((|L|+|R|) log) — a single hash shuffle on the key plus an in-partition
  * sort, the same cost as a sort-merge join, and AQE-splittable on skewed
  * keys. At 100 TB the right side (block headers) is far smaller than the
  * left (events), and both stream through without materializing pairs.
  *
  * Right-side ties on (key, ts) are resolved before the union (latest by
  * `tieBreak` wins) so the operator is deterministic.
  */
object AsofJoin {

  /** @param left       probe side; keeps all its columns
    * @param right      reference side; `valueCols` are landed on each left row
    * @param keyCols    equi-join key
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param valueCols  right columns to land (as `asof_<name>`)
    * @param tieBreak   deterministic tie-break among right rows sharing
    *                   (key, ts): highest value of this column wins
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String, valueCols: Seq[String],
               tieBreak: String): DataFrame =
    asofImpl(left, right, keyCols, leftTs, rightTs, valueCols, tieBreak,
      forward = false)

  /** Forward as-of join: for each left row, attach the EARLIEST right row
    * whose timestamp is >= the left row's timestamp, per key ("next event
    * at-or-after" — e.g. next price tick, next block). Same single-shuffle
    * union+window shape as [[backward]], with the window ordered by
    * descending timestamp so "last value at-or-before" becomes "first value
    * at-or-after". Tie-break among right rows sharing (key, ts) is the same
    * highest-`tieBreak`-wins rule, applied before the union. */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTs: String, rightTs: String, valueCols: Seq[String],
              tieBreak: String): DataFrame =
    asofImpl(left, right, keyCols, leftTs, rightTs, valueCols, tieBreak,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTs: String, rightTs: String, valueCols: Seq[String],
                       tieBreak: String, forward: Boolean): DataFrame = {
    val reserved = Seq("__ts", "__side", "__asof") ++ valueCols.map(c => s"asof_$c")
    val clash = left.columns.intersect(reserved)
    require(clash.isEmpty,
      s"left columns collide with as-of internals/outputs: ${clash.mkString(", ")}")
    val key = keyCols.map(col)

    // dedupe right to one row per (key, ts): highest tieBreak wins; the
    // value columns complete the ordering so rows that even tie on
    // tieBreak resolve deterministically (fully identical rows are then
    // interchangeable — same landed struct either way)
    val rightRanked = right.withColumn("__rdup",
        row_number().over(Window.partitionBy((keyCols :+ rightTs).map(col): _*)
          .orderBy((col(tieBreak).desc +: valueCols.map(col(_).desc)).toIndexedSeq: _*)))
      .filter(col("__rdup") === 1).drop("__rdup")

    val leftCols = left.columns
    // side 0 sorts before side 1 at equal ts => "at-or-before" (<=) semantics.
    // Right values travel as ONE struct so a null inside a value column can't
    // make `last(ignoreNulls)` skip past the true latest right row.
    val taggedLeft = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val taggedRight = rightRanked
      .select((key :+ col(rightTs).as("__ts") :+ lit(0).as("__side")
        :+ struct(valueCols.map(col): _*).as("__asof")).toIndexedSeq: _*)

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // ascending ts: preceding rows are those at-or-before (backward);
    // descending ts: preceding rows are those at-or-after (forward). In
    // both, side 0 sorts before side 1 at equal ts, so an equal-ts right
    // row qualifies (<= / >= semantics).
    val tsOrd = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(key: _*)
      .orderBy(tsOrd, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(c => col(s"__asof.$c").as(s"asof_$c"))).toIndexedSeq: _*)
  }

  /** Nearest as-of join: for each left row, the right row with the
    * MINIMUM |Δts| — backward on ties (the MergeTree/kdb "nearest"
    * mode). Both direction candidates come from the SAME single key
    * shuffle: one exchange, two window sorts (ascending for
    * last-at-or-before, descending for first-at-or-after), then a
    * per-row integer distance compare picks the winner. Right-side ties
    * on (key, ts) resolve by the same highest-`tieBreak` rule. Lands
    * `asof_<col>` plus `asof_direction` ('backward'/'forward', null when
    * no right row exists on either side). */
  def nearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTs: String, rightTs: String, valueCols: Seq[String],
              tieBreak: String): DataFrame = {
    val reserved = Seq("__ts", "__side", "__b", "__f", "asof_direction") ++
      valueCols.map(c => s"asof_$c")
    val clash = left.columns.intersect(reserved)
    require(clash.isEmpty,
      s"left columns collide with as-of internals/outputs: ${clash.mkString(", ")}")
    val key = keyCols.map(col)
    val rightRanked = right.withColumn("__rdup",
        row_number().over(Window.partitionBy((keyCols :+ rightTs).map(col): _*)
          .orderBy((col(tieBreak).desc +: valueCols.map(col(_).desc)).toIndexedSeq: _*)))
      .filter(col("__rdup") === 1).drop("__rdup")
    val leftCols = left.columns
    val taggedLeft = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val taggedRight = rightRanked
      .select((key :+ col(rightTs).as("__ts") :+ lit(0).as("__side")
        :+ struct((col(rightTs).as("__rts") +: valueCols.map(col)).toIndexedSeq: _*)
          .as("__rv")).toIndexedSeq: _*)
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val wb = Window.partitionBy(key: _*)
      .orderBy(col("__ts").asc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(key: _*)
      .orderBy(col("__ts").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = unioned
      .withColumn("__b", last(col("__rv"), ignoreNulls = true).over(wb))
      .withColumn("__f", last(col("__rv"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .withColumn("__pick", expr(
        """CASE
          |  WHEN __b IS NULL AND __f IS NULL THEN NULL
          |  WHEN __f IS NULL THEN named_struct('v', __b, 'dir', 'backward')
          |  WHEN __b IS NULL THEN named_struct('v', __f, 'dir', 'forward')
          |  WHEN unix_micros(__ts) - unix_micros(__b.__rts)
          |       <= unix_micros(__f.__rts) - unix_micros(__ts)
          |    THEN named_struct('v', __b, 'dir', 'backward')
          |  ELSE named_struct('v', __f, 'dir', 'forward')
          |END""".stripMargin))
    picked.select((leftCols.map(col) ++
      valueCols.map(c => col(s"__pick.v.$c").as(s"asof_$c")) :+
      col("__pick.dir").as("asof_direction")).toIndexedSeq: _*)
  }
}
