package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis over an event log: for each user, the
  * earliest time they completed stage 0, then the earliest stage-1 event
  * AT OR AFTER that, then the earliest stage-2 event at or after THAT, …
  * — strictly sequential progression, the standard product-analytics /
  * conversion query (and, over pipeline telemetry, the "reached
  * download → filter → train" accounting a data-pipeline dashboard runs).
  *
  * Scale shape: stage 0 is one aggregate; each later stage is a left join
  * of the accumulated per-user frame against the (filtered) event stream
  * plus a re-aggregate — every shuffle keys on the user column, so the
  * exchange introduced by stage 0 is reused by all later stages instead
  * of re-partitioning per stage. Cost is `stages.length` passes over the
  * event scan with the stage filter pushed down; per-user state is one
  * row of `stages.length` timestamps, never a collected event list (a
  * `collect_list` funnel would OOM on a hot user at 100 TB).
  */
object Funnel {

  /** One row per user who completed stage 0, with `ts_0 … ts_{n-1}`
    * columns: `ts_i` = earliest `stages(i)`-typed event at or after
    * `ts_{i-1}`, null (and null for all later stages) if the user never
    * progressed. */
  def stageTimes(events: DataFrame, stages: Seq[String],
                 userCol: String = "user_id", tsCol: String = "ts",
                 typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("ts_0"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (stage, i)) =>
      val ev = events.filter(col(typeCol) === stage)
        .select(col(userCol), col(tsCol).as("__ts"))
      val carried = (0 until i).map(j => s"ts_$j")
      acc.join(ev, Seq(userCol), "left")
        .groupBy((userCol +: carried).map(col).toIndexedSeq: _*)
        // __ts >= null is null -> min(when) is null: a user stuck at
        // stage i-1 stays null through every later stage
        .agg(min(when(col("__ts") >= col(s"ts_${i - 1}"), col("__ts")))
          .as(s"ts_$i"))
    }
  }

  /** The funnel rollup: how many users reached each stage. One row,
    * `n_<stage>` columns (non-null counts of the stage times). */
  def stageCounts(events: DataFrame, stages: Seq[String],
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type"): DataFrame =
    stageTimes(events, stages, userCol, tsCol, typeCol)
      .agg(count(col("ts_0")).as(s"n_${stages.head}"),
        stages.zipWithIndex.drop(1).map { case (s, i) =>
          count(col(s"ts_$i")).as(s"n_$s")
        }.toIndexedSeq: _*)
}
