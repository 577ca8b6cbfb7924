package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiler — the data-quality summary every ingest pipeline runs
  * before trusting a new drop: one row per profiled column with row/
  * non-null/distinct counts and min/max, as a TABLE (so it lands in the
  * same sinks, diffs, and alerts as any other dataset).
  *
  * ONE pass over the data: all per-column aggregates ride a single
  * `agg(...)` (Spark plans the multi-`countDistinct` via Expand — a
  * deliberate exact-profile cost; swap in `approx_count_distinct` or the
  * KMV manifest ([[graft.eth.Sinks]]) when profiling 100 TB), then the
  * wide 1-row result pivots to rows with one `explode` of plan-time
  * structs — no second scan, no join.
  *
  * min/max are computed on the NATIVE type (numeric min, not
  * lexicographic) and cast to string only for the uniform report schema.
  * Callers should profile integer/string columns when the report feeds a
  * cross-engine compare — float-to-string formatting is engine-specific.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs >= 1 column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = array(cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_str"), col(s"__mx_$c").as("max_str"))
    }: _*)
    wide.select(explode(rows).as("__r")).select(col("__r.*"))
  }
}
