package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiler — the data-quality summary every ingest pipeline runs
  * before trusting a new drop: one row per profiled column with row/
  * non-null/distinct counts and min/max, as a TABLE (so it lands in the
  * same sinks, diffs, and alerts as any other dataset).
  *
  * TWO passes, both cheap: (1) an exploded (column, value) projection
  * feeding a two-level distinct aggregate — the shuffle carries one row
  * per DISTINCT (column, value) pair, never the corpus, and avoids the
  * ×(4·cols) Expand a multi-`countDistinct` over one agg would plan;
  * (2) a map-side-only min/max/count pass on the native types. The two
  * column-table-sized results meet by broadcast. Swap the distinct level
  * for `approx_count_distinct` or the KMV manifest
  * ([[graft.eth.Sinks]]) when profiling 100 TB.
  *
  * min/max are computed on the NATIVE type (numeric min, not
  * lexicographic) and cast to string only for the uniform report schema;
  * distinctness is counted on the string form (injective for the
  * integer/string columns this feeds — float-to-string formatting is
  * engine-specific, so keep floats out of oracle-facing reports).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs >= 1 column")
    val pairs = df.select(explode(array(cols.map { c =>
      struct(lit(c).as("column"), col(c).cast("string").as("__v"))
    }: _*)).as("__p")).select(col("__p.column").as("column"), col("__p.__v"))
    val distincts = pairs.filter(col("__v").isNotNull)
      .groupBy(col("column"))
      .agg(count(lit(1)).as("n_nonnull"), countDistinct(col("__v")).as("n_distinct"))
    val minMax = df.agg(count(lit(1)).as("__n"), cols.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }: _*)
    val mmRows = minMax.select(explode(array(cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__mn_$c").as("min_str"), col(s"__mx_$c").as("max_str"))
    }: _*)).as("__r")).select(col("__r.*"))
    mmRows.join(broadcast(distincts), Seq("column"), "left")
      .select(col("column"), col("n_rows"),
        coalesce(col("n_nonnull"), lit(0L)).as("n_nonnull"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_str"), col("max_str"))
  }
}
