package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query: the unit of the driver's correctness
  * gate. `oracle` is equivalent ANSI SQL runnable by DuckDB over the same
  * parquet tables; None -> the driver records a weaker rows-only check
  * (used only for ops whose output is not SQL-expressible, e.g.
  * approx_count_distinct).
  */
final case class Q(
    name: String,
    section: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  /** Load one driver testdata table (TESTDATA.md).
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * read it as a nanos long (legacy conf) and truncate to microseconds —
    * exactly what DuckDB's `CAST(ts_ns AS TIMESTAMP)` does, so oracle
    * comparisons agree. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        // integer div, not `/` (double loses bits on ~1.7e18 nanos)
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
