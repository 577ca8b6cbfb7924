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
    * `events.ts` has shipped as either parquet TIMESTAMP(NANOS) (which
    * Spark reads only as a nanos long, via the legacy conf) or plain
    * TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ), depending
    * on the generator run. Normalize BOTH to a session-zone (UTC)
    * microsecond TIMESTAMP — exactly what DuckDB's `CAST(ts AS TIMESTAMP)`
    * yields for either layout, so oracle comparisons agree. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integer div, not `/` (double loses bits on ~1.7e18 nanos)
          df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case _ => // micros: NTZ -> session-zone timestamp, value preserved
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
