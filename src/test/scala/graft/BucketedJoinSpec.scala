package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-located join: the shuffle is paid once at write time;
  * every later join on the bucket key runs with NO Exchange on either
  * side. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans no Exchange") {
    val base = java.nio.file.Files.createTempDirectory("bjoin").toString
    spark.range(0, 10000).toDF("k").withColumn("v", col("k") % 7)
      .write.format("parquet").bucketBy(8, "k").sortBy("k")
      .option("path", s"$base/a").saveAsTable("bj_a")
    spark.range(0, 5000).toDF("k").withColumn("w", col("k") % 3)
      .write.format("parquet").bucketBy(8, "k").sortBy("k")
      .option("path", s"$base/b").saveAsTable("bj_b")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bj_a").join(spark.table("bj_b"), "k")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(j.count() == 5000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS bj_a")
      spark.sql("DROP TABLE IF EXISTS bj_b")
    }
  }
}
