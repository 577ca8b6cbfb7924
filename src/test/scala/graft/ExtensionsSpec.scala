package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-wide injection path: a session created with
  * `spark.sql.extensions=graft.functions.GraftExtensions` must resolve all
  * graft SQL functions WITHOUT any registry call and run the
  * bucket-inference optimizer rule WITHOUT extraOptimizations — exactly
  * what `--conf spark.sql.extensions=...` gives every session on a real
  * cluster. (The other specs cover the per-session register()/
  * extraOptimizations paths; this one covers deployment.) */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=GraftExtensions injects functions and the bucket rule") {
    // force SparkSession creation (extensions apply only at session
    // creation); the JVM-wide SparkContext is reused and NOT stopped
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // `spark.sql.extensions` is a STATIC conf resolved from the
    // SparkContext, and this JVM's context already exists (created by an
    // earlier suite without it) — so inject the extension object through
    // the builder, which exercises the exact class the conf string names
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      s.sparkContext.setLogLevel("ERROR")
      // scalar + aggregate functions resolve by SQL name alone
      val r = s.sql(
        """SELECT graft_md5_long('alpha') AS h,
          |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
        .collect()(0)
      assert(r.getLong(0) == graft.functions.Md5LongExpr.hash(
        "alpha".getBytes("UTF-8")))
      assert(r.getDouble(1) == 11.0)
      val u = s.sql(
        """SELECT graft_uint256_sum(w) AS t FROM
          |  (SELECT unhex('01') AS w UNION ALL SELECT unhex('ff'))""".stripMargin)
        .collect()(0)
      assert(u.get(0) != null)

      // the optimizer rule fires from the extension injection alone
      val dir = java.nio.file.Files.createTempDirectory("ext_binf").toString + "/t"
      import s.implicits._
      val df = s.range(0, 5000).toDF("block_id")
        .withColumn("block_id_group",
          graft.functions.ColumnFns.blockIdGroup(col("block_id")))
      graft.eth.Sinks.writeBucketedParquet(df, dir, "block_id_group", Seq("block_id"))
      val q = s.read.parquet(dir).filter(col("block_id").between(1500, 2499))
      val plan = q.queryExecution.executedPlan.toString
      val pf = plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      assert(pf.contains("block_id_group"), s"rule did not fire:\n$plan")
      assert(q.count() == 1000)
    } finally {
      // do NOT stop s (it shares the JVM's SparkContext with every other
      // suite) — just restore the previous session bindings
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
