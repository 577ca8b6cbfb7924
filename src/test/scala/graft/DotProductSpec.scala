package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{ColumnFns, GraftFunctions}

/** Native codegen'd graft_dot vs the composable HOF dot product: identical
  * results (incl. null and length-mismatch semantics), and the native form
  * stays inside whole-stage codegen. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def native(a: String, b: String) = call_function("graft_dot", col(a), col(b))

  test("native == HOF on random float vectors (one Spark job)") {
    GraftFunctions.register(spark)
    val gen = Gen.listOfN(16, Gen.chooseNum(-100f, 100f))
    val rows = (0 until 300).map(_ => (gen.sample.get.toArray, gen.sample.get.toArray))
    val out = rows.toDF("a", "b")
      .select(native("a", "b").as("n"),
        ColumnFns.dotProduct(col("a"), col("b")).as("h"))
      .collect()
    out.foreach(r => assert(r.getAs[Double]("n") == r.getAs[Double]("h")))
  }

  test("null semantics match the HOF form: null element / length mismatch -> null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array[java.lang.Float](1f, 2f), Array[java.lang.Float](3f, 4f)),   // 11.0
      (Array[java.lang.Float](1f, null), Array[java.lang.Float](3f, 4f)), // null elem
      (Array[java.lang.Float](1f, 2f, 3f), Array[java.lang.Float](3f, 4f)) // len mismatch
    ).toDF("a", "b")
    val out = df.select(native("a", "b").as("n"),
      ColumnFns.dotProduct(col("a"), col("b")).as("h")).collect()
    assert(out(0).getAs[Double]("n") == 11.0 && out(0).getAs[Double]("h") == 11.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }

  test("mixed element types: float x double (LSH planes) and int x long") {
    GraftFunctions.register(spark)
    val out = Seq((Array(1.5f, 2f), Array(2.0, 10.0), Array(1, 2), Array(10L, 100L)))
      .toDF("f", "d", "i", "l")
      .select(native("f", "d").as("fd"), native("i", "l").as("il"))
      .collect()(0)
    assert(out.getAs[Double]("fd") == 23.0)
    assert(out.getAs[Double]("il") == 210.0)
  }

  test("fused graft_cosine is bit-identical to the composed dot/norm formula") {
    GraftFunctions.register(spark)
    def composed(a: String, b: String) =
      native(a, b) / (sqrt(native(a, a)) * sqrt(native(b, b)))
    val gen = Gen.listOfN(16, Gen.chooseNum(-100f, 100f))
    val rows = (0 until 300).map(_ => (gen.sample.get.toArray, gen.sample.get.toArray))
    val out = rows.toDF("a", "b")
      .select(call_function("graft_cosine", col("a"), col("b")).as("fused"),
        composed("a", "b").as("comp"))
      .collect()
    out.foreach { r =>
      // compare raw bits so NaN == NaN and -0.0 != 0.0 distinctions hold
      assert(java.lang.Double.doubleToRawLongBits(r.getAs[Double]("fused")) ==
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("comp")))
    }
    // zero-norm vectors: the composed form DIES under ANSI (DIVIDE_BY_ZERO);
    // the fused expression keeps IEEE semantics (0/0 -> NaN) — strictly
    // more tolerant, and degenerate vectors never match a threshold filter
    val z = Seq((Array.fill(16)(0f), gen.sample.get.toArray)).toDF("a", "b")
      .select(call_function("graft_cosine", col("a"), col("b")).as("c")).collect()
    assert(z(0).getAs[Double]("c").isNaN)
    // null semantics follow graft_dot: null element / length mismatch -> null
    val edge = Seq(
      (Array[java.lang.Float](1f, null), Array[java.lang.Float](3f, 4f)),
      (Array[java.lang.Float](1f, 2f, 3f), Array[java.lang.Float](3f, 4f))
    ).toDF("a", "b")
      .select(call_function("graft_cosine", col("a"), col("b")).as("c")).collect()
    assert(edge.forall(_.isNullAt(0)))
  }

  test("graft_dot runs inside whole-stage codegen") {
    GraftFunctions.register(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // non-foldable input (range), else ConvertToLocalRelation evaluates
      // the expression at plan time and there is no codegen stage to observe
      val df = spark.range(2)
        .select(array((col("id") + 1).cast("float"), lit(2f)).as("a"),
          array(lit(3f), lit(4f)).as("b"))
        .select(native("a", "b").as("s"))
      assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
      assert(df.orderBy("s").collect()(0).getAs[Double]("s") == 11.0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
