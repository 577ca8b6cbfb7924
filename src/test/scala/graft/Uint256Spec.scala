package graft

import java.math.BigInteger

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, Skew}

class Uint256Spec extends SparkSpec {
  import spark.implicits._

  private val maxU256 = Array.fill[Byte](32)(0xff.toByte)

  test("uint256 sum is exact beyond Decimal(38) and long range") {
    GraftFunctions.register(spark)
    val df = Seq(maxU256, maxU256, Array[Byte](0x01)).toDF("wei")
    val out = df.agg(expr("graft_uint256_sum(wei)")).collect()(0).getString(0)
    val expected = new BigInteger(1, maxU256)
      .multiply(BigInteger.valueOf(2)).add(BigInteger.ONE)
    assert(out == expected.toString)
    assert(expected.toString.length == 78) // 78 digits > Decimal(38)
  }

  test("uint256 sum skips nulls and survives partial/merge across partitions") {
    GraftFunctions.register(spark)
    val rows = (1 to 1000).map(i => Array[Byte](((i >> 8) & 0xff).toByte, (i & 0xff).toByte)) :+
      null.asInstanceOf[Array[Byte]]
    val df = rows.toDF("wei").repartition(7)
    val out = df.agg(expr("graft_uint256_sum(wei)")).collect()(0).getString(0)
    assert(out == (1 to 1000).map(_.toLong).sum.toString)
  }

  test("uint256 sum groups correctly") {
    GraftFunctions.register(spark)
    val df = Seq((1, Array[Byte](0x10)), (1, Array[Byte](0x01)), (2, Array[Byte](0x02)))
      .toDF("k", "wei")
    val out = df.groupBy("k").agg(expr("graft_uint256_sum(wei)").as("s"))
      .orderBy("k").collect()
    assert(out(0).getString(1) == "17" && out(1).getString(1) == "2")
  }

  test("rejects non-binary input at analysis time") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq(1, 2).toDF("x").agg(expr("graft_uint256_sum(x)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("salted sum equals plain groupBy sum") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L)).toDF("k", "v")
    val salted = Skew.saltedSum(df, Seq("k"), "v", salts = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq == Seq(("a", 6L), ("b", 10L)))
    // and on real data: identical to direct aggregation
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag"), round(col("l_quantity") * 100).cast("long").as("cents"))
    val direct = li.groupBy("l_returnflag").agg(sum("cents")).orderBy("l_returnflag")
      .collect().map(_.getLong(1)).toSeq
    val viaSalt = Skew.saltedSum(li, Seq("l_returnflag"), "cents", 16)
      .orderBy("l_returnflag").collect().map(_.getLong(1)).toSeq
    assert(direct == viaSalt)
  }
}
