package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.eth.Sinks
import graft.functions.ColumnFns
import graft.plans.BucketPredicateInference

/** The custom Catalyst rule: block_id-only predicates gain the derived
  * block_id_group partition predicate (directory pruning without the caller
  * knowing the bucket layout). */
class BucketInferenceSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BucketPredicateInference()
    try f finally spark.experimental.extraOptimizations = prev
  }

  private lazy val sink: String = {
    val path = Files.createTempDirectory("binf").toString + "/t"
    val df = spark.range(0, 10000).toDF("block_id")
      .withColumn("block_id_group", ColumnFns.blockIdGroup(col("block_id")))
      .withColumn("v", col("block_id") % 7)
    Sinks.writeBucketedParquet(df, path, "block_id_group", Seq("block_id"))
    path
  }

  test("derives PartitionFilters from a block_id-only range filter") {
    withRule {
      val q = spark.read.parquet(sink)
        .filter(col("block_id").between(3000, 4999))
      val p = q.queryExecution.executedPlan.toString
      // the partition predicate was NOT written by the user — the rule
      // must have derived it and FileSourceScan must use it for pruning
      assert(p.contains("PartitionFilters"), p)
      assert(p.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("block_id_group"), s"no derived bucket predicate:\n$p")
      assert(q.count() == 2000)
    }
  }

  test("point lookup gets an exact bucket equality bound") {
    withRule {
      val q = spark.read.parquet(sink).filter(col("block_id") === 4242)
      val pf = q.queryExecution.executedPlan.toString
        .replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      assert(pf.contains("block_id_group"), pf)
      assert(q.count() == 1)
    }
  }

  test("does not fire without id bounds or when bucket already constrained") {
    withRule {
      // a derived conjunct renders as "(block_id_group#N >= v)" / "<= v)"
      val derived = "block_id_group#\\d+ [<>]=".r
      // no bounds on block_id -> no derived predicate
      val p1 = spark.read.parquet(sink).filter(col("v") === 3)
        .queryExecution.optimizedPlan.toString
      assert(derived.findAllIn(p1).isEmpty, p1)
      // bucket already constrained -> unchanged (no derived range conjunct
      // on top of the user's equality)
      val p2 = spark.read.parquet(sink)
        .filter(col("block_id_group") === 2 && col("block_id") >= 2500)
        .queryExecution.optimizedPlan.toString
      assert(derived.findAllIn(p2).isEmpty, p2)
    }
  }

  test("does not fire above an aggregate whose alias shadows block_id") {
    withRule {
      // sum(block_id) aliased to block_id: the invariant does NOT hold for
      // this column — a derived bucket predicate would filter every group
      // out (bucket sums are in the millions)
      val q = spark.read.parquet(sink)
        .groupBy(col("block_id_group"))
        .agg(sum(col("block_id")).as("block_id"))
        .filter(col("block_id") >= 3000000)
      assert(q.count() == 7) // buckets 3..9: sum of 1000 ids ≈ (b+0.5)M
      val p = q.queryExecution.optimizedPlan.toString
      assert("block_id_group#\\d+ [<>]=".r.findAllIn(p).isEmpty, p)
    }
  }

  test("IN-list predicates derive bucket bounds from the extreme members") {
    withRule {
      val q = spark.read.parquet(sink)
        .filter(col("block_id").isin(4242, 4243, 5251))
      val pf = q.queryExecution.executedPlan.toString
        .replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      assert(pf.contains("block_id_group"), s"no derived bucket bounds:\n$pf")
      assert(q.count() == 3)
      // large IN lists optimize to InSet — bounds must still derive
      val many = (4000 to 4300) :+ 6001
      val q2 = spark.read.parquet(sink)
        .filter(col("block_id").isin(many: _*))
      val pf2 = q2.queryExecution.executedPlan.toString
        .replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      assert(pf2.contains("block_id_group"), s"no derived InSet bounds:\n$pf2")
      assert(q2.count() == many.length)
    }
  }

  test("huge id literal over an Int bucket column saturates, never wraps") {
    withRule {
      // floorDiv(3e12, 1000) = 3e9 exceeds Int.MaxValue. The partition
      // column reads back as Int, so a wrapped literal (-1294967296) used
      // as an upper bound would prune EVERY partition and silently return
      // zero rows; saturation keeps the bound loose instead. Counts must
      // match the rule-off answer exactly.
      val hi = spark.read.parquet(sink).filter(col("block_id") <= 3000000000000L)
      assert(hi.count() == 10000, "wrapped upper bound pruned matching rows")
      val lo = spark.read.parquet(sink).filter(col("block_id") >= 3000000000000L)
      assert(lo.count() == 0)
      // negative-huge literal saturates at Int.MinValue (loose, not wrong)
      val neg = spark.read.parquet(sink).filter(col("block_id") >= -3000000000000L)
      assert(neg.count() == 10000)
    }
  }

  test("conservative bounds: strict comparisons keep every matching row") {
    withRule {
      val q = spark.read.parquet(sink)
        .filter(col("block_id") > 2999 && col("block_id") < 5000)
      assert(q.count() == 2000)
    }
  }
}
