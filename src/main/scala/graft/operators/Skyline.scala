package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) query (Börzsönyi et al. 2001): the rows not
  * dominated by any other row — `s` dominates `r` iff `s.x <= r.x` and
  * `s.y <= r.y` with at least one strict. The multi-criteria "best
  * trade-offs" operator (cheapest-with-best-discount, shortest-with-
  * highest-quality) that no single ORDER BY can express.
  *
  * Two phases, both relational:
  *   1. BROADCAST PRUNE: pick the row minimizing `x + y` (any point on
  *      the frontier's "knee"); every row it strictly dominates — the
  *      entire upper-right quadrant — dies in one codegen'd filter
  *      against a 1-row broadcast. On non-adversarial distributions this
  *      removes almost everything, leaving the thin L-band around the
  *      frontier.
  *   2. SWEEP: order survivors by `x`; a row is on the frontier iff its
  *      `y` beats the running min over strictly-smaller `x` (integer
  *      RANGE frame to 1 PRECEDING — ties in `x` are NOT "previous") and
  *      it carries the min `y` of its own `x` group. Duplicate (x, y)
  *      points all survive (neither dominates the other), the standard
  *      value-skyline convention.
  *
  * Scale note: the sweep window is unpartitioned — correct because phase
  * 1 already shrank the input to the frontier band (skyline output and
  * its band are tiny for any distribution without a huge anti-chain). A
  * corpus that IS one huge anti-chain (adversarial negative correlation)
  * needs the local-skyline-then-merge generalization: skyline(P₁ ∪ P₂) =
  * skyline(skyline(P₁) ∪ skyline(P₂)) — the same sweep run per partition
  * first, which this operator's algebra supports by construction.
  *
  * Both criteria are MINIMIZED; negate a column to maximize it. Integer
  * columns required (the RANGE frame and exact compares depend on it).
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val p0 = df
      .orderBy(col(xCol) + col(yCol), col(xCol))
      .limit(1)
      .select(col(xCol).as("__px"), col(yCol).as("__py"))
    val pruned = df.crossJoin(broadcast(p0))
      .filter(!(col(xCol) >= col("__px") && col(yCol) >= col("__py")
        && (col(xCol) > col("__px") || col(yCol) > col("__py"))))
      .drop("__px", "__py")
    val sweep = Window.orderBy(col(xCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameX = Window.partitionBy(col(xCol))
    pruned
      .withColumn("__mp", min(col(yCol)).over(sweep))
      .withColumn("__ms", min(col(yCol)).over(sameX))
      .filter((col("__mp").isNull || col(yCol) < col("__mp"))
        && col(yCol) === col("__ms"))
      .drop("__mp", "__ms")
  }
}
