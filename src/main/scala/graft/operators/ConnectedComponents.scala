package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the clustering step that turns
  * verified near-duplicate PAIRS into duplicate GROUPS (pick one survivor
  * per component). Spark has no built-in; this is iterative min-label
  * propagation:
  *
  *   label(v) := min(label(v), min over neighbors u of label(u))
  *
  * repeated until a fixpoint. Each iteration is one shuffle join (labels ⋈
  * edges) plus one aggregation; the driver loop carries only ONE long per
  * iteration (the label-sum convergence check — labels only ever decrease,
  * so an unchanged sum IS the fixpoint, no row-wise diff join needed).
  * `localCheckpoint` truncates the growing lineage each round.
  *
  * Converges in O(diameter) iterations. Near-dup components are tiny
  * (pairs/triples), so 2-3 rounds in practice; for adversarial
  * long-diameter graphs at 100 TB the production upgrade is the
  * large-star/small-star algorithm (Kiveris et al.), which is the same
  * join-aggregate shape with a different update rule — the plan properties
  * (shuffle on node id, map-side combine, bounded driver state) carry over.
  */
object ConnectedComponents {

  /** @return one row per node: (node, component) where component is the
    *         smallest node id reachable from it. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxIter: Int = 15): DataFrame = {
    // both directions from ONE evaluation of the (possibly expensive) edge
    // plan: a union of two selects would run it twice before the checkpoint
    val sym = edges
      .select(explode(array(
        struct(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b")),
        struct(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b"))))
        .as("__e"))
      .select(col("__e.a").as("a"), col("__e.b").as("b"))
      .localCheckpoint(true) // reused every iteration: pin it once

    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint(true)
    // sum over an EMPTY edge list is null — return the empty labeling
    // instead of dereferencing it
    val first = labels.agg(sum(col("component"))).collect()(0)
    if (first.isNullAt(0)) return labels
    var prevSum = first.getLong(0)

    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      // labels flowing across edges: b's label arrives at a
      val incoming = sym.join(labels, sym("b") === labels("node"))
        .select(sym("a").as("node"), col("component"))
      // the convergence sum rides an Observation on the checkpoint's own
      // evaluation — one job per iteration, not a checkpoint job plus a
      // separate aggregate job over the checkpointed data
      val obs = new org.apache.spark.sql.Observation()
      val updated = labels.select(col("node"), col("component"))
        .union(incoming)
        .groupBy(col("node")).agg(min(col("component")).as("component"))
        .observe(obs, sum(col("component")).as("label_sum"))
        .localCheckpoint(true)
      val newSum = obs.get("label_sum").asInstanceOf[Number].longValue()
      labels = updated
      converged = newSum == prevSum // labels are monotone non-increasing
      prevSum = newSum
      i += 1
    }
    // a silent partial labeling would split components (and, downstream,
    // keep redundant near-duplicates) — refuse to return one
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxIter iterations — " +
        "graph diameter exceeds maxIter; raise it or switch to a " +
        "star-contraction variant for long-chain graphs")
    labels
  }
}
