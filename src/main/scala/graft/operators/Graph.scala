package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over a weighted edge list — the graphsense-downstream
  * primitives the reference's exported tables feed (reference context:
  * `graphsense-ethereum-etl` produces the raw blocks/txs/traces that the
  * GraphSense platform turns into an ADDRESS GRAPH; the platform-side
  * operators are importance ranking and multi-hop flow over that graph).
  * Node ids are opaque longs — an address dictionary (address → long id,
  * the standard graphsense encoding) plugs in upstream without changing
  * the operators.
  *
  * Both operators are pure DataFrame programs in the same admissible
  * shapes as [[ConnectedComponents]]: per-iteration cost is one equi-join
  * shuffle on the node id plus one fixed-width aggregate with map-side
  * combine; driver state is zero (fixed iteration count); lineage is
  * truncated every round with `localCheckpoint`. All rank arithmetic is
  * integer micro-units with truncating division of non-negative operands
  * (Spark `div` ≡ DuckDB `//` there), so results are bit-deterministic
  * across engines, retries, and partitionings.
  */
object Graph {

  /** Weighted PageRank with a FIXED iteration count — the address-
    * importance ranking of a money-flow graph. Multi-edges are collapsed
    * first (`groupBy(src, dst) → sum(weight)`); each node then splits its
    * rank across out-edges proportional to edge weight:
    *
    *   contrib(u→v) = (rank_micro(u) * w(u→v)) div out_w(u)
    *   rank'_micro(v) = (1000 - dampMilli)·1000 + (dampMilli · Σ contrib) div 1000
    *
    * Dangling-node mass evaporates (the classic simplification — total
    * mass shrinks, relative order is what the ranking serves). The fixed
    * iteration count is the production form at 100 TB: convergence-test
    * loops cost a driver round-trip per check, while k iterations of
    * power-method PageRank is the documented, budgetable contract
    * (3 iterations separates hubs from leaves; 10+ approaches the
    * stationary distribution).
    *
    * Scale shape: the edge list (with its out-weight denormalized on) is
    * pinned ONCE and re-joined each round — at 1000 executors both sides
    * hash-partition on the join key, and the per-round aggregate is
    * map-side-combined on dst with cardinality |V|, never |E|. Returns
    * one row per node: (node, rank_micro). */
  def pagerank(edges: DataFrame, iters: Int = 3, dampMilli: Long = 850,
               srcCol: String = "src", dstCol: String = "dst",
               weightCol: Option[String] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampMilli >= 0 && dampMilli <= 1000,
      s"dampMilli must be in [0, 1000], got $dampMilli")
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    val ew = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), w.as("__w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("__w")).as("w"))
    val outw = ew.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    // reused every iteration: pin the joined edge+denominator table once
    val e = ew.join(outw, "src").localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)

    val base = (1000L - dampMilli) * 1000L
    var ranks = nodes.withColumn("rank_micro", lit(1000000L))
    var i = 0
    while (i < iters) {
      val sums = ranks.join(e, ranks("node") === e("src"))
        .select(col("dst"), expr("(rank_micro * w) div ow").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__m"))
      ranks = nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"(coalesce(__m, 0) * $dampMilli) div 1000"))
            .as("rank_micro"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** Two-hop in-neighborhood aggregate — "what reaches this address
    * through one intermediary" (the multi-hop flow question graphsense's
    * entity graph answers). Multi-edges are collapsed to weights, then
    * 2-paths (s → mid → d) come from ONE self-equi-join on the mid node
    * and are aggregated per destination:
    *
    *   n_paths   = Σ w(s→mid)·w(mid→d)   (path multiplicity)
    *   n_sources = |distinct s|           (2-hop reach)
    *   n_mids    = |distinct mid|         (intermediary fan-in)
    *
    * Scale shape: the join key is the mid node, so a hub's cost is
    * in-degree × out-degree — exactly the pair-expansion regime of the
    * LSH dedup buckets, and the same mitigations apply (AQE skew split
    * reactively; cap or sample hub neighborhoods explicitly when a
    * degree bound is known). No cartesian, no all-pairs: cost is
    * Σ_mid deg_in·deg_out, never |V|². */
  def twoHopPaths(edges: DataFrame, srcCol: String = "src",
                  dstCol: String = "dst",
                  weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    val ew = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), w.as("__w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("__w")).as("w"))
    val a = ew.select(col("src").as("s0"), col("dst").as("mid"), col("w").as("w1"))
    val b = ew.select(col("src").as("mid"), col("dst").as("node"), col("w").as("w2"))
    a.join(b, "mid")
      .groupBy(col("node"))
      .agg(sum(col("w1") * col("w2")).as("n_paths"),
        countDistinct(col("s0")).as("n_sources"),
        countDistinct(col("mid")).as("n_mids"))
  }
}
