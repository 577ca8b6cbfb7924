package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._

/** Induced-skew robustness: one hot key owning ~30% of the rows (the
  * exchange-address shape of a real chain graph). These tests assert the
  * QUANTITATIVE spread — record ceilings per reducer unit, measured on
  * deterministic row counts, never wall-clock — alongside the semantic
  * equality the oracle queries (j_salted_skew_hot, dedup_components_hot,
  * graph_two_hop_hot) already pin against DuckDB.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 100k rows; key 42 owns 30% of them. The payload keeps the row id —
  // the real shape of a hot KEY (one address, many distinct events); the
  // content-derived salt needs varying payload bytes to spread on.
  private def hotDf = spark.range(100000).select(
    when(pmod(col("id"), lit(10L)) < 3, lit(42L)).otherwise(col("id")).as("k"),
    col("id").as("v"))

  test("salted sum under a 30% hot key: every salt engaged, partials bounded, result exact") {
    val df = hotDf
    // exactness vs the plain aggregate
    val plain = df.groupBy("k").agg(sum(col("v")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), "v", salts = 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // spread: the hot key's 30k rows must hit ALL 16 salts, each partial
    // within 2x of the ideal 30000/16 — the content-derived salt cannot
    // silently collapse (the failure mode of a partition-id-only salt on
    // pre-clustered input)
    val parts = df.withColumn("__salt", Skew.rowSalt(df, 16))
      .filter(col("k") === 42L)
      .groupBy(col("__salt")).count().collect().map(_.getLong(1))
    assert(parts.length == 16, s"only ${parts.length}/16 salts engaged")
    assert(parts.max <= 2L * 30000 / 16,
      s"hot partial too large: ${parts.max} vs ideal ${30000 / 16}")
  }

  test("salted equi join under a 30% hot key: reducer record ceiling drops; content salt survives pre-clustered input") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val l = hotDf
      val r = spark.range(100000).select(col("id").as("k"),
        (col("id") % 3).as("tag"))
      def maxPartitionRecords(df: org.apache.spark.sql.DataFrame): Long =
        df.select(spark_partition_id().as("pid"))
          .groupBy("pid").count().agg(max("count")).head().getLong(0)
      // plain join: the hot key pins one reducer with >= its 30k rows
      val plainMax = maxPartitionRecords(l.join(r, Seq("k")))
      assert(plainMax >= 30000L, s"fixture not skewed: $plainMax")
      // salted join: (k, salt) spreads the hot key across reducers
      val saltedOut = Skew.saltedEquiJoin(l, r, Seq("k"), salts = 16)
      val saltedMax = maxPartitionRecords(saltedOut)
      assert(saltedMax * 2 <= plainMax,
        s"salting did not halve the reducer ceiling: $saltedMax vs $plainMax")
      // and the result is the plain join's, exactly
      assert(saltedOut.count() == l.join(r, Seq("k")).count())
      // pre-clustered input (the layout a bucketed sink hands back): all
      // hot rows in ONE input partition — the content-derived salt still
      // spreads them (a partition-id salt would give them all one value)
      val clustered = l.repartition(col("k"))
      val clusteredParts = clustered
        .withColumn("__salt", Skew.rowSalt(clustered, 16))
        .filter(col("k") === 42L)
        .groupBy(col("__salt")).count().collect().map(_.getLong(1))
      assert(clusteredParts.length == 16,
        s"pre-clustered hot key engaged only ${clusteredParts.length}/16 salts")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("factorized two-hop under a 30% hub: no pair expansion, rows stay |E|-bounded") {
    // hub-remapped weighted edges: ~30% of endpoints collapse onto node 9.
    // src and dst are INDEPENDENT hash streams of the row id (a multiplier
    // mod 1000 would make both functions of id mod 1000 — perfectly
    // correlated endpoints, no hub forms)
    val raw = spark.range(20000).select(
      pmod(xxhash64(col("id"), lit(1)), lit(1000L)).as("src"),
      pmod(xxhash64(col("id"), lit(2)), lit(1000L)).as("dst"))
    def hot(c: org.apache.spark.sql.Column) =
      when(pmod(c, lit(10L)) < 3, lit(9L)).otherwise(c)
    val ewh = raw.select(hot(col("src")).as("src"), hot(col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val nEdges = ewh.count()
    // exact pair join through the hub would materialize deg_in*deg_out
    val hub = ewh.filter(col("dst") === 9L).count() *
      ewh.filter(col("src") === 9L).count()
    assert(hub > 10L * nEdges, s"fixture hub not quadratic: $hub vs $nEdges")
    // the factorized plan's largest intermediate is the |E|-row join of
    // edges against the |V|-row inflow table — count it directly
    val inflow = ewh.groupBy(col("dst")).agg(sum(col("w")).as("iw"))
      .select(col("dst").as("mid"), col("iw"))
    val joined = ewh.select(col("src").as("mid"), col("dst").as("node"), col("w"))
      .join(inflow, "mid")
    assert(joined.count() == nEdges,
      "factorized two-hop materialized more than |E| rows")
    // and it equals the pair-expanded truth
    val fact = joined.groupBy("node").agg(sum(col("w") * col("iw")).as("n_paths"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = ewh.select(col("src").as("s0"), col("dst").as("mid"), col("w").as("w1"))
    val b = ewh.select(col("src").as("mid"), col("dst").as("node"), col("w").as("w2"))
    val pairs = a.join(b, "mid").groupBy("node")
      .agg(sum(col("w1") * col("w2")).as("n_paths"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fact == pairs)
  }
}
