package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.Skew
import graft.llm.TextAnalysis
import graft.operators.AsofJoin

/** Round-3 operators: backward as-of join, salted equi-join, TF-IDF,
  * DDL generation. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("as-of backward: latest right at-or-before, per key; null when none") {
    val left = Seq(
      (1L, 10L, ts(100)), (2L, 10L, ts(250)), (3L, 10L, ts(300)),
      (4L, 20L, ts(50)), // user 20 has no click at all
      (5L, 30L, ts(100))) // user 30's only click is AFTER -> null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(100), 101L, 1.0), // exactly at left #1's ts -> matches (<=)
      (10L, ts(200), 102L, 2.0),
      (10L, ts(300), 103L, 3.0),
      (30L, ts(999), 301L, 9.0))
      .toDF("user_id", "rts", "click_id", "click_value")
    val out = AsofJoin.backward(left, right, Seq("user_id"), "ts", "rts",
        Seq("click_id", "click_value"), tieBreak = "click_id")
      .orderBy("event_id").collect()
    assert(out.map(r => Option(r.getAs[Any]("asof_click_id"))).toSeq ==
      Seq(Some(101L), Some(102L), Some(103L), None, None))
  }

  test("as-of nearest: min |dt| wins, equidistant goes backward, one-sided falls back") {
    val left = Seq(
      (1L, 10L, ts(200)), // click at 100 (dt 100) vs 250 (dt 50) -> forward
      (2L, 10L, ts(175)), // equidistant 100/250 (dt 75) -> backward wins
      (3L, 20L, ts(50)),  // only a later click -> forward fallback
      (4L, 30L, ts(50)))  // no clicks at all -> null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(100), 101L, 1.0), (10L, ts(250), 102L, 2.0),
      (20L, ts(500), 201L, 3.0))
      .toDF("user_id", "rts", "click_id", "click_value")
    val out = AsofJoin.nearest(left, right, Seq("user_id"), "ts", "rts",
        Seq("click_id", "click_value"), tieBreak = "click_id")
      .orderBy("event_id").collect()
    def pick(i: Int) = (Option(out(i).getAs[Any]("asof_click_id")),
      Option(out(i).getAs[String]("asof_direction")))
    assert(pick(0) == ((Some(102L), Some("forward"))))
    assert(pick(1) == ((Some(101L), Some("backward"))))
    assert(pick(2) == ((Some(201L), Some("forward"))))
    assert(pick(3) == ((None, None)))
  }

  test("as-of backward: right-side ties on (key, ts) resolve to highest tieBreak") {
    val left = Seq((1L, 10L, ts(500))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(400), 7L, 1.0), (10L, ts(400), 9L, 2.0), (10L, ts(400), 8L, 3.0))
      .toDF("user_id", "rts", "click_id", "click_value")
    val out = AsofJoin.backward(left, right, Seq("user_id"), "ts", "rts",
      Seq("click_id", "click_value"), tieBreak = "click_id").collect()
    assert(out(0).getAs[Long]("asof_click_id") == 9L)
    assert(out(0).getAs[Double]("asof_click_value") == 2.0)
  }

  test("as-of backward: a null inside a landed value column does not skip rows") {
    val left = Seq((1L, 10L, ts(500))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(300), Some(77L), Some(1.0)),
      (10L, ts(400), None: Option[Long], None: Option[Double])) // latest row, null values
      .toDF("user_id", "rts", "click_id", "click_value")
    val out = AsofJoin.backward(left, right, Seq("user_id"), "ts", "rts",
      Seq("click_id", "click_value"), tieBreak = "click_id").collect()
    // the latest right row wins even though its values are null — we must
    // NOT fall back to the older row 77
    assert(out(0).isNullAt(out(0).fieldIndex("asof_click_id")))
  }

  test("as-of forward: earliest right at-or-after; equal ts matches; none after -> null") {
    val left = Seq(
      (1L, 10L, ts(100)), // click exactly at 100 -> matches (>=)
      (2L, 10L, ts(250)), // next click at 300
      (3L, 10L, ts(301)), // nothing after -> null
      (4L, 20L, ts(50)))  // user 20 has no click at all -> null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(100), 101L, 1.0),
      (10L, ts(200), 102L, 2.0),
      (10L, ts(300), 103L, 3.0))
      .toDF("user_id", "rts", "click_id", "click_value")
    val out = AsofJoin.forward(left, right, Seq("user_id"), "ts", "rts",
        Seq("click_id", "click_value"), tieBreak = "click_id")
      .orderBy("event_id").collect()
    assert(out.map(r => Option(r.getAs[Any]("asof_click_id"))).toSeq ==
      Seq(Some(101L), Some(103L), None, None))
  }

  test("connected components: empty edge list yields empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.operators.ConnectedComponents.run(empty, "id_a", "id_b").count() == 0)
  }

  test("as-of rejects left columns that collide with its internals") {
    val l = Seq((1L, 10L, ts(1), "x")).toDF("event_id", "user_id", "ts", "__side")
    val r = Seq((10L, ts(1), 1L)).toDF("user_id", "rts", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.backward(l, r, Seq("user_id"), "ts", "rts", Seq("v"), "v")
    }
    assert(e.getMessage.contains("__side"))
  }

  test("salted equi-join matches the plain join, inner and left") {
    val left = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (4, "f"))
      .toDF("k", "lv")
    val right = Seq((1, 10), (1, 11), (3, 30)).toDF("k", "rv")
    for (jt <- Seq("inner", "left")) {
      val plain = left.join(right, Seq("k"), jt)
        .select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
      val salted = Skew.saltedEquiJoin(left, right, Seq("k"), salts = 3, joinType = jt)
        .select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
      assert(salted.toSeq == plain.toSeq, s"joinType=$jt")
    }
  }

  test("salt spreads a hot key even when the input is clustered by the key") {
    // the layout where a partition-id salt silently does nothing: every row
    // of the hot key in ONE partition (bucketed sink read-back, or any
    // repartition-by-key upstream). The content-derived salt must still
    // spread the hot key over >1 salt value / shuffle partition.
    val hot = (0 until 1000).map(i => (42, s"payload-$i"))
    val clustered = (hot ++ Seq((1, "x"), (2, "y"))).toDF("k", "lv")
      .repartition(col("k"))
    val spread = clustered
      .withColumn("__salt", Skew.rowSalt(clustered, 8))
      .filter(col("k") === 42)
      .select("__salt").distinct().count()
    assert(spread > 1, s"hot key stayed on $spread salt(s)")

    // and the join result is still exactly the plain join
    val right = Seq((42, 1), (1, 2)).toDF("k", "rv")
    val plain = clustered.join(right, Seq("k"), "inner")
      .select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedEquiJoin(clustered, right, Seq("k"), salts = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)

    // determinism: the salt is a pure function of (partition, content) —
    // two evaluations agree row-for-row
    val s1 = clustered.withColumn("__salt", Skew.rowSalt(clustered, 8))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getInt(2)).toMap
    val s2 = clustered.withColumn("__salt", Skew.rowSalt(clustered, 8))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(s1 == s2)
  }

  test("salt skips map-bearing columns at any nesting depth") {
    // Spark's hash() rejects MapType recursively — array<map> and a map
    // inside a struct must be excluded from the salt too, not just
    // top-level maps, or saltedSum fails analysis on such frames
    val df = Seq((1, 10L), (1, 32L), (2, 5L)).toDF("k", "v")
      .withColumn("m", map(lit("a"), lit(1)))
      .withColumn("am", array(map(lit("b"), lit(2))))
      .withColumn("sm", struct(lit(1).as("x"), map(lit("c"), lit(3)).as("mm")))
    val out = Skew.saltedSum(df, Seq("k"), "v", salts = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 42L, 2 -> 5L))
  }

  test("tf-idf: corpus-wide terms get idf 0; rarer terms weigh more") {
    val docs = Seq(
      (0L, "common alpha"), (1L, "common beta"), (2L, "common beta gamma"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(docs, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) -> r).toMap
    // "common" appears in all 3 docs -> idf = ln(3/3) = 0
    assert(out((0L, "common")).getAs[Long]("tfidf_micro") == 0L)
    // "alpha" (df=1) outweighs "beta" (df=2)
    assert(out((0L, "alpha")).getAs[Long]("tfidf_micro") >
      out((1L, "beta")).getAs[Long]("tfidf_micro"))
    assert(out((2L, "gamma")).getAs[Long]("df_count") == 1L)
  }

  test("k-means step: means are exact per-dimension averages of the assigned cell") {
    // 2-dim vectors, 2 obvious clusters around (1,0) and (0,1)
    val vecs = Seq(
      (10L, Array(0.9f, 0.1f)), (11L, Array(1.1f, -0.1f)),
      (12L, Array(0.1f, 0.9f)), (13L, Array(-0.1f, 1.1f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = graft.llm.Similarity.kmeansStep(vecs, cents)
      .orderBy("centroid_id", "pos").collect()
    // centroid 0 <- {10, 11}: mean (1.0, 0.0); centroid 1 <- {12, 13}:
    // (0.0, 1.0) — means in exact integer micro-units
    assert(out.map(r => (r.getAs[Long]("centroid_id"), r.getAs[Int]("pos"),
      r.getAs[Long]("mean_micro"), r.getAs[Long]("n_members"))).toSeq ==
      Seq((0L, 1, 1000000L, 2L), (0L, 2, 0L, 2L),
        (1L, 1, 0L, 2L), (1L, 2, 1000000L, 2L)))
  }

  test("connected components: chain, triangle, isolated pair; converges") {
    // chain 1-2-3-4 (diameter 3 — needs >1 iteration), triangle 10-11-12,
    // isolated pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L))
      .toDF("id_a", "id_b")
    val out = graft.operators.ConnectedComponents.run(edges, "id_a", "id_b")
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(out(_) == 10L))
    assert(Seq(20L, 21L).forall(out(_) == 20L))
    assert(out.size == 9)
  }

  test("star contraction matches label propagation on mixed graphs") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L), (30L, 30L))
      .toDF("id_a", "id_b") // incl. a self-loop, dropped up front
    val lp = graft.operators.ConnectedComponents.run(edges, "id_a", "id_b")
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
    val sc = graft.operators.ConnectedComponents
      .runStarContraction(edges, "id_a", "id_b")
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
    // both algorithms keep the self-loop-only node (labels itself)
    assert(sc == lp)
  }

  test("star contraction labels a 120-node path within its round budget") {
    // diameter 119: label propagation's default budget (15 rounds) cannot
    // finish this; star contraction halves chains every round
    val path = (0L until 119L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = graft.operators.ConnectedComponents
      .runStarContraction(path, "id_a", "id_b")
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("component"))
    assert(out.length == 120 && out.forall(_._2 == 0L))
    intercept[IllegalStateException] {
      graft.operators.ConnectedComponents.run(path, "id_a", "id_b")
    }
  }

  test("star contraction matches label propagation on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = Seq.fill(n)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
        .toDF("id_a", "id_b")
      val lp = graft.operators.ConnectedComponents.run(edges, "id_a", "id_b", maxIter = 40)
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
      val sc = graft.operators.ConnectedComponents
        .runStarContraction(edges, "id_a", "id_b")
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
      assert(sc == lp, s"trial $trial")
    }
  }

  test("star contraction: empty edge list yields empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.operators.ConnectedComponents
      .runStarContraction(empty, "id_a", "id_b").count() == 0)
  }

  test("funnel: strictly sequential progression, abandoners carry nulls forward") {
    import spark.implicits._
    // u1 completes all 3 in order; u2 clicks BEFORE viewing (must not
    // count); u3 views only
    val ev = Seq(
      (1L, 10, "view"), (1L, 20, "click"), (1L, 30, "purchase"),
      (2L, 50, "click"), (2L, 60, "view"),
      (3L, 70, "view"))
      .map { case (u, t, k) => (u, java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${t / 60}%02d:${t % 60}%02d"), k) }
      .toDF("user_id", "ts", "event_type")
    val out = graft.operators.Funnel
      .stageTimes(ev, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(out.length == 3)
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2) && !out(0).isNullAt(3))
    // u2's click precedes its view -> stage 1 unreached (and stage 2 null)
    assert(!out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3))
    assert(out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("int8 quantization: zero vector -> zero scale path, error bounded by scale/2") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, -0.5f, 0.25f))).toDF("vec_id", "embedding")
    val rows = graft.llm.Similarity.quantizeInt8(vecs)
      .orderBy("vec_id").collect()
    assert(rows(0).getAs[String]("q") == "0,0,0")
    assert(rows(0).getAs[Long]("scale_nano") == 0L)
    assert(rows(0).getAs[Long]("err_nano") == 0L)
    // max reconstruction error <= scale/2 (scale = 1/127)
    val scaleNano = rows(1).getAs[Long]("scale_nano")
    assert(rows(1).getAs[Long]("err_nano") <= scaleNano / 2 + 1)
  }

  test("pagerank: cycles conserve mass; stars concentrate it; weights split contributions") {
    import graft.operators.Graph
    // 3-cycle: every node passes its full rank on — ranks stay at 1.0
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rc = Graph.pagerank(cycle, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rank_micro")).toMap
    assert(rc == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))

    // star 1,2,3 -> 0: hub absorbs; leaf (dangling-source) ranks decay to
    // the base and the hub stabilizes at 150000 + 850·(3·150000)/1000
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val rs = Graph.pagerank(star, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rank_micro")).toMap
    assert(rs(0L) == 532500L && rs(1L) == 150000L && rs(3L) == 150000L)

    // weighted: src 0 splits 3:1 between dst 1 and 2 on the first hop
    val wed = Seq((0L, 1L, 3L), (0L, 2L, 1L)).toDF("src", "dst", "w")
    val rw = Graph.pagerank(wed, iters = 1, weightCol = Some("w")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rank_micro")).toMap
    assert(rw(1L) == 150000L + 850L * 750000L / 1000L)
    assert(rw(2L) == 150000L + 850L * 250000L / 1000L)

    // multi-edges collapse to weights before the split (2 parallel edges
    // 0->1 and 1 edge 0->2 behave as weights 2:1)
    val multi = Seq((0L, 1L), (0L, 1L), (0L, 2L)).toDF("src", "dst")
    val rm = Graph.pagerank(multi, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rank_micro")).toMap
    assert(rm(1L) == 150000L + 850L * 666666L / 1000L)
  }

  test("eigencentrality: prestige chains through feeders; max pins the grid") {
    import graft.operators.Graph
    // funnel 1,2 -> 3 -> 4. Round 1: node 3 takes the max inflow (2) ->
    // 1e6, node 4 half of it. Round 2: only node 4 has inflow (from 3),
    // so it alone holds the grid max; the sources read 0 throughout.
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r1 = Graph.eigencentrality(edges, rounds = 1).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("centrality_micro")).toMap
    assert(r1 == Map(1L -> 0L, 2L -> 0L, 3L -> 1000000L, 4L -> 500000L))
    val r2 = Graph.eigencentrality(edges, rounds = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("centrality_micro")).toMap
    assert(r2 == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1000000L))
    // a cycle is a fixed point: every node keeps full centrality
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rc = Graph.eigencentrality(cycle, rounds = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("centrality_micro")).toMap
    assert(rc == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("label spread: chains label hop by hop; equal-mass ties take the smaller label") {
    import graft.operators.Graph
    val chain = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val seeds = Seq((0L, 10L)).toDF("node", "label")
    val out = Graph.labelSpread(chain, seeds, rounds = 2).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("label"), r.getAs[Long]("labeled_round"))).toMap
    assert(out == Map(0L -> ((10L, 0L)), 1L -> ((10L, 1L)), 2L -> ((10L, 2L))))
    // two seeds vote on node 3 with equal weight -> smaller label wins
    val vee = Seq((0L, 3L), (7L, 3L)).toDF("src", "dst")
    val two = Seq((0L, 100L), (7L, 200L)).toDF("node", "label")
    val ov = Graph.labelSpread(vee, two, rounds = 1).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(ov(3L) == 100L)
  }

  test("random walks: sinks end walks; forced path follows the only edge") {
    import graft.operators.Graph
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = Graph.randomWalks(edges, steps = 3).collect()
      .map(r => (r.getAs[Long]("walker"), r.getAs[Long]("step"),
        r.getAs[Long]("node"))).toSet
    // walker 1 must step to 2 then stop (2 is a sink); walker 2 never moves
    assert(out == Set((1L, 0L, 1L), (1L, 1L, 2L), (2L, 0L, 2L)))
    // a 2-cycle walks forever: every step emits for both walkers
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val oc = Graph.randomWalks(cyc, steps = 3).collect()
    assert(oc.length == 8) // 2 walkers x steps 0..3, no drops
  }

  test("personalized pagerank: mass restarts at seeds; rank vector stays sparse") {
    import graft.operators.Graph
    // chain 1 -> 2 -> 3, seed {1}: after 3 iters the exact integer ranks
    // are 150000 / 127500 / 108375; nothing else appears (sparse vector)
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r = Graph.personalizedPagerank(chain, seeds, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rank_micro")).toMap
    assert(r == Map(1L -> 150000L, 2L -> 127500L, 3L -> 108375L))
    // seed on a 2-cycle keeps full mass at fixpoint shape: both nodes ranked
    val cyc = Seq((5L, 6L), (6L, 5L)).toDF("src", "dst")
    val rc = Graph.personalizedPagerank(cyc, Seq(Tuple1(5L)).toDF("node"),
        iters = 2).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("rank_micro")).toMap
    // i1: 5 -> 150000 + 0, 6 -> 850000; i2: 5 -> 150000 + 722500, 6 -> 127500
    assert(rc == Map(5L -> 872500L, 6L -> 127500L))
  }

  test("scc: cycles fuse, DAG tails stay singletons, label is the max member") {
    import graft.operators.Graph
    // 3-cycle {1,2,3} feeding a chain 4 -> 5, a 2-cycle {6,7}, a lone edge
    // 8 -> 9, and a self-loop (dropped)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 6L), (8L, 9L), (9L, 9L)).toDF("src", "dst")
    // both execution paths must label identically: the distributed
    // coloring rounds (localThreshold = 0) and the Multistep local finish
    for (thr <- Seq(0L, 200000L)) {
      val r = Graph.scc(e, localThreshold = thr).collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("scc")).toMap
      assert(r(1L) == 3L && r(2L) == 3L && r(3L) == 3L, s"thr=$thr")
      assert(r(6L) == 7L && r(7L) == 7L, s"thr=$thr")
      assert(r(4L) == 4L && r(5L) == 5L && r(8L) == 8L && r(9L) == 9L, s"thr=$thr")
      assert(r.size == 9, s"thr=$thr")
    }
  }

  test("scc: a decreasing-id chain of cycles needs (and gets) multiple rounds") {
    import graft.operators.Graph
    // {30,31} -> {20,21} -> {10,11}: color floods the max id 31 downstream,
    // so only one SCC resolves per round — exercises the outer loop
    val e = Seq((30L, 31L), (31L, 30L), (20L, 21L), (21L, 20L),
      (10L, 11L), (11L, 10L), (31L, 20L), (21L, 10L)).toDF("src", "dst")
    val r = Graph.scc(e, localThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("scc")).toMap
    assert(r(30L) == 31L && r(31L) == 31L)
    assert(r(20L) == 21L && r(21L) == 21L)
    assert(r(10L) == 11L && r(11L) == 11L)
  }

  test("scc hybrid: distributed rounds hand off to the local finish mid-run") {
    import graft.operators.Graph
    // threshold 7: the initial graph (6 nodes + 8 edges = 14) runs the
    // distributed coloring, each round retires one cycle; the final
    // remnant (2 + 2 = 4) crosses the threshold and finishes in Tarjan —
    // labels must be seamless across the handoff
    val e = Seq((30L, 31L), (31L, 30L), (20L, 21L), (21L, 20L),
      (10L, 11L), (11L, 10L), (31L, 20L), (21L, 10L)).toDF("src", "dst")
    val r = Graph.scc(e, localThreshold = 7L).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("scc")).toMap
    assert(r == Map(30L -> 31L, 31L -> 31L, 20L -> 21L, 21L -> 21L,
      10L -> 11L, 11L -> 11L))
  }

  test("scc matches a driver-side Tarjan on seeded random digraphs") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val m = 60 + trial * 30
      val raw = Seq.fill(m)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter { case (a, b) => a != b }.distinct
      // reference: iterative Tarjan over the same edge set
      val adj = raw.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val vs = raw.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val idx = scala.collection.mutable.Map.empty[Long, Int]
      val low = scala.collection.mutable.Map.empty[Long, Int]
      val onStk = scala.collection.mutable.Set.empty[Long]
      val stk = scala.collection.mutable.Stack.empty[Long]
      val comp = scala.collection.mutable.Map.empty[Long, Long]
      var counter = 0
      def strong(v0: Long): Unit = { // explicit work-stack, no deep recursion
        case class Frame(v: Long, var rest: List[Long])
        val work = scala.collection.mutable.Stack(
          Frame(v0, adj.getOrElse(v0, Seq.empty).toList))
        idx(v0) = counter; low(v0) = counter; counter += 1
        stk.push(v0); onStk += v0
        while (work.nonEmpty) {
          val f = work.top
          f.rest match {
            case w :: tl =>
              f.rest = tl
              if (!idx.contains(w)) {
                idx(w) = counter; low(w) = counter; counter += 1
                stk.push(w); onStk += w
                work.push(Frame(w, adj.getOrElse(w, Seq.empty).toList))
              } else if (onStk(w)) low(f.v) = math.min(low(f.v), idx(w))
            case Nil =>
              work.pop()
              if (work.nonEmpty)
                low(work.top.v) = math.min(low(work.top.v), low(f.v))
              if (low(f.v) == idx(f.v)) {
                var grp = List.empty[Long]
                var w = stk.pop(); onStk -= w; grp ::= w
                while (w != f.v) { w = stk.pop(); onStk -= w; grp ::= w }
                val label = grp.max
                grp.foreach(comp(_) = label)
              }
          }
        }
      }
      vs.foreach(v => if (!idx.contains(v)) strong(v))
      // force the DISTRIBUTED coloring path — with the default threshold
      // these graphs would take the local finish, which is itself Tarjan
      val got = Graph.scc(raw.toDF("src", "dst"), maxRounds = 30,
          localThreshold = 0L).collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("scc")).toMap
      assert(got == comp.toMap, s"trial $trial")
    }
  }

  test("two-hop paths: multiplicities multiply along the path; only reachable nodes appear") {
    import graft.operators.Graph
    // 1 -> 2 (x2), 2 -> 3: two 2-paths land on 3; nothing lands on 1 or 2
    val e = Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.twoHopPaths(e).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("node") == 3L
      && out(0).getAs[Long]("n_paths") == 2L
      && out(0).getAs[Long]("n_sources") == 1L
      && out(0).getAs[Long]("n_mids") == 1L)
  }

  test("triangle count: K4 = 4 triangles / 12 wedges; paths close nothing") {
    import graft.operators.Graph
    // K4 (as directed edges with duplicates + a self-loop to shed): every
    // 3-subset is a triangle -> 4; wedges = 4 nodes x C(3,2) = 12; global
    // clustering = 3*4/12 = 1, as it must be for a clique.
    val k4 = (for { a <- 0 to 3; b <- 0 to 3 if a != b } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
      .union(Seq((2L, 2L)).toDF("src", "dst")) // self-loop must be dropped
    val r = Graph.triangleCount(k4).collect()(0)
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Long]("n_wedges") == 12L)

    // path 1-2-3-4: one wedge per interior node, no triangles
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val p = Graph.triangleCount(path).collect()(0)
    assert(p.getAs[Long]("n_triangles") == 0L)
    assert(p.getAs[Long]("n_wedges") == 2L)

    // triangle + pendant: 1 triangle, wedges = C(3,2) + 1 + 1 = 5,
    // direction-independent
    val tri = Seq((1L, 2L), (3L, 2L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val t = Graph.triangleCount(tri).collect()(0)
    assert(t.getAs[Long]("n_triangles") == 1L)
    assert(t.getAs[Long]("n_wedges") == 5L)
  }

  test("degree histogram: multi-edges collapse; buckets are exact log2") {
    import graft.operators.Graph
    // star 0-{1..5} with doubled edges: hub deg 5 (bucket 2), leaves deg 1
    // (bucket 0)
    val star = (1 to 5).flatMap(i => Seq((0L, i.toLong), (i.toLong, 0L)))
      .toDF("src", "dst")
    val h = Graph.degreeHistogram(star).collect()
      .map(r => r.getAs[Int]("bucket_log2") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("min_deg"), r.getAs[Long]("max_deg"))).toMap
    assert(h(0) == ((5L, 1L, 1L)) && h(2) == ((1L, 5L, 5L)))
    // deg 4 lands in bucket 2 (exact power of two: length(bin(4))-1 = 2)
    val k5star = (1 to 4).map(i => (0L, i.toLong)).toDF("src", "dst")
    val h2 = Graph.degreeHistogram(k5star).collect()
      .map(r => r.getAs[Int]("bucket_log2") -> r.getAs[Long]("max_deg")).toMap
    assert(h2(2) == 4L)
  }

  test("kcore: pendant chain peels off; the core keeps exact within-core degrees") {
    import graft.operators.Graph
    // K4 core {0,1,2,3} + chain 3-10-11: k=3 peels the chain AND the
    // chain's anchor keeps only its in-core degree
    val k4 = for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong)
    val g = (k4 ++ Seq((3L, 10L), (10L, 11L))).toDF("src", "dst")
    val core = Graph.kcore(g, k = 3, rounds = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap
    assert(core.keySet == Set(0L, 1L, 2L, 3L))
    assert(core.values.toSet == Set(3L)) // node 3's pendant edge is gone
    // k above the max degree empties the graph
    assert(Graph.kcore(g, k = 10, rounds = 2).count() == 0L)
    // k=1 keeps everything (no self-loops, so every node has deg >= 1)
    assert(Graph.kcore(g, k = 1, rounds = 1).count() == 6L)
  }

  test("ktruss: K4 survives k=4, lone triangle survives only k=3, pendants peel") {
    import graft.operators.Graph
    // K4 {0,1,2,3} (every edge in 2 triangles) + lone triangle {5,6,7}
    // (support 1 each) + pendant 3-10 (support 0)
    val k4 = for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong)
    val g = (k4 ++ Seq((5L, 6L), (6L, 7L), (5L, 7L), (3L, 10L)))
      .toDF("src", "dst")
    val t3 = Graph.ktruss(g, k = 3, rounds = 2).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) -> r.getAs[Long]("support"))
      .toMap
    // k=3: pendant gone, K4 + triangle stay with exact supports
    assert(t3.keySet.size == 9 && !t3.contains((3L, 10L)))
    assert(t3((5L, 6L)) == 1L && t3((0L, 1L)) == 2L)
    val t4 = Graph.ktruss(g, k = 4, rounds = 2).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet
    // k=4: only K4's 6 edges have 2 witnesses
    assert(t4 == k4.toSet)
    // k above any support empties the graph
    assert(Graph.ktruss(g, k = 5, rounds = 1).count() == 0L)
  }

  test("sssp: cheaper long path beats direct edge; rounds bound path length") {
    import graft.operators.Graph
    import spark.implicits._
    // 1->4 direct costs 9; 1->2->3->4 costs 3; unreachable node 9
    val e = Seq((1L, 4L, 9L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (9L, 1L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val d3 = Graph.sssp(e, seeds, rounds = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(d3 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 3 < 9
    // with 1 round only paths of <= 1 edge are final: 4 still costs 9
    val d1 = Graph.sssp(e, seeds, rounds = 1).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    assert(d1(4L) == 9L && d1(2L) == 1L && !d1.contains(3L))
  }

  test("khop reach: BFS hop labels are minimal; direction respected; budget caps depth") {
    import graft.operators.Graph
    // 1 -> 2 -> 3 -> 4, plus shortcut 1 -> 3 (so 3 is hop 1, NOT hop 2),
    // plus back-edge 4 -> 1 (cycle must not relabel), plus 9 unreachable
    // via the direction (9 -> 1 only points INTO the seed)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (4L, 1L), (9L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r = Graph.khopReach(e, seeds, maxHops = 3).collect()
      .map(x => x.getAs[Long]("node") -> x.getAs[Int]("hops")).toMap
    assert(r == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // budget of 1 stops at the first frontier
    val r1 = Graph.khopReach(e, seeds, maxHops = 1).collect()
      .map(x => x.getAs[Long]("node") -> x.getAs[Int]("hops")).toMap
    assert(r1 == Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("local clustering: clique corners score 1000; pendant-diluted corners score less") {
    import graft.operators.Graph
    // triangle {1,2,3} + pendant 4-1: nodes 2,3 have c = 1 (1000 milli);
    // node 1 has deg 3, 1 triangle -> 1000/3 = 333; node 4 deg 1 excluded
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val c = Graph.localClustering(g).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("n_tri"), r.getAs[Long]("clustering_milli"))).toMap
    assert(c == Map(1L -> ((1L, 333L)), 2L -> ((1L, 1000L)), 3L -> ((1L, 1000L))))
  }

  test("haircut taint: pro-rata split, sink absorption, truncating division") {
    import graft.operators.Graph
    // 1 splits 3:1 to sinks 2 and 3; one round moves everything, the
    // second round changes nothing (2 and 3 absorb)
    val g = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val t = Graph.haircutTaint(g, seeds, iters = 2, weightCol = Some("w"))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("taint_micro")).toMap
    assert(t == Map(2L -> 750000L, 3L -> 250000L))

    // truncation: 1M split 1:2 -> 333333 + 666666 (one micro evaporates)
    val g2 = Seq((1L, 2L, 1L), (1L, 3L, 2L)).toDF("src", "dst", "w")
    val t2 = Graph.haircutTaint(g2, seeds, iters = 1, weightCol = Some("w"))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("taint_micro")).toMap
    assert(t2 == Map(2L -> 333333L, 3L -> 666666L))

    // a 2-cycle keeps mass in flight: after 2 rounds the taint is back home
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val t3 = Graph.haircutTaint(cyc, seeds, iters = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("taint_micro")).toMap
    assert(t3 == Map(1L -> 1000000L))
  }

  test("label propagation: weighted majority wins, ties go low, bridge stays weak") {
    import graft.operators.Graph
    // two triangles {1,2,3} and {10,11,12} joined by one bridge 3-10.
    // Synchronous rounds are a pure function of the graph — the exact
    // 2-round state is hand-traceable: r1 = {1→2, 2→1, 3→1, 10→3,
    // 11→10, 12→10}; r2 applies the same tie-to-min rule to those labels,
    // giving the left triangle its min seed while the bridge's r1 label
    // (3) propagates into the right triangle's tie-breaks
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("src", "dst")
    val out = Graph.labelPropagation(tri, rounds = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 3L, 12L -> 3L), s"2-round trace: $out")

    // weights dominate cardinality: node 0 has two unit votes for label 1
    // (via 1 and 2... both labeled 1 after round 1? use round 1 directly)
    // — one heavy edge (w=5) to 9 beats two light edges to 1 and 2
    val wed = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 9L, 5L)).toDF("src", "dst", "w")
    val w1 = Graph.labelPropagation(wed, rounds = 1, weightCol = Some("w"))
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(w1(0L) == 9L, s"heavy edge must win: $w1")
    // deterministic tie-break: equal weights -> smallest label
    val tie = Seq((0L, 5L), (0L, 3L)).toDF("src", "dst")
    val t1 = Graph.labelPropagation(tie, rounds = 1).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(t1(0L) == 3L)
    // fixed rounds are partitioning-independent
    val rep = Graph.labelPropagation(tri.repartition(13), rounds = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(rep == out)
  }

  test("skyline: equals brute-force dominance filter; duplicates both survive; prune keeps frontier") {
    import graft.operators.Skyline
    val pts = Seq((1L, 1L, 9L), (2L, 3L, 5L), (3L, 5L, 5L), (4L, 6L, 2L),
      (5L, 6L, 2L), (6L, 8L, 1L), (7L, 9L, 9L), (8L, 2L, 7L), (9L, 4L, 8L))
      .toDF("id", "x", "y")
    val got = Skyline.skyline2D(pts, "x", "y").collect()
      .map(_.getAs[Long]("id")).toSet
    val raw = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = raw.filter { case (i, x, y) =>
      !raw.exists { case (j, sx, sy) =>
        j != i && sx <= x && sy <= y && (sx < x || sy < y) }
    }.map(_._1).toSet
    assert(got == want, s"got $got want $want")
    // (6,2) appears twice: both copies are on the frontier
    assert(got.contains(4L) && got.contains(5L))
    // dominated interior (3: (5,5) dominated by (3,5)) and corner (7) are gone
    assert(!got.contains(3L) && !got.contains(7L))
  }

  test("association rules: hand-computed support/confidence/lift; duplicates inside a basket collapse") {
    import graft.operators.Associations
    // baskets: u1={A,B}, u2={A,B}, u3={A,C}, u4={B} (A dup in u1 collapses)
    // N=4, c_A=3, c_B=3, c_C=1, c_AB=2:
    // A=>B: supp = 2000/4 = 500, conf = 2000/3 = 666, lift = 2·4·1000/(3·3) = 888
    val df = Seq((1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B"),
      (3, "A"), (3, "C"), (4, "B")).toDF("u", "item")
    val out = Associations.rules(df, "u", "item", minPairCount = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("A", "B"), ("B", "A")), s"got ${out.keySet}")
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("c_ab") == 2L && ab.getAs[Long]("c_a") == 3L
      && ab.getAs[Long]("n_baskets") == 4L)
    assert(ab.getAs[Long]("supp_milli") == 500L)
    assert(ab.getAs[Long]("conf_milli") == 666L)
    assert(ab.getAs[Long]("lift_milli") == 888L)
    // the symmetric rule shares counts but has its own confidence base
    assert(out(("B", "A")).getAs[Long]("conf_milli") == 666L)
  }

  test("snapshot diff: one row per churned key; unchanged dropped; separator blocks boundary collisions") {
    import graft.operators.Scd2
    val prev = Seq((1L, "same", "x"), (2L, "old", "x"), (3L, "gone", "x"),
      (5L, "ab", "c")).toDF("pk", "a", "b")
    val curr = Seq((1L, "same", "x"), (2L, "new", "x"), (4L, "born", "x"),
      (5L, "a", "bc")).toDF("pk", "a", "b")
    val out = Scd2.snapshotDiff(prev, curr, "pk", Seq("a", "b")).collect()
      .map(r => r.getAs[Long]("pk") -> r.getAs[String]("change")).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added",
      5L -> "changed"), s"got $out") // 1 unchanged -> absent; 5 must not collide
  }

  test("modularity: hand-computed two-triangle partition; one-community Q = 0") {
    import graft.operators.Graph
    // two triangles joined by a bridge, partitioned per triangle:
    // m = 7; each community has e_c = 3, d_c = 7 (2+2+3);
    // q_num = 2·(4·7·3 − 49) = 70, q_den = 4·49 = 196, Q = 0.357 → 357
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "label")
    val r = Graph.modularity(g, labels).collect().head
    assert(r.getAs[Long]("m") == 7L)
    assert(r.getAs[Long]("n_comm") == 2L)
    assert(r.getAs[Long]("sum_e_in") == 6L)
    // q_num/q_den are operator-boundary STRINGS (divergence-proof form)
    assert(r.getAs[String]("q_num").toLong == 70L)
    assert(r.getAs[String]("q_den").toLong == 196L)
    assert(r.getAs[Long]("q_milli") == 357L)

    // the everything-in-one-community partition scores exactly 0
    val one = labels.select($"node", lit(1L).as("label"))
    val r1 = Graph.modularity(g, one).collect().head
    assert(r1.getAs[String]("q_num").toLong == 0L)
    assert(r1.getAs[Long]("q_milli") == 0L)

    // anti-community partition (each edge cut) goes negative
    val bad = Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L), (5L, 1L), (6L, 2L))
      .toDF("node", "label")
    assert(Graph.modularity(g, bad).collect().head.getAs[Long]("q_milli") < 0L)
  }

  test("louvain move: two triangles converge to the perfect partition; beats LPA on its own objective") {
    import graft.operators.Graph
    // two triangles joined by one bridge. Synchronous moves WITHOUT the
    // parity gate swap-oscillate on this graph forever; with it, round 1
    // moves the even nodes (2->1, 4->5, 6->5) and round 2 pulls the odd
    // nodes in (3->1), landing exactly one community per triangle.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Graph.louvainMove(g, rounds = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 5L, 5L -> 5L, 6L -> 5L), s"got $labels")
    // the objective check: Q(louvain) on this graph is the optimum 357
    // milli, strictly above the 2-round LPA partition's score — the
    // modularity-optimizing step must not lose on its own objective
    val qLouvain = Graph.modularity(g,
        Graph.louvainMove(g, rounds = 2).select($"node", $"label"))
      .collect().head.getAs[Long]("q_milli")
    val qLpa = Graph.modularity(g,
        Graph.labelPropagation(g, rounds = 2).select($"node", $"label"))
      .collect().head.getAs[Long]("q_milli")
    assert(qLouvain == 357L, s"got $qLouvain")
    assert(qLouvain >= qLpa, s"louvain $qLouvain < lpa $qLpa")
    // determinism: a second run is bit-identical
    val again = Graph.louvainMove(g, rounds = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("label")).toMap
    assert(again == labels)
  }

  test("harmonic centrality: hand-computed path graph; horizon truncates") {
    import graft.operators.Graph
    // path 1-2-3-4-5, pivots {1,5}, hops 4: every pair is within horizon
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val piv = Seq(1L, 5L).toDF("node")
    val got = Graph.harmonicCentrality(path, piv, hops = 4).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("harmonic_micro"), r.getAs[Long]("n_reached"))).toMap
    assert(got == Map(
      1L -> (250000L, 1L),            // d(5,1)=4
      2L -> (1333333L, 2L),           // 1/1 + 1/3
      3L -> (1000000L, 2L),           // 1/2 + 1/2
      4L -> (1333333L, 2L),
      5L -> (250000L, 1L)), s"got $got")
    // hops = 2 truncates: node 4 only reachable from pivot 5 (d=1),
    // pivot 1's d=3 path falls outside the horizon
    val h2 = Graph.harmonicCentrality(path, piv, hops = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("harmonic_micro")).toMap
    assert(h2(4L) == 1000000L, s"got ${h2(4L)}") // only d(5,4)=1 in horizon
    assert(h2(3L) == 1000000L) // 1/2 + 1/2
  }

  test("betweenness: path graph interior carries all flow; diamond splits sigma exactly") {
    import graft.operators.Graph
    // path 1-2-3-4-5, pivots {1,5}, hops 4: Brandes gives every interior
    // node total dependency 4e6 micro (3e6 from the near pivot + 1e6 far)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val piv = Seq(1L, 5L).toDF("node")
    val got = Graph.betweennessPivot(path, piv, hops = 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("bc_micro")).toMap
    assert(got == Map(2L -> 4000000L, 3L -> 4000000L, 4L -> 4000000L),
      s"got $got")
    // diamond 1-2-4, 1-3-4: two shortest paths to 4 -> sigma(4) = 2,
    // delta(2) = delta(3) = (1 * 1e6) div 2 = 500000 exactly
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val d = Graph.betweennessPivot(diamond, Seq(1L).toDF("node"), hops = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("bc_micro")).toMap
    assert(d == Map(2L -> 500000L, 3L -> 500000L), s"got $d")
  }

  test("coarsen: community pairs aggregate edges, intra flag marks self-loops") {
    import graft.operators.Graph
    // communities {1,2}→A(=1) and {3,4}→B(=3); edges: 2 intra-A, 1 intra-B,
    // 2 A→B (one per direction pair), weights summed per community pair
    val edges = Seq((1L, 2L, 5L), (2L, 1L, 2L), (3L, 4L, 7L),
      (1L, 3L, 1L), (2L, 4L, 3L)).toDF("src", "dst", "w")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("node", "label")
    val got = Graph.coarsen(edges, labels, weightCol = Some("w")).collect()
      .map(r => (r.getAs[Long]("src_comm"), r.getAs[Long]("dst_comm")) ->
        (r.getAs[Long]("n_edges"), r.getAs[Long]("w_total"), r.getAs[Boolean]("intra")))
      .toMap
    assert(got == Map(
      (1L, 1L) -> (2L, 7L, true),
      (3L, 3L) -> (1L, 7L, true),
      (1L, 3L) -> (2L, 4L, false)), s"got $got")
    // unweighted defaults to edge counting
    val unw = Graph.coarsen(edges, labels).collect()
      .map(r => (r.getAs[Long]("src_comm"), r.getAs[Long]("dst_comm")) ->
        r.getAs[Long]("w_total")).toMap
    assert(unw == Map((1L, 1L) -> 2L, (3L, 3L) -> 1L, (1L, 3L) -> 2L))
  }

  test("temporal two-hop: only time-ordered in-window hop pairs count") {
    import graft.operators.Graph
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // in-window ordered pairs through mid 2: (1→2 @10:00, 2→3 @10:30) and
    // (1→2 @10:00, 2→3 @10:45) count; 4→2 @10:50 is AFTER both second
    // hops (order violation); 5→2 @09:00 is 90/105 min before them
    // (outside the 1h window). Expect exactly the two paths 1→2→3.
    val edges = Seq(
      (1L, 2L, ts(0)), (2L, 3L, ts(30)), (2L, 3L, ts(45)),
      (4L, 2L, ts(50)),
      (5L, 2L, Timestamp.valueOf("2024-01-01 09:00:00"))).toDF("src", "dst", "ts")
    val got = Graph.temporalTwoHop(edges, maxGap = "1 hour").collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("n_paths"), r.getAs[Long]("n_sources"), r.getAs[Long]("n_mids")))
      .toMap
    assert(got == Map(3L -> (2L, 1L, 1L)), s"got $got")
  }

  test("scd2: consecutive duplicates collapse, intervals chain, last run stays open") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // key 1: a,a,b,a -> runs a/b/a; key 2: single run; same-ts tie broken by ord
    val log = Seq(
      (1L, "a", t(1), 10L), (1L, "a", t(2), 11L), (1L, "b", t(3), 12L),
      (1L, "a", t(4), 13L), (2L, "x", t(1), 14L), (2L, "x", t(1), 15L))
      .toDF("k", "attr", "ts", "ord")
    val out = graft.operators.Scd2.buildIntervals(log, "k", "attr", "ts", "ord")
      .orderBy("k", "version").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("a", "b", "a"))
    assert(k1.map(_.getInt(4)).toSeq == Seq(1, 2, 3))
    // intervals chain: each valid_to equals the next valid_from
    assert(k1(0).getTimestamp(3) == k1(1).getTimestamp(2))
    assert(k1(1).getTimestamp(3) == k1(2).getTimestamp(2))
    assert(k1(2).isNullAt(3) && k1(2).getBoolean(5)) // open + current
    assert(!k1(0).getBoolean(5) && !k1(1).getBoolean(5))
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2(0).getBoolean(5)) // dup at same value: one run
  }

  test("bpe train step: elects the top pair and applies it greedily non-overlapping") {
    import graft.llm.TextAnalysis
    // vocab: aa (freq 1), aaaa (freq 2), ab (freq 1)
    // pair counts: "aa" = 1 + 3*2 = 7, "ab" = 1, "aaaa"-internal dupes are
    // all "aa" -> elected pair "aa"; greedy: "aa" -> 1 merge, "aaaa" ->
    // positions {1,2,3} one run -> ceil(3/2) = 2 merges; "ab" excluded
    val docs = Seq((1L, "aa aaaa"), (2L, "aaaa ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainStep(docs, "text").orderBy("word").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("aa", "aaaa"))
    assert(out.forall(r => r.getString(2) == "aa" && r.getAs[Long]("n_occurrences") == 7L))
    val byWord = out.map(r => r.getString(0) ->
      (r.getAs[Long]("freq"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_merges"), r.getAs[Long]("n_symbols_after"))).toMap
    assert(byWord("aa") == ((1L, 2L, 1L, 1L)))
    assert(byWord("aaaa") == ((2L, 4L, 2L, 2L)))
  }

  test("bpe train loop: round 2 merges round-1 products; symbol counts shrink exactly") {
    import graft.llm.TextAnalysis
    // vocab: abab (freq 2), cd (freq 1)
    // round 1: 'ab' wins (2 starts x freq 2 = 4 > 'ba' 2 > 'cd' 1);
    //          abab -> [ab, ab]; symbols 2*2 + 2*1 = 6
    // round 2: 'abab' (the round-1 product!) wins with 2; abab -> [abab];
    //          symbols 1*2 + 2*1 = 4
    val docs = Seq((1L, "abab cd"), (2L, "abab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrainMerges(docs, rounds = 2).orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getAs[Long](2),
        r.getAs[Long](3), r.getAs[Long](4), r.getAs[Long](5)))
    assert(out(0) == ((1, "ab", 4L, 1L, 4L, 6L)))
    assert(out(1) == ((2, "abab", 2L, 1L, 2L, 4L)))
  }

  test("matryoshka: truncation reports exact retained energy; search funnel matches brute force at full width") {
    import graft.llm.Similarity
    val vecs = Seq(
      (0L, Array(3f, 4f, 12f, 0f)), (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 0f, 0f, 0f)), (3L, Array(0f, 2f, 0f, 1f)),
      (4L, Array(1f, 1f, 1f, 1f))).toDF("vec_id", "embedding")
    val tr = Similarity.matryoshkaTruncate(vecs, dims = 2).orderBy("vec_id").collect()
    // |prefix|^2 = 25e6 micro, |full|^2 = 169e6 -> 25000*1000 div 169... = 147
    assert(tr(0).getString(1) == "3000000,4000000")
    assert(tr(0).getAs[Long]("retained_milli") == 25000000L * 1000L / 169000000L)
    assert(tr(1).getAs[Long]("retained_milli") == 1000L) // energy all in prefix
    assert(tr(2).getAs[Long]("retained_milli") == 1000L) // zero vector guard
    // at dims = full width with an exhaustive shortlist, the funnel IS
    // brute force (score_coarse == score, same ranking)
    val q = vecs.filter(col("vec_id") < 2)
    val c = vecs.filter(col("vec_id") >= 2)
    val funnel = Similarity.matryoshkaSearch(c, q, dims = 4, k = 3, shortlist = 3)
      .orderBy("query_id", "rnk").collect()
    val brute = Similarity.bruteForceTopK(c, q, 3)
      .orderBy("query_id", "rnk").collect()
    assert(funnel.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSeq == brute.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSeq)
    assert(funnel.forall(r => r.getLong(3) == r.getLong(4)))
  }

  test("band join equals the nested-loop truth: boundaries inclusive, negatives, nulls dropped, no BNLJ in the plan") {
    import graft.operators.BandJoin
    // values straddle bucket boundaries (multiples of the width), go
    // negative, and include exact-width gaps — every edge of the
    // floor-bucket candidate rule
    val l = Seq((1L, -250.0), (2L, -100.0), (3L, 0.0), (4L, 99.99),
      (5L, 100.0), (6L, 300.0), (7L, Double.NaN))
      .toDF("lid", "lv").withColumn("lv",
        when(col("lid") === 7L, lit(null).cast("double")).otherwise(col("lv")))
    val r = Seq((10L, -200.0), (11L, 0.0), (12L, 200.0), (13L, 1000.0))
      .toDF("rid", "rv")
    val got = BandJoin.join(l, r, col("lv"), col("rv"), width = 100.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = (for {
      (lid, lv) <- Seq((1L, -250.0), (2L, -100.0), (3L, 0.0), (4L, 99.99),
        (5L, 100.0), (6L, 300.0))
      (rid, rv) <- Seq((10L, -200.0), (11L, 0.0), (12L, 200.0), (13L, 1000.0))
      if math.abs(lv - rv) <= 100.0
    } yield (lid, rid)).toSet
    assert(got == want)
    assert(want.contains((2L, 10L)) && want.contains((2L, 11L)),
      "fixture must exercise exact-width boundaries on both sides")
    // the whole point: the plan is an equi-join on the bucket id, not a
    // nested-loop scan
    val plan = BandJoin.join(l, r, col("lv"), col("rv"), 100.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    intercept[IllegalArgumentException](BandJoin.join(l, r, col("lv"), col("rv"), 0.0))
  }

  test("DDL generation round-trips through Spark SQL's parser") {
    import org.apache.spark.sql.types.StructType
    graft.eth.EthSchemas.tables.foreach { case (name, st) =>
      val ddl = graft.eth.EthSchemas.toDdl(name, st)
      val colList = ddl.stripPrefix(s"CREATE TABLE $name (").stripSuffix(")")
      // the rendered column list must parse back to the same types
      val parsed = StructType.fromDDL(colList)
      assert(parsed.fields.map(f => (f.name, f.dataType)).toSeq ==
        st.fields.map(f => (f.name, f.dataType)).toSeq, name)
    }
  }

  test("interval overlap join: bucket-spanning pairs dedup; touching endpoints overlap") {
    import graft.operators.IntervalJoin
    val a = Seq(("a1", 0L, 250L), ("a2", 500L, 520L), ("a3", 900L, 950L))
      .toDF("id", "s", "e")
    val b = Seq(("b1", 240L, 600L), ("b2", 250L, 250L), ("b3", 951L, 999L))
      .toDF("id", "s", "e")
    // bucket 100s: a1 spans 3 buckets shared with b1 -> must appear ONCE
    val out = IntervalJoin.overlapJoin(a, b, "id", "s", "e", "id", "s", "e", 100L)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getAs[String]("a_id"), r.getAs[String]("b_id"),
        r.getAs[Long]("overlap_s")))
    assert(out.toSeq == Seq(
      ("a1", "b1", 10L),  // [0,250] x [240,600]
      ("a1", "b2", 0L),   // touching point-interval at 250: closed semantics
      ("a2", "b1", 20L))) // [500,520] inside [240,600]
    // a3 [900,950] vs b3 [951,999]: adjacent but NOT touching -> no row
  }

  test("sequence rules: first-occurrence order decides; ties count for neither direction") {
    import graft.operators.Associations
    val ev = Seq(
      (1L, "a", ts(10)), (1L, "b", ts(20)), (1L, "a", ts(30)), // a->b (repeat ignored)
      (2L, "a", ts(10)), (2L, "b", ts(5)),                     // b->a
      (3L, "a", ts(7)), (3L, "b", ts(7)),                      // tie: neither
      (4L, "a", ts(1)), (4L, "b", ts(2)), (4L, "c", ts(0)))    // c->a, c->b, a->b
      .toDF("user_id", "item", "t")
    val out = Associations.sequenceRules(ev, "user_id", "item", "t", minPairCount = 1)
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 4L),  // users 1 and 4; c_a = 4 baskets contain a
      ("b", "a", 1L, 4L),  // user 2 only (tie user 3 counts neither)
      ("c", "a", 1L, 1L),
      ("c", "b", 1L, 1L)))
  }

  test("bloom-prefiltered join: result identical to the plain join; probe actually prunes") {
    import graft.operators.BloomJoin
    import graft.llm.TextAnalysis
    val big = (0L until 2000L).map(i => (i, i * 3)).toDF("k", "v")
    val small = Seq((7L, "a"), (1234L, "b"), (1999L, "c")).toDF("k", "tag")
    val viaBloom = BloomJoin.bloomFilteredJoin(big, small, "k")
      .orderBy("k").collect().map(_.toSeq)
    val plain = big.join(small, "k").orderBy("k").collect().map(_.toSeq)
    assert(viaBloom.toSeq == plain.toSeq && plain.length == 3)
    // pruning evidence: the probe predicate alone rejects the vast
    // majority of the big side (FP rate at 2^16 bits / 3 keys ~ 0)
    val f = TextAnalysis.bloomBuild(
      small.select($"k".cast("string").as("__k")), "__k", 1 << 16, 4)
    val survivors = big.filter(
      TextAnalysis.bloomMightContain(f, 1 << 16, 4, $"k".cast("string"))).count()
    assert(survivors < 20, s"bloom probe rejected almost nothing: $survivors/2000")
  }

  test("landmark distances: multi-source BFS hops + triangle-bound estimation") {
    import graft.operators.Graph
    // path 1-2-3-4-5 plus a chord 1-4; landmarks {1, 5}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("src", "dst")
    val sym = edges.unionByName(edges.select($"dst".as("src"), $"src".as("dst")))
    val lms = Seq(1L, 5L).toDF("node")
    val d = Graph.landmarkDistances(sym, lms, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(d((1L, 1L)) == 0 && d((4L, 1L)) == 1) // chord beats the path
    assert(d((3L, 1L)) == 2 && d((5L, 1L)) == 2) // 1-4-5
    assert(d((2L, 5L)) == 3)                     // 5-4-1-2 via chord
    // estimate 2..3: true dist 1; the landmark bound gives
    // min(d(2,1)+d(1,3), d(2,5)+d(5,3)) = min(1+2, 3+2) = 3 (upper bound)
    val est = Graph.landmarkEstimate(
      Graph.landmarkDistances(sym, lms, rounds = 4),
      Seq((2L, 3L)).toDF("u", "v")).collect()
    assert(est.length == 1 && est(0).getInt(2) == 3)
  }

  test("er blocking flood guard: capped block drops quadratic junk; other passes keep recall") {
    import graft.operators.EntityResolution
    // 40 records share the junk (city, prefix) block; 1 & 2 are a true
    // twin pair INSIDE the flood, linked by an exact phone
    val recs = (1L to 40L).map(i =>
      (i, "unknown", "cx", if (i <= 2) "5550001" else f"555$i%04d"))
      .toDF("id", "name", "city", "phone")
      .withColumn("name3", expr("substring(name, 1, 3)"))
    val passes = Seq(Seq("city", "name3"), Seq("phone"))
    val unbounded = EntityResolution.candidates(recs, "id", passes).count()
    assert(unbounded >= 40L * 39 / 2, s"expected the quadratic flood, got $unbounded")
    val capped = EntityResolution.candidates(recs, "id", passes, maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the junk block is gone; the phone pass still finds the twin
    assert(capped.toSeq == Seq((1L, 2L)))
  }

  test("data quality: one-pass suite with exact counts and mixed statuses") {
    import graft.operators.DataQuality._
    val df = Seq(
      (Some(1L), Some(0.05), "A", "O"),
      (Some(2L), Some(0.12), "A", "F"),   // discount over 10c
      (Some(2L), Some(0.00), "X", "O"),   // dup id, bad flag
      (None, None, "N", "xx"))            // null id, null discount, bad status
      .toDF("id", "disc", "flag", "st")
    val rep = graft.operators.DataQuality.validate(df, Seq(
      NotNull("id_nn", "id"),
      Unique("id_uq", "id"),
      InRangeCents("disc_rng", "disc", 0L, 10L),
      InSet("flag_set", "flag", Seq("A", "N")),
      MatchesRegex("st_re", "st", "[OF]")))
      .collect()
    assert(rep.map(r => (r.getAs[String]("expectation"), r.getAs[Long]("n_rows"),
      r.getAs[Long]("n_violations"), r.getAs[String]("status"))).toSeq == Seq(
      ("id_nn", 4L, 1L, "fail"),
      ("id_uq", 4L, 1L, "fail"),   // 3 non-null, 2 distinct
      ("disc_rng", 4L, 2L, "fail"), // 0.12 + null
      ("flag_set", 4L, 1L, "fail"),
      ("st_re", 4L, 1L, "fail")))
    // an all-pass suite on the clean subset
    val clean = df.filter("id = 1")
    val ok = graft.operators.DataQuality.validate(clean, Seq(NotNull("id_nn", "id"),
      Unique("id_uq", "id"))).collect()
    assert(ok.forall(_.getAs[String]("status") == "pass"))
  }

  test("entity resolution: multi-pass blocking, FS scoring, clustering, survivorship") {
    import graft.operators.EntityResolution
    import graft.operators.EntityResolution.Field
    // 1 & 2 are dirty twins (same phone catches them via pass 2 even
    // though the name prefix differs); 3 & 4 share a block but disagree
    // on every field; 5 is a singleton
    val recs = Seq(
      (1L, "smith", "c1", "5550001"),
      (2L, "zmith", "c1", "5550001"), // name lev 1 but different prefix
      (3L, "jones", "c2", "5550002"),
      (4L, "jonas", "c2", "5550003"), // lev 1 name, same block, phone off
      (5L, "brown", "c3", "5550004"))
      .toDF("id", "name", "city", "phone")
      .withColumn("name3", expr("substring(name, 1, 3)"))
    val passes = Seq(Seq("city", "name3"), Seq("phone"))
    val fields = Seq(Field("name", 1, 400, -400),
      Field("phone", 0, 300, -200), Field("city", 0, 150, -150))
    // candidates: (3,4) from pass 1; (1,2) only via the phone pass —
    // the multi-pass union is what finds it
    val cand = EntityResolution.candidates(recs, "id", passes)
      .orderBy("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.toSeq == Seq((1L, 2L), (3L, 4L)))
    // scores: (1,2) = 400+300+150 = 850; (3,4) = 400-200+150 = 350
    val mdf = EntityResolution.matchPairs(recs, "id", passes, fields, 500)
    val m = mdf.orderBy("id_a").collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 850L)))
    // entities: {1,2} clustered (rep = "zmith", the greatest name),
    // 3/4/5 singletons
    val ents = EntityResolution.resolve(recs, "id", mdf, Seq("name"))
      .orderBy("entity").collect()
    assert(ents.map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getString(3))).toSeq ==
      Seq((1L, 2L, 2L, "zmith"), (3L, 1L, 3L, "jones"),
        (4L, 1L, 4L, "jonas"), (5L, 1L, 5L, "brown")))
  }
}
