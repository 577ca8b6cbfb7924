package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Sketches}
import graft.llm.TextAnalysis

/** Round-7 additions: KMV / CMS sketches, HITS, RA link prediction,
  * assortativity moments, bigram LM scoring. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- KMV ----------------

  test("kmv: under-full sketch returns the exact distinct count") {
    val df = (1 to 40).map(i => s"key${i % 17}").toDF("k")
    val row = Sketches.kmvDistinct(df, "k", k = 64).collect().head
    assert(row.getAs[Long]("n_kept") == 17L)
    assert(row.getAs[Long]("est_distinct") == 17L)
  }

  test("kmv: estimate is within 35% of truth at n >> k") {
    val df = (1 to 20000).map(i => s"user$i").toDF("k")
    val row = Sketches.kmvDistinct(df, "k", k = 256).collect().head
    val est = row.getAs[Long]("est_distinct")
    // k=256 gives ~1/sqrt(254) ≈ 6% relative std error; 35% is >5 sigma
    assert(est > 13000 && est < 27000, s"estimate $est too far from 20000")
  }

  test("kmv intersect: exact mode (both sketches under-full) is the exact overlap") {
    val a = (1 to 30).map(i => s"u$i").toDF("k")   // {u1..u30}
    val b = (21 to 50).map(i => s"u$i").toDF("k")  // {u21..u50} -> overlap 10
    val row = Sketches.kmvIntersect(
      Sketches.kmvValues(a, "k", k = 64),
      Sketches.kmvValues(b, "k", k = 64), k = 64).collect().head
    assert(row.getAs[Long]("theta") == Sketches.HashSpace)
    assert(row.getAs[Long]("n_common") == 10L)
    assert(row.getAs[Long]("est_intersect") == 10L)
  }

  test("kmv intersect: empty overlap still yields one row with estimate 0") {
    val a = (1 to 20).map(i => s"a$i").toDF("k")
    val b = (1 to 20).map(i => s"b$i").toDF("k")
    val row = Sketches.kmvIntersect(
      Sketches.kmvValues(a, "k", k = 16),
      Sketches.kmvValues(b, "k", k = 16), k = 16).collect().head
    assert(row.getAs[Long]("n_common") == 0L)
    assert(row.getAs[Long]("est_intersect") == 0L)
  }

  test("kmv intersect: saturated sketches estimate a large overlap within tolerance") {
    val a = (1 to 8000).map(i => s"u$i").toDF("k")
    val b = (4001 to 12000).map(i => s"u$i").toDF("k") // true overlap 4000
    val row = Sketches.kmvIntersect(
      Sketches.kmvValues(a, "k", k = 256),
      Sketches.kmvValues(b, "k", k = 256), k = 256).collect().head
    assert(row.getAs[Long]("theta") < Sketches.HashSpace) // estimating mode
    val est = row.getAs[Long]("est_intersect")
    // ~1/sqrt(k_eff) error with k_eff ≈ n_common below theta; wide 3x band
    assert(est > 1300 && est < 12000, s"estimate $est too far from 4000")
  }

  test("kmv: merging per-part value sets equals the whole-corpus sketch") {
    val whole = (1 to 5000).map(i => s"u$i").toDF("k")
    val parts = Seq(
      (1 to 3000).map(i => s"u$i").toDF("k"), // overlapping halves:
      (2000 to 5000).map(i => s"u$i").toDF("k")) // union algebra must dedup
      .map(p => p.select(graft.functions.ColumnFns.md5Long(col("k")).as("__h"))
        .distinct().orderBy(col("__h")).limit(256))
    val merged = Sketches.kmvMerge(parts, k = 256).collect().map(_.getLong(0))
    val direct = whole.select(graft.functions.ColumnFns.md5Long(col("k")).as("__h"))
      .distinct().orderBy(col("__h")).limit(256).collect().map(_.getLong(0))
    assert(merged.sorted.sameElements(direct.sorted))
  }

  test("native bottom-k aggregate equals the relational distinct+sort bottom-k per group") {
    val df = (1 to 4000).map(i => (s"g${i % 7}", s"v${i % 997}")).toDF("g", "v")
    val native = Sketches.kmvDistinctPerKey(df, "g", "v", k = 32).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("kth_min_hash"),
          r.getAs[Long]("est_distinct"))).toMap
    // relational replay: distinct hash per group, sort, take 32
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("__h"))
    val rel = df.select(col("g"),
        graft.functions.ColumnFns.md5Long(col("v")).as("__h"))
      .distinct()
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 32)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("kth"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("kth"))).toMap
    assert(native.keySet == rel.keySet)
    rel.foreach { case (g, (n, kth)) =>
      assert(native(g)._1 == n && native(g)._2 == kth,
        s"group $g: native ${native(g)} != relational ($n, $kth)")
    }
  }

  test("bottom-k union algebra: merged per-part sketches equal the direct per-group sketch") {
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"v${i % 499}", i % 5))
      .toDF("g", "v", "part")
    val k = 16
    // per-(group, part) sketches, exploded and re-merged per group
    val merged = Sketches.kmvPerKeyReadOut(
      df.select(col("g"), col("part"),
          graft.functions.ColumnFns.md5Long(col("v")).as("__h"))
        .groupBy(col("g"), col("part"))
        .agg(Sketches.bottomK(col("__h"), k).as("__pbk"))
        .select(col("g"), explode(col("__pbk")).as("__h"))
        .groupBy(col("g")).agg(Sketches.bottomK(col("__h"), k).as("__bk")),
      "g", "__bk", k).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_distinct")).toMap
    val direct = Sketches.kmvDistinctPerKey(df, "g", "v", k = k).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("est_distinct")).toMap
    assert(merged == direct, s"$merged != $direct")
  }

  // ---------------- CMS ----------------

  test("cms: estimate never under-counts and is exact for dominant keys") {
    val rows = (1 to 900).map(_ => "whale") ++ (1 to 300).flatMap(i => Seq(s"m$i"))
    val df = rows.toDF("k")
    val sketch = Sketches.cmsBuild(df, "k", d = 3, w = 64)
    assert(sketch.count() <= 3L * 64) // the sketch is d*w cells, never |rows|
    val exact = df.groupBy($"k").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(sketch, df.distinct(), "k", d = 3, w = 64)
      .join(exact, "k").collect()
    est.foreach { r =>
      assert(r.getAs[Long]("est_count") >= r.getAs[Long]("exact"),
        s"CMS under-counted ${r.getAs[String]("k")}")
    }
    val whale = est.find(_.getAs[String]("k") == "whale").get
    // 300 light keys over 3*64 cells collide with the whale by at most a
    // handful of counts; the whale estimate stays within +10%
    assert(whale.getAs[Long]("est_count") <= 990)
  }

  test("ndv manifest: metadata-only estimate equals the direct KMV sketch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ndvspec")
      .toString + "/t"
    val df = (1 to 3000).map(i => s"key$i").toDF("k")
    df.repartition(6, col("k")).write.mode("overwrite").parquet(dir)
    graft.eth.Sinks.writeNdvManifest(spark, dir, "k", k = 128)
    val manifest = spark.read.parquet(
      graft.eth.Sinks.ndvManifestPath(dir))
    assert(manifest.count() <= 6L * 128) // metadata-sized: files x k
    val fromManifest = graft.eth.Sinks.ndvFromManifest(spark, dir, k = 128)
      .collect().head
    val direct = Sketches.kmvDistinct(df, "k", k = 128).collect().head
    // lossless merge algebra: bottom-k of per-file bottom-k == global
    assert(fromManifest.toSeq == direct.toSeq)
  }

  // ---------------- histogram quantiles ----------------

  test("histogram quantiles: picked bucket contains the exact order statistic") {
    val vals = ((1 to 700).map(_.toLong * 3 + 1) ++ (1 to 300).map(_.toLong * 97))
      .toDF("v")
    val hist = Sketches.logHistogram(vals, "v")
    val qs = Sketches.histogramQuantiles(hist, Seq(100, 500, 900, 1000))
      .collect().map(r => r.getInt(0) ->
        (r.getInt(1), r.getAs[Long]("bucket_hi"), r.getAs[Long]("n_le"))).toMap
    val sorted = vals.orderBy("v").collect().map(_.getLong(0))
    val n = sorted.length
    for ((q, (bucket, hi, nLe)) <- qs) {
      val exact = sorted((q * n + 999) / 1000 - 1)
      // the true quantile lives in the picked bucket: same log2, <= hi
      assert(java.lang.Long.numberOfTrailingZeros(
        java.lang.Long.highestOneBit(exact)) == bucket,
        s"q=$q exact=$exact not in bucket $bucket")
      assert(exact <= hi && nLe >= (q.toLong * n + 999) / 1000)
    }
  }

  test("histogram: merge by cell-wise addition equals whole-corpus build") {
    val a = (1 to 500).map(_.toLong).toDF("v")
    val b = (300 to 2000).map(_.toLong).toDF("v")
    val merged = Sketches.logHistogram(a, "v")
      .unionByName(Sketches.logHistogram(b, "v"))
      .groupBy("bucket_log2")
      .agg(sum(col("n_rows")).as("n_rows"), min(col("lo")).as("lo"),
        max(col("hi")).as("hi"))
    val direct = Sketches.logHistogram(a.unionByName(b), "v")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  // ---------------- HITS ----------------

  test("hits: star fan-in makes the center the authority, feeders the hubs") {
    // 1->4, 2->4, 3->4: auth(4)=3 after round 1, hub(1|2|3)=auth(4)
    val e = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.hits(e, rounds = 1).collect()
      .map(r => r.getLong(0) -> (r.getDecimal(1).longValue(), r.getDecimal(2).longValue()))
      .toMap
    assert(out(4L) == ((0L, 3L))) // pure authority: no out-edges
    assert(out(1L) == ((3L, 0L)) && out(2L) == ((3L, 0L)) && out(3L) == ((3L, 0L)))
  }

  test("hits: weighted two-round recursion matches the hand-unrolled values") {
    // 1->2 (w 2), 3->2 (w 1), 2->4 (w 5)
    val e = Seq((1L, 2L, 2L), (3L, 2L, 1L), (2L, 4L, 5L)).toDF("src", "dst", "w")
    // round 1: a1 = in-weight: a1(2)=3, a1(4)=5
    //          h1(1)=2*3=6, h1(3)=1*3=3, h1(2)=5*5=25
    // round 2: a2(2)=2*h1(1)+1*h1(3)=15, a2(4)=5*h1(2)=125
    //          h2(1)=2*15=30, h2(3)=15, h2(2)=5*125=625
    val out = Graph.hits(e, rounds = 2, weightCol = Some("w")).collect()
      .map(r => r.getLong(0) -> (r.getDecimal(1).longValue(), r.getDecimal(2).longValue()))
      .toMap
    assert(out(1L) == ((30L, 0L)))
    assert(out(2L) == ((625L, 15L)))
    assert(out(3L) == ((15L, 0L)))
    assert(out(4L) == ((0L, 125L)))
  }

  // ---------------- link prediction ----------------

  test("link prediction: 4-cycle predicts exactly the two diagonals") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val out = Graph.linkPrediction(e, maxCenterDeg = 64, topK = 10).collect()
    val got = out.map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Long]("ra_micro"), r.getAs[Long]("n_common"))).toSet
    // each diagonal shares BOTH opposite corners, deg 2 each: 2 * 500000
    assert(got == Set((1L, 3L, 1000000L, 2L), (2L, 4L, 1000000L, 2L)))
  }

  test("link prediction: high-degree centers are cut, existing edges never predicted") {
    // hub 99 connects 1..10 (deg 10 > cap 4): contributes nothing;
    // path 1-20-2 through a deg-2 center predicts (1,2)
    val hubEdges = (1L to 10L).map(i => (99L, i))
    val e = (hubEdges ++ Seq((1L, 20L), (20L, 2L))).toDF("src", "dst")
    val out = Graph.linkPrediction(e, maxCenterDeg = 4, topK = 100).collect()
    val got = out.map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Long]("ra_micro"), r.getAs[Long]("n_common"))).toSet
    // deg-2 centers 1 and 2 each link their neighbor pair {20, 99};
    // center 20 links (1, 2). NO pair is centered at the capped hub 99 —
    // none of 3..10's sole-neighbor pairs appear.
    assert(got == Set((1L, 2L, 500000L, 1L), (20L, 99L, 1000000L, 2L)))
    assert(!got.exists { case (x, y, _, _) => x >= 3L && x <= 10L || y >= 3L && y <= 10L })
  }

  // ---------------- assortativity ----------------

  test("assortativity: star graph is exactly disassortative (r = -1)") {
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = Graph.assortativityMoments(e).collect().head
    // endpoint pairs: (3,1) x3 and (1,3) x3 -> r = -1 exactly
    assert(r.getAs[Long]("n_ends") == 6L)
    assert(r.getAs[Long]("r_milli") == -1000L)
  }

  test("assortativity: regular graph has zero variance -> r_den 0, r 0") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst") // 2-regular
    val r = Graph.assortativityMoments(e).collect().head
    assert(r.getAs[String]("r_den").toLong == 0L)
    assert(r.getAs[Long]("r_milli") == 0L)
  }

  // ---------------- bigram LM ----------------

  test("bigram scoring: probable word order outscores shuffled order") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat sat on the mat"),
      (4L, "mat the on sat cat the")) // same unigrams, improbable order
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProbScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("logprob_bi")).toMap
    assert(out(1L) == out(2L) && out(2L) == out(3L)) // identical docs tie
    assert(out(4L) < out(1L), // shuffled doc is less probable
      s"shuffled ${out(4L)} should score below natural ${out(1L)}")
  }

  test("bigram scoring: single-token docs carry no bigrams") {
    val docs = Seq((1L, "hello"), (2L, "hello world")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProbScores(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    assert(out.head.getAs[Long]("n_bigrams") == 1L)
  }

  test("kmv sliding windows: each window equals the one-shot sketch of its member buckets") {
    // buckets 10..14, keys overlap across buckets; W = 3, k = 4 (small
    // enough that saturation and the under-full path both occur)
    val rows = for (b <- 10 to 14; i <- 0 until (b - 8)) yield (b.toLong, s"u${b % 3}_$i")
    val df = rows.toDF("h", "uk")
    val win = Sketches.kmvSlidingWindows(df, "h", "uk", windowBuckets = 3, k = 4)
      .orderBy("win_end").collect()
    assert(win.map(_.getAs[Long]("win_end")).toSeq == (10L to 14L))
    for (r <- win) {
      val end = r.getAs[Long]("win_end")
      val member = df.filter(col("h") > end - 3 && col("h") <= end)
      val oneShot = Sketches.kmvDistinct(member, "uk", k = 4).collect().head
      assert(r.getAs[Long]("n_kept") == oneShot.getAs[Long]("n_kept"), s"win $end")
      assert(r.getAs[Long]("est_distinct") == oneShot.getAs[Long]("est_distinct"), s"win $end")
      assert(r.getAs[Long]("kth_min_hash") == oneShot.getAs[Long]("kth_min_hash"), s"win $end")
    }
  }
}
