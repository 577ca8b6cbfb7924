package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColumnFns

/** Mergeable cardinality / frequency sketches, built relationally so they
  * run as ordinary shuffles and stay oracle-verifiable.
  *
  * Why sketches in a 100 TB engine: exact `COUNT(DISTINCT)` over a
  * billion-key column is a full shuffle of every distinct key, and exact
  * per-key frequency tables can exceed memory at the consumer. A sketch is
  * a FIXED-SIZE summary (here: 256 longs for KMV, d×w cells for CMS) that
  * (a) aggregates with map-side combine, (b) merges across partitions,
  * files, or days by construction, and (c) answers the query with bounded
  * error. Spark's own `approx_count_distinct` (HLL++) covers the plain
  * case but its register layout is opaque to SQL oracles; these operators
  * use the engine's SQL-reproducible `md5Long` hash (`CAST('0x'||substr(
  * md5(x),1,15) AS BIGINT)` in any engine) so every estimate is
  * value-checkable in DuckDB — the same property the MinHash family relies
  * on.
  *
  * Determinism: md5-derived hashes, integer arithmetic only (truncating
  * `div` of non-negative operands), explicit total-order tiebreaks.
  */
object Sketches {

  /** 2^60 — the exclusive upper bound of [[ColumnFns.md5Long]]'s range. */
  val HashSpace: Long = 1L << 60

  /** K-minimum-values (KMV / bottom-k theta) distinct-count sketch:
    * keep the k smallest DISTINCT hash values of the key column; if the
    * k-th smallest is `h_k`, the keys are uniform on [0, 2^60) and the
    * unbiased estimate is `(k-1) * 2^60 / h_k` (Bar-Yossef et al. 2002;
    * the DataSketches "theta" sketch is this plus union algebra).
    *
    * Scale shape: one hash projection + one DISTINCT on the hash (the
    * only shuffle — map-side combined, and at most k values per partition
    * need to survive in a tuned implementation) + a k-row top-k. The
    * sketch itself (k longs) broadcasts anywhere; union-merge = union the
    * value sets and re-take the bottom k, which is exactly re-running
    * this operator on the concatenation ([[kmvMerge]]).
    *
    * Returns ONE row: (k, n_kept, kth_min_hash, est_distinct). Callers
    * wanting an accuracy audit cross-join the exact distinct count next
    * to it (the query layer does; production drops it — the exact count
    * is the shuffle the sketch exists to avoid).
    */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = 256): DataFrame =
    kmvFromHashes(df.select(ColumnFns.md5Long(col(keyCol)).as("__h")), k)

  /** [[kmvDistinct]] over an already-hashed value table (`__h` in
    * [0, 2^60)) — the entry point for PRE-SKETCHED inputs: per-file
    * manifest value sets ([[graft.eth.Sinks.writeNdvManifest]]), unions of
    * per-day sketches, etc. Taking the bottom k of a union of per-part
    * bottom-k sets is EXACTLY the bottom k of the union (min is
    * associative), so estimates from merged sketches equal estimates from
    * the raw data — the algebra the manifest path relies on. */
  def kmvFromHashes(hashes: DataFrame, k: Int = 256): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val bottomK = hashes.select(col("__h")).distinct().orderBy(col("__h")).limit(k)
    // kth_min = the LARGEST of the bottom-k survivors. If the column has
    // fewer than k distinct keys the sketch IS the exact value set, so the
    // estimate returns the exact count — standard KMV small-cardinality
    // behavior; callers size k below expected |keys|. The (k-1)*2^60
    // product exceeds Long, so the quotient rides DECIMAL(38,0) and only
    // the final (always < 2^61-scale) estimate narrows back to BIGINT.
    bottomK
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("kth_min_hash"))
      .select(lit(k).as("k"), col("n_kept"), col("kth_min_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("long"))
          .otherwise(expr(
            s"CAST((CAST(n_kept AS DECIMAL(38,0)) - 1) * ${HashSpace}" +
              " div kth_min_hash AS BIGINT)")))
  }

  /** [[graft.functions.KmvBottomK]] as a Column aggregate: the bottom-k
    * DISTINCT values of a BIGINT column, ascending. Map-side partials
    * carry ≤ k longs per (group, partition) — the shuffle cap the
    * relational DISTINCT + window formulation cannot give. */
  def bottomK(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.KmvBottomK(
        org.apache.spark.sql.GraftColumnBridge.expression(c), k)
        .toAggregateExpression())

  /** Per-GROUP KMV distinct-count sketch — [[kmvDistinct]] with a group
    * column: one (group, k, n_kept, kth_min_hash, est_distinct) row per
    * group. The twin that per-group exact `COUNT(DISTINCT)` reaches for
    * when the distinct shuffle dominates (e.g. the two-hop
    * neighborhood's per-node distinct-source count — the suite's most
    * expensive exact aggregate).
    *
    * Scale shape: ONE aggregation over the raw (group, key) stream —
    * the native [[bottomK]] dedups and trims INSIDE the aggregate, so
    * map-side partials are ≤ k longs per (group, partition) and the
    * shuffle never carries the distinct pair set (the relational
    * DISTINCT-then-window form moves every distinct pair; this moves a
    * fixed-size sketch per group). Same estimator and decimal
    * discipline as [[kmvFromHashes]]. */
  def kmvDistinctPerKey(df: DataFrame, groupCol: String, keyCol: String,
                        k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    kmvPerKeyReadOut(
      df.select(col(groupCol), ColumnFns.md5Long(col(keyCol)).as("__h"))
        .groupBy(col(groupCol))
        .agg(bottomK(col("__h"), k).as("__bk")),
      groupCol, "__bk", k)
  }

  /** Read a per-group bottom-k VALUE-ARRAY column out as the KMV
    * estimate row: (group, k, n_kept, kth_min_hash, est_distinct). The
    * array is [[bottomK]]'s output — possibly re-merged through the
    * union algebra first (bottom-k of a union of per-part bottom-k
    * arrays IS the bottom-k of the union; min is associative). */
  def kmvPerKeyReadOut(df: DataFrame, groupCol: String, bkCol: String,
                       k: Int): DataFrame =
    df.select(col(groupCol), lit(k).as("k"),
        size(col(bkCol)).cast("long").as("n_kept"),
        try_element_at(col(bkCol), size(col(bkCol))).as("kth_min_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("long"))
          .otherwise(expr(
            s"CAST((CAST(n_kept AS DECIMAL(38,0)) - 1) * ${HashSpace}" +
              " div kth_min_hash AS BIGINT)")))

  /** The KMV sketch as its VALUE table — the bottom-k distinct md5 hashes
    * of the key column, one `__h` row each. This is the mergeable form
    * ([[kmvMerge]]) and the form set algebra runs on ([[kmvIntersect]]);
    * [[kmvFromHashes]] is its 1-row read-out. */
  def kmvValues(df: DataFrame, keyCol: String, k: Int = 256): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    df.select(ColumnFns.md5Long(col(keyCol)).as("__h"))
      .distinct().orderBy(col("__h")).limit(k)
  }

  /** Theta-sketch set intersection over two KMV value tables (Dasgupta et
    * al., the DataSketches "theta" algebra): the estimate of
    * `|keys(A) ∩ keys(B)|` from two bottom-k sketches, never touching the
    * raw data again.
    *
    * θ_X = the k-th (largest kept) hash when the sketch is saturated
    * (n_kept = k), else 2^60 (the sketch IS the exact value set).
    * θ = min(θ_A, θ_B); every kept hash < θ is a uniform sample of the
    * key space at rate θ/2^60, so
    * `est = |A_values ∩ B_values ∩ [0, θ)| * 2^60 / θ`.
    * When both sketches are exact (θ = 2^60) the estimate IS the exact
    * intersection cardinality. Join-planning use: `est` over two key
    * columns is the distinct-key overlap — the equi-join's distinct-match
    * cardinality — from two metadata-sized summaries.
    *
    * Scale shape: both inputs are <= k rows by construction, so the
    * whole operator is a broadcastable k-row join + 1-row aggregates; the
    * corpus is never rescanned. Integer/decimal arithmetic only.
    *
    * Returns ONE row: (theta, n_common, est_intersect). */
  def kmvIntersect(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    def theta(v: DataFrame) = v.agg(
      when(count(lit(1)) >= k, max(col("__h"))).otherwise(lit(HashSpace))
        .as("__theta"))
    val thetas = theta(a).crossJoin(theta(b).withColumnRenamed("__theta", "__tb"))
      .select(least(col("__theta"), col("__tb")).as("theta"))
    val common = a.join(b, "__h")
    common.crossJoin(broadcast(thetas))
      .filter(col("__h") < col("theta"))
      .groupBy(col("theta"))
      .agg(count(lit(1)).as("n_common"))
      // right-outer-style guard: an empty intersection still yields a row
      .unionByName(thetas.select(col("theta"), lit(0L).as("n_common")))
      .groupBy(col("theta")).agg(max(col("n_common")).as("n_common"))
      .withColumn("est_intersect",
        expr(s"CAST(CAST(n_common AS DECIMAL(38,0)) * ${HashSpace}" +
          " div theta AS BIGINT)"))
  }

  /** Union-merge of KMV sketches stored as (bottom-k hash) VALUE tables:
    * concatenate, distinct, re-take bottom k. Associative + commutative +
    * idempotent, so per-file / per-day sketches roll up in any order —
    * the property that makes the sketch a manifest-friendly statistic. */
  def kmvMerge(parts: Seq[DataFrame], k: Int = 256): DataFrame =
    parts.reduce(_ unionByName _).distinct().orderBy(col("__h")).limit(k)

  /** Sliding-window distinct estimates from MERGEABLE per-bucket KMV
    * sketches — the "sketch once, merge many" pattern that makes
    * windowed cardinality affordable at 100 TB: the corpus is scanned
    * and hashed ONCE into one bottom-k per time bucket (a single
    * map-side-combined aggregate whose shuffle carries ≤ k longs per
    * bucket, never the rows), and every sliding window of
    * `windowBuckets` consecutive buckets is then answered from the
    * union algebra — bottom-k of a union of bottom-k arrays IS the
    * bottom-k of the union, so each window costs ≤ k·W metadata longs
    * instead of a re-scan. An exact windowed COUNT(DISTINCT) would pay
    * a full shuffle of every (window, key) pair — W× the corpus.
    *
    * One output row per DISTINCT bucket value b: the window covering
    * buckets (b − W, b]. The bucket→window fan-out is a W-element
    * `sequence` explode on the ≤-k-long sketch rows (metadata-sized),
    * then one hash aggregate per window end merges member arrays with
    * `flatten → array_distinct → array_sort → slice k` — bounded at
    * k·W elements per group by construction. */
  def kmvSlidingWindows(df: DataFrame, bucketCol: String, keyCol: String,
                        windowBuckets: Int, k: Int = 64): DataFrame = {
    require(windowBuckets >= 1, s"need W >= 1, got $windowBuckets")
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val perBucket = df
      .select(col(bucketCol).cast("long").as("__b"),
        ColumnFns.md5Long(col(keyCol)).as("__h"))
      .groupBy(col("__b"))
      .agg(bottomK(col("__h"), k).as("__bk"))
    // every bucket's sketch serves the W windows ending at b..b+W-1;
    // keep only window ends that are real buckets (inner join with the
    // bucket set — itself metadata-sized)
    val ends = perBucket.select(col("__b").as("win_end"))
    val fanned = perBucket
      .select(explode(expr(s"sequence(__b, __b + ${windowBuckets - 1})"))
        .as("win_end"), col("__bk"))
      .join(ends.hint("broadcast"), "win_end")
    kmvPerKeyReadOut(
      fanned.groupBy(col("win_end"))
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("__bk"))))),
          1, k).as("__bk")),
      "win_end", "__bk", k)
  }

  /** Count-min sketch build: d independent md5 rows × w columns of long
    * counters. Each input row increments cell `(r, md5Long(r||key) % w)`
    * by one. The WHOLE sketch is d×w rows — it aggregates with map-side
    * combine (shuffle cardinality d×w, never |rows|) and merges across
    * batches by cell-wise addition.
    */
  def cmsBuild(df: DataFrame, keyCol: String, d: Int = 3, w: Int = 64): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d w=$w")
    val rows = (0 until d).map { r =>
      df.select(lit(r).as("row_id"),
        pmod(ColumnFns.md5Long(concat(lit(s"cms$r|"), col(keyCol))), lit(w))
          .as("cell_id"))
    }.reduce(_ unionByName _)
    rows.groupBy(col("row_id"), col("cell_id"))
      .agg(count(lit(1)).as("cell_count"))
  }

  /** Count-min point estimate for a candidate key set: probe each key's d
    * cells, take the MIN across rows — the classic CMS guarantee:
    * `exact <= est <= exact + eps*N` with probability 1-delta (Cormode &
    * Muthukrishnan 2005). The sketch side is d×w rows and BROADCASTS;
    * the probe is a map-side join, so estimating frequencies for any
    * candidate set never shuffles the corpus.
    *
    * Returns (key, est_count) — one row per candidate key.
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame, keyCol: String,
                  d: Int = 3, w: Int = 64): DataFrame = {
    val probes = (0 until d).map { r =>
      candidates.select(col(keyCol), lit(r).as("row_id"),
        pmod(ColumnFns.md5Long(concat(lit(s"cms$r|"), col(keyCol))), lit(w))
          .as("cell_id"))
    }.reduce(_ unionByName _)
    probes.join(broadcast(sketch), Seq("row_id", "cell_id"))
      .groupBy(col(keyCol))
      .agg(min(col("cell_count")).as("est_count"))
  }

  /** Log2-bucketed histogram of a non-negative long measure — the
    * deterministic fixed-size quantile sketch: bucket `b` holds values in
    * [2^b, 2^(b+1)) (zero and negatives land in guard bucket -1), so the
    * whole summary is <= 64 rows regardless of input size, aggregates
    * with map-side combine, and merges across batches/files/days by
    * cell-wise addition + min/max — the same mergeability contract as
    * [[cmsBuild]]. Relative error of a quantile read off the histogram is
    * bounded by the bucket width (2× — tighten by bucketing
    * `length(bin(v * scale))` if needed). Float-free: `bin()` length IS
    * floor(log2)+1, exactly, for every positive long.
    *
    * Returns (bucket_log2, n_rows, lo, hi) — lo/hi the observed extrema
    * within the bucket (tighter than the power-of-two bounds). */
  def logHistogram(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .select(col("__v"),
        when(col("__v") <= 0, lit(-1))
          .otherwise((length(bin(col("__v"))) - 1).cast("int")).as("bucket_log2"))
      .groupBy(col("bucket_log2"))
      .agg(count(lit(1)).as("n_rows"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))

  /** Quantile read-out of a [[logHistogram]]: for each requested q (in
    * milli-units), the first bucket whose cumulative count reaches
    * ceil(q·n/1000) — the bucket that CONTAINS the exact q-quantile, with
    * its observed upper bound `hi` as the point estimate (never below the
    * true quantile). Pure integer threshold arithmetic; the cumulative
    * window runs over the <= 64-row summary (metadata-sized by
    * construction — the corpus never re-sorts). Returns
    * (q_milli, bucket_log2, bucket_hi, n_le) per requested quantile. */
  def histogramQuantiles(hist: DataFrame, qMillis: Seq[Int]): DataFrame = {
    require(qMillis.nonEmpty && qMillis.forall(q => q > 0 && q <= 1000),
      s"quantiles must be in (0, 1000] milli, got $qMillis")
    val cumWin = Window.orderBy(col("bucket_log2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("n_le", sum(col("n_rows")).over(cumWin))
      .select(col("bucket_log2"), col("hi"), col("n_le"))
    val total = hist.agg(sum(col("n_rows")).as("__n"))
    val qs = hist.sparkSession
      .createDataset(qMillis)(org.apache.spark.sql.Encoders.scalaInt)
      .toDF("q_milli").crossJoin(broadcast(total))
      .select(col("q_milli"),
        expr("(q_milli * __n + 999) div 1000").as("__thr"))
    val pick = qs.join(cum, cum("n_le") >= qs("__thr"))
      .groupBy(col("q_milli"))
      .agg(min(col("bucket_log2")).as("bucket_log2"))
    pick.join(cum, Seq("bucket_log2"))
      .select(col("q_milli"), col("bucket_log2"), col("hi").as("bucket_hi"),
        col("n_le"))
  }
}
