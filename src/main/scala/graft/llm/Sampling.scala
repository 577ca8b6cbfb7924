package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColumnFns.md5Long

/** Deterministic sampling operators for training-data pipelines.
  *
  * Everything here is a pure function of the row's id — content- and
  * partitioning-independent — so the same document lands in the same
  * sample on every run, cluster, and engine (`rand()`-based sampling
  * cannot promise any of that, and breaks replay/idempotence contracts).
  */
object Sampling {

  /** Stratified deterministic sampling: keep a row iff
    * `hash(id) mod granularity < rate(stratum) * granularity`, with the
    * per-stratum rate looked up from `rates` (columns: `stratum`, `rate`)
    * and `defaultRate` for strata absent from the table.
    *
    * The classic data-mixing knob: up-weight curated sources, down-sample
    * boilerplate-heavy ones, at per-stratum precision of 1/granularity.
    *
    * Scale shape: `rates` is stratum-cardinality (tiny) -> broadcast left
    * join; the data side streams through one scan + filter with no
    * shuffle, so the operator composes with any downstream partitioning.
    * The hash is the engine's cross-engine md5 ([[md5Long]]), making the
    * kept set reproducible in SQL oracles and across replays.
    */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
                 rates: DataFrame, defaultRate: Double = 0.0,
                 granularity: Long = 1000000L): DataFrame = {
    require(granularity > 0, s"granularity must be positive, got $granularity")
    require(defaultRate >= 0.0 && defaultRate <= 1.0,
      s"defaultRate must be in [0,1], got $defaultRate")
    // a dirty rates table is the one input that can CORRUPT the corpus: a
    // duplicated stratum row fans every matching document out through the
    // join (duplicated training docs), and an out-of-range rate bypasses
    // the [0,1] contract checked for defaultRate. rates is tiny by
    // contract, so the eager validation is one cheap job.
    val bad = rates.groupBy(col("stratum"))
      .agg(count(lit(1)).as("__n"), min(col("rate")).as("__lo"),
        max(col("rate")).as("__hi"))
      .filter(col("__n") > 1 || col("__lo") < 0.0 || col("__hi") > 1.0)
    require(bad.isEmpty,
      "stratified: rates table has a duplicated stratum or a rate outside [0,1]")
    val r = rates.select(col("stratum").as("__stratum"), col("rate").as("__rate"))
    val threshold = round(coalesce(col("__rate"), lit(defaultRate)) * granularity)
      .cast("long")
    df.join(broadcast(r), df(strataCol) === col("__stratum"), "left")
      .filter(pmod(md5Long(col(idCol).cast("string")), lit(granularity)) < threshold)
      .drop("__stratum", "__rate")
  }

  /** Winsorization at exact percentiles: clamp a numeric column into
    * [P(loMilli), P(hiMilli)] — the robust-statistics tail treatment
    * (outlier-capping before means/regressions/mixture weights) that
    * DROP-based filters can't give you when every row must survive.
    *
    * Thresholds are EXACT order statistics (value at rank
    * `ceil(p·n/1000)` over the (value, id) total order — integer rank
    * arithmetic, engine-exact), landed on every row via a 2-value
    * broadcast; the clamp itself is one codegen'd least/greatest. The
    * exact ranks come from [[graft.operators.GlobalRank.globalRowNumber]]
    * — the two-phase range-partitioned form, never a single-task global
    * window — so the exact derivation itself survives 100 TB; the
    * mergeable histogram sketch read-out remains the cheaper approximate
    * twin when ±1-rank slack is acceptable. */
  /** Systematic probability-proportional-to-size sampling: lay the rows
    * end-to-end on their weight intervals (exact distributed prefix sum —
    * [[graft.operators.GlobalRank.globalPrefixSum]], never a single-task
    * window), then take every step-th point of the total weight line
    * (step = W div k). A row is picked once per step-multiple its
    * interval covers — heavy rows can be picked multiple times
    * (`n_picks` > 1), zero-weight rows never. Fully deterministic and
    * integer-exact: picks are `cum div step − (cum − w) div step`, no
    * random stream to reconcile across engines. Σ n_picks = W div step
    * (≥ k). Returns only picked rows: (id, w, cum_w, n_picks). */
  def ppsSystematic(df: DataFrame, idCol: String, weightCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val v = df.select(col(idCol),
      greatest(col(weightCol).cast("long"), lit(0L)).as("w"))
    val cum = graft.operators.GlobalRank
      .globalPrefixSum(v, Seq(col(idCol)), "w", "__cum")
    val tot = v.agg(sum(col("w").cast("decimal(38,0)")).as("__tw"))
    cum.crossJoin(broadcast(tot))
      .withColumn("__step", expr(s"__tw div $k"))
      .filter(col("__step") > 0)
      .withColumn("n_picks",
        expr("cast(__cum div __step - (__cum - w) div __step as bigint)"))
      .filter(col("n_picks") > 0)
      // cum_w stays DECIMAL(38,0) (globalPrefixSum's native width): at
      // 100 TB the running total can exceed Long.MaxValue, and a long
      // cast would silently null/wrap it while n_picks stayed correct
      .select(col(idCol), col("w"), col("__cum").as("cum_w"),
        col("n_picks"))
  }

  /** Median-absolute-deviation outlier gate — the robust complement of
    * the 3-sigma screen (a single whale inflates a standard deviation
    * until nothing flags; the median and MAD don't move): flag rows with
    * |v − median| · 1000 > kMilli · MAD. Both medians are EXACT lower
    * order statistics (rank (n+1)/2) via the two-phase global ranking —
    * no single-task window — and every comparison is integer, so the
    * gate is bit-deterministic. Two ranking passes + two 1-row
    * broadcasts; returns only the flagged rows
    * (id, value, abs_dev, mad). */
  def madOutliers(df: DataFrame, idCol: String, valueCol: String,
                  kMilli: Long = 3000): DataFrame = {
    require(kMilli > 0, s"kMilli must be positive, got $kMilli")
    val v = df.select(col(idCol), col(valueCol).cast("long").as("value"))
    val n1 = v.agg(count(lit(1)).as("__n"))
    val med = graft.operators.GlobalRank
      .globalRowNumber(v, Seq(col("value"), col(idCol)), "__rn")
      .crossJoin(broadcast(n1))
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .agg(min(col("value")).as("__med"))
    val dev = v.crossJoin(broadcast(med))
      .withColumn("__dev", abs(col("value") - col("__med")))
    val mad = graft.operators.GlobalRank
      .globalRowNumber(dev.select(col(idCol), col("__dev")),
        Seq(col("__dev"), col(idCol)), "__rn2")
      .crossJoin(broadcast(n1))
      .filter(col("__rn2") === expr("(__n + 1) div 2"))
      .agg(min(col("__dev")).as("__mad"))
    dev.crossJoin(broadcast(mad))
      .filter(col("__dev") * 1000L > lit(kMilli) * col("__mad"))
      .select(col(idCol), col("value"), col("__dev").as("abs_dev"),
        col("__mad").as("mad"))
  }

  def winsorize(df: DataFrame, idCol: String, valueCol: String,
                loMilli: Int = 10, hiMilli: Int = 990): DataFrame = {
    require(loMilli >= 0 && hiMilli <= 1000 && loMilli < hiMilli,
      s"need 0 <= loMilli < hiMilli <= 1000, got $loMilli/$hiMilli")
    val v = df.select(col(idCol), col(valueCol).cast("long").as("value"))
    val ranked = graft.operators.GlobalRank.globalRowNumber(
      v, Seq(col("value"), col(idCol)), "__rn")
    val thr = ranked.crossJoin(broadcast(v.agg(count(lit(1)).as("__n"))))
      .filter(col("__rn") === expr(s"greatest(1L, ($loMilli * __n + 999) div 1000)")
        || col("__rn") === expr(s"greatest(1L, ($hiMilli * __n + 999) div 1000)"))
      .agg(min(col("value")).as("__lo"), max(col("value")).as("__hi"))
    v.crossJoin(broadcast(thr))
      .select(col(idCol), col("value"),
        least(greatest(col("value"), col("__lo")), col("__hi"))
          .as("winsorized"))
  }

  /** Quantile normalization across strata (the microarray-era classic,
    * Bolstad et al. 2003, as a corpus-mixing tool): replace each row's
    * value with the GLOBAL value at the same within-stratum quantile, so
    * every stratum ends up with the global distribution — the fix for
    * "source A's quality scores run hot" before mixture sampling compares
    * scores across sources.
    *
    * Integer-exact mapping: within-stratum rank r of n_s rows maps to
    * global rank `ceil(r·N/n_s)` (1-indexed, `(r·N + n_s − 1) div n_s`),
    * all ranks from `row_number` over the (value, id) total order — no
    * float quantiles, engines agree exactly.
    *
    * Scale note: BOTH rank sides are two-phase — within-stratum ranks
    * ride [[graft.operators.GlobalRank.groupedRowNumber]] (strata are
    * low-cardinality sources/domains, so a stratum-partitioned window
    * would be one task per stratum) and the global side rides
    * [[graft.operators.GlobalRank.globalRowNumber]] — never a
    * single-task window on either axis. The mergeable
    * [[graft.operators.Sketches.logHistogram]] read-out remains the
    * cheaper approximate twin (same join shape) when ±1-rank slack is
    * acceptable. */
  def quantileNormalize(df: DataFrame, idCol: String, valueCol: String,
                        strataCol: String): DataFrame = {
    val v = df.select(col(idCol), col(strataCol), col(valueCol).cast("long").as("v"))
    // within-stratum exact ranks via the GROUPED two-phase ranking — a
    // window partitioned by the stratum key would be one task per
    // stratum (strata are low-cardinality by definition here: sources /
    // domains), each sorting ~N/|strata| of the corpus at 100 TB
    // NULL-SAFE stratum count join (a null stratum is an ordinary
    // partition to the window form this replaces, and groupedRowNumber
    // ranks it — a plain equi-join would silently drop those rows)
    val ns = v.groupBy(col(strataCol)).agg(count(lit(1)).as("__ns"))
      .select(col(strataCol).as("__qn_s"), col("__ns"))
    val ranked = graft.operators.GlobalRank.groupedRowNumber(v,
        Seq(strataCol), Seq(col("v"), col(idCol)), "__r")
      .join(broadcast(ns), col(strataCol) <=> col("__qn_s"))
      .drop("__qn_s")
    val globalRanked = graft.operators.GlobalRank.globalRowNumber(
        v.select(col("v"), col(idCol)), Seq(col("v"), col(idCol)), "__gr")
      .select(col("__gr"), col("v").as("norm_value"))
    val n = v.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      // DECIMAL(38,0) product: __r·__n is rows² — at 10^10 corpus rows a
      // long multiply wraps past 2^63 and the mapped rank goes garbage;
      // the quotient itself is ≤ N and fits a long again
      .withColumn("__gr", expr(
        "cast((cast(__r as decimal(38,0)) * __n + __ns - 1) div __ns as bigint)"))
      .join(globalRanked, "__gr")
      .select(col(idCol), col(strataCol), col("v").as("value"),
        col("norm_value"))
  }

  /** KL-divergence drift audit between two categorical samples — the
    * distribution-shift monitor a mixture pipeline runs between epochs,
    * snapshots, or source versions: `KL(p‖q) = Σ_t p_t·ln(p_t/q_t)` over
    * the category distribution, add-one (Laplace) smoothed so categories
    * absent from one side stay finite. Positive total = the new sample
    * has drifted from the reference; per-category contributions say
    * WHERE (a category with a large positive contribution is
    * over-represented in `p` relative to `q`).
    *
    * Determinism: the log-ratio is quantized ONCE PER CATEGORY from
    * exact integer counts (`round(ln((c1+1)·(N2+T) / ((c2+1)·(N1+T)))·
    * 1e6)`, products in DECIMAL(38,0), one double division), and the
    * contribution is integer arithmetic on it — engine-exact.
    *
    * Scale shape: two map-side-combined category counts (the only
    * corpus-sized work), one category-keyed full outer join, totals via
    * a 1-row broadcast. Output is category-table sized. */
  def klDrift(p: DataFrame, q: DataFrame, keyCol: String): DataFrame = {
    val cp = p.groupBy(col(keyCol)).agg(count(lit(1)).as("c1"))
    val cq = q.groupBy(col(keyCol)).agg(count(lit(1)).as("c2"))
    val joined = cp.join(cq, Seq(keyCol), "full_outer")
      .select(col(keyCol), coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
    val totals = joined.agg(sum(col("c1")).as("__n1"), sum(col("c2")).as("__n2"),
      count(lit(1)).as("__t"))
    joined.crossJoin(broadcast(totals))
      .withColumn("lr_micro",
        round(log(expr("cast(c1 + 1 as decimal(38,0)) * (__n2 + __t)").cast("double")
          / expr("cast(c2 + 1 as decimal(38,0)) * (__n1 + __t)").cast("double"))
          * 1e6).cast("long"))
      // the (c1+1)·lr product rides DECIMAL(38,0) like the lr operands
      // above: a 1e11-count category times a ~8e7 lr_micro wraps Long
      .withColumn("contrib_micro", expr(
        """CAST(CASE WHEN lr_micro < 0
          |     THEN -(cast(c1 + 1 as decimal(38,0)) * (-lr_micro) div (__n1 + __t))
          |     ELSE cast(c1 + 1 as decimal(38,0)) * lr_micro div (__n1 + __t)
          |     END AS BIGINT)""".stripMargin))
      .select(col(keyCol), col("c1"), col("c2"), col("lr_micro"),
        col("contrib_micro"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    * algorithm A-ES): a fixed-size sample of `k` rows where selection
    * probability tracks the row's weight — the "pick 50M docs, favoring
    * quality" primitive [[weighted]] (per-row Bernoulli, variable output
    * size) cannot express. E-S draws `u^(1/w)` per row and keeps the k
    * largest; equivalently the k SMALLEST of `-ln(u)/w`, which is the form
    * that quantizes: `u = md5(id)/2^60` (the family's cross-engine
    * uniform), `nlu_micro = -round(ln(u)·1e6)`, key =
    * `nlu_micro·1e6 div w` with truncating integer division, ties to the
    * smaller id — fully deterministic, replayable, oracle-checkable.
    *
    * Scale shape: one scan computing the key (codegen'd; md5 + ln per
    * row), then a k-row `TakeOrderedAndProject` (per-partition top-k,
    * merge of k·partitions survivors — never a full sort). Weights must
    * be positive integers (char counts, token counts, milli-quality);
    * non-positive rows are excluded (cannot be sampled).
    */
  def weightedSampleNoReplacement(df: DataFrame, idCol: String,
                                  weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = greatest(md5Long(col(idCol).cast("string")), lit(1L)) // h=0 guard
    df.withColumn("w", weight.cast("long"))
      .filter(col("w") > 0)
      .withColumn("__nlu",
        (-round(log(u.cast("double") / lit(1.152921504606846976e18)) * 1e6))
          .cast("long"))
      .withColumn("es_key", expr("__nlu * 1000000 div w"))
      .select(col(idCol), col("w"), col("es_key"))
      .orderBy(col("es_key"), col(idCol))
      .limit(k)
  }

  /** Per-row weighted deterministic sampling: keep a row iff
    * `hash(id) mod granularity < round(weight * granularity)`, with the
    * weight a per-row COLUMN in [0,1] (vs [[stratified]]'s per-stratum
    * lookup) — the shape quality-weighted corpus sampling takes, where
    * each document's keep probability comes from its own quality score.
    *
    * Scale shape: one scan, one codegen'd filter, no shuffle, no join —
    * composes with any partitioning. Same cross-engine hash as the rest
    * of the sampling family, so the kept set is replay- and
    * oracle-stable. Weights outside [0,1] are clamped.
    */
  def weighted(df: DataFrame, idCol: String,
               weight: org.apache.spark.sql.Column,
               granularity: Long = 1000000L): DataFrame = {
    require(granularity > 0, s"granularity must be positive, got $granularity")
    val threshold = round(
      greatest(least(weight, lit(1.0)), lit(0.0)) * granularity).cast("long")
    df.filter(
      pmod(md5Long(col(idCol).cast("string")), lit(granularity)) < threshold)
  }

  /** Per-stratum cap ("domain quota"): keep at most `maxPerStratum` rows
    * per stratum — the ones with the LOWEST `(hash(id), id)` — as a
    * deterministic down-weighting of over-represented domains.
    *
    * Exact top-N per key WITHOUT a per-stratum window sort: phase 1 keeps
    * each partition's local top-N per stratum (`sort_array ∘ collect_list`
    * over one partition's slice of one stratum — bounded by the partition,
    * not the stratum), phase 2 merges the ≤ N·partitions survivors per
    * stratum and re-slices. The global top-N is always a subset of the
    * union of local top-Ns, so the result is exact and independent of the
    * physical partitioning — a corpus-dominating domain never funnels its
    * full row set through one task the way `row_number() OVER (PARTITION
    * BY stratum)` would. Returns (stratum, rank, id). */
  def capPerStratum(df: DataFrame, idCol: String, strataCol: String,
                    maxPerStratum: Int): DataFrame = {
    require(maxPerStratum > 0,
      s"maxPerStratum must be positive, got $maxPerStratum")
    val rec = struct(md5Long(col(idCol).cast("string")).as("h"),
      col(idCol).as("id"))
    df.select(col(strataCol), rec.as("__rec"),
        spark_partition_id().as("__pid"))
      .groupBy(col(strataCol), col("__pid"))
      .agg(slice(sort_array(collect_list(col("__rec"))), 1, maxPerStratum)
        .as("__local"))
      .groupBy(col(strataCol))
      .agg(slice(sort_array(flatten(collect_list(col("__local")))), 1,
        maxPerStratum).as("__top"))
      .select(col(strataCol), posexplode(col("__top")).as(Seq("__pos", "__r")))
      .select(col(strataCol), (col("__pos") + 1).as("rank"),
        col("__r.id").as(idCol))
  }

  /** Per-STRATUM Efraimidis–Spirakis weighted sampling without
    * replacement: k rows per stratum with inclusion probability
    * proportional to `weight` — the "fixed-size weighted sample per
    * domain/language/source" read a mixture pipeline takes before
    * inspecting or re-weighting a corpus. Same deterministic integer
    * `es_key` as [[weightedSampleNoReplacement]] (quantized −ln(u)/w,
    * md5-derived u — engines agree bit-for-bit, replays are stable);
    * the per-stratum top-k uses [[capPerStratum]]'s two-phase
    * local-top-k / merge shape (each phase bounded by the PARTITION,
    * exact for any skew), so a corpus-dominating stratum never funnels
    * its rows through one `row_number` window task.
    * Returns (stratum, rank, id, w, es_key), rank 1..k. */
  def weightedSamplePerStratum(df: DataFrame, idCol: String,
                               strataCol: String, weight: Column,
                               k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = greatest(md5Long(col(idCol).cast("string")), lit(1L)) // h=0 guard
    val keyed = df.withColumn("w", weight.cast("long"))
      .filter(col("w") > 0)
      .withColumn("__nlu",
        (-round(log(u.cast("double") / lit(1.152921504606846976e18)) * 1e6))
          .cast("long"))
      .withColumn("es_key", expr("__nlu * 1000000 div w"))
    val rec = struct(col("es_key"), col(idCol).as("id"), col("w"))
    keyed
      .select(col(strataCol), rec.as("__rec"), spark_partition_id().as("__pid"))
      .groupBy(col(strataCol), col("__pid"))
      .agg(slice(sort_array(collect_list(col("__rec"))), 1, k).as("__local"))
      .groupBy(col(strataCol))
      .agg(slice(sort_array(flatten(collect_list(col("__local")))), 1, k)
        .as("__top"))
      .select(col(strataCol), posexplode(col("__top")).as(Seq("__pos", "__r")))
      .select(col(strataCol), (col("__pos") + 1).as("rank"),
        col("__r.id").as(idCol), col("__r.w").as("w"),
        col("__r.es_key").as("es_key"))
  }

  /** Largest value whose ×1e6 micro-unit quantization fits a Long. Both
    * mixture builders multiply a per-stratum quantity by 1e6 before the
    * integer `div`; past this bound the product no longer fits 63 bits.
    * At 100 TB per-stratum char counts CAN reach 1e14 — the guard makes
    * the failure loud and actionable (pre-scale `sizeCol`, e.g. to MB)
    * in every engine/ANSI mode instead of wrapping to garbage weights. */
  private val MaxMicroSafe = Long.MaxValue / 1000000L

  /** `($c * 1000000) div $tot`, overflow-guarded: raises a descriptive
    * error when `$c` exceeds [[MaxMicroSafe]] rather than wrapping (or
    * throwing ANSI's generic overflow) mid-job. */
  private def microShare(c: String, tot: String, op: String): Column =
    expr(s"""CASE WHEN $c > $MaxMicroSafe THEN
            |  raise_error(concat('$op: ', '$c', ' = ', CAST($c AS STRING),
            |    ' exceeds the 1e6-quantization bound $MaxMicroSafe — pre-scale the size column'))
            |ELSE ($c * 1000000) div $tot END""".stripMargin)

  /** Temperature-scaled mixture weights per stratum: `p_s ∝ size_s^α`
    * with α = 0.5 — the flattening exponent that is also IEEE-exact
    * (`sqrt` is correctly rounded in every engine; `pow(x, α)` in general
    * is not), so the weights are bit-identical across engines. Per-stratum
    * float math happens ONCE per stratum row and is quantized to integer
    * micro-units BEFORE the cross-row normalization; the normalizing sum
    * and the final `div` are exact integer arithmetic riding a 1-row
    * broadcast (no driver collect). Strata larger than [[MaxMicroSafe]]
    * raise a descriptive error ([[microShare]]) instead of overflowing. */
  def temperatureMixtureSqrt(df: DataFrame, strataCol: String,
                             sizeCol: String): DataFrame = {
    val w = df.groupBy(col(strataCol))
      .agg(sum(col(sizeCol)).as("stratum_size"))
      .withColumn("w_micro",
        round(sqrt(col("stratum_size").cast("double")) * 1e6).cast("long"))
    w.crossJoin(broadcast(w.agg(sum(col("w_micro")).as("__tot"))))
      .withColumn("p_micro",
        microShare("w_micro", "__tot", "temperatureMixtureSqrt"))
      .select(col(strataCol), col("stratum_size"), col("w_micro"),
        col("p_micro"))
  }

  /** Epoch-annealed mixture schedule: per-epoch sampling weights that
    * interpolate linearly from the NATURAL source distribution (epoch 0)
    * to the sqrt-TEMPERED one ([[temperatureMixtureSqrt]], final epoch) —
    * the standard curriculum that starts faithful to the corpus and
    * flattens toward rare sources as training progresses.
    *
    * Determinism: the only float op is the IEEE-exact `sqrt` (same
    * argument in every engine); both endpoint distributions are quantized
    * to integer micro-units FIRST and the per-epoch interpolation is pure
    * integer arithmetic (`t` in micro-units; interpolation products
    * ≤ 1e12 << 2^63), so the schedule is bit-identical across engines,
    * runs, and retries. The ENDPOINT quantization multiplies raw stratum
    * sizes by 1e6, so strata beyond [[MaxMicroSafe]] raise a descriptive
    * error ([[microShare]]) instead of overflowing.
    * Scale shape: one bounded aggregate + a 1-row broadcast + a
    * per-stratum explode of `epochs` rows — never a corpus-sized shuffle.
    */
  def annealedMixture(df: DataFrame, strataCol: String, sizeCol: String,
                      epochs: Int): DataFrame = {
    require(epochs >= 2, s"need at least 2 epochs to interpolate, got $epochs")
    val w = df.groupBy(col(strataCol))
      .agg(sum(col(sizeCol)).as("stratum_size"))
      .withColumn("__wsq",
        round(sqrt(col("stratum_size").cast("double")) * 1e6).cast("long"))
    w.crossJoin(broadcast(w.agg(
        sum(col("stratum_size")).as("__ts"), sum(col("__wsq")).as("__tw"))))
      .withColumn("__pn", microShare("stratum_size", "__ts", "annealedMixture"))
      .withColumn("__ps", microShare("__wsq", "__tw", "annealedMixture"))
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("__t", expr(s"(epoch * 1000000) div ${epochs - 1}"))
      .select(col("epoch"), col(strataCol), col("stratum_size"),
        expr("(__pn * (1000000 - __t) + __ps * __t) div 1000000").as("p_micro"))
  }

  /** Deterministic sequence packing: assign each document a (shard,
    * pack_idx, pack_offset) placement in the concat-and-chunk layout
    * pretraining uses — all documents of a shard concatenated in id order,
    * the token stream cut every `seqLen` tokens; a document's pack is the
    * chunk its first token lands in.
    *
    * Sharding is what makes this scale: a single global concatenation
    * order would force the running token sum through ONE task, so the
    * stream is first split into `shards` independent streams by id hash
    * (content-independent, deterministic) and the cumulative sum is a
    * window per shard — `shards` parallel running sums, each a bounded
    * partition. Placements are reproducible across runs/clusters/engines:
    * every ingredient is a pure function of (id, tokenCount).
    */
  def packSequences(df: DataFrame, idCol: String, tokenCountCol: String,
                    seqLen: Long, shards: Int = 64): DataFrame = {
    require(seqLen > 0 && shards > 0,
      s"seqLen and shards must be positive, got $seqLen / $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(md5Long(col(idCol).cast("string")), lit(shards)))
      .withColumn("tokens_before", coalesce(sum(col(tokenCountCol)).over(w), lit(0L)))
      .withColumn("pack_idx", expr(s"tokens_before div $seqLen"))
      .withColumn("pack_offset", expr(s"tokens_before % $seqLen"))
  }

  /** Leakage-safe train/val/test assignment: the split is a hash of the
    * near-duplicate COMPONENT (from `comp`, a (node, component) labeling —
    * e.g. [[graft.operators.ConnectedComponents.run]] over
    * [[Dedup.nearDupEdges]]), not of the document, so a near-dup pair can
    * never straddle train and test — the guarantee a naive per-document
    * hash split violates exactly where contamination matters most.
    * Documents in no component fall back to their own id as the group.
    * Returns one row per document: (idCol, grp, split).
    */
  def groupAwareSplit(df: DataFrame, idCol: String, comp: DataFrame,
                      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split fractions: train $trainPct / val $valPct")
    df.select(col(idCol))
      .join(comp, col(idCol) === col("node"), "left")
      .withColumn("grp", coalesce(col("component"), col(idCol)))
      .withColumn("bucket", md5Long(col("grp").cast("string")) % 100)
      .withColumn("split", when(col("bucket") < trainPct, "train")
        .when(col("bucket") < trainPct + valPct, "val").otherwise("test"))
      .select(col(idCol), col("grp"), col("split"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): documents are scored by
    * how much more likely their hashed-n-gram features are under the
    * TARGET distribution (`isTarget` rows) than under the RAW distribution
    * (the rest). Features are word unigrams hashed into `buckets` buckets;
    * both distributions are Laplace-smoothed bucket frequencies; a
    * document's weight is Σ_tokens (log p_target(bucket) − log
    * p_raw(bucket)) — resample raw data proportionally to exp(weight) to
    * shift it toward the target domain.
    *
    * Scale shape: the two distributions are ONE conditional aggregate of
    * fixed cardinality `buckets` (map-side combine carries the load); the
    * per-bucket log-ratio table rides a broadcast join onto the exploded
    * token stream; the per-document sum is integer micro-nat arithmetic —
    * each log quantized once per BUCKET (not per token), so scores are
    * bit-deterministic across engines and retries, the same contract as
    * [[TextAnalysis.unigramLogProbScores]]. No driver-side data path.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val toks = df
      .select(col(idCol), isTarget.as("__t"),
        explode(graft.functions.ColumnFns.tokens(col(textCol))).as("__term"))
      .select(col(idCol), col("__t"),
        pmod(md5Long(col("__term")), lit(buckets.toLong)).as("bucket"))
    val counts = toks.groupBy(col("bucket"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("__cr"))
    def logMicro(c: Column, n: Column): Column =
      round(log((c + 1).cast("double") / (n + buckets).cast("double")) * 1e6)
        .cast("long")
    val ratio = counts
      .crossJoin(broadcast(counts.agg(
        sum(col("__ct")).as("__nt"), sum(col("__cr")).as("__nr"))))
      .select(col("bucket"),
        (logMicro(col("__ct"), col("__nt")) -
          logMicro(col("__cr"), col("__nr"))).as("__lr"))
    toks.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lr")).as("weight_micro"))
      .select(col(idCol), col("n_tokens"), col("weight_micro"),
        // integer micro-nat mean, truncating division with explicit sign
        // split (trunc-vs-floor engine divergence on negatives; and a
        // round(w/n, 6) double here landed EXACTLY on a half-ulp tie at
        // sf0.1 — integer division has no ties)
        expr("CASE WHEN weight_micro < 0 THEN -((-weight_micro) div n_tokens)" +
          " ELSE weight_micro div n_tokens END").as("avg_weight_micro"))
  }

  /** One DoReMi-style domain-reweighting step (Xie et al. 2023): update
    * each domain's mixture weight multiplicatively by its (excess) loss —
    * `w' ∝ w · exp(η · loss)` — then renormalize. The exponentiated-
    * gradient update that upweights the domains the proxy model finds
    * hardest; iterating it is the DoReMi training loop, and ONE step is
    * the per-round relational program (the loop is driver-side over
    * bounded domain rows, like the k-means step).
    *
    * Determinism: the exp argument is one double division of an exact
    * integer product (`etaMilli · loss_milli`, ≤ 4e6 — exactly
    * representable), the factor is quantized to integer MILLI units
    * (keeping the normalization products ≤ ~5.5e16, far under Long), and
    * the renormalization is exact integer arithmetic on a 1-row
    * broadcast. `loss_milli` outside [0, 4000] raises a descriptive
    * error instead of silently overflowing (e^4 is the quantization
    * budget's ceiling).
    *
    * Scale shape: domains are BOUNDED rows (a mixture has tens of
    * domains, never corpus-scale) — one scan of the domain table, one
    * 1-row broadcast. The expensive part of DoReMi (per-domain loss) is
    * the caller's aggregate over the corpus, which IS corpus-sized but
    * map-side combined on the domain key. */
  def doremiStep(domainLoss: DataFrame, domainCol: String,
                 lossMilliCol: String, prevMicroCol: String,
                 etaMilli: Int = 500): DataFrame = {
    require(etaMilli > 0 && etaMilli <= 1000,
      s"etaMilli must be in (0, 1000], got $etaMilli")
    val guarded = expr(s"""CASE WHEN $lossMilliCol < 0 OR $lossMilliCol > 4000 THEN
      |  raise_error(concat('doremiStep: $lossMilliCol = ',
      |    CAST($lossMilliCol AS STRING), ' outside [0, 4000] — rescale the loss'))
      |ELSE $lossMilliCol END""".stripMargin)
    val f = domainLoss
      .withColumn("factor_milli",
        round(exp(expr(s"cast($etaMilli as double)") * guarded / lit(1e6))
          * 1000).cast("long"))
      .withColumn("__unnorm", col(prevMicroCol) * col("factor_milli"))
    f.crossJoin(broadcast(f.agg(sum(col("__unnorm")).as("__tot"))))
      .withColumn("w_new_micro", expr("(__unnorm * 1000000) div __tot"))
      .select(col(domainCol), col(lossMilliCol), col(prevMicroCol),
        col("factor_milli"), col("w_new_micro"))
  }

  /** Neyman-allocation stratified sample sizing (Neyman 1934 — the
    * variance-optimal split of a budget of `n` samples across strata):
    * stratum h receives n·(N_h·σ_h)/Σ(N_h·σ_h). With integer-cent
    * values, N_h·σ_h = √(N_h·Σx² − (Σx)²) EXACTLY, so the allocation
    * weight needs no division at all; fractional seats resolve by the
    * largest-remainder method (Hamilton), remainder ties broken by
    * stratum value — fully deterministic, Σ n_alloc = n by construction.
    *
    * Scale shape: ONE map-side-combined aggregate over the corpus (the
    * only data-sized pass), a 1-row total broadcast, and a seat-ranking
    * window over the STRATUM table — bounded by the stratum universe
    * (segments, languages, domains: O(10..10k)), never corpus-sized.
    * Degenerate all-zero-variance corpora (Σ weights = 0) allocate by
    * population instead — the uniform-σ limit of the formula. */
  def neymanAllocation(df: DataFrame, stratumCol: String,
                       valueCentsCol: String, n: Int): DataFrame = {
    require(n >= 1, s"sample budget must be >= 1, got $n")
    val v = col(valueCentsCol).cast("decimal(38,0)")
    val st = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_pop"), sum(v).as("__s"),
        sum(v * v).as("__q"))
      .withColumn("alloc_w", expr(
        "cast(floor(sqrt(cast(n_pop * __q - __s * __s as double))) as bigint)"))
    val tot = st.agg(sum(col("alloc_w")).as("__w"), sum(col("n_pop")).as("__np"))
    // degenerate all-zero-variance corpus: substitute population for
    // weight — the uniform-σ limit of the formula (a flat rem here would
    // cap one seat per stratum and LOSE seats when n > #strata)
    val based = st.crossJoin(broadcast(tot))
      .withColumn("__base", expr(
        s"""CASE WHEN __w = 0 THEN cast($n as bigint) * n_pop div __np
           |     ELSE cast($n as bigint) * alloc_w div __w END""".stripMargin))
      .withColumn("__rem", expr(
        s"""CASE WHEN __w = 0 THEN cast($n as bigint) * n_pop - __base * __np
           |     ELSE cast($n as bigint) * alloc_w - __base * __w END""".stripMargin))
    val extra = based.agg((lit(n.toLong) - sum(col("__base"))).as("__extra"))
    // seat ranking runs over the bounded stratum table — the one-task
    // window is by design here, same class as the day-spine whitelist
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col("stratum"))
    based.crossJoin(broadcast(extra))
      .withColumn("__rk", row_number().over(w))
      .withColumn("n_alloc",
        col("__base") + when(col("__rk") <= col("__extra"), 1L).otherwise(0L))
      .select(col("stratum"), col("n_pop"), col("alloc_w"), col("n_alloc"))
  }
}
