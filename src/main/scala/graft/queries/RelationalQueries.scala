package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface beyond the reference (SURVEY §2.9 "absent in the
  * reference — engine supplies via Spark built-ins"): window functions,
  * grouping sets, distinct aggregation, semi/anti/range joins, set ops,
  * subqueries, pivot, JSON extraction. All monetary math is integer cents
  * (`round(x*100)::long`) so results are bit-deterministic across engines.
  */
object RelationalQueries {

  private val cents = (c: org.apache.spark.sql.Column) => round(c * 100).cast("long")

  /** Create (once per session+dir) the two bucketed tables the co-located
    * join reads. Split out so Bench's untimed warm-up can pre-create them —
    * the timed query then measures the zero-shuffle sort-merge join, not
    * one-time table DDL+write. */
  def ensureBucketedTables(s: org.apache.spark.sql.SparkSession,
                           d: String): (String, String) = {
    val t1 = s"li_b_${math.abs(d.hashCode)}"
    val t2 = s"ord_b_${math.abs(d.hashCode)}"
    if (!s.catalog.tableExists(t1)) {
      val base = java.nio.file.Files.createTempDirectory("graft_buck").toString
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
        .write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/li").saveAsTable(t1)
      Tables(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        .write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/ord").saveAsTable(t2)
    }
    (t1, t2)
  }

  /** Exact "discounted revenue" in cent-percent units:
    * `round(ep*100) * (100 - round(disc*100))` — all-integer, so sums are
    * bit-identical across engines (see PERF.md determinism rules). */
  private val revenueCp =
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))

  private val revenueCpSql =
    "CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))"

  val all: Seq[Q] = Seq(

    // Bucketed-table co-located join: both sides written with bucketBy on
    // the join key -> the sort-merge join needs NO Exchange on either side
    // (BucketedJoinSpec asserts the plan). THE big-big join strategy at
    // 100 TB: shuffle paid once at write time, amortized over every later
    // join. Oracle: result equality with the plain join.
    Q("j_bucketed_colocated", "J",
      (s, d) => {
        val (t1, t2) = RelationalQueries.ensureBucketedTables(s, d)
        s.table(t1).join(s.table(t2), "l_orderkey")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("l_extendedprice"))).as("price_c"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Explicit NULLS FIRST/LAST: engines disagree on the default (Spark
    // sorts nulls first ascending, DuckDB last) — the operator surface must
    // pin it explicitly on both sides.
    Q("o6_nulls_ordering", "O",
      (s, d) => Tables(s, d, "events")
        .select(col("event_id"),
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(col("value")).as("v"))
        .orderBy(col("v").desc_nulls_last, col("event_id"))
        .limit(100),
      Some("""SELECT event_id, CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
             |FROM events ORDER BY v DESC NULLS LAST, event_id LIMIT 100""".stripMargin)),

    // Value-based RANGE window frame (not ROWS): peers within 5 price units
    // — the frame kind rows-frames cannot express. Partitioned by
    // o_orderpriority (5 values), so the window form is one task per
    // priority; a count-over-RANGE-frame is exactly a banded range-count
    // (distinct-value compression + 2-bucket equi-join probes, ≤ W+1
    // matches per probe), which keeps every stage on corpus-cardinality
    // keys — see operators/BandedRange.scala.
    Q("w7_range_frame", "W",
      (s, d) => graft.operators.BandedRange.peersWithin(
          Tables(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderpriority"),
              cents(col("o_totalprice")).as("price_c")),
          Seq("o_orderpriority"), "price_c", w = 500L, "peers_within_5")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderpriority,
             |       CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             |       count(*) OVER (PARTITION BY o_orderpriority
             |                      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
             |                      RANGE BETWEEN 500 PRECEDING AND CURRENT ROW) AS peers_within_5
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Time-based RANGE frame: per-user rolling count/sum over the trailing
    // hour of EVENT TIME (seconds since epoch as the frame axis) — the
    // feature-engineering staple w7's value-range frame cannot express.
    // Peers at the same second are frame-equal in both engines, so the
    // result is deterministic regardless of tie order. Sums ride integer
    // micro-units; the frame key is floor-seconds on both sides.
    Q("w8_time_rolling", "W",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_timestamp(col("ts")))
          .rangeBetween(-3600L, 0L)
        Tables(s, d, "events")
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_1h"),
            sum(round(col("value") * 1000000).cast("long")).over(w)
              .as("val_micro_1h"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, count(*) OVER w AS n_1h,
             |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) OVER w AS BIGINT) AS val_micro_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id
             |             ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
             |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // GROUP BY ALL through the SQL front end (the non-aggregated
    // projection defines the keys; same text on both engines — pure
    // parser/analyzer parity, plans as an ordinary hash aggregate).
    Q("agg_group_by_all", "A",
      (s, d) => {
        Tables(s, d, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
                |FROM orders GROUP BY ALL
                |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
             |FROM orders GROUP BY ALL
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // Remaining ranking-function surface in one query: cume_dist (exact
    // rational, rounded at 1e-6 like the percent_rank query), ntile
    // quartiles, and nth_value over an explicit full-partition frame (the
    // default frames differ between engines — pinning the frame IS the
    // semantic being tested). Unique (value, id) ordering keeps every
    // function deterministic.
    Q("w10_dist_functions", "W",
      (s, d) => {
        // event_type has ~5 values over the full corpus — the same
        // one-task-per-key cliff as w3/w4/w6. The total order is
        // (v_c, event_id), so every distribution function is rank
        // algebra on the row number, and the row number decomposes as
        // cum-count-of-smaller-values (distinct-value compression: a
        // dimension-sized window over the (type, v_c) aggregate) plus
        // the within-(type, v_c) position (a window on a
        // corpus-cardinality key — balanced at any scale):
        //   cume_dist = rn/n (peers are single rows under a total
        //   order), emitted in integer micro units (the w6 sf10
        //   lesson: round(double, 6) splits engines on dense grids);
        //   ntile    = remainder-bucket rank algebra;
        //   nth_value(3) over the full frame = the value at rank 3 —
        //   smallest v_c whose cumulative count reaches 3, null when
        //   the group has fewer rows.
        val ev = Tables(s, d, "events")
          .select(col("event_type"), col("event_id"), cents(col("value")).as("v_c"))
        val vals = ev.groupBy(col("event_type"), col("v_c"))
          .agg(count(lit(1)).as("__c"))
        val cum = vals.withColumn("__cum_before",
          coalesce(sum(col("__c")).over(
            Window.partitionBy("event_type").orderBy("v_c")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val within = ev.withColumn("__pos", row_number().over(
          Window.partitionBy(col("event_type"), col("v_c"))
            .orderBy(col("event_id"))).cast("long"))
        val counts = ev.groupBy(col("event_type")).agg(count(lit(1)).as("__n"))
        val third = cum.filter(col("__cum_before") + col("__c") >= 3)
          .groupBy(col("event_type")).agg(min(col("v_c")).as("third_lowest"))
        // NULL-SAFE spine join: a null v_c is an ordinary window-order
        // class (groupBy keyed it; an equi-join would drop those rows
        // while the oracle's window ranks them)
        val spine = cum.select(col("event_type").as("__et"),
          col("v_c").as("__vc"), col("__cum_before"))
        within.join(spine,
            col("event_type") <=> col("__et") && col("v_c") <=> col("__vc"))
          .drop("__et", "__vc")
          .withColumn("__rn", col("__cum_before") + col("__pos"))
          .join(broadcast(counts), Seq("event_type"))
          .join(broadcast(third), Seq("event_type"), "left")
          .select(col("event_type"), col("event_id"), col("v_c"),
            expr("__rn * 1000000 div __n").as("cd_micro"),
            expr("""CASE WHEN __rn <= (__n % 4) * (__n div 4 + 1)
                   |     THEN (__rn - 1) div (__n div 4 + 1) + 1
                   |     ELSE (__n % 4) + (__rn - (__n % 4) * (__n div 4 + 1) - 1)
                   |          div (__n div 4) + 1 END""".stripMargin)
              .cast("int").as("quartile"),
            col("third_lowest"))
          .orderBy("event_type", "v_c", "event_id")
      },
      Some("""WITH e AS (SELECT event_type, event_id,
             |            CAST(round(value * 100) AS BIGINT) AS v_c FROM events),
             |r AS (SELECT event_type, event_id, v_c,
             |        CAST(row_number() OVER w AS BIGINT) AS rn,
             |        CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             |        CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             |        nth_value(v_c, 3) OVER
             |          (PARTITION BY event_type ORDER BY v_c, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |          AS third_lowest
             |      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY v_c, event_id))
             |SELECT event_type, event_id, v_c,
             |  CAST(rn * 1000000 // n AS BIGINT) AS cd_micro,
             |  quartile, third_lowest
             |FROM r ORDER BY event_type, v_c, event_id""".stripMargin)),

    // Skyline / Pareto frontier (Börzsönyi 2001): cheapest line items with
    // the deepest discounts — minimize price, maximize discount (negated).
    // Broadcast knee-point prune kills the dominated quadrant in one
    // codegen'd filter; the unpartitioned sweep window only ever sees the
    // thin frontier band.
    Q("skyline_price_discount", "Q",
      (s, d) => {
        val pts = Tables(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("price_c"),
          (-cents(col("l_discount"))).as("neg_disc_c"))
        graft.operators.Skyline.skyline2D(pts, "price_c", "neg_disc_c")
          .select(col("l_orderkey"), col("l_linenumber"), col("price_c"),
            (-col("neg_disc_c")).as("disc_c"))
          .orderBy("price_c", "l_orderkey", "l_linenumber")
      },
      Some("""WITH pts AS (SELECT l_orderkey, l_linenumber,
             |         CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
             |         -CAST(round(l_discount * 100) AS BIGINT) AS y
             |       FROM lineitem),
             |p0 AS (SELECT x AS px, y AS py FROM pts ORDER BY x + y, x LIMIT 1),
             |pr AS (SELECT pts.* FROM pts, p0
             |       WHERE NOT (x >= px AND y >= py AND (x > px OR y > py))),
             |wv AS (SELECT *,
             |         min(y) OVER (ORDER BY x RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp,
             |         min(y) OVER (PARTITION BY x) AS ms
             |       FROM pr)
             |SELECT l_orderkey, l_linenumber, x AS price_c, -y AS disc_c
             |FROM wv WHERE (mp IS NULL OR y < mp) AND y = ms
             |ORDER BY price_c, l_orderkey, l_linenumber""".stripMargin)),

    // Native session_window TVF (Spark's event-time session semantics, in
    // batch): sessions merge while the next event starts STRICTLY inside
    // the previous event's [ts, ts + gap) extension, and the reported
    // window end is last_ts + gap — both deliberately different from the
    // gaps-and-islands formulation (stream_sessionize breaks only on
    // ts > lag + gap and ends at max(ts)), so the oracle pins Spark's TVF
    // contract, not a re-derivation. Planner-wise session_window is one
    // hash exchange on the key + a per-partition merge — the same scale
    // shape as the window form.
    Q("w9_session_window", "W",
      (s, d) => Tables(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("w_start"),
          col("sw.end").as("w_end"), col("n_events"))
        .orderBy("user_id", "w_start"),
      Some("""WITH dd AS (SELECT user_id, ts, event_id,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |                OR ts >= lag(ts) OVER w + INTERVAL 10 MINUTE
             |              THEN 1 ELSE 0 END AS brk
             |       FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |ss AS (SELECT user_id, ts,
             |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |       FROM dd)
             |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS w_start,
             |       CAST(max(ts) + INTERVAL 10 MINUTE AS TIMESTAMP) AS w_end,
             |       count(*) AS n_events
             |FROM ss GROUP BY user_id, sid ORDER BY user_id, w_start""".stripMargin)),

    // UNPIVOT (wide -> long melt): the inverse of pivot, over integer-cent
    // metrics.
    Q("unpivot_metrics", "P",
      (s, d) => Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          cents(col("l_quantity")).as("qty_c"),
          cents(col("l_extendedprice")).as("price_c"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("qty_c"), col("price_c")), "metric", "v")
        .orderBy("l_orderkey", "l_linenumber", "metric"),
      Some("""SELECT l_orderkey, l_linenumber, metric, v FROM (
             |  UNPIVOT (SELECT l_orderkey, l_linenumber,
             |             CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
             |             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
             |           FROM lineitem)
             |  ON qty_c, price_c INTO NAME metric VALUE v)
             |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)),

    // grouping_id over a rollup: distinguishes subtotal levels (the bitmask
    // every BI layer relies on).
    Q("gs_grouping_id", "GS",
      (s, d) => Tables(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority"),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin)),

    // Skew-salted equi-join: result-identical to the plain join, but the
    // (potentially hot) left key is spread over 8 reducers via a
    // deterministic salt, with the right side replicated per salt.
    Q("j_salted_skew", "J",
      (s, d) => {
        val ord = Tables(s, d, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        graft.functions.Skew.saltedEquiJoin(
            Tables(s, d, "lineitem"), ord, Seq("l_orderkey"), salts = 8)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("l_extendedprice"))).as("price_c"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // j_salted_skew's INDUCED-SKEW twin (the exchange-address shape: one
    // hot key owning ~30% of the fact side): l_orderkey is remapped so
    // keys ≡ 0..2 (mod 10) collapse onto the minimum order key, then the
    // SAME salted join + aggregate runs — the salt spreads the hot key
    // over 8 reducers where a plain key shuffle would pin one. The oracle
    // applies the identical remap to a plain join; result equality proves
    // the salting is semantics-free even under heavy skew. (SkewSpec
    // carries the quantitative spread assertion.)
    Q("j_salted_skew_hot", "J",
      (s, d) => {
        val ord = Tables(s, d, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        val hotKey = min(col("o_orderkey")).cast("long")
        val hotLit = Tables(s, d, "orders").agg(hotKey.as("__hot"))
        val li = Tables(s, d, "lineitem")
          .crossJoin(broadcast(hotLit))
          .withColumn("l_orderkey",
            when(pmod(col("l_orderkey"), lit(10L)) < 3, col("__hot"))
              .otherwise(col("l_orderkey")))
          .drop("__hot")
        graft.functions.Skew.saltedEquiJoin(li, ord, Seq("l_orderkey"), salts = 8)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("l_extendedprice"))).as("price_c"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH hot AS (SELECT min(o_orderkey) AS h FROM orders),
             |li AS (SELECT CASE WHEN l_orderkey % 10 < 3 THEN (SELECT h FROM hot)
             |              ELSE l_orderkey END AS k, l_extendedprice
             |       FROM lineitem)
             |SELECT o_orderstatus, count(*) AS n,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_c
             |FROM li JOIN orders ON li.k = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Approximate percentile (KLL/GK-style sketch): estimator is
    // engine-specific, so — like agg_approx_distinct — the query emits the
    // exact interpolated p90 plus a "sketch within 2% of exact" flag, and
    // the oracle asserts both.
    //
    // r15 (guide §2.5/§5): the exact side is distributed rank selection
    // (GlobalRank.exactPercentile), not the `percentile` aggregate — that
    // aggregate collects every group value into one buffer and merges it
    // in a single task (1.4 s max task at sf0.1; O(group) memory at
    // 100 TB). Bit-identical read-out (the helper replicates
    // Percentile.getPercentile's interpolation); the sketch side keeps
    // its bounded-buffer aggregate.
    Q("agg_approx_percentile", "A",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"),
            col("l_orderkey"), col("l_linenumber"))
        val exact = graft.operators.GlobalRank.exactPercentile(li,
          Seq("l_returnflag"), "l_extendedprice",
          Seq(col("l_orderkey"), col("l_linenumber")), 0.9, "exact_p90")
        val approx = li.groupBy(col("l_returnflag"))
          .agg(percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000))
            .as("approx"))
        exact.join(broadcast(approx), Seq("l_returnflag"))
          // integer 1e-4 units: both engines round the SAME double product
          // at scale 0 (round(double, 4) is the w6 divergence class)
          .select(col("l_returnflag"),
            round(col("exact_p90") * 1e4).cast("long").as("exact_p90_e4"),
            (abs(col("approx") - col("exact_p90")) / col("exact_p90") <= 0.02)
              .as("approx_within_tol"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |       CAST(round(quantile_cont(l_extendedprice, 0.9) * 10000) AS BIGINT) AS exact_p90_e4,
             |       TRUE AS approx_within_tol
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Analytic windows over ratios: percent_rank + cume_dist. Partitioned
    // by o_orderpriority (5 values) with a TOTAL order (o_orderkey breaks
    // ties), so rank == row_number and the last peer is the row itself:
    // pr = (rn−1)/(n−1), cd = rn/n — rank arithmetic on the grouped
    // two-phase row number + a 5-row count broadcast, no one-task-per-
    // priority sort at 100 TB. Emitted in integer MICRO units (floor of
    // ratio·10^6): the sf10 gate caught round(double, 6) disagreeing
    // between engines ~1200/15M times (DuckDB rounds via the x·10^6
    // double product, Spark via the exact decimal view of the double;
    // at n≈3M per group the ratio grid hits .5-millionth boundaries) —
    // integer division is bit-deterministic at every scale.
    Q("w6_percent_rank", "W",
      (s, d) => {
        val rn = graft.operators.GlobalRank.groupedRowNumber(
          Tables(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
          Seq("o_orderpriority"),
          Seq(col("o_totalprice"), col("o_orderkey")), "__rn")
        // NULL-SAFE count add-back (quantileNormalize pattern): a null
        // group key is an ordinary window partition; a plain equi-join
        // would drop its ranked rows (latent here — o_orderpriority is
        // non-null in the generated data — but kept consistent)
        val counts = Tables(s, d, "orders").groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("__n"))
          .select(col("o_orderpriority").as("__ct_p"), col("__n"))
        rn.join(broadcast(counts), col("o_orderpriority") <=> col("__ct_p"))
          .drop("__ct_p")
          .select(col("o_orderkey"), col("o_orderpriority"),
            when(col("__n") > 1,
              expr("(__rn - 1) * 1000000 div (__n - 1)")).otherwise(lit(0L))
              .as("pr_micro"),
            expr("__rn * 1000000 div __n").as("cd_micro"))
          .orderBy("o_orderkey")
      },
      Some("""WITH r AS (SELECT o_orderkey, o_orderpriority,
             |  CAST(row_number() OVER (PARTITION BY o_orderpriority
             |    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rn,
             |  CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
             |FROM orders)
             |SELECT o_orderkey, o_orderpriority,
             |       CAST(CASE WHEN n > 1 THEN (rn - 1) * 1000000 // (n - 1)
             |            ELSE 0 END AS BIGINT) AS pr_micro,
             |       CAST(rn * 1000000 // n AS BIGINT) AS cd_micro
             |FROM r ORDER BY o_orderkey""".stripMargin)),

    // TPC-H Q10 shape: returned-item reporting — 4-way join (two broadcast
    // dims), grouped revenue, top-k customers.
    Q("tpch_q10_returns", "TPCH",
      (s, d) => {
        val ord = Tables(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li = Tables(s, d, "lineitem").filter(col("l_returnflag") === "R")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(revenueCp).as("revenue_cp"))
          .orderBy(col("revenue_cp").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name,
              |       CAST(sum($revenueCpSql) AS BIGINT) AS revenue_cp
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE l_returnflag = 'R'
              |  AND o_orderdate >= TIMESTAMP '1997-10-01' AND o_orderdate < TIMESTAMP '1998-01-01'
              |GROUP BY 1, 2, 3 ORDER BY revenue_cp DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q1 shape: pricing summary — wide aggregation over the fact
    // table with a shipdate predicate (pushed to the scan).
    Q("tpch_q1_pricing", "TPCH",
      (s, d) => Tables(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(revenueCp).as("sum_disc_cp"),
          sum(revenueCp * (lit(100L) + cents(col("l_tax")))).as("sum_charge_cpp"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
              |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
              |       CAST(sum($revenueCpSql) AS BIGINT) AS sum_disc_cp,
              |       CAST(sum($revenueCpSql * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) AS sum_charge_cpp,
              |       count(*) AS count_order
              |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-02'
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // TPC-H Q3 shape: shipping priority — 3-way join (broadcast dim),
    // filtered fact, grouped revenue, top-k.
    Q("tpch_q3_shipping", "TPCH",
      (s, d) => {
        val cust = Tables(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables(s, d, "orders")
          .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        val li = Tables(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(revenueCp).as("revenue_cp"))
          .orderBy(col("revenue_cp").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
              |       CAST(sum($revenueCpSql) AS BIGINT) AS revenue_cp
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1998-03-15'
              |  AND l_shipdate > TIMESTAMP '1998-03-15'
              |GROUP BY 1, 2, 3 ORDER BY revenue_cp DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5 shape: local-customer volume — 5-way join through the
    // dimension chain customer -> nation -> region, dims broadcast.
    Q("tpch_q5_volume", "TPCH",
      (s, d) => {
        val dims = broadcast(Tables(s, d, "customer")
          .join(Tables(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
          .join(Tables(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .select(col("c_custkey"), col("n_name")))
        Tables(s, d, "lineitem")
          .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(dims, col("o_custkey") === col("c_custkey"))
          .groupBy(col("n_name"))
          .agg(sum(revenueCp).as("revenue_cp"), count(lit(1)).as("n_items"))
          .orderBy(col("revenue_cp").desc, col("n_name"))
      },
      Some(s"""SELECT n_name, CAST(sum($revenueCpSql) AS BIGINT) AS revenue_cp, count(*) AS n_items
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation ON c_nationkey = n_nationkey
              |  JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |GROUP BY 1 ORDER BY revenue_cp DESC, n_name""".stripMargin)),

    // TPC-H Q4 shape: order-priority checking — EXISTS correlated
    // subquery as a LEFT SEMI join with a cross-table inequality (this
    // schema has no l_commitdate/l_receiptdate, so the late-lineitem
    // predicate is l_shipdate > o_orderdate).
    Q("tpch_q4_priority", "TPCH",
      (s, d) => {
        val ord = Tables(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        ord.join(li, col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q6 shape: forecasting revenue change — single-table scan with
    // a tight multi-predicate filter (all pushed down) and one global sum
    // in exact cent×cent units.
    Q("tpch_q6_forecast", "TPCH",
      (s, d) => Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
          && cents(col("l_discount")).between(5, 7)
          && col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
          .as("revenue_cc")),
      Some("""SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cc
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
             |  AND l_quantity < 24""".stripMargin)),

    // TPC-H Q12 shape: shipping-priority split — fact⋈orders with
    // conditional integer counts (this schema has no l_shipmode; the
    // grouping dimension is l_linestatus).
    Q("tpch_q12_modal", "TPCH",
      (s, d) => Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q14 shape: promotion effect — fact⋈broadcast(part), two
    // conditional integer sums, and ONE final double division (a single
    // rounding, so the percentage is engine-stable).
    Q("tpch_q14_promo", "TPCH",
      (s, d) => Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(broadcast(Tables(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"), revenueCp)
            .otherwise(0L)).as("promo_cp"),
          sum(revenueCp).as("total_cp"))
        .select(col("promo_cp"), col("total_cp"),
          // integer micro-units: both engines round the SAME double product
          // at scale 0 (round(double, 6) is the w6 divergence class)
          round(col("promo_cp") * 100.0 / col("total_cp") * 1e6).cast("long")
            .as("promo_pct_micro")),
      Some(s"""WITH a AS (SELECT
              |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN $revenueCpSql ELSE 0 END) AS BIGINT) AS promo_cp,
              |  CAST(sum($revenueCpSql) AS BIGINT) AS total_cp
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01')
              |SELECT promo_cp, total_cp,
              |       CAST(round(promo_cp * 100.0 / total_cp * 1000000) AS BIGINT) AS promo_pct_micro FROM a""".stripMargin)),

    // TPC-H Q18 shape: large-volume customers — HAVING over a fact
    // aggregate (map-side partials carry the load), then joins up the
    // key chain and a deterministic top-100.
    Q("tpch_q18_large", "TPCH",
      (s, d) => Tables(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"))
        .filter(col("sum_qty_c") > 21200)
        .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty_c"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
      Some("""WITH big AS (SELECT l_orderkey,
             |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
             |       FROM lineitem GROUP BY 1
             |       HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 21200)
             |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty_c
             |FROM big JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // TPC-H Q7 shape: volume shipping between two nations — the fact table
    // joins up BOTH dimension chains (supplier-side and customer-side
    // nation), with the nation filter pushed into each broadcast dim before
    // the join so only matching customers/suppliers reach the fact shuffle.
    Q("tpch_q7_volume", "TPCH",
      (s, d) => {
        val nations = Tables(s, d, "nation")
          .filter(col("n_name").isin("NATION_1", "NATION_2"))
        val supp = Tables(s, d, "supplier")
          .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val cust = Tables(s, d, "customer")
          .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        Tables(s, d, "lineitem")
          .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum(revenueCp).as("revenue_cp"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
              |       CAST(sum($revenueCpSql) AS BIGINT) AS revenue_cp
              |FROM lineitem
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation cn ON c_nationkey = cn.n_nationkey
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation sn ON s_nationkey = sn.n_nationkey
              |WHERE sn.n_name IN ('NATION_1','NATION_2')
              |  AND cn.n_name IN ('NATION_1','NATION_2')
              |  AND sn.n_name <> cn.n_name
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // TPC-H Q8 shape: national market share — one nation's revenue share
    // within a region per year. The share is a ratio of two big integer
    // cent-sums; the single double division happens once per output row on
    // exactly-representable longs, so round(.,6) is engine-stable (a ratio
    // in [0,1] keeps the 6th decimal far above the ulp — contrast Q17).
    Q("tpch_q8_market_share", "TPCH",
      (s, d) => {
        val custRegion = Tables(s, d, "customer")
          .join(broadcast(Tables(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables(s, d, "region"))
              .filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"))
        val suppNation = Tables(s, d, "supplier")
          .join(broadcast(Tables(s, d, "nation")
              .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
          .select(col("s_suppkey"), col("supp_nation"))
        Tables(s, d, "lineitem")
          .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(custRegion, col("o_custkey") === col("c_custkey"), "left_semi")
          .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_5", revenueCp).otherwise(0L))
              .as("nation_cp"),
            sum(revenueCp).as("total_cp"))
          .select(col("o_year"), col("nation_cp"), col("total_cp"),
            round(col("nation_cp") / col("total_cp") * 1e6).cast("long")
              .as("mkt_share_micro"))
          .orderBy("o_year")
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
              |       CAST(sum(CASE WHEN sn.n_name = 'NATION_5' THEN $revenueCpSql ELSE 0 END) AS BIGINT) AS nation_cp,
              |       CAST(sum($revenueCpSql) AS BIGINT) AS total_cp,
              |       CAST(round(CAST(sum(CASE WHEN sn.n_name = 'NATION_5' THEN $revenueCpSql ELSE 0 END) AS BIGINT)
              |             / CAST(sum($revenueCpSql) AS BIGINT) * 1000000) AS BIGINT) AS mkt_share_micro
              |FROM lineitem
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation sn ON s_nationkey = sn.n_nationkey
              |WHERE EXISTS (SELECT 1 FROM customer
              |                JOIN nation cn ON c_nationkey = cn.n_nationkey
              |                JOIN region ON cn.n_regionkey = r_regionkey
              |              WHERE c_custkey = o_custkey AND r_name = 'ASIA')
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q16 shape: supplier-part relationship cardinality — this
    // schema has no partsupp, so the observed (part, supplier) pairs in
    // lineitem stand in; the aggregate is the same distinct-count over a
    // filtered join, ordered by descending cardinality.
    Q("tpch_q16_partsupp", "TPCH",
      (s, d) => Tables(s, d, "lineitem")
        .join(broadcast(Tables(s, d, "part")
            .filter(col("p_brand") =!= "Brand#5"
              && col("p_size").isin(1, 9, 17, 25, 33, 41, 49))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
        .limit(100),
      Some("""SELECT p_brand, p_type, p_size,
             |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#5' AND p_size IN (1, 9, 17, 25, 33, 41, 49)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100""".stripMargin)),

    // TPC-H Q9 shape: product-type profit by nation and year — profit =
    // revenue − cost, with the part's retail price standing in for the
    // missing partsupp supplycost (same multi-join + signed aggregate
    // shape). All integer cent/cent-percent math; cost scaled ×100 to
    // revenue's cent-percent units so the subtraction stays exact.
    Q("tpch_q9_profit", "TPCH",
      (s, d) => {
        val suppNation = Tables(s, d, "supplier")
          .join(broadcast(Tables(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
        val costC = cents(col("p_retailprice")) * lit(100L)
        Tables(s, d, "lineitem")
          .join(broadcast(Tables(s, d, "part")
              .filter(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(revenueCp - costC * col("l_quantity").cast("long"))
            .as("profit_cp"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
              |       CAST(sum($revenueCpSql
              |                - CAST(round(p_retailprice * 100) AS BIGINT) * 100
              |                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS profit_cp
              |FROM lineitem
              |  JOIN part ON l_partkey = p_partkey
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation ON s_nationkey = n_nationkey
              |WHERE p_type = 'PROMO'
              |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)),

    // TPC-H Q11 shape: important stock identification — per-group value
    // share above a global-threshold fraction. The scalar subquery
    // (0.01% of total) is the 1-row broadcast again; the comparison is an
    // integer cross-product (share_cp * 10000 > total_cp), no double
    // threshold.
    Q("tpch_q11_important", "TPCH",
      (s, d) => {
        val perSupp = Tables(s, d, "lineitem")
          .join(broadcast(Tables(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"))
          .agg(sum(cents(col("l_extendedprice"))).as("value_c"))
        perSupp
          .crossJoin(broadcast(perSupp.agg(sum(col("value_c")).as("total_c"))))
          .filter(col("value_c") * 10000L > col("total_c") * 200L)
          .select(col("s_nationkey"), col("value_c"))
          .orderBy(col("value_c").desc, col("s_nationkey"))
      },
      Some("""WITH v AS (SELECT s_nationkey,
             |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_c
             |       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |       GROUP BY 1)
             |SELECT s_nationkey, value_c FROM v
             |WHERE value_c * 10000 > (SELECT CAST(sum(value_c) AS BIGINT) FROM v) * 200
             |ORDER BY value_c DESC, s_nationkey""".stripMargin)),

    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER join
    // with an extra join-side predicate (priority filter belongs in the ON
    // clause, not WHERE, or childless customers vanish), then a second
    // aggregation over the first's output.
    Q("tpch_q13_custdist", "TPCH",
      (s, d) => Tables(s, d, "customer")
        .join(Tables(s, d, "orders"),
          col("c_custkey") === col("o_custkey")
            && col("o_orderpriority") =!= lit("1-URGENT"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY 1)
             |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q15 shape: top supplier by quarterly revenue — the scalar-max
    // subquery becomes a 1-row broadcast joined back on equality, so the
    // revenue aggregate is computed once and reused (no driver collect).
    Q("tpch_q15_top_supplier", "TPCH",
      (s, d) => {
        val rev = Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(revenueCp).as("total_cp"))
        rev.join(broadcast(rev.agg(max(col("total_cp")).as("max_cp"))),
            col("total_cp") === col("max_cp"))
          .join(Tables(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_cp"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey, CAST(sum($revenueCpSql) AS BIGINT) AS total_cp
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
              |  GROUP BY 1)
              |SELECT s_suppkey, s_name, total_cp
              |FROM rev JOIN supplier ON l_suppkey = s_suppkey
              |WHERE total_cp = (SELECT max(total_cp) FROM rev)
              |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q17 shape: small-quantity-order revenue — the correlated
    // per-part average becomes a per-part (count, sum) aggregate joined
    // back, and the `qty < 0.2 * avg` test is the integer cross-product
    // `5 * qty_c * cnt < sum_qty_c` (exact; no double rounding crosses
    // engines). The yearly average is integer milli-cents (`div 7`), NOT a
    // rounded double: at this sum's magnitude the 6th decimal sits below
    // the double's ulp, where engines legitimately disagree.
    Q("tpch_q17_small_qty", "TPCH",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val perPart = li.groupBy(col("l_partkey").as("ap_partkey"))
          .agg(count(lit(1)).as("qty_n"), sum(cents(col("l_quantity"))).as("qty_sum_c"))
        li.join(broadcast(Tables(s, d, "part")
              .filter(col("p_brand") === "Brand#3")),
            col("l_partkey") === col("p_partkey"))
          .join(perPart, col("l_partkey") === col("ap_partkey"))
          .filter(cents(col("l_quantity")) * 5 * col("qty_n") < col("qty_sum_c"))
          .agg(sum(cents(col("l_extendedprice"))).as("price_sum_c"))
          .select(col("price_sum_c"),
            expr("price_sum_c * 1000 div 7").as("avg_yearly_mc"))
      },
      Some("""WITH ap AS (
             |  SELECT l_partkey AS ap_partkey, count(*) AS qty_n,
             |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_sum_c
             |  FROM lineitem GROUP BY 1),
             |hit AS (
             |  SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_sum_c
             |  FROM lineitem
             |    JOIN part ON l_partkey = p_partkey
             |    JOIN ap ON l_partkey = ap_partkey
             |  WHERE p_brand = 'Brand#3'
             |    AND CAST(round(l_quantity * 100) AS BIGINT) * 5 * qty_n < qty_sum_c)
             |SELECT price_sum_c, (price_sum_c * 1000) // 7 AS avg_yearly_mc FROM hit""".stripMargin)),

    // TPC-H Q19 shape: discounted revenue over an OR-of-ANDs predicate —
    // the disjunction mixes part attributes and lineitem attributes, so it
    // can only be evaluated after the join; the shared p_partkey equi-key
    // still broadcasts.
    Q("tpch_q19_disjunct", "TPCH",
      (s, d) => Tables(s, d, "lineitem")
        .join(broadcast(Tables(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
            && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#7" && col("p_size").between(1, 25)
            && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 35)
            && col("l_quantity").between(20, 30)))
        .agg(sum(revenueCp).as("revenue_cp"),
          count(lit(1)).as("n_lines")),
      Some(s"""SELECT CAST(sum($revenueCpSql) AS BIGINT) AS revenue_cp,
              |       count(*) AS n_lines
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
              |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
              |   OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // TPC-H Q21 shape: suppliers who kept orders waiting. The textbook
    // plan turns the EXISTS (another supplier in the same order) and
    // NOT EXISTS (another supplier ALSO late) into a left-semi and a
    // left-anti self-join of the fact — two fact-sized shuffles whose
    // bytes the r9 sf1 gate measured ballooning 132× on the tiled
    // fixture (the probe sides crossed the broadcast threshold and
    // flipped to full shuffle joins). The decorrelation-to-aggregate
    // rewrite used here is strictly better at scale: per-order DISTINCT
    // supplier counts replace both quantifiers (EXISTS other supplier ⟺
    // n_supp ≥ 2; NOT EXISTS other LATE supplier ⟺ n_late_supp = 1,
    // since the probe row itself is late), so the fact is shuffled once
    // as map-side-deduped (orderkey, suppkey) pairs and every
    // subsequent join keys on l_orderkey — order-sized, AQE-coalesced —
    // instead of re-shuffling lineitem twice. The late-line multiplicity
    // the original counts per supplier survives as sum(n_lines).
    // This schema has no receipt/commit dates; "late" is
    // l_shipdate > o_orderdate + 60 days.
    Q("tpch_q21_waiting", "TPCH",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        // distinct suppliers per order over ALL lineitem: two-phase
        // (partial distinct map-side), one orderkey-keyed exchange
        val nSupp = li.groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"))
        val late = li
          .join(Tables(s, d, "orders")
              .filter(col("o_orderstatus") === "F")
              .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"))
        // one row per late (order, supplier) with its line multiplicity;
        // the orderkey window then counts DISTINCT late suppliers per
        // order without ever re-joining the fact
        val latePairs = late.groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(count(lit(1)).as("n_lines"))
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey"))
        latePairs
          .withColumn("n_late_supp", count(lit(1)).over(wOrd))
          .filter(col("n_late_supp") === 1)
          .join(nSupp.filter(col("n_supp") >= 2).select(col("l_orderkey")),
            "l_orderkey")
          .join(broadcast(Tables(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(sum(col("n_lines")).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""WITH late AS (
             |  SELECT l_orderkey, l_suppkey
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |SELECT s_name, count(*) AS numwait
             |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM late l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
             |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)),

    // TPC-H Q22 shape: global sales opportunity — customers above the
    // average positive balance (integer cross-product `bal_c * n > sum_c`,
    // no double avg) with no pending orders (left-anti). The 1-row global aggregate
    // rides a broadcast cross join, not a driver collect. Country code is
    // c_nationkey (this schema has no phone column).
    Q("tpch_q22_opportunity", "TPCH",
      (s, d) => {
        val cust = Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            cents(col("c_acctbal")).as("bal_c"))
        val posAvg = cust.filter(col("bal_c") > 0)
          .agg(count(lit(1)).as("pos_n"), sum(col("bal_c")).as("pos_sum_c"))
        cust.crossJoin(broadcast(posAvg))
          .filter(col("bal_c") * col("pos_n") > col("pos_sum_c"))
          .join(Tables(s, d, "orders")
              .filter(col("o_orderstatus") === "P").select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totacctbal_c"))
          .orderBy("c_nationkey")
      },
      Some("""WITH bal AS (
             |  SELECT c_custkey, c_nationkey,
             |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
             |  FROM customer),
             |pos AS (SELECT count(*) AS pos_n,
             |               CAST(sum(bal_c) AS BIGINT) AS pos_sum_c
             |        FROM bal WHERE bal_c > 0)
             |SELECT c_nationkey, count(*) AS numcust,
             |       CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
             |FROM bal, pos
             |WHERE bal_c * pos_n > pos_sum_c
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q2 shape: minimum-cost supplier per part. This schema has no
    // partsupp, so the observed (part, supplier) pairs in lineitem stand in
    // and s_acctbal (integer cents) stands in for ps_supplycost. The
    // correlated `= (SELECT min(...))` subquery becomes a partition-local
    // window min — one shuffle on l_partkey, no self-join — and the region
    // dimension chain is a broadcast. Ties at the minimum all survive, as
    // in the spec query.
    Q("tpch_q2_min_cost", "TPCH",
      (s, d) => {
        val regionSupp = Tables(s, d, "supplier")
          .join(broadcast(Tables(s, d, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables(s, d, "region")
              .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"),
            cents(col("s_acctbal")).as("acctbal_c"))
        // Broadcast part filter BEFORE the distinct: the pair-dedup shuffle
        // then carries only the filtered parts' lineitems, not the full fact.
        val pairs = Tables(s, d, "lineitem")
          .join(broadcast(Tables(s, d, "part")
              .filter(col("p_size") <= 10 && col("p_type") === "PROMO")
              .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"), "inner")
          .select(col("p_partkey"), col("p_brand"), col("l_suppkey"))
          .distinct()
        val w = Window.partitionBy(col("p_partkey"))
        pairs
          .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
          .withColumn("min_c", min(col("acctbal_c")).over(w))
          .filter(col("acctbal_c") === col("min_c"))
          .select(col("acctbal_c"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_brand"))
          .orderBy(col("acctbal_c").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
             |SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_c,
             |       s_name, n_name, p_partkey, p_brand
             |FROM part, supplier, nation, region, ps
             |WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
             |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'EUROPE' AND p_size <= 10 AND p_type = 'PROMO'
             |  AND CAST(round(s_acctbal * 100) AS BIGINT) = (
             |    SELECT min(CAST(round(s2.s_acctbal * 100) AS BIGINT))
             |    FROM supplier s2
             |      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
             |      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
             |      JOIN ps ps2 ON s2.s_suppkey = ps2.l_suppkey
             |    WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
             |ORDER BY acctbal_c DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin)),

    // TPC-H Q20 shape: suppliers shipping an outsized share of a part's
    // volume. The spec's doubly-nested IN (parts by brand -> pairs above a
    // correlated half-of-availqty threshold) becomes: brand filter as a
    // broadcast semi-join, per-(part, supplier) year volume as one hash
    // aggregate, and the correlated per-part total as a window sum over the
    // SAME shuffle key (no second aggregate-join). A supplier qualifies
    // when it shipped >20% of the part's annual volume; the final
    // supplier⋈nation probe is a left-semi on the qualifying set.
    Q("tpch_q20_excess", "TPCH",
      (s, d) => {
        val shipped = Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .join(broadcast(Tables(s, d, "part")
              .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(cents(col("l_quantity"))).as("qty_c"))
        val w = Window.partitionBy(col("l_partkey"))
        val excess = shipped
          .withColumn("total_c", sum(col("qty_c")).over(w))
          .filter(col("qty_c") * 5L > col("total_c"))
          .select(col("l_suppkey")).distinct()
        Tables(s, d, "supplier")
          .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .join(broadcast(Tables(s, d, "nation")
              .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_name"), cents(col("s_acctbal")).as("acctbal_c"))
          .orderBy("s_name")
      },
      Some("""WITH shipped AS (
             |  SELECT l_partkey, l_suppkey,
             |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-01-01'
             |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
             |  GROUP BY 1, 2),
             |sh AS (SELECT l_suppkey, qty_c,
             |              sum(qty_c) OVER (PARTITION BY l_partkey) AS total_c
             |       FROM shipped)
             |SELECT s_name, CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_c
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name = 'NATION_3'
             |  AND s_suppkey IN (SELECT l_suppkey FROM sh WHERE qty_c * 5 > total_c)
             |ORDER BY s_name""".stripMargin)),

    // Running total per customer (analytic window, unbounded preceding).
    Q("w1_running_total", "W",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            sum(cents(col("o_totalprice"))).over(w).as("running_cents"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // lag/lead navigation.
    Q("w2_lag_lead", "W",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables(s, d, "events")
          .select(col("user_id"), col("event_id"),
            lag(col("event_id"), 1).over(w).as("prev_event"),
            lead(col("event_id"), 1).over(w).as("next_event"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, lag(event_id) OVER w AS prev_event, lead(event_id) OVER w AS next_event
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // rank / dense_rank — partitioned by o_orderpriority (5 distinct
    // values), so the window form would plan ONE TASK per priority, each
    // sorting ~N/5 of the corpus at 100 TB. The grouped two-phase ranking
    // (range-shuffle on (group, order), balanced per-slice sorts, peer-set
    // min-rn arithmetic) produces the identical tie-aware ranks with every
    // stage keyed on corpus-cardinality keys. PlanSpec locks the shape.
    Q("w3_rank_dense", "W",
      (s, d) => graft.operators.GlobalRank.groupedRankDense(
          Tables(s, d, "orders")
            .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
          groupCols = Seq("o_orderpriority"),
          peerCols = Seq("o_totalprice"),
          orderCols = Seq(col("o_totalprice").desc, col("o_orderkey")),
          rankCol = "rnk", denseRankCol = "drnk")
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("rnk"), col("drnk"))
        .orderBy("o_orderpriority", "rnk", "o_orderkey"),
      Some("""SELECT o_orderpriority, o_orderkey, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
             |FROM orders WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
             |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin)),

    // ntile + moving (frame-bounded) window sum. The quartile partitions
    // by o_orderpriority (5 values — the one-task-per-key cliff); ntile is
    // PURE RANK ALGEBRA (ties don't matter, remainder rows go to the first
    // buckets), so it derives from the grouped two-phase row number + a
    // 5-row group-count broadcast. The per-customer moving sum keeps its
    // window — o_custkey is corpus-cardinality, already balanced.
    Q("w4_ntile_moving", "W",
      (s, d) => {
        val wm = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-2, Window.currentRow)
        val moving = Tables(s, d, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"),
            col("o_totalprice"),
            sum(cents(col("o_totalprice"))).over(wm).as("moving_cents"))
        val rn = graft.operators.GlobalRank.groupedRowNumber(moving,
          Seq("o_orderpriority"),
          Seq(col("o_totalprice").desc, col("o_orderkey")), "__rn")
        // NULL-SAFE count add-back (quantileNormalize pattern) — see w6
        val counts = Tables(s, d, "orders").groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("__n"))
          .select(col("o_orderpriority").as("__ct_p"), col("__n"))
        // SQL ntile(k): base = n div k rows per bucket, the n mod k
        // remainder buckets (the FIRST ones) take one extra row
        rn.join(broadcast(counts), col("o_orderpriority") <=> col("__ct_p"))
          .drop("__ct_p")
          .withColumn("quartile",
            expr("""CASE WHEN __rn <= (__n % 4) * (__n div 4 + 1)
                   |     THEN (__rn - 1) div (__n div 4 + 1) + 1
                   |     ELSE (__n % 4) + (__rn - (__n % 4) * (__n div 4 + 1) - 1)
                   |          div (__n div 4) + 1 END""".stripMargin)
              .cast("long"))
          .select(col("o_orderpriority"), col("o_orderkey"),
            col("quartile"), col("moving_cents"))
          .orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey,
             |       ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
             |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_cents
             |FROM orders ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // ROLLUP grouping sets.
    Q("gs_rollup", "GS",
      (s, d) => Tables(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(cents(col("l_quantity"))).as("qty_cents"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // CUBE grouping sets.
    Q("gs_cube", "GS",
      (s, d) => Tables(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("min_key"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n, min(o_orderkey) AS min_key
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Exact distinct aggregation.
    Q("agg_distinct_count", "A",
      (s, d) => Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("distinct_parts"), count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts, count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bitmap-bucket exact distinct (the ClickHouse/Druid technique for
    // dense integer keys): ids land in 64-wide buckets, each bucket
    // OR-accumulates one long of presence bits — two map-side-combined
    // hash aggregates, popcount at the end. Exact like countDistinct but
    // with fixed 8-byte partial state per bucket instead of a sort/hash
    // of the raw values; the oracle is the SEMANTIC check (true
    // COUNT(DISTINCT)), proving bitmap == exact.
    Q("agg_bitmap_distinct", "A",
      (s, d) => Tables(s, d, "events")
        .select(col("event_type"), expr("user_id div 64").as("__bkt"),
          expr("shiftleft(1L, cast(user_id % 64 as int))").as("__bit"))
        .groupBy(col("event_type"), col("__bkt"))
        .agg(expr("bit_or(__bit)").as("__bm"))
        .groupBy(col("event_type"))
        .agg(sum(bit_count(col("__bm")).cast("long")).as("n_distinct"),
          count(lit(1)).as("n_buckets"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
             |  CAST(count(DISTINCT user_id // 64) AS BIGINT) AS n_buckets
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bitmap set algebra on the same buckets: exact "users who did BOTH"
    // via per-bucket bit_and of the two presence bitmaps — set
    // intersection without a distinct-distinct join; popcount reads the
    // answer. Semantic oracle again (INTERSECT count).
    Q("agg_bitmap_intersect", "A",
      (s, d) => {
        val ev = Tables(s, d, "events")
        def bm(t: String) = ev.filter(col("event_type") === t)
          .select(expr("user_id div 64").as("bkt"),
            expr("shiftleft(1L, cast(user_id % 64 as int))").as("__bit"))
          .groupBy(col("bkt")).agg(expr("bit_or(__bit)").as(s"bm_$t"))
        bm("click").join(bm("purchase"), Seq("bkt"))
          .select(bit_count(expr("bm_click & bm_purchase")).cast("long")
            .as("__both"))
          .agg(sum(col("__both")).as("n_both"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_both FROM (
             |  SELECT user_id FROM events WHERE event_type = 'click'
             |  INTERSECT
             |  SELECT user_id FROM events WHERE event_type = 'purchase')""".stripMargin)),

    // HLL-sketch distinct (approx_count_distinct): algorithm-specific
    // estimates differ per engine -> rows-only check, no SQL oracle.
    // HLL sketch: the estimator is engine-specific, so the oracle can't match
    // the estimate itself — instead the query emits the exact count plus a
    // "within HLL tolerance" flag (rsd=0.05 → 3 sigma = 15%), and the oracle
    // asserts the exact counts and that the flag is TRUE. Estimator quality
    // is thereby gate-checked, not just row-counted.
    Q("agg_approx_distinct", "A",
      (s, d) => Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.05).as("approx"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx") - col("exact_parts")).cast("double")
            / col("exact_parts").cast("double") <= 0.15).as("approx_within_tol"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             |       TRUE AS approx_within_tol
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Left-semi join (EXISTS).
    // Bloom-prefiltered join (explicit runtime row-level filtering): a
    // ~2%-selective order subset builds an 8 KiB Bloom that rides the
    // plan as a literal; the probe is k codegen'd hashes per lineitem
    // row AT THE SCAN, so ~98% of the fact side never reaches the join
    // exchange. No false negatives, FPs die in the join — the result is
    // EXACTLY the plain join's, which is what the oracle computes.
    Q("j_bloom_prefilter", "J",
      (s, d) => {
        val li = Tables(s, d, "lineitem").select(col("l_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
        val sm = Tables(s, d, "orders")
          .filter(col("o_orderkey") % 50 === 0)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        graft.operators.BloomJoin.bloomFilteredJoin(li, sm, "l_orderkey")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("revenue_cents"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |    AS revenue_cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderkey % 50 = 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Full-outer join with engineered unmatched rows on BOTH sides
    // (even-key customers vs the order book of %3 customers): the one
    // outer-join shape the battery lacked. Null-side handling is the
    // point — keys coalesce, the aggregate treats absent sides as 0.
    Q("j_full_outer", "J",
      (s, d) => {
        val c = Tables(s, d, "customer")
          .filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey"), col("c_mktsegment"))
        val o = Tables(s, d, "orders")
          .filter(col("o_custkey") % 3 === 0)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_mktsegment"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy("custkey")
      },
      Some("""WITH c AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 2 = 0),
             |o AS (SELECT o_custkey, count(*) AS n_orders FROM orders
             |      WHERE o_custkey % 3 = 0 GROUP BY 1)
             |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_mktsegment,
             |  CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders
             |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
             |ORDER BY custkey""".stripMargin)),

    Q("j_semi", "J",
      (s, d) => Tables(s, d, "customer")
        .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders) ORDER BY c_custkey""".stripMargin)),

    // Left-anti join (NOT EXISTS). The right side is restricted to a key
    // subset (custkey % 3 = 0) so the probe returns the customers that
    // subset MISSES — a non-empty result whose VALUES the oracle hash
    // checks, not just emptiness (r12 verdict: a 0-row green proves only
    // that both engines dropped everything).
    Q("j_anti", "J",
      (s, d) => Tables(s, d, "customer")
        .join(Tables(s, d, "orders").filter(col("o_custkey") % 3 === 0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey % 3 = 0 AND o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // Empty twin: anti-join against ALL orders. The generator gives every
    // customer at least one order, so an empty result IS the contract here
    // — referential completeness of the customer→orders relationship (the
    // same NOT EXISTS shape eth_audit_referential uses on the chain
    // tables). Asserted as emptiness on purpose; the value-bearing probe
    // above is j_anti.
    Q("j_anti_empty", "J",
      (s, d) => Tables(s, d, "customer")
        .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""".stripMargin)),

    // Band (range/theta) join: small side broadcast -> nested-loop with a
    // range predicate. At 100 TB this becomes a bucketed interval join; the
    // operator surface is the same.
    // Band join via graft.operators.BandJoin — bucketed candidate
    // generation + exact predicate, never the |S|·|C| nested-loop plan a
    // raw non-equi condition forces (the sf1 scale gate measured the BNLJ
    // form superlinear: 10x rows on a fixed value range = 100x
    // comparisons; the bucketed form tracks per-band density instead).
    Q("j_range_band", "J",
      (s, d) => graft.operators.BandJoin.join(
          Tables(s, d, "customer"), Tables(s, d, "supplier"),
          col("c_acctbal"), col("s_acctbal"), width = 100.0)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_near"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, count(*) AS n_near
             |FROM supplier JOIN customer ON c_acctbal BETWEEN s_acctbal - 100 AND s_acctbal + 100
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Big-big join strategies: when neither side fits a broadcast (full
    // historical backfills), the same equi-join runs as sort-merge or
    // shuffled-hash — forced here via hints so both plans are exercised and
    // oracle-checked. Both sides shuffle on the join key; with bucketed
    // storage on that key the exchange is avoided entirely (PERF.md).
    Q("j_sortmerge", "J",
      (s, d) => Tables(s, d, "lineitem").hint("merge")
        .join(Tables(s, d, "orders").hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS n,
             |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("j_shuffle_hash", "J",
      (s, d) => Tables(s, d, "lineitem").hint("shuffle_hash")
        .join(Tables(s, d, "orders").hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // INTERSECT set op.
    Q("set_intersect", "SET",
      (s, d) => Tables(s, d, "orders").select(col("o_custkey").cast("bigint").as("k"))
        .intersect(Tables(s, d, "customer").select(col("c_custkey").cast("bigint").as("k")))
        .orderBy("k"),
      Some("""SELECT CAST(o_custkey AS BIGINT) AS k FROM orders
             |INTERSECT SELECT CAST(c_custkey AS BIGINT) AS k FROM customer ORDER BY k""".stripMargin)),

    // EXCEPT set op over OVERLAPPING-BUT-UNEQUAL key sets (even custkeys
    // minus multiples of 3): survivors are keys ≡ 2 or 4 (mod 6) — a
    // non-empty, value-hashed result (r12 verdict: the previous full-set
    // form was empty on both engines and proved only emptiness).
    Q("set_except", "SET",
      (s, d) => Tables(s, d, "customer")
        .filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").cast("bigint").as("k"))
        .except(Tables(s, d, "orders")
          .filter(col("o_custkey") % 3 === 0)
          .select(col("o_custkey").cast("bigint").as("k")))
        .orderBy("k"),
      Some("""SELECT CAST(c_custkey AS BIGINT) AS k FROM customer WHERE c_custkey % 2 = 0
             |EXCEPT SELECT CAST(o_custkey AS BIGINT) AS k FROM orders WHERE o_custkey % 3 = 0
             |ORDER BY k""".stripMargin)),

    // Empty twin: customer keys minus ALL order keys. Empty BY CONTRACT —
    // every customer key appears in orders (same completeness invariant as
    // j_anti_empty), so EXCEPT must erase the whole left side.
    Q("set_except_empty", "SET",
      (s, d) => Tables(s, d, "customer").select(col("c_custkey").cast("bigint").as("k"))
        .except(Tables(s, d, "orders").select(col("o_custkey").cast("bigint").as("k")))
        .orderBy("k"),
      Some("""SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
             |EXCEPT SELECT CAST(o_custkey AS BIGINT) AS k FROM orders ORDER BY k""".stripMargin)),

    // UNION (distinct) set op.
    Q("set_union", "SET",
      (s, d) => Tables(s, d, "orders").select(col("o_custkey").cast("bigint").as("k"))
        .union(Tables(s, d, "customer").select(col("c_custkey").cast("bigint").as("k")))
        .distinct()
        .orderBy("k"),
      Some("""SELECT CAST(o_custkey AS BIGINT) AS k FROM orders
             |UNION SELECT CAST(c_custkey AS BIGINT) AS k FROM customer ORDER BY k""".stripMargin)),

    // first_value / last_value over a full frame.
    Q("w5_first_last", "W",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            first(col("o_orderkey")).over(w).as("first_order"),
            last(col("o_orderkey")).over(w).as("last_order"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       first_value(o_orderkey) OVER w AS first_order,
             |       last_value(o_orderkey) OVER w AS last_order
             |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Exact median (interpolated percentile) per group on integer cents —
    // r15: rank selection (GlobalRank.exactPercentile), not the
    // collect-all-values `percentile` aggregate; bit-identical read-out.
    Q("agg_median", "A",
      (s, d) => graft.operators.GlobalRank.exactPercentile(
          Tables(s, d, "orders")
            .select(col("o_orderpriority"), col("o_orderkey"),
              cents(col("o_totalprice")).as("cents")),
          Seq("o_orderpriority"), "cents", Seq(col("o_orderkey")),
          0.5, "median_cents")
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |       quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS median_cents
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Statistical moments per group: sample stddev/variance and the
    // bivariate corr/covar pair — identical sample definitions in both
    // engines; micro-unit quantization absorbs merge-order double noise
    // (values are O(1) to O(10^2), so 1e-6 is ~8 orders above the
    // accumulation error) without the round(double, 6) divergence class.
    Q("agg_stats_moments", "A",
      (s, d) => Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_quantity")) * 1e6).cast("long").as("sd_qty_micro"),
          round(var_samp(col("l_quantity")) * 1e6).cast("long").as("var_qty_micro"),
          round(corr(col("l_quantity"), col("l_discount")) * 1e6).cast("long").as("corr_qd_micro"),
          round(covar_samp(col("l_quantity"), col("l_discount")) * 1e6).cast("long").as("cov_qd_micro"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       CAST(round(stddev_samp(l_quantity) * 1000000) AS BIGINT) AS sd_qty_micro,
             |       CAST(round(var_samp(l_quantity) * 1000000) AS BIGINT) AS var_qty_micro,
             |       CAST(round(corr(l_quantity, l_discount) * 1000000) AS BIGINT) AS corr_qd_micro,
             |       CAST(round(covar_samp(l_quantity, l_discount) * 1000000) AS BIGINT) AS cov_qd_micro
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Correlated scalar subquery through the SQL front end.
    Q("subq_correlated", "SUBQ",
      (s, d) => {
        Tables(s, d, "customer").createOrReplaceTempView("customer")
        Tables(s, d, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT c_custkey,
                |       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
                |FROM customer ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey,
             |       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // LATERAL correlated subquery through the SQL front end: per-nation
    // top-2 customers by balance — the "top-k per outer row" shape LATERAL
    // expresses directly (same text runs on both engines). Catalyst plans
    // the correlated limit as a partitioned window under the hood, so the
    // SQL surface costs the same as the window formulation.
    Q("subq_lateral_topk", "SUBQ",
      (s, d) => {
        Tables(s, d, "nation").createOrReplaceTempView("nation")
        Tables(s, d, "customer").createOrReplaceTempView("customer")
        s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
                |FROM nation n,
                |LATERAL (SELECT c_name, c_acctbal FROM customer
                |         WHERE c_nationkey = n.n_nationkey
                |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
                |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
      },
      Some("""SELECT n.n_name, t.c_name, t.c_acctbal
             |FROM nation n,
             |LATERAL (SELECT c_name, c_acctbal FROM customer
             |         WHERE c_nationkey = n.n_nationkey
             |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
             |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)),

    // Scalar subquery through the SQL front end (same text runs on both
    // engines — parser/analyzer parity check).
    Q("subq_scalar", "SUBQ",
      (s, d) => {
        Tables(s, d, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
                |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.9
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.9
             |ORDER BY o_orderkey""".stripMargin)),

    // Pivot (conditional aggregation).
    Q("pivot_status", "PIVOT",
      (s, d) => Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("O", "F"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("O", "o_cnt")
        .withColumnRenamed("F", "f_cnt")
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
             |       CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Custom TypedImperativeAggregate: exact uint256 sum (wei values exceed
    // no built-in type; BigInteger accumulator, map-side partials). The
    // oracle composes the same 96-bit values from two <=60-bit hex parts.
    Q("agg_uint256_sum", "A",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, d, "customer")
          .select(col("c_nationkey"),
            unhex(substring(md5(col("c_name")), 1, 24)).as("wei"))
          .groupBy("c_nationkey")
          .agg(expr("graft_uint256_sum(wei)").as("total_wei"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey,
             |       CAST(sum(CAST(CAST('0x' || substring(md5(c_name), 1, 9) AS BIGINT) AS HUGEINT)
             |                * 1152921504606846976
             |                + CAST('0x' || substring(md5(c_name), 10, 15) AS BIGINT)) AS VARCHAR) AS total_wei
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Z-order (Morton) clustering key: interleaving two range dimensions
    // into one sort key gives a bucketed layout multi-dimensional scan
    // locality without a second data copy — the (x, y) range box then
    // touches O(perimeter) row groups. The code is pure codegen'd bit
    // arithmetic, mirrored bit-for-bit by the oracle.
    Q("zorder_code", "O",
      (s, d) => Tables(s, d, "orders")
        .select(col("o_orderkey"),
          graft.functions.ColumnFns.mortonInterleave(
            col("o_custkey") % 1024, col("o_orderkey") % 1024, bits = 10)
            .as("zcode"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |       CAST(list_sum(list_transform(range(0, 10), i ->
             |          ((CAST(o_custkey % 1024 AS BIGINT) >> i) & 1) * 2**(2*i)
             |        + ((CAST(o_orderkey % 1024 AS BIGINT) >> i) & 1) * 2**(2*i+1))) AS BIGINT) AS zcode
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // uint256 ordering without bigint arithmetic: fixed-length big-endian
    // binary compares as unsigned lexicographic, which IS numeric order —
    // so max(wei) needs no custom aggregate at all (the oracle's numeric
    // max agrees with the hex-string max for fixed-width hex).
    Q("agg_uint256_max", "A",
      (s, d) => Tables(s, d, "customer")
        .select(col("c_nationkey"),
          unhex(substring(md5(col("c_name")), 1, 24)).as("wei"))
        .groupBy("c_nationkey")
        .agg(graft.functions.ColumnFns.binaryToHex(max(col("wei"))).as("max_wei_hex"))
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, '0x' || max(substring(md5(c_name), 1, 24)) AS max_wei_hex
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),

    // uint256 BEYOND Decimal(38), proven end-to-end (SURVEY §1.2/§7.4
    // ceiling): 42-digit values flow through the reference's hex-string
    // contract — format ("0x" + 64 hex chars) → bucketed sink → pruned
    // range scan → exact Uint256Sum — and the 46-digit total (> 2^127,
    // wider than HUGEINT) is verified EXACTLY. Neither engine has a
    // numeric for these, so the fixture is built to be string-checkable:
    // each logical value hi·10^30 + lo (hi 12 digits, lo < 10^9) is laid
    // down as its decimal-digit PARTS — digit d at position j becomes d
    // copies of the 32-byte constant 10^(30+j) (BigInteger at plan build:
    // 12 driver-side literals, zero per-row bignum) plus one lo row —
    // so the aggregate's BigInteger path does the real >38-digit
    // accumulation, while the oracle composes the expected decimal string
    // as str(Σhi) || lpad(str(Σlo), 30, '0') (exact: Σlo < 10^30).
    Q("agg_uint256_e2e", "A",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        // fixture memo: the sink write is part of the CONTRACT under test
        // but must run once per host, not once per DataFrame CONSTRUCTION
        // — schema-only consumers (RegistrySpec's lint, PlanSpec) build
        // every registered frame, and an eager write per build would cost
        // a multi-stage job each time and leak a temp dir per call. The
        // content is a pure function of the constants below, so a
        // completed marker makes re-use sound.
        val root = new java.io.File(
          System.getProperty("java.io.tmpdir"), "graft_u256_fixture_v1")
        val path = new java.io.File(root, "wei").toString
        val marker = new java.io.File(root, "_complete")
        if (!marker.exists()) {
          val base = s.range(20000).select(
            col("id").as("block_id"),
            expr("id div 1000").as("block_id_group"),
            (lit(100000000000L) + col("id") * 37L).as("hi"),
            (col("id") * col("id") % 1000000000L).as("lo"))
          def p10hex(k: Int): String = {
            val h = java.math.BigInteger.TEN.pow(k).toString(16)
            ("0" * (64 - h.length)) + h
          }
          val digitArrays = (0 until 12).map { j =>
            array_repeat(lit(p10hex(30 + j)),
              expr(s"CAST((hi div ${"1" + "0" * j}L) % 10 AS INT)"))
          }
          val hiRows = base.select(col("block_id"), col("block_id_group"),
            explode(flatten(array(digitArrays: _*))).as("value_hex"))
          val loRows = base.select(col("block_id"), col("block_id_group"),
            lower(lpad(hex(col("lo")), 64, "0")).as("value_hex"))
          val formatted = hiRows.unionByName(loRows)
            .select(col("block_id"), col("block_id_group"),
              concat(lit("0x"), col("value_hex")).as("value_hex"))
          graft.eth.Sinks.writeBucketedParquet(formatted, path,
            "block_id_group", Seq("block_id"))
          marker.createNewFile()
        }
        graft.eth.Sinks.readBlockRange(s, path, 0, 9999)
          .agg(expr("graft_uint256_sum(unhex(substring(value_hex, 3)))")
              .as("total_wei"),
            count(lit(1)).cast("long").as("n_parts"))
      },
      Some("""WITH src AS (
             |  SELECT i AS id, 100000000000 + i * 37 AS hi,
             |         (i * i) % 1000000000 AS lo
             |  FROM generate_series(0, 19999) t(i) WHERE i <= 9999),
             |s AS (SELECT sum(CAST(hi AS HUGEINT)) AS sh,
             |        sum(CAST(lo AS HUGEINT)) AS sl,
             |        sum(list_sum(list_transform(range(0, 12),
             |          j -> (hi // CAST(10 ** j AS BIGINT)) % 10)))
             |          + count(*) AS np
             |      FROM src)
             |SELECT CAST(sh AS VARCHAR) || lpad(CAST(sl AS VARCHAR), 30, '0') AS total_wei,
             |       CAST(np AS BIGINT) AS n_parts
             |FROM s""".stripMargin)),

    // Salted two-phase aggregation (skew mitigation): result identical to a
    // plain groupBy sum — the oracle is the plain form.
    Q("agg_salted_sum", "A",
      (s, d) => graft.functions.Skew.saltedSum(
        Tables(s, d, "lineitem")
          .select(col("l_returnflag"), round(col("l_quantity") * 100).cast("long").as("cents")),
        Seq("l_returnflag"), "cents", salts = 16)
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Scalar-function families (§2.9 "math functions beyond floor-div"):
    // math, string, and date functions, each checked value-for-value.
    Q("fn_math", "FN",
      (s, d) => Tables(s, d, "part")
        .select(col("p_partkey"),
          abs(col("p_size") - 25).as("abs_d"),
          pmod(col("p_partkey"), lit(7)).as("mod7"),
          floor(sqrt(col("p_partkey").cast("double"))).cast("bigint").as("isqrt"),
          pow(lit(2.0), col("p_size") % 10).cast("long").as("pow2"),
          greatest(col("p_size"), lit(10)).as("gmax"),
          least(col("p_size"), lit(40)).as("lmin"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, abs(p_size - 25) AS abs_d,
             |       CAST(p_partkey % 7 AS INTEGER) AS mod7,
             |       CAST(floor(sqrt(CAST(p_partkey AS DOUBLE))) AS BIGINT) AS isqrt,
             |       CAST(2 ** (p_size % 10) AS BIGINT) AS pow2,
             |       greatest(p_size, 10) AS gmax, least(p_size, 40) AS lmin
             |FROM part ORDER BY p_partkey""".stripMargin)),

    Q("fn_string", "FN",
      (s, d) => Tables(s, d, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          length(col("c_name")).as("len"),
          regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
          concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string")).as("tag"),
          trim(lpad(col("c_custkey").cast("string"), 6, "0")).as("padded"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, upper(c_name) AS up, CAST(length(c_name) AS INTEGER) AS len,
             |       regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
             |       c_mktsegment || '-' || CAST(c_custkey AS VARCHAR) AS tag,
             |       trim(lpad(CAST(c_custkey AS VARCHAR), 6, '0')) AS padded
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    Q("fn_date", "FN",
      (s, d) => Tables(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"),
          date_add(to_date(col("o_orderdate")), 90).as("due"),
          last_day(col("o_orderdate")).as("eom"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
             |       CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
             |       CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS dom,
             |       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
             |       CAST(o_orderdate AS DATE) + 90 AS due,
             |       last_day(CAST(o_orderdate AS DATE)) AS eom
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Array-function battery: sort/distinct/contains/position/slice/set ops
    // over arrays — all scalar (per-row), encoded to comparator-safe
    // strings in the final projection.
    // FILTER-clause aggregate surface: per-group conditional aggregates
    // without CASE pyramids — identical SQL text runs on both engines.
    Q("agg_filter_clause", "A",
      (s, d) => {
        Tables(s, d, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""SELECT l_returnflag,
                |  count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
                |  count(*) FILTER (WHERE l_discount = 0) AS n_full_price,
                |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                |       FILTER (WHERE l_tax = 0) AS BIGINT) AS untaxed_cents
                |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
             |  count(*) FILTER (WHERE l_discount = 0) AS n_full_price,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |       FILTER (WHERE l_tax = 0) AS BIGINT) AS untaxed_cents
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Cumulative distinct count per user over time — exact running NDV
    // without quadratic state: a first-occurrence flag (row_number = 1
    // per (user, item)) summed cumulatively. Two windows, both keyed on
    // the high-cardinality user.
    Q("w11_cumulative_distinct", "W",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables(s, d, "events")
          .filter(col("user_id") < 30)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        val wf = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        val wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("first_seen",
            when(row_number().over(wf) === 1, 1L).otherwise(0L))
          .withColumn("n_distinct_types_so_far", sum(col("first_seen")).over(wc))
          .select(col("user_id"), col("event_id"), col("n_distinct_types_so_far"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id, event_type
             |       FROM events WHERE user_id < 30),
             |fs AS (SELECT user_id, t, event_id,
             |         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
             |                                      ORDER BY t, event_id) = 1
             |              THEN 1 ELSE 0 END AS first_seen
             |       FROM ev)
             |SELECT user_id, event_id,
             |  CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |    AS n_distinct_types_so_far
             |FROM fs ORDER BY user_id, event_id""".stripMargin)),

    // LIKE-prefix pushdown evidence: a 'xxx%' predicate reaches the
    // parquet scan as StringStartsWith (PlanSpec asserts it), so row
    // groups whose min/max string range excludes the prefix are skipped
    // at the reader — the string analogue of the numeric range scan.
    // 'sma%' matches the generator's "small ..." names (~270 rows at
    // sf0.01) so the probe hash-checks surviving VALUES; the pushdown
    // lock in PlanSpec is prefix-agnostic.
    Q("q7_like_prefix", "Q",
      (s, d) => Tables(s, d, "part")
        .filter(col("p_name").startsWith("sma"))
        .select(col("p_partkey"), col("p_name"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_name LIKE 'sma%' ORDER BY p_partkey""".stripMargin)),

    // Struct surface: build, field access, nested comparison-based
    // argmax (struct ordering is the engine's tuple ordering), struct →
    // JSON text. Struct min/max is the argmin/argmax workhorse the
    // whole battery leans on — surfaced here explicitly.
    Q("fn_struct", "FN",
      (s, d) => Tables(s, d, "orders")
        .select(col("o_custkey"),
          struct(round(col("o_totalprice") * 100).cast("long").as("price_c"),
            col("o_orderkey").as("ok")).as("st"))
        .groupBy(col("o_custkey"))
        .agg(max(col("st")).as("best"), count(lit(1)).as("n"))
        .select(col("o_custkey"), col("best.price_c").as("best_price_c"),
          col("best.ok").as("best_orderkey"), col("n"),
          concat(lit("{\"p\":"), col("best.price_c").cast("string"),
            lit(",\"k\":"), col("best.ok").cast("string"), lit("}")).as("js"))
        .orderBy("o_custkey"),
      Some("""WITH st AS (SELECT o_custkey,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS p, o_orderkey AS k,
             |         row_number() OVER (PARTITION BY o_custkey
             |           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
             |                    o_orderkey DESC) AS rn,
             |         count(*) OVER (PARTITION BY o_custkey) AS n
             |       FROM orders)
             |SELECT o_custkey, p AS best_price_c, k AS best_orderkey,
             |  CAST(n AS BIGINT) AS n,
             |  '{"p":' || CAST(p AS VARCHAR) || ',"k":' || CAST(k AS VARCHAR) || '}' AS js
             |FROM st WHERE rn = 1 ORDER BY o_custkey""".stripMargin)),

    // Bitwise surface: shifts, and/or/xor, popcount — the primitives
    // under the SimHash/bitmap/Bloom family, surfaced as columns.
    Q("fn_bitwise", "FN",
      (s, d) => Tables(s, d, "part")
        .select(col("p_partkey"),
          expr("shiftleft(p_partkey, 3)").as("shl3"),
          expr("shiftright(p_partkey, 2)").as("shr2"),
          expr("p_partkey & 255").as("lo8"),
          expr("p_partkey | 4096").as("or4k"),
          expr("p_partkey ^ 21845").as("xorpat"),
          expr("cast(bit_count(p_partkey) as int)").as("pop"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  CAST(p_partkey << 3 AS BIGINT) AS shl3,
             |  CAST(p_partkey >> 2 AS BIGINT) AS shr2,
             |  CAST(p_partkey & 255 AS BIGINT) AS lo8,
             |  CAST(p_partkey | 4096 AS BIGINT) AS or4k,
             |  CAST(xor(p_partkey, 21845) AS BIGINT) AS xorpat,
             |  CAST(bit_count(p_partkey) AS INTEGER) AS pop
             |FROM part ORDER BY p_partkey""".stripMargin)),

    Q("fn_array", "FN",
      (s, d) => {
        val words = split(col("p_name"), " ")
        Tables(s, d, "part")
          .select(col("p_partkey"),
            array_join(array_sort(words), ",").as("sorted"),
            size(array_distinct(words)).as("n_distinct"),
            array_contains(words, "green").as("has_green"),
            array_position(words, element_at(words, 1)).cast("int").as("first_pos"),
            array_join(slice(words, 2, 2), ",").as("mid2"),
            // sorted: array_intersect dedups in first-occurrence order while
            // DuckDB's list_distinct reorders — sorting pins both
            array_join(array_sort(
              array_intersect(words, array(lit("green"), lit("red"), lit("blue")))), ",")
              .as("primary_colors"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey,
             |       array_to_string(list_sort(str_split(p_name, ' ')), ',') AS sorted,
             |       CAST(len(list_distinct(str_split(p_name, ' '))) AS INTEGER) AS n_distinct,
             |       list_contains(str_split(p_name, ' '), 'green') AS has_green,
             |       CAST(list_position(str_split(p_name, ' '), (str_split(p_name, ' '))[1]) AS INTEGER) AS first_pos,
             |       array_to_string((str_split(p_name, ' '))[2:3], ',') AS mid2,
             |       coalesce(array_to_string(list_sort(list_distinct(list_filter(str_split(p_name, ' '),
             |         x -> x IN ('green', 'red', 'blue')))), ','), '') AS primary_colors
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Map-function battery: construction, key/value extraction, merge,
    // lookup — exchange_rates-shaped MapType end-to-end.
    Q("fn_map", "FN",
      (s, d) => {
        val m = map(lit("usd"), col("o_totalprice"), lit("eur"), col("o_totalprice") * 0.9)
        val m2 = map_concat(m, map(lit("gbp"), col("o_totalprice") * 0.8))
        Tables(s, d, "orders")
          .select(col("o_orderkey"),
            array_join(map_keys(m2), ",").as("ccys"),
            size(m2).as("n_ccys"),
            round(element_at(m2, "gbp") * 100).cast("long").as("gbp_cents"),
            round(aggregate(map_values(m2), lit(0.0), _ + _) * 100).cast("long").as("total_cents"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |       'usd,eur,gbp' AS ccys, 3 AS n_ccys,
             |       CAST(round(o_totalprice * 0.8 * 100) AS BIGINT) AS gbp_cents,
             |       CAST(round((o_totalprice + (o_totalprice * 0.9) + (o_totalprice * 0.8)) * 100) AS BIGINT) AS total_cents
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // JSON scalar extraction from the events props column.
    Q("json_extract_props", "JSON",
      (s, d) => Tables(s, d, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // Recursive CTE execution (WITH RECURSIVE, new engine surface in
    // Spark 4.1): level-order walk of a 1023-node binary-heap tree
    // carrying root-to-node path sums — the org-chart/BOM rollup shape
    // SQL recursion exists for. A tree (DAG) keeps UNION ALL recursion
    // linear (Spark does not yet support UNION-dedup recursion, so
    // cyclic fixpoints stay with the iterative Graph operators). Both
    // engines run the same recursive SQL text.
    Q("rec_tree_rollup", "Q",
      (s, d) => {
        s.range(1, 1023)
          .selectExpr("id AS node", "(id - 1) div 2 AS parent")
          .createOrReplaceTempView("rec_tree")
        s.sql("""
          WITH RECURSIVE walk(node, depth, path_sum) AS (
            SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            UNION ALL
            SELECT t.node, w.depth + 1, w.path_sum + t.node
            FROM rec_tree t JOIN walk w ON t.parent = w.node)
          SELECT depth, count(*) AS n_nodes, sum(path_sum) AS sum_paths,
                 min(path_sum) AS min_path, max(path_sum) AS max_path
          FROM walk GROUP BY depth ORDER BY depth""")
      },
      Some("""WITH RECURSIVE t AS (SELECT r.range AS node, (r.range - 1) // 2 AS parent
             |                     FROM range(1, 1023) r),
             |walk(node, depth, path_sum) AS (
             |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
             |  UNION ALL
             |  SELECT t.node, w.depth + 1, w.path_sum + t.node
             |  FROM t JOIN walk w ON t.parent = w.node)
             |SELECT depth, count(*) AS n_nodes, CAST(sum(path_sum) AS BIGINT) AS sum_paths,
             |       min(path_sum) AS min_path, max(path_sum) AS max_path
             |FROM walk GROUP BY depth ORDER BY depth""".stripMargin)))
}
