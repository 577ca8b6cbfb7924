package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-cell point-radius join — the spatial sibling of
  * [[IntervalJoin]]: every corpus point hashes into ONE grid cell of
  * width = `radius`, every probe explodes into its 3×3 cell
  * neighborhood (any point within `radius` of the probe provably lives
  * in one of those 9 cells), candidates meet by an equi-join on the
  * packed cell key, and the exact integer predicate dx²+dy² ≤ r²
  * verifies each candidate once.
  *
  * Scale shape: the corpus is scanned once and shuffled once on the
  * cell key (9 rows per PROBE, 1 per corpus point — fan-out rides the
  * small side); work concentrates only where points actually
  * concentrate, which AQE's skew splitting handles. Never
  * |probes|·|corpus|, which is exactly what the oracle pays.
  * Coordinates are non-negative integers (geo data arrives here after
  * the usual fixed-point scaling of lon/lat).
  */
object SpatialJoin {

  /** Inner radius join: one row per (probe, point) with
    * dist2 = dx²+dy² ≤ radius². Cell key packs (x div r, y div r) into
    * one long — single-long equi-join keys keep Spark on its fast
    * hashed relations (the packed-key lesson from the motif census). */
  def radiusJoin(points: DataFrame, probes: DataFrame,
                 idCol: String, xCol: String, yCol: String,
                 radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val K = 1L << 31
    // Domain enforcement (not just documentation): coordinates must sit in
    // [0, 2^31) so (a) the packed (cx*K + cy) key is collision-free —
    // cy < 2^31 by construction once y < 2^31 and radius >= 1 — and
    // (b) dist2 = dx²+dy² < 2^63 never wraps Long. Violations raise at
    // scan time instead of silently admitting/dropping boundary pairs.
    // Cell ids use SQL `div` (exact integer division) — the previous
    // double `/` lost exactness past 2^53.
    def checked(c: org.apache.spark.sql.Column, name: String) =
      when(c >= 0L && c < K, c).otherwise(raise_error(concat(
        lit(s"radiusJoin: $name outside [0, 2^31): "), c.cast("string"))).cast("long"))
    val corpus = points.select(col(idCol).as("point_id"),
        checked(col(xCol).cast("long"), xCol).as("px"),
        checked(col(yCol).cast("long"), yCol).as("py"))
      .withColumn("__cell",
        expr(s"(px div ${radius}L) * ${K}L + (py div ${radius}L)"))
    val probed = probes.select(col(idCol).as("probe_id"),
        checked(col(xCol).cast("long"), xCol).as("qx"),
        checked(col(yCol).cast("long"), yCol).as("qy"))
      .withColumn("__d", explode(expr(
        "array(-1L, 0L, 1L)")))
      .withColumn("__e", explode(expr("array(-1L, 0L, 1L)")))
      .withColumn("__cell",
        (expr(s"qx div ${radius}L") + col("__d")) * K
          + expr(s"qy div ${radius}L") + col("__e"))
      .drop("__d", "__e")
    probed.join(corpus, "__cell")
      .withColumn("dist2",
        (col("px") - col("qx")) * (col("px") - col("qx"))
          + (col("py") - col("qy")) * (col("py") - col("qy")))
      .filter(col("dist2") <= radius * radius)
      .select(col("probe_id"), col("point_id"), col("dist2"))
  }
}
