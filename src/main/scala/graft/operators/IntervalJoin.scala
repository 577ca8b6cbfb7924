package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval × interval OVERLAP join — the temporal/genomic join shape
  * ("which maintenance windows overlapped which user sessions") that a
  * plain equi-join cannot express and a theta-join would pay |A|·|B|
  * for. Bucketization makes it an equi-join: every interval explodes
  * into the fixed-width buckets it covers, candidates meet in their
  * shared bucket, the exact predicate `sA <= eB && sB <= eA` verifies
  * each DISTINCT candidate pair once.
  *
  * Scale shape: fan-out per interval is ceil(len/bucket)+1 rows — pick
  * `bucketSeconds` near the median interval length so it's O(1) — then
  * ONE equi-shuffle on the bucket key, a distinct on the pair id, and a
  * codegen'd verify. Never |A|·|B|; skew concentrates only where real
  * temporal overlap concentrates (a hot hour), which AQE skew-join
  * splits. The pair-distinct is required because a pair sharing k
  * buckets meets k times — dedup BEFORE any per-pair work.
  */
object IntervalJoin {

  /** Inner overlap join. Inputs carry (id, start, end) as LONG epoch
    * seconds (caller converts timestamps); intervals are closed, and
    * touching endpoints (eA == sB) DO overlap — the standard closed-
    * interval convention; pre-shrink ends by 1 for half-open semantics.
    * Output: idA, sA, eA, idB, sB, eB, overlap_s = min(e)−max(s). */
  def overlapJoin(a: DataFrame, b: DataFrame,
                  idA: String, sA: String, eA: String,
                  idB: String, sB: String, eB: String,
                  bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    def explodeSide(df: DataFrame, id: String, s: String, e: String,
                    pfx: String): DataFrame =
      df.select(col(id).as(s"${pfx}_id"),
          col(s).cast("long").as(s"${pfx}_s"), col(e).cast("long").as(s"${pfx}_e"))
        .filter(col(s"${pfx}_s") <= col(s"${pfx}_e"))
        .withColumn("__bkt", explode(expr(
          s"sequence(${pfx}_s div $bucketSeconds, ${pfx}_e div $bucketSeconds)")))
    val ea = explodeSide(a, idA, sA, eA, "a")
    val eb = explodeSide(b, idB, sB, eB, "b")
    ea.join(eb, "__bkt")
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("a_id"), col("a_s"), col("a_e"),
        col("b_id"), col("b_s"), col("b_e"))
      .distinct() // a pair sharing k buckets met k times
      .withColumn("overlap_s",
        least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
  }
}
