package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): multi-pass blocking → pairwise
  * field scoring → transitive clustering → survivorship. The classic
  * Fellegi–Sunter pipeline re-expressed as four declarative Spark stages,
  * none of which ever materializes the corpus² pair space:
  *
  *  1. '''Blocking''' — candidate pairs come only from records sharing a
  *     cheap blocking key (an equi-join Catalyst can shuffle-hash on the
  *     key). Several passes run with DIFFERENT keys and union: a pair
  *     missed by one pass (typo in the name prefix) is caught by another
  *     (identical phone) — the standard recall fix that keeps every
  *     individual pass narrow. Pair volume is Σ_blocks |block|², bounded
  *     by the caller's key design, never n².
  *  2. '''Scoring''' — each candidate pair is verified once: per-field
  *     agreement (exact equality, or Levenshtein ≤ maxDist for fuzzy
  *     fields — Spark's codegen'd `levenshtein`, exact integers on both
  *     engines) adds that field's agreement weight, disagreement adds the
  *     (negative) disagreement weight; all weights are integer milli
  *     log-likelihood ratios so the comparison is ulp-proof.
  *  3. '''Clustering''' — pairs at/above the match threshold feed the
  *     shared [[ConnectedComponents]] operator (O(log n) label rounds);
  *     unmatched records stay their own singleton entity.
  *  4. '''Survivorship''' — one representative row per entity, chosen by
  *     a caller-supplied preference (longest name, freshest timestamp,
  *     …) as a min/max-of-struct argmax inside ONE hash aggregate — no
  *     window sort over the full corpus.
  *
  * At 100 TB the shape holds: every stage is an equi-shuffle on a key
  * (block key, record id, entity id) with map-side partial aggregation;
  * a skewed block (every record named "UNKNOWN") is the one hazard, and
  * the mitigation is pass design — put the skewed value's discriminating
  * power in ANOTHER pass and drop it from this one (or pre-filter the
  * flood value, the same move as Dedup's flood collapse).
  */
object EntityResolution {

  /** One compare field: `maxDist` 0 = exact equality, > 0 = Levenshtein
    * distance at most `maxDist` counts as agreement. Weights are integer
    * milli-units (Fellegi–Sunter log-likelihood ratios scaled by 1000);
    * `disagreeMilli` is typically negative. */
  final case class Field(col: String, maxDist: Int,
                         agreeMilli: Int, disagreeMilli: Int)

  /** Multi-pass blocked candidate pairs: for each pass (a list of exact
    * blocking-key columns) self-join records within the block, keep
    * id_a < id_b, union the passes, dedup. Null block keys never match
    * (SQL equality semantics) — a record with a missing phone simply
    * contributes no pairs to the phone pass.
    *
    * `maxBlock` (0 = unlimited) is the standard ER flood guard: a block
    * larger than the cap — the "UNKNOWN"/"N/A" junk value that owns 30%
    * of a real corpus — is EXCLUDED from that pass before the self-join,
    * because its |block|² pair set is (a) unpayable and (b) evidentially
    * worthless (sharing a junk value is not evidence of identity).
    * That's exactly why blocking is multi-pass: records flooded out of
    * the name pass still pair through the phone pass, where their keys
    * are discriminative. The cap is one map-side-combined count per
    * pass, joined back as a semi-filter — metadata-priced. */
  def candidates(records: DataFrame, idCol: String,
                 passes: Seq[Seq[String]], maxBlock: Int = 0): DataFrame = {
    require(passes.nonEmpty, "need at least one blocking pass")
    val id = col(idCol).cast("long")
    val byPass = passes.map { keys =>
      val base =
        if (maxBlock <= 0) records
        else {
          val small = records.groupBy(keys.map(col): _*)
            .agg(count(lit(1)).as("__bn"))
            .filter(col("__bn") <= maxBlock)
            .drop("__bn")
          records.join(small, keys, "left_semi")
        }
      val a = base.select((id.as("id_a") +: keys.map(col)): _*)
      val b = base.select((id.as("id_b") +: keys.map(col)): _*)
      a.join(b, keys.map(k => a(k) === b(k)).reduce(_ && _)
          && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    }
    // distinct on the pair id — one shuffle; a pair found by k passes
    // is scored once
    byPass.reduce(_ unionByName _).distinct()
  }

  /** Score blocked candidates field-by-field and keep matches. Output:
    * (id_a, id_b, score_milli) with score ≥ `thresholdMilli`. The join
    * back to the records is by id (two shuffle-hash joins); each field
    * comparison runs inside whole-stage codegen. */
  def matchPairs(records: DataFrame, idCol: String,
                 passes: Seq[Seq[String]], fields: Seq[Field],
                 thresholdMilli: Int, maxBlock: Int = 0): DataFrame = {
    require(fields.nonEmpty, "need at least one compare field")
    val cand = candidates(records, idCol, passes, maxBlock)
    val cols = fields.map(_.col).distinct
    val left = records.select(col(idCol).cast("long").as("id_a") +:
      cols.map(c => col(c).as(s"__a_$c")): _*)
    val right = records.select(col(idCol).cast("long").as("id_b") +:
      cols.map(c => col(c).as(s"__b_$c")): _*)
    val scored = cand.join(left, "id_a").join(right, "id_b")
    val score = fields.map { f =>
      val agree =
        if (f.maxDist == 0) col(s"__a_${f.col}") === col(s"__b_${f.col}")
        else levenshtein(col(s"__a_${f.col}"), col(s"__b_${f.col}")) <= f.maxDist
      when(agree, lit(f.agreeMilli.toLong)).otherwise(lit(f.disagreeMilli.toLong))
    }.reduce(_ + _)
    scored.select(col("id_a"), col("id_b"), score.as("score_milli"))
      .filter(col("score_milli") >= thresholdMilli)
  }

  /** Cluster matches into entities and pick one surviving representative
    * per entity. `prefer` orders candidates DESCENDING field-by-field
    * (first column most significant); ties MUST be broken by something
    * unique — the record id is appended ascending as the final
    * tie-break, so survivorship is deterministic by construction.
    *
    * Output: one row per entity — (entity, n_records, rep_id, then one
    * `rep_<col>` per preference column). Entity = smallest member id
    * (the [[ConnectedComponents]] label contract).
    *
    * Cost shape: CC on match edges only (matches are output-sized, tiny
    * next to the corpus), one left join corpus⋈labels on id, one hash
    * aggregate on entity with a struct-max — no windows, no sorts. */
  def resolve(records: DataFrame, idCol: String, matches: DataFrame,
              prefer: Seq[String]): DataFrame = {
    val labels = ConnectedComponents.run(matches, "id_a", "id_b")
    val id = col(idCol).cast("long")
    val labeled = records
      .join(labels, id === col("node"), "left")
      .withColumn("entity", coalesce(col("component"), id))
    // argmax-of-struct: preference columns descending, then SMALLEST id
    // ascending as the unique tie-break (negate the id inside a max())
    val pick = struct(prefer.map(col) :+ (-id).as("__neg_id"): _*)
    labeled.groupBy(col("entity"))
      .agg(count(lit(1)).as("n_records"), max(pick).as("__best"))
      .select((col("entity") +: col("n_records") +:
        (-col("__best.__neg_id")).as("rep_id") +:
        prefer.map(c => col(s"__best.$c").as(s"rep_$c"))): _*)
  }
}
