package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ / Great-Expectations
  * pattern): a suite of per-column constraints evaluated over a table in
  * ONE aggregation pass, producing a row-per-constraint report —
  * (expectation, column, n_rows, n_violations, status).
  *
  * Why one pass matters at 100 TB: the naive per-check loop scans the
  * table once per constraint; here every violation predicate becomes one
  * conditional-sum column of a single hash aggregate, so a 20-check suite
  * still costs exactly one scan with map-side partial aggregation and a
  * 1-row shuffle. `Unique` is the one exception class — it needs a
  * distinct count, which Spark folds into the same Aggregate via its
  * Expand-based multi-distinct rewrite (still one pass over the scan).
  *
  * Determinism: all metrics are exact integer counts; numeric range
  * checks take integer-cent bounds and compare `round(col*100)` so the
  * report is bit-identical across engines.
  */
object DataQuality {

  /** One declarative constraint. `name` must be unique in a suite. */
  sealed trait Expectation { def name: String; def column: String }
  /** No nulls allowed. */
  final case class NotNull(name: String, column: String) extends Expectation
  /** All (non-null) values distinct — primary-key shape. Violations =
    * n_nonnull − n_distinct (the count of surplus duplicate rows). */
  final case class Unique(name: String, column: String) extends Expectation
  /** round(col × 100) within [loCents, hiCents]; nulls violate. */
  final case class InRangeCents(name: String, column: String,
                                loCents: Long, hiCents: Long) extends Expectation
  /** Value must be one of `values`; nulls violate. */
  final case class InSet(name: String, column: String,
                         values: Seq[String]) extends Expectation
  /** String must FULLY match `regex` (anchored both ends by the
    * operator, so partial-vs-full match semantics can't diverge across
    * engines); nulls violate. Keep the pattern in the POSIX-compatible
    * subset — character classes, alternation, repetition. */
  final case class MatchesRegex(name: String, column: String,
                                regex: String) extends Expectation

  /** Evaluate the suite: one row per expectation, in suite order —
    * (expectation, column, n_rows, n_violations, status). */
  def validate(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    require(suite.nonEmpty, "empty expectation suite")
    require(suite.map(_.name).distinct.size == suite.size,
      "expectation names must be unique")
    val spark = df.sparkSession
    import spark.implicits._

    def violations(e: Expectation): Column = e match {
      case NotNull(_, c) =>
        sum(when(col(c).isNull, 1L).otherwise(0L))
      case Unique(_, c) =>
        sum(when(col(c).isNotNull, 1L).otherwise(0L)) - countDistinct(col(c))
      case InRangeCents(_, c, lo, hi) =>
        val cents = round(col(c).cast("double") * 100).cast("long")
        sum(when(col(c).isNull || cents < lo || cents > hi, 1L).otherwise(0L))
      case InSet(_, c, vs) =>
        sum(when(col(c).isNull || !col(c).isin(vs: _*), 1L).otherwise(0L))
      case MatchesRegex(_, c, re) =>
        sum(when(col(c).isNull || !col(c).rlike(s"^(?:$re)$$"), 1L).otherwise(0L))
    }

    val aggs = lit(suite.size).as("__k") +: count(lit(1)).as("__n") +:
      suite.map(e => coalesce(violations(e), lit(0L)).as(s"__v_${e.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // explode the 1-row metric vector into the report rows, keeping
    // suite order via the index column
    val rows = suite.zipWithIndex.map { case (e, i) =>
      struct(lit(i).as("__i"), lit(e.name).as("expectation"),
        lit(e.column).as("column"), col("__n").as("n_rows"),
        col(s"__v_${e.name}").as("n_violations"))
    }
    one.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.__i").as("__i"), col("__r.expectation").as("expectation"),
        col("__r.column").as("column"), col("__r.n_rows").as("n_rows"),
        col("__r.n_violations").as("n_violations"))
      .withColumn("status",
        when(col("n_violations") === 0L, lit("pass")).otherwise(lit("fail")))
      .orderBy("__i").drop("__i")
  }
}
