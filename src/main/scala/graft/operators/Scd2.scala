package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval build — turn an append-only
  * change log ("key had attribute value X at time T") into the versioned
  * dimension table warehouses join against: one row per (key, value run)
  * with `[valid_from, valid_to)` interval, version number, and current
  * flag. This is the standard CDC-consumer shape downstream of the
  * reference's ingest (reference context: the exchange-rates and
  * configuration tables of `graphsense-ethereum-etl` are point-in-time
  * lookups — `scripts/eth_cassandra_streaming.py` upserts the latest
  * value; an SCD2 view is what preserves the history those lookups lose).
  *
  * Two windows over the SAME partition key, so one hash exchange on
  * `keyCol` serves the whole plan:
  *   1. change-point detection: `lag(attr)` per key in (ts, ord) order —
  *      a row opens a new interval iff it is the key's first row or its
  *      attribute differs from the previous row's (consecutive
  *      duplicates collapse into the open interval);
  *   2. interval close: `lead(valid_from)` over the surviving change
  *      points — each interval runs to the next change (exclusive), the
  *      last one stays open (`valid_to` null, `is_current` true).
  *
  * Determinism: `ordCol` breaks same-timestamp ties totally, so the run
  * structure is a pure function of the data. Scale shape: per-key state
  * never leaves the executor (both windows partition on `keyCol` —
  * high-cardinality keys spread evenly); no joins, no driver state; at
  * 100 TB this is one shuffle of the change log. */
object Scd2 {

  /** @return one row per value run: (keyCol, attrCol, valid_from,
    *         valid_to, version, is_current), version numbering the key's
    *         runs from 1 in time order. */
  def buildIntervals(df: DataFrame, keyCol: String, attrCol: String,
                     tsCol: String, ordCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    val changes = df
      .select(col(keyCol), col(attrCol), col(tsCol), col(ordCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(byTime))
      .withColumn("__rn", row_number().over(byTime))
      // null-safe inequality: a null attribute value is a legal run value,
      // distinct from every non-null one
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
    val byChange = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(ordCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byChange))
      .withColumn("version", row_number().over(byChange))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("version"), col("is_current"))
  }

  /** Snapshot diff (change-data capture between two full table states):
    * one row per key whose content CHANGED between `prev` and `curr` —
    * `added` (new key), `removed` (key gone), `changed` (content hash
    * differs). Unchanged keys are dropped, so the output is proportional
    * to the CHURN, not the table — the property that makes "re-run the
    * pipeline on what moved" incremental maintenance affordable at
    * 100 TB (feed the `added`/`changed` rows to the upsert sink, the
    * `removed` keys to a tombstone pass).
    *
    * Content identity is `md5(concat_ws('\\u0001', contentCols))` — the
    * family's SQL-reproducible hash, with an unprintable separator so
    * ("ab","c") never collides with ("a","bc"). Null content columns
    * hash as empty (concat_ws skips nulls) — callers needing null/empty
    * distinction add an explicit sentinel column.
    *
    * Plan: ONE full outer join on the key + a codegen'd filter. When both
    * snapshots live in the engine's bucketed sink layout
    * ([[graft.eth.Sinks]]) the join is co-located (zero shuffle); the
    * general case shuffles each side once by the key. */
  def snapshotDiff(prev: DataFrame, curr: DataFrame, pkCol: String,
                   contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "snapshotDiff needs >= 1 content column")
    def hashed(df: DataFrame, hName: String) = df.select(col(pkCol),
      md5(concat_ws("\u0001", contentCols.map(col): _*)).as(hName))
    hashed(prev, "prev_hash")
      .join(hashed(curr, "curr_hash"), Seq(pkCol), "full_outer")
      .withColumn("change", when(col("prev_hash").isNull, lit("added"))
        .when(col("curr_hash").isNull, lit("removed"))
        .when(col("prev_hash") =!= col("curr_hash"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(pkCol), col("change"), col("prev_hash"), col("curr_hash"))
  }
}
