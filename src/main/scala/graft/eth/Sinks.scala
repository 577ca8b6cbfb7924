package graft.eth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sinks (SURVEY §2.7): bucket-partitioned parquet (the engine's primary
  * layout, mirroring the reference's 1,000-block files / Cassandra
  * partitions) and the gzipped-CSV dialect with per-table delimiters.
  */
object Sinks {

  /** T5/K1: bucket-aligned partitioned parquet write.
    *
    * `partitionBy(bucketCol)` makes the bucket a *directory* key — block-range
    * readers prune partitions exactly like the reference's
    * `block_id_group`-keyed Cassandra partitions / `%08d-%08d` export dirs
    * (ref: scripts/eth_csv_export.py:563-598). `repartition(bucketCol)`
    * first co-locates each bucket in one task so each partition directory
    * gets one file instead of one-per-task (small-files control at scale);
    * `sortWithinPartitions` reproduces the clustering order
    * (ref: scripts/schema.cql:101-102).
    */
  def writeBucketedParquet(df: DataFrame, path: String,
                           bucketCol: String = "block_id_group",
                           sortCols: Seq[String] = Seq("block_id")): Unit =
    df.repartition(col(bucketCol))
      .sortWithinPartitions((bucketCol +: sortCols).map(col).toIndexedSeq: _*)
      .write
      .mode("overwrite")
      // dynamic: replace only the buckets present in this write — the
      // partition-level upsert that makes incremental re-ingest idempotent
      // (T4) without wiping previously ingested ranges (static overwrite
      // would truncate the whole table)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(bucketCol)
      .parquet(path)

  /** Bucket-level upsert: merge the incoming rows with whatever already
    * lives in the affected buckets, dedupe by primary key, and rewrite only
    * those buckets (dynamic partition overwrite). This is what makes
    * *mid-bucket* incremental ranges safe: plain overwrite replaces whole
    * bucket directories, so a range starting at block 1500 would silently
    * drop blocks 1000-1499. The merge read is partition-pruned to the
    * touched buckets (bounded: buckets-per-batch), and the PK dedupe is the
    * Cassandra-upsert equivalence (replayed rows are byte-identical, T4).
    */
  def upsertBucketedParquet(df: DataFrame, path: String, pkCols: Seq[String],
                            bucketCol: String = "block_id_group",
                            sortCols: Seq[String] = Seq("block_id")): Unit = {
    val spark = df.sparkSession
    val existing =
      try {
        val old = spark.read.parquet(path)
        // bounded metadata: the distinct buckets of this batch
        val buckets = df.select(col(bucketCol)).distinct().collect().map(_.get(0))
        Some(old.filter(col(bucketCol).isin(buckets.toIndexedSeq: _*)))
      } catch { case _: org.apache.spark.sql.AnalysisException => None }
    val merged = existing match {
      case Some(old) =>
        df.unionByName(old.select(df.columns.map(col).toIndexedSeq: _*))
          .dropDuplicates(pkCols)
          // break lineage from the files we are about to overwrite
          .localCheckpoint(true)
      case None => df
    }
    writeBucketedParquet(merged, path, bucketCol, sortCols)
  }

  /** Read back a bucket range with partition pruning: the bucket filter
    * prunes directories (visible as PartitionFilters in explain), the id
    * filter prunes row groups via parquet min/max stats. */
  def readBlockRange(spark: SparkSession, path: String, lo: Long, hi: Long,
                     bucketCol: String = "block_id_group",
                     blockIdCol: String = "block_id",
                     bucketSize: Long = 1000L): DataFrame =
    spark.read.parquet(path)
      .filter(col(bucketCol).between(lo / bucketSize, hi / bucketSize)
        && col(blockIdCol).between(lo, hi))

  /** Per-table CSV dialect (ref: scripts/csv_import.sh:12-39): logs use `|`
    * because `topics` is rendered as a JSON-ish string containing commas
    * (ref: scripts/eth_csv_export.py:574-580); all other tables use `,`. */
  def csvDelimiter(table: String): String = if (table == "log") "|" else ","

  /** K2: gzipped CSV with header and the table's delimiter
    * (ref: scripts/eth_csv_export.py:352-370). */
  def writeCsv(df: DataFrame, path: String, table: String): Unit =
    df.write
      .mode("overwrite")
      .option("compression", "gzip")
      .option("header", "true")
      .option("delimiter", csvDelimiter(table))
      .option("emptyValue", "")
      .csv(path)

  /** K4: the CSV read-back contract — gzip, header, per-table delimiter,
    * empty-string nulls, explicit schema (CSV carries no types). */
  def readCsv(spark: SparkSession, path: String, table: String,
              schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("delimiter", csvDelimiter(table))
      .option("nullValue", "")
      .csv(path)
}
