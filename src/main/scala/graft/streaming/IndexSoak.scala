package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Long-horizon + scale evidence harness for the mutable-corpus index
  * maintainers (VERDICT r13 tasks 2 and 5). Two modes, one engine under
  * test — `StreamingOps.maintainWinnowIndexAndFlag`, the heaviest
  * consumer of `upsertMutableIndex` (set-shrink erase, wholesale
  * replace, emptied-bucket deletion all reachable from text edits):
  *
  *  - `scale <sfDir> <workDir> <keyBuckets> <nBatches> <batchSize>`:
  *    seeds the index from the CORPUS documents table (batch path,
  *    layout-identical to the maintainer's own writes), then drives
  *    `nBatches` constant-size edit batches through the live maintainer
  *    and reports per-batch wall + bytes read. Run at sf0.1/sf1/sf10
  *    with keyBuckets scaled ∝ corpus (constant bucket SIZE — the 100 TB
  *    deployment posture): per-batch cost must stay ~flat across
  *    decades, proving the maintainer pays O(batch × bucket) per batch,
  *    never O(corpus).
  *
  *  - `soak <workDir> <nBatches>`: from an empty index, a deterministic
  *    schedule of ingests, edits, shrink-below-window erasures,
  *    restores, new docs, and byte-identical replays; at the end the
  *    maintained index and pk side map are compared row-exactly against
  *    a from-scratch rebuild of the final expected corpus state, and
  *    the report carries per-batch walls + data-file counts so creep
  *    (file-count growth or per-batch slowdown) is visible. The
  *    StreamingSpec mini-soak runs the same method.
  */
object IndexSoak {

  /** Content-bucket derivation — MUST match maintainWinnowIndexAndFlag. */
  private def kbCol(keyBuckets: Int) =
    pmod(graft.functions.ColumnFns.md5Long(col("fp_hash").cast("string")),
      lit(keyBuckets.toLong))

  /** Id-bucket derivation — MUST match upsertMutableIndex's side map. */
  private def pkbCol(idCol: String, keyBuckets: Int) =
    pmod(graft.functions.ColumnFns.md5Long(col(idCol).cast("string")),
      lit(keyBuckets.toLong))

  /** Expected (id, fp_hash, kb) index rows for a corpus state. */
  def expectedIndex(docs: DataFrame, idCol: String, textCol: String,
                    keyBuckets: Int): DataFrame =
    graft.llm.TextAnalysis.winnowFingerprints(docs, idCol, textCol)
      .select(col(idCol), col("fp_hash")).distinct()
      .withColumn("kb", kbCol(keyBuckets))

  /** Seed the winnow index + pk map in ONE batch write, layout-identical
    * to what the streaming maintainer produces (same pkCols / bucket /
    * sort / sink), so subsequent micro-batches upsert into a
    * corpus-scale index without paying a corpus-length stream replay. */
  def seedWinnowIndex(docs: DataFrame, indexDir: String,
                      idCol: String = "doc_id", textCol: String = "text",
                      keyBuckets: Int = 64): Unit = {
    val fps = expectedIndex(docs, idCol, textCol, keyBuckets)
      .localCheckpoint(true)
    graft.eth.Sinks.upsertBucketedParquet(fps, indexDir,
      pkCols = Seq(idCol, "fp_hash"), bucketCol = "kb",
      sortCols = Seq("fp_hash", idCol))
    val mapRows = fps.select(col(idCol), col("kb")).distinct()
      .withColumn("pkb", pkbCol(idCol, keyBuckets))
    graft.eth.Sinks.upsertBucketedParquet(mapRows, s"${indexDir}_pk",
      pkCols = Seq(idCol, "kb"), bucketCol = "pkb", sortCols = Seq(idCol))
  }

  /** Row-exact equivalence of the maintained index + side map against a
    * from-scratch rebuild of `finalDocs` — the soak's closing assert.
    * Returns (indexDiff, mapDiff): both must be 0. */
  def rebuildDiff(spark: SparkSession, indexDir: String, finalDocs: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  keyBuckets: Int = 64): (Long, Long) = {
    val want = expectedIndex(finalDocs, idCol, textCol, keyBuckets)
      .localCheckpoint(true)
    val got = spark.read.parquet(indexDir)
      .select(col(idCol), col("fp_hash"), col("kb").cast("long").as("kb"))
    val idxDiff = got.exceptAll(want).count() + want.exceptAll(got).count()
    val wantMap = want.select(col(idCol), col("kb")).distinct()
      .withColumn("pkb", pkbCol(idCol, keyBuckets))
    val gotMap = spark.read.parquet(s"${indexDir}_pk")
      .select(col(idCol), col("kb").cast("long").as("kb"),
        col("pkb").cast("long").as("pkb"))
    val mapDiff = gotMap.exceptAll(wantMap).count() + wantMap.exceptAll(gotMap).count()
    (idxDiff, mapDiff)
  }

  /** Parquet data-file count under a bucketed dir (creep detector). */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
  }

  case class SoakReport(walls: Seq[Double], idxDiff: Long, mapDiff: Long,
                        filesMid: Int, filesEnd: Int, finalDocsN: Long,
                        finalIndexRows: Long)

  /** Deterministic soak: `nBatches` micro-batches against one live
    * maintainer. Schedule (k docs per op, ids arithmetic — no RNG):
    * first `seedBatches` batches ingest the base corpus in slices; then
    * cycle edit / shrink-to-below-window / restore+grow / add-new /
    * byte-identical-replay. Tracks the expected corpus in a driver map
    * (the soak's oracle) and closes with [[rebuildDiff]]. */
  def runSoak(spark: SparkSession, workDir: String, nBatches: Int,
              baseDocs: Int = 300, opDocs: Int = 20,
              keyBuckets: Int = 64): SoakReport = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def baseText(id: Long) =
      (0 until (12 + (id % 9)).toInt).map(j => s"w${(id * 7 + j * 13) % 97}")
        .mkString(s"doc $id opens with ", " ", s" and closes at ${id % 31}")
    val state = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    val originals = scala.collection.mutable.Map.empty[Long, String]
    var nextNewId = 1000000L

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = StreamingOps.maintainWinnowIndexAndFlag(
      input.toDF().toDF("doc_id", "text"),
      s"$workDir/index", s"$workDir/flags", s"$workDir/ckpt",
      minShared = 2, keyBuckets = keyBuckets)
    val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
    var filesMid = 0
    var lastBatch: Seq[(Long, String)] = Seq.empty
    val seedBatches = math.max(1, math.min(nBatches / 5, baseDocs / opDocs / 2))
    val seedSlice = (baseDocs + seedBatches - 1) / seedBatches
    try {
      for (b <- 0 until nBatches) {
        val batch: Seq[(Long, String)] =
          if (b < seedBatches) {
            val ids = (b * seedSlice) until math.min((b + 1) * seedSlice, baseDocs)
            ids.map { i => val id = i.toLong; (id, baseText(id)) }
          } else (b - seedBatches) % 5 match {
            case 0 => // edit: rewrite k docs with batch-stamped tails
              pick(state.keys, b, opDocs).map(id =>
                (id, state(id) + s" edited in batch $b tail ${id % 13}"))
            case 1 => // shrink below the winnow window: full erase
              pick(state.keys, b, opDocs).map(id => (id, "tiny"))
            case 2 => // restore + grow from the original
              pick(state.keys, b, opDocs).map(id =>
                (id, originals.getOrElse(id, baseText(id)) + s" regrown at $b"))
            case 3 => // brand-new docs
              (0 until opDocs).map { j =>
                val id = nextNewId; nextNewId += 1
                (id, baseText(id) + s" born in batch $b slot $j")
              }
            case 4 => // byte-identical replay of the previous batch
              lastBatch
          }
        if (batch.nonEmpty) {
          batch.foreach { case (id, text) =>
            state(id) = text
            if (!originals.contains(id)) originals(id) = text
          }
          lastBatch = batch
          val t0 = System.nanoTime()
          input.addData(batch: _*)
          q.processAllAvailable()
          walls += (System.nanoTime() - t0) / 1e9
        }
        if (b == nBatches / 2) filesMid = dataFileCount(spark, s"$workDir/index")
      }
    } finally q.stop()
    val filesEnd = dataFileCount(spark, s"$workDir/index")
    val finalDocs = state.toSeq.toDF("doc_id", "text")
    val (idxDiff, mapDiff) = rebuildDiff(spark, s"$workDir/index", finalDocs,
      keyBuckets = keyBuckets)
    SoakReport(walls.toSeq, idxDiff, mapDiff, filesMid, filesEnd,
      state.size.toLong,
      spark.read.parquet(s"$workDir/index").count())
  }

  /** Deterministic doc pick: k ids from the live set, rotated by batch. */
  private def pick(ids: Iterable[Long], b: Int, k: Int): Seq[Long] = {
    val live = ids.toIndexedSeq
    if (live.isEmpty) Seq.empty
    else (0 until math.min(k, live.size)).map(j => live((b * 31 + j * 7) % live.size)).distinct
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    args.toList match {
      case "scale" :: sfDir :: workDir :: kb :: nb :: bs :: Nil =>
        val keyBuckets = kb.toInt; val nBatches = nb.toInt; val batchSize = bs.toInt
        implicit val sqlCtx = spark.sqlContext
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val corpusN = docs.count()
        val inBytes = new java.util.concurrent.atomic.AtomicLong()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
              val m = te.taskMetrics
              if (m != null) inBytes.addAndGet(m.inputMetrics.bytesRead)
            }
          })
        val t0 = System.nanoTime()
        // reuse an existing seeded index (same workDir, varying batch
        // size): edits replace rows wholesale, so the index stays
        // corpus-shaped across measurement runs
        val already = new org.apache.hadoop.fs.Path(s"$workDir/index")
        val fs0 = already.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs0.exists(already))
          seedWinnowIndex(docs, s"$workDir/index", keyBuckets = keyBuckets)
        fs0.delete(new org.apache.hadoop.fs.Path(s"$workDir/ckpt"), true)
        val seedS = (System.nanoTime() - t0) / 1e9
        // constant-size edit batches: doc ids stride the corpus so every
        // batch touches distinct docs; text edits re-derive fingerprints
        val baseIds = docs.select(col("doc_id")).orderBy(col("doc_id"))
          .limit(nBatches * batchSize).collect().map(_.getLong(0))
        val texts = docs.join(
            baseIds.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
          .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val q = StreamingOps.maintainWinnowIndexAndFlag(
          input.toDF().toDF("doc_id", "text"),
          s"$workDir/index", s"$workDir/flags", s"$workDir/ckpt",
          minShared = 2, keyBuckets = keyBuckets)
        val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
        val bytes = scala.collection.mutable.ArrayBuffer.empty[Long]
        try {
          for (b <- 0 until nBatches) {
            val ids = baseIds.slice(b * batchSize, (b + 1) * batchSize)
            val batch = ids.map(id => (id, texts(id) + s" edited in pass $b"))
            val b0 = inBytes.get(); val t1 = System.nanoTime()
            input.addData(batch.toIndexedSeq: _*)
            q.processAllAvailable()
            walls += (System.nanoTime() - t1) / 1e9
            Thread.sleep(200) // listener drain
            bytes += inBytes.get() - b0
          }
        } finally q.stop()
        def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
        println(s"""{"mode":"scale","sf_dir":"$sfDir","corpus_docs":$corpusN,""" +
          s""""key_buckets":$keyBuckets,"batch_size":$batchSize,"seed_s":$seedS,""" +
          s""""batch_walls_s":[${walls.map(w => f"$w%.2f").mkString(",")}],""" +
          s""""batch_read_mb":[${bytes.map(x => (x / 1e6).round).mkString(",")}],""" +
          s""""median_wall_s":${f"${med(walls.toSeq)}%.2f"},""" +
          s""""median_read_mb":${(bytes.sorted.apply(bytes.size / 2) / 1e6).round}}""")

      case "soak" :: workDir :: nb :: rest if rest.size <= 2 =>
        val r = runSoak(spark, workDir, nb.toInt,
          baseDocs = rest.headOption.map(_.toInt).getOrElse(300),
          opDocs = rest.lift(1).map(_.toInt).getOrElse(20))
        def med(xs: Seq[Double]) = if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.size / 2)
        val head = r.walls.take(10); val tail = r.walls.takeRight(10)
        println(s"""{"mode":"soak","batches":${r.walls.size},""" +
          s""""idx_diff":${r.idxDiff},"map_diff":${r.mapDiff},""" +
          s""""files_mid":${r.filesMid},"files_end":${r.filesEnd},""" +
          s""""final_docs":${r.finalDocsN},"final_index_rows":${r.finalIndexRows},""" +
          s""""wall_med_first10_s":${f"${med(head)}%.2f"},""" +
          s""""wall_med_last10_s":${f"${med(tail)}%.2f"},""" +
          s""""walls_s":[${r.walls.map(w => f"$w%.2f").mkString(",")}]}""")
        if (r.idxDiff != 0 || r.mapDiff != 0) sys.exit(1)

      case other =>
        System.err.println(s"usage: scale <sfDir> <workDir> <keyBuckets> " +
          s"<nBatches> <batchSize> | soak <workDir> <nBatches>; got: $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
