package graft.eth

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal multi-version bucketed table — time travel on plain parquet
  * (the lakehouse capability the bucketed sink was missing; reference
  * context: the Cassandra sink keeps only the latest state, so "what did
  * the table say at ingest N" is unanswerable there).
  *
  * Design (a Delta log reduced to its load-bearing parts):
  *   - data files are IMMUTABLE, one per (commit, touched bucket), named
  *     by the partition-dir write (`data/v<N>/__pv=<bucket>/part-*`);
  *     the bucket column is duplicated inside the file so an explicit
  *     file-list read needs no partition inference;
  *   - each commit appends ONE manifest (`_versions/<N>.json`) listing
  *     file adds and removes — commit = manifest rename-into-place, so
  *     readers see old-or-new, never half;
  *   - an UNTOUCHED bucket's file is never rewritten or copied: every
  *     later version's manifest simply keeps referencing it. Reading as
  *     of version v replays manifests 1..v (metadata-sized) into the
  *     active file set, then scans exactly those files.
  *
  * Commit semantics are bucket-granular upsert, same contract as
  * [[Sinks.upsertBucketedParquet]]: incoming rows win on PK collision
  * within the touched buckets; other buckets carry forward by
  * reference. Single-writer (like a Delta log without the LogStore CAS
  * primitive — the cloud-store swap point is documented, not faked).
  * At 100 TB the per-commit cost is proportional to TOUCHED data plus
  * metadata, not table size.
  */
object Versioned {

  /** All path bookkeeping (manifest contents, vacuum's keep-set string
    * compare) flows through ONE canonical form of the table dir, so a
    * caller mixing `tmp/t`, `tmp/t/` and `/abs/tmp/t` across commit /
    * readAt / vacuum can never make the keep-set lookup miss and delete
    * a still-referenced data file. */
  private def norm(dir: String): String =
    Paths.get(dir).toAbsolutePath.normalize.toString

  private def versionsDir(dir: String) = Paths.get(norm(dir), "_versions")

  // pure manifests only: `<v>.checkpoint.json` (written by checkpoint/
  // vacuum) also ends in ".json" — matching it here would make
  // "N.checkpoint".toLong throw on every commit after the first vacuum
  private val manifestName = """(\d+)\.json""".r

  /** Highest committed version, 0 if the table does not exist yet. */
  def latestVersion(dir: String): Long = {
    val vd = versionsDir(dir)
    if (!Files.isDirectory(vd)) 0L
    else {
      val it = Files.list(vd)
      try {
        val vs = it.iterator()
        var mx = 0L
        while (vs.hasNext) {
          vs.next().getFileName.toString match {
            case manifestName(v) => mx = math.max(mx, v.toLong)
            case _ => // checkpoint snapshot or tmp file — not a manifest
          }
        }
        mx
      } finally it.close()
    }
  }

  /** One manifest line per file action; hand-rolled JSON (paths and longs
    * only — no escaping hazards beyond quotes, which file paths here
    * cannot contain; `txn` ids are restricted to [A-Za-z0-9._-]; schema
    * actions restrict column names to the same alphabet). */
  private def writeManifest(dir: String, version: Long,
                            adds: Seq[(String, Long)],
                            removes: Seq[String],
                            txnId: Option[String] = None,
                            schemaAction: Option[String] = None): Unit = {
    Files.createDirectories(versionsDir(dir))
    val txnLine = txnId.map(t => s""""txn": "$t",\n""").getOrElse("")
    val schemaLine = schemaAction.map(a => s""""schema_action": $a,\n""").getOrElse("")
    val json =
      s"""{"version": $version,
         |$txnLine$schemaLine"add": [${adds.map { case (f, b) => s"""{"file": "$f", "bucket": $b}""" }.mkString(", ")}],
         |"remove": [${removes.map(f => s""""$f"""").mkString(", ")}]}""".stripMargin
    val tmp = versionsDir(dir).resolve(s".$version.json.tmp")
    Files.writeString(tmp, json)
    // rename-into-place: the commit point
    Files.move(tmp, versionsDir(dir).resolve(s"$version.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  // ------------------------------------------------------------------
  // Logical column mapping (Delta-style): data files are IMMUTABLE, so
  // rename/drop never rewrite a byte — the PHYSICAL column name in every
  // file (past and future) stays the name the column was born with, and
  // manifests carry metadata-only schema actions that readers fold into
  // a physical→logical mapping as of their version. Time travel to a
  // pre-action version folds fewer actions and sees the old shape.
  // ------------------------------------------------------------------

  private val colNameRe = "[A-Za-z0-9._-]+"
  private val renameRe =
    """"schema_action": \{"op": "rename", "from": "([^"]+)", "to": "([^"]+)"\}""".r
  private val dropRe = """"schema_action": \{"op": "drop", "col": "([^"]+)"\}""".r

  /** The fold of all schema actions up to a version: which physical
    * columns now surface under which logical name, and which are gone. */
  private[eth] case class SchemaState(renames: Map[String, String],
                                      dropped: Set[String]) {
    def logicalOf(physical: String): String = renames.getOrElse(physical, physical)
    def physicalOf(logical: String): String =
      renames.collectFirst { case (p, l) if l == logical => p }.getOrElse(logical)
    def isIdentity: Boolean = renames.isEmpty && dropped.isEmpty
  }

  private def foldAction(st: SchemaState, action: (String, String, String)): SchemaState =
    action match {
      case ("rename", from, to) =>
        val p = st.physicalOf(from)
        if (p == to) SchemaState(st.renames - p, st.dropped)
        else SchemaState(st.renames + (p -> to), st.dropped)
      case ("drop", c, _) =>
        val p = st.physicalOf(c)
        SchemaState(st.renames - p, st.dropped + p)
      case (op, _, _) => sys.error(s"unknown schema action '$op'")
    }

  private def actionsIn(txt: String): Seq[(String, String, String)] =
    (renameRe.findAllMatchIn(txt).map(m => ("rename", m.group(1), m.group(2))) ++
      dropRe.findAllMatchIn(txt).map(m => ("drop", m.group(1), ""))).toSeq

  /** Schema state as of `asOf` (0 = identity). Replays from the nearest
    * checkpoint — checkpoints snapshot the CUMULATIVE action list, so
    * vacuuming manifests below a checkpoint loses no rename/drop.
    *
    * Checkpoint actions are applied LITERALLY, never through
    * [[foldAction]]: a checkpoint's rename/drop list is the already-folded
    * state keyed by PHYSICAL names, while foldAction resolves its `from`/
    * `col` operands via physicalOf as user-level logical names. Refolding
    * a physical-keyed snapshot that way is not a fixpoint when a rename
    * target reuses another column's physical name — e.g. state {a→b, b→c}
    * refolds to {a→c} (columns silently mislabeled), and {renames {p→x},
    * dropped {x}} refolds to {dropped {p}} (the dropped column's bytes
    * resurrect and the live column vanishes) — and every vacuum()
    * checkpoints, so a routine vacuum would corrupt all subsequent reads. */
  private[eth] def schemaState(dir: String, asOf: Long): SchemaState = {
    if (asOf <= 0) return SchemaState(Map.empty, Set.empty)
    val cp = checkpointAtOrBefore(dir, asOf)
    var st = SchemaState(Map.empty, Set.empty)
    if (cp != 0L) {
      val txt = Files.readString(versionsDir(dir).resolve(s"$cp.checkpoint.json"))
      actionsIn(txt).foreach {
        case ("rename", p, l) => st = SchemaState(st.renames + (p -> l), st.dropped)
        case ("drop", p, _)   => st = SchemaState(st.renames, st.dropped + p)
        case (op, _, _)       => sys.error(s"unknown schema action '$op'")
      }
    }
    var v = cp + 1
    while (v <= asOf) {
      val mf = versionsDir(dir).resolve(s"$v.json")
      if (Files.exists(mf)) actionsIn(Files.readString(mf)).foreach(a => st = foldAction(st, a))
      v += 1
    }
    st
  }

  /** Project a physically-named frame to its logical shape as of a
    * state: dropped physicals vanish, renamed physicals surface under
    * their current logical name. */
  private def toLogical(st: SchemaState, df: DataFrame): DataFrame =
    if (st.isIdentity) df
    else df.select(df.columns.toIndexedSeq
      .filterNot(st.dropped.contains)
      .map(c => col(c).as(st.logicalOf(c))): _*)

  /** Rename a physically-named frame's columns FROM logical names the
    * caller used TO the physical names files carry. */
  private def toPhysical(st: SchemaState, df: DataFrame): DataFrame =
    if (st.isIdentity) df
    else df.columns.foldLeft(df) { (d, c) =>
      val p = st.physicalOf(c)
      if (p == c) d else d.withColumnRenamed(c, p)
    }

  /** Metadata-only commit: logically rename a column. No data file is
    * touched — new AND old files keep the physical name; readers at or
    * after the returned version see `to`, time travel before it sees
    * `from`. `to` must not collide with a live logical column (enforced
    * against the mapping; callers own not colliding with a physical
    * data column the mapping has never touched). */
  def renameColumn(dir: String, from: String, to: String): Long = {
    require(from != to, s"rename to self: $from")
    require(from.matches(colNameRe) && to.matches(colNameRe),
      s"column names must match $colNameRe")
    val ndir = norm(dir)
    val prev = latestVersion(ndir)
    require(prev >= 1, "renameColumn needs an existing table")
    val st = schemaState(ndir, prev)
    require(!st.dropped.contains(st.physicalOf(from)),
      s"cannot rename dropped column '$from'")
    require(!st.renames.values.exists(_ == to),
      s"logical name '$to' is already mapped")
    writeManifest(ndir, prev + 1, Seq.empty, Seq.empty,
      schemaAction = Some(s"""{"op": "rename", "from": "$from", "to": "$to"}"""))
    prev + 1
  }

  /** Metadata-only commit: logically drop a column. Files keep the bytes
    * (time travel still reads them); readers at or after the returned
    * version never see the column. The dropped PHYSICAL name (the
    * column's storage name — its original name, through any renames) is
    * RETIRED: committing a column under it is rejected (no physical id
    * indirection in this reduced log, so reuse would resurrect old
    * bytes). Re-adding the dropped LOGICAL name therefore works only
    * when the column had been renamed at some point (its logical name
    * differs from its retired physical name — the re-add becomes a
    * fresh physical column); dropping a never-renamed column retires
    * its name outright, and a re-add must pick a new name. */
  def dropColumn(dir: String, colName: String): Long = {
    require(colName.matches(colNameRe), s"column names must match $colNameRe")
    val ndir = norm(dir)
    val prev = latestVersion(ndir)
    require(prev >= 1, "dropColumn needs an existing table")
    val st = schemaState(ndir, prev)
    require(!st.dropped.contains(st.physicalOf(colName)),
      s"column '$colName' is already dropped")
    writeManifest(ndir, prev + 1, Seq.empty, Seq.empty,
      schemaAction = Some(s"""{"op": "drop", "col": "$colName"}"""))
    prev + 1
  }

  private def parseManifest(dir: String, version: Long): (Seq[(String, Long)], Seq[String]) = {
    val txt = Files.readString(versionsDir(dir).resolve(s"$version.json"))
    val addRe = """\{"file": "([^"]+)", "bucket": (-?\d+)\}""".r
    val adds = addRe.findAllMatchIn(
      txt.substring(txt.indexOf("\"add\""), txt.indexOf("\"remove\"")))
      .map(m => (m.group(1), m.group(2).toLong)).toSeq
    val removeSection = txt.substring(txt.indexOf("\"remove\""))
    val remRe = """"([^"]+)"""".r
    val removes = remRe.findAllMatchIn(removeSection).map(_.group(1)).toSeq
      .filterNot(_ == "remove")
    (adds, removes)
  }

  /** Highest checkpoint version ≤ `asOf`, 0 if none. A checkpoint is a
    * full active-set snapshot (`<v>.checkpoint.json`) that lets replay
    * start mid-chain — the standard Delta-checkpoint move, and what
    * makes [[vacuum]]'s manifest truncation safe. */
  private def checkpointAtOrBefore(dir: String, asOf: Long): Long = {
    val vd = versionsDir(dir)
    if (!Files.isDirectory(vd)) return 0L
    val it = Files.list(vd)
    try {
      var best = 0L
      val i = it.iterator()
      while (i.hasNext) {
        val n = i.next().getFileName.toString
        if (n.endsWith(".checkpoint.json")) {
          val v = n.stripSuffix(".checkpoint.json").toLong
          if (v <= asOf) best = math.max(best, v)
        }
      }
      best
    } finally it.close()
  }

  /** The active (file, bucket) set as of `asOf` (manifest replay from the
    * nearest checkpoint — metadata-sized, driver-side by design). Fails
    * if `asOf` predates the retention horizon ([[vacuum]]). */
  def activeFiles(dir: String, asOf: Long): Seq[(String, Long)] = {
    require(asOf >= 1, s"versions start at 1, got $asOf")
    val cp = checkpointAtOrBefore(dir, asOf)
    var active: Map[String, Long] =
      if (cp == 0L) Map.empty
      else {
        val txt = Files.readString(versionsDir(dir).resolve(s"$cp.checkpoint.json"))
        val addRe = """\{"file": "([^"]+)", "bucket": (-?\d+)\}""".r
        addRe.findAllMatchIn(txt).map(m => (m.group(1), m.group(2).toLong)).toMap
      }
    var v = cp + 1
    while (v <= asOf) {
      val (adds, removes) = parseManifest(dir, v)
      active = active -- removes
      active = active ++ adds
      v += 1
    }
    active.toSeq.sortBy(_._1)
  }

  /** Snapshot version `v`'s full active set — plus the CUMULATIVE schema
    * action list, so manifest truncation below the checkpoint cannot
    * lose a rename/drop — so replay can start there. */
  def checkpoint(dir: String, v: Long): Unit = {
    val files = activeFiles(dir, v)
    val st = schemaState(dir, v)
    // re-emit the folded state as a minimal action list keyed by PHYSICAL
    // column name. This is already-folded state, NOT a replayable log:
    // the reader must apply these actions literally (see the schemaState
    // doc) — re-folding a rename chain a→b→c collapsed to a→c through
    // the fold logic again is not a fixpoint and corrupts the mapping.
    val actions =
      st.renames.toSeq.sortBy(_._1).map { case (p, l) =>
        s"""{"schema_action": {"op": "rename", "from": "$p", "to": "$l"}}""" } ++
      st.dropped.toSeq.sorted.map(p =>
        s"""{"schema_action": {"op": "drop", "col": "$p"}}""")
    val json = s"""{"checkpoint": $v, "schema": [${actions.mkString(", ")}],
      |"active": [${files.map { case (f, b) =>
      s"""{"file": "$f", "bucket": $b}""" }.mkString(", ")}]}""".stripMargin
    val tmp = versionsDir(dir).resolve(s".$v.checkpoint.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, versionsDir(dir).resolve(s"$v.checkpoint.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Retention enforcement: keep every version in [`minVersion`, latest]
    * readable, physically delete everything only older versions
    * referenced. Checkpoints `minVersion` first (so truncating the
    * manifest chain below it is safe), then removes (a) data files not
    * active in ANY retained version and (b) manifests before the
    * checkpoint. Time travel below `minVersion` then fails by contract —
    * the same semantics as Delta VACUUM's retention window. Returns the
    * number of data files deleted. */
  def vacuum(dir: String, minVersion: Long): Int = {
    val latest = latestVersion(dir)
    require(minVersion >= 1 && minVersion <= latest,
      s"minVersion must be in [1, $latest], got $minVersion")
    checkpoint(dir, minVersion)
    val keep = (minVersion to latest)
      .flatMap(v => activeFiles(dir, v).map(_._1)).toSet
    // walk data/: delete any parquet file no retained version references
    // (walk from the same canonical root the manifests were written
    // against, so path strings compare equal)
    var deleted = 0
    val dataDir = Paths.get(norm(dir), "data")
    if (Files.isDirectory(dataDir)) {
      val walk = Files.walk(dataDir)
      try {
        val it = walk.iterator()
        val toDelete = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet") &&
            !keep.contains(p.toString)) toDelete += p
        }
        toDelete.foreach { p => Files.deleteIfExists(p); deleted += 1 }
      } finally walk.close()
    }
    // truncate the manifest chain below the checkpoint
    var v = 1L
    while (v < minVersion) {
      Files.deleteIfExists(versionsDir(dir).resolve(s"$v.json"))
      v += 1
    }
    deleted
  }

  /** Read the table as of a version (default: latest). A nonexistent /
    * empty table resolves to version 0 and reads as the documented empty
    * frame rather than tripping activeFiles' `asOf >= 1` contract.
    * `mergeSchema` makes reads correct across schema evolution: a
    * version whose active set mixes pre- and post-evolution files (an
    * untouched bucket still carried by reference) widens to the union
    * schema with nulls for the missing column, while time travel to a
    * pre-evolution version — whose active set is all-old files — yields
    * exactly the old schema. Rename/drop evolution is LOGICAL (no file
    * rewrite): the schema state as of `asOf` projects physical file
    * columns to their logical names and hides dropped ones — time travel
    * before the action sees the pre-action shape. */
  def readAt(spark: SparkSession, dir: String, asOf: Long = -1L): DataFrame = {
    val v = if (asOf == -1L) latestVersion(dir) else asOf
    if (v == 0L) return spark.emptyDataFrame
    val files = activeFiles(dir, v).map(_._1)
    if (files.isEmpty) spark.emptyDataFrame
    else toLogical(schemaState(dir, v),
      spark.read.option("mergeSchema", "true").parquet(files: _*).drop("__pv"))
  }

  /** The version a transaction id was committed as, None if never.
    * Driver-side scan of the manifest chain (metadata-sized; vacuumed
    * manifests are gone, so retention must cover the replay horizon —
    * the same contract as Delta's txn retention). */
  def txnVersion(dir: String, txnId: String): Option[Long] = {
    val vd = versionsDir(dir)
    if (!Files.isDirectory(vd)) return None
    val needle = s""""txn": "$txnId""""
    val it = Files.list(vd)
    try {
      val i = it.iterator()
      var found: Option[Long] = None
      while (i.hasNext && found.isEmpty) {
        i.next().getFileName.toString match {
          case manifestName(v) =>
            if (Files.readString(vd.resolve(s"$v.json")).contains(needle))
              found = Some(v.toLong)
          case _ =>
        }
      }
      found
    } finally it.close()
  }

  /** Exactly-once commit for streaming replay (the foreachBatch
    * contract): `txnId` (e.g. "query7-batch42") is recorded in the
    * manifest at the commit point; replaying the SAME txnId — a restart
    * re-running a batch whose commit already landed — is a no-op that
    * returns the original version instead of double-applying the batch.
    * The check and the manifest write are driver-side and ordered
    * (single-writer contract, like [[commit]]); data written by a crash
    * BEFORE the manifest rename is invisible and re-written by the
    * replay — the same recovery story the crash-injection specs pin for
    * the manifest protocol. */
  def commitTxn(df: DataFrame, dir: String, pkCols: Seq[String],
                bucketCol: String, txnId: String,
                deleteWhere: Option[Column] = None): Long = {
    require(txnId.matches("[A-Za-z0-9._-]+"),
      s"txn id must be [A-Za-z0-9._-]+, got '$txnId'")
    txnVersion(dir, txnId).getOrElse(
      commit(df, dir, pkCols, bucketCol, deleteWhere, txnId = Some(txnId)))
  }

  /** Change-data read between two committed versions — Delta CDF's
    * answer to "what changed between v_from and v_to", reconstructed
    * from the manifests alone. Returns one row per changed PK:
    * `change_type` ('insert' | 'update' | 'delete') + the data columns
    * (new image for insert/update, old image for delete). Same-PK
    * rewrites with identical content are NOT changes and don't appear.
    *
    * Scale shape — the load-bearing trick: data files are immutable and
    * buckets carry forward BY REFERENCE, so any bucket whose file list
    * is string-identical in both manifests provably has identical
    * content and is pruned WITHOUT A SCAN. Only the touched buckets'
    * files are read (both sides), full-outer-joined on the PK (one
    * key shuffle), and classified with null-safe column compares. A
    * 100 TB table with one hot bucket diffs at the cost of that bucket. */
  def diff(spark: SparkSession, dir: String, fromV: Long, toV: Long,
           pkCols: Seq[String]): DataFrame = {
    val latest = latestVersion(dir)
    require(fromV >= 1 && fromV < toV && toV <= latest,
      s"need 1 <= fromV < toV <= $latest, got ($fromV, $toV)")
    def byBucket(v: Long): Map[Long, Seq[String]] =
      activeFiles(dir, v).groupBy(_._2).map { case (b, fs) =>
        b -> fs.map(_._1).sorted
      }
    val from = byBucket(fromV); val to = byBucket(toV)
    val changed = (from.keySet ++ to.keySet)
      .filter(b => from.get(b) != to.get(b)).toSeq.sorted
    val oldFiles = changed.flatMap(b => from.getOrElse(b, Nil))
    val newFiles = changed.flatMap(b => to.getOrElse(b, Nil))
    // both sides surface in toV's LOGICAL schema (rename/drop mapping):
    // the diff answers "what changed, as the table reads today(=toV)" —
    // a column dropped by toV is invisible on the old side too
    val stTo = schemaState(dir, toV)
    def read(fs: Seq[String]): Option[DataFrame] =
      if (fs.isEmpty) None
      else Some(toLogical(stTo, spark.read.option("mergeSchema", "true")
        .parquet(fs: _*).drop("__pv")))
    (read(oldFiles), read(newFiles)) match {
      case (None, None) =>
        // no bucket changed: return an EMPTY frame with the documented
        // shape (change_type + the table's columns at toV) so callers
        // that reference columns (orderBy("change_type"), selects) get
        // zero rows, not an AnalysisException from a schemaless frame
        val base = readAt(spark, dir, toV)
        val fields = org.apache.spark.sql.types.StructField(
          "change_type", org.apache.spark.sql.types.StringType) +: base.schema.fields.toIndexedSeq
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(fields))
      case (None, Some(nw)) =>
        nw.select(lit("insert").as("change_type") +: nw.columns.toIndexedSeq.map(col): _*)
      case (Some(od), None) =>
        od.select(lit("delete").as("change_type") +: od.columns.toIndexedSeq.map(col): _*)
      case (Some(od0), Some(nw)) =>
        val cols = nw.columns.toIndexedSeq
        // align the old side to the new schema (add-column evolution:
        // pre-evolution rows compare as null in the new column)
        val od = od0.select(cols.map { c =>
          if (od0.columns.contains(c)) col(c)
          else lit(null).cast(nw.schema(c).dataType).as(c)
        }: _*)
        val o = od.select(cols.map(c => col(c).as(s"__o_$c")): _*)
        val joined = nw.join(o,
          pkCols.map(k => nw(k) <=> col(s"__o_$k")).reduce(_ && _), "full_outer")
        val isDelete = nw(pkCols.head).isNull
        val isInsert = col(s"__o_${pkCols.head}").isNull
        val valCols = cols.filterNot(pkCols.contains)
        val differs = valCols.map(c => !(nw(c) <=> col(s"__o_$c")))
          .foldLeft(lit(false))(_ || _)
        joined
          .withColumn("change_type",
            when(isDelete, lit("delete")).when(isInsert, lit("insert"))
              .when(differs, lit("update")))
          .filter(col("change_type").isNotNull)
          .select(col("change_type") +: cols.map { c =>
            // delete rows carry the old image (the new side is all null)
            when(col("change_type") === "delete", col(s"__o_$c"))
              .otherwise(nw(c)).as(c)
          }: _*)
    }
  }

  /** Commit a batch: bucket-granular upsert producing version
    * latest+1. Returns the new version number.
    *
    * `deleteWhere` (the MERGE "when matched delete" arm): after the
    * upsert merge, rows of the TOUCHED buckets matching the predicate
    * are dropped from the new version. Scoped to touched buckets by
    * construction — a delete targeting an untouched bucket must include
    * a row for that bucket in `df` (or be applied as its own commit);
    * this is the same locality contract as the upsert itself, and it is
    * what keeps commit cost proportional to touched data. A bucket
    * whose rows all die is written as an empty bucket (old file
    * removed, no new file added). */
  def commit(df: DataFrame, dir: String, pkCols: Seq[String],
             bucketCol: String, deleteWhere: Option[Column] = None,
             txnId: Option[String] = None): Long = {
    val spark = df.sparkSession
    val ndir = norm(dir)
    val prev = latestVersion(ndir)
    // column mapping: callers speak LOGICAL names; files speak physical.
    // Translate the batch (and the pk/bucket designators) to physical so
    // every file the table ever writes stays name-uniform, and reject a
    // column that would resurrect a dropped physical's bytes.
    val st0 = schemaState(ndir, prev)
    df.columns.foreach { c =>
      require(!st0.dropped.contains(st0.physicalOf(c)),
        s"Versioned.commit: column '$c' was dropped — dropped physical " +
          "names are retired; re-add it under a new name")
    }
    val dfP = toPhysical(st0, df)
    val pkColsP = pkCols.map(st0.physicalOf)
    val bucketColP = st0.physicalOf(bucketCol)
    commitPhysical(dfP, spark, ndir, prev, pkColsP, bucketColP,
      deleteWhere, txnId, st0)
  }

  private def commitPhysical(df: DataFrame,
                             spark: SparkSession, ndir: String, prev: Long,
                             pkCols: Seq[String], bucketCol: String,
                             deleteWhere: Option[Column],
                             txnId: Option[String],
                             st: SchemaState): Long = {
    val v = prev + 1
    val touchedRows = df.select(col(bucketCol).cast("long")).distinct().collect()
    require(!touchedRows.exists(_.isNullAt(0)),
      s"Versioned.commit: null $bucketCol — null buckets are not addressable")
    val touched = touchedRows.map(_.getLong(0)).toIndexedSeq
    val touchedSet = touched.toSet

    // merge incoming with the touched buckets' current rows (incoming wins)
    val merged =
      if (prev == 0) df
      else {
        val curFiles = activeFiles(ndir, prev)
          .filter(fb => touchedSet.contains(fb._2)).map(_._1)
        if (curFiles.isEmpty) df
        else {
          // schema evolution (add-column across commits): a touched
          // bucket's carried-forward rows may predate a column the new
          // batch carries — align to the NEW schema with typed nulls so
          // the rewritten bucket lands fully evolved, while untouched
          // buckets keep their old files (readAt merges schemas).
          val old0 = spark.read.option("mergeSchema", "true")
            .parquet(curFiles: _*).drop("__pv")
          val old = old0.select(df.columns.toIndexedSeq.map { c =>
            if (old0.columns.contains(c)) col(c)
            else lit(null).cast(df.schema(c).dataType).as(c)
          }: _*)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(pkCols.map(col).toIndexedSeq: _*)
            .orderBy(col("__src"))
          df.withColumn("__src", lit(0))
            .unionByName(old.withColumn("__src", lit(1)))
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__src", "__rn")
        }
      }

    // MERGE delete arm: applied to the merged content of the touched
    // buckets, so a PK that is both upserted and delete-matched dies
    // (delete wins — it is evaluated on the post-merge image). The
    // predicate references LOGICAL names (caller vocabulary), so it is
    // evaluated on the logical projection and the survivors translate
    // back to physical for the write.
    val finalDf = deleteWhere
      .map(c => toPhysical(st, toLogical(st, merged).filter(!c)))
      .getOrElse(merged)

    // one job: every touched bucket's full new content, one file per
    // bucket dir (repartition by the partition column pins 1:1)
    val commitDir = s"$ndir/data/v$v"
    finalDf.withColumn("__pv", col(bucketCol).cast("long"))
      .repartition(col("__pv"))
      .write.partitionBy("__pv").mode("overwrite").parquet(commitDir)

    // discover written files (driver listing, bounded by touched buckets)
    val adds: Seq[(String, Long)] = touched.sorted.flatMap { b =>
      val bd = Paths.get(commitDir, s"__pv=$b")
      if (!Files.isDirectory(bd)) Seq.empty[(String, Long)]
      else {
        val it = Files.list(bd)
        try {
          val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
          val i = it.iterator()
          while (i.hasNext) {
            val p = i.next()
            if (p.getFileName.toString.endsWith(".parquet"))
              buf += ((p.toString, b))
          }
          buf.toSeq
        } finally it.close()
      }
    }
    val removes =
      if (prev == 0) Seq.empty[String]
      else activeFiles(ndir, prev).filter(fb => touchedSet.contains(fb._2)).map(_._1)
    writeManifest(ndir, v, adds, removes, txnId)
    v
  }
}
