package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Transactional Delta Lake writer — append / overwrite through the
  * PUBLIC commit protocol (github.com/delta-io/delta PROTOCOL.md),
  * completing the [[DeltaRead]] interop loop: the engine can now
  * produce tables any Delta reader consumes, not only consume them.
  * (The reference's upload blueprint, upload_file.py:174-217, moves
  * opaque objects; this is the table-formatted upsert a lake actually
  * wants.)
  *
  * Write path (the real writers' shape):
  *  1. **Data first, invisibly.** The DataFrame writes as parquet into
  *     a `_staging-<nonce>` dir INSIDE the table, then each part file
  *     renames (same-FS, O(1) metadata op) to its final
  *     `<part>=<val>/...` location. Files not referenced by a
  *     committed log entry are invisible to every Delta reader, so a
  *     crash here leaves only orphans (VACUUM-class garbage, never
  *     corruption).
  *  2. **Stats.** One Spark aggregate over the fresh files only
  *     (grouped by `_metadata.file_path`) collects per-file numRecords
  *     and long-column min/max — the inputs of metadata-only counts
  *     and zone-map skipping. Real writers fold this into the write
  *     itself; the extra pass here touches only this commit's data,
  *     never the table.
  *  3. **Commit = ONE create-exclusive JSON** at the next version.
  *     Version collision means a concurrent writer won that number:
  *     appends re-validate the schema and retry at the new tip
  *     (appends conflict with nothing but metadata changes);
  *     overwrites re-snapshot so the remove set covers the winner's
  *     files too. Bounded retries, loud failure.
  *
  * Scope guards (refuse loudly, never corrupt): existing tables must
  * replay under [[DeltaRead]]'s reader-v1 gate, need
  * minWriterVersion <= 2 with no writerFeatures, and must not set
  * `delta.appendOnly` when overwriting; schemas must match the table
  * exactly (field names + types; nullability ignored) — evolution is
  * a different operation, not a silent side effect of a write.
  */
object DeltaWrite {

  private val mapper = new ObjectMapper()

  private def fail(path: String, why: String): Nothing =
    throw new IllegalArgumentException(s"DeltaWrite: $path — $why")

  /** One freshly written data file, ready for its add action. */
  private final case class NewFile(
      relPath: String,
      size: Long,
      partitionValues: Map[String, Option[String]],
      stats: Option[String])

  /** Append `df` to the Delta table at `tablePath`, creating the table
    * (version 0: protocol + metaData + adds) when no `_delta_log`
    * exists. Returns the committed version.
    */
  def append(
      df: DataFrame,
      tablePath: String,
      partitionBy: Seq[String] = Seq.empty,
      collectStats: Boolean = true,
      maxRetries: Int = 10,
      beforeCommit: () => Unit = () => ()): Long =
    write(df, tablePath, partitionBy, overwrite = false, collectStats,
      maxRetries, beforeCommit, txn = None).get

  /** Idempotent append — the protocol's `txn` action: the commit
    * carries (appId, txnVersion), and an append whose txnVersion is
    * already <= the table's last committed version for that appId is
    * SKIPPED (returns None). This is the exactly-once streaming sink
    * primitive: foreachBatch replays after a crash re-offer the same
    * (appId, batchId) and no-op instead of duplicating rows. The check
    * re-runs inside the version-race retry loop, so a concurrent
    * replay of the same batch cannot double-commit either.
    */
  def idempotentAppend(
      df: DataFrame,
      tablePath: String,
      appId: String,
      txnVersion: Long,
      partitionBy: Seq[String] = Seq.empty,
      collectStats: Boolean = true,
      maxRetries: Int = 10,
      beforeCommit: () => Unit = () => ()): Option[Long] = {
    val spark = df.sparkSession
    if (lastTxnVersion(spark, tablePath, appId) >= txnVersion) None
    else write(df, tablePath, partitionBy, overwrite = false,
      collectStats, maxRetries, beforeCommit,
      txn = Some((appId, txnVersion)))
  }

  /** Replace the table's live content with `df` (remove every live
    * file + add the new ones, one atomic commit). The table must
    * exist. Returns the committed version.
    */
  def overwrite(
      df: DataFrame,
      tablePath: String,
      partitionBy: Seq[String] = Seq.empty,
      collectStats: Boolean = true,
      maxRetries: Int = 10,
      beforeCommit: () => Unit = () => ()): Long =
    write(df, tablePath, partitionBy, overwrite = true, collectStats,
      maxRetries, beforeCommit, txn = None).get

  /** MERGE (CDC upsert) — copy-on-write, the real engines' shape:
    * rows of `updates` matched on `keyCols` REPLACE the table's rows,
    * unmatched rows INSERT, and rows whose `deleteCol` (when given) is
    * true DELETE their key. Only data files that actually CONTAIN a
    * matched key are rewritten (found by one semi-join over a
    * file-path-carrying scan); every other file rides along untouched
    * — at 100 TB a merge touching 0.1% of keys rewrites ~0.1% of the
    * table, not all of it. One atomic commit: removes(affected files)
    * + adds(rewritten survivors ∪ upserts).
    *
    * Guards: `updates` must be key-unique (an ambiguous multi-update
    * of one key refuses — SQL MERGE semantics); keys must be
    * non-partition data columns; schema (minus `deleteCol`) must
    * match the table; `delta.appendOnly` refuses (a merge removes
    * files). A concurrent commit between snapshot and commit refuses
    * with a rerun message UNLESS it provably changed nothing about
    * the live file set — merge correctness is defined against the
    * snapshot it read, and silently retrying against a moved table
    * would re-apply the merge to state it never saw.
    *
    * Returns the committed version.
    */
  def merge(
      updates: DataFrame,
      tablePath: String,
      keyCols: Seq[String],
      deleteCol: Option[String] = None,
      collectStats: Boolean = true,
      maxRetries: Int = 10,
      beforeCommit: () => Unit = () => ()): Long = {
    val spark = updates.sparkSession
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val logDir = new Path(root, "_delta_log")
    if (!fs.exists(logDir) || fs.listStatus(logDir).isEmpty)
      fail(tablePath, "merge into a non-existent table")
    val snap = DeltaRead.snapshot(spark, tablePath)
    // missing generated columns compute (insert shape) before the
    // schema gate; provided ones get validated with the other row
    // obligations below
    val updates2 = completeGenerated(snap, updates)
    val dataDf = deleteCol.fold(updates2)(updates2.drop(_))
    checkSchema(tablePath, dataDf.schema, snap.partitionColumns, snap)
    writerGate(spark, fs, logDir, root, overwrite = true)
    keyCols.foreach { k =>
      if (!dataDf.columns.contains(k))
        fail(tablePath, s"merge key '$k' not in updates")
      if (snap.partitionColumns.contains(k))
        fail(tablePath, s"merge key '$k' is a partition column — " +
          "key lookup happens inside data files; repartition-key " +
          "merges are an overwrite, not a merge")
    }
    deleteCol.foreach { d =>
      if (!updates.columns.contains(d))
        fail(tablePath, s"deleteCol '$d' not in updates")
    }
    // updates is referenced three times (dup check, semi, anti) —
    // stage it once (scratch-truncation rule)
    val upd = graft.ScratchSpace.materialize(updates2, "delta_merge_upd_")
    val keyExprs = keyCols.map(col)
    val dup = upd.groupBy(keyExprs: _*).count()
      .where(col("count") > 1).limit(1).count()
    if (dup > 0)
      fail(tablePath, "updates contain duplicate keys — an ambiguous " +
        "multi-update of one key; dedupe upstream (keep-latest) first")
    // candidate pruning BEFORE the scan: with a single long-typed key
    // and written stats, a file whose [min,max] cannot overlap the
    // update keys' global range provably contains no match — the
    // zone-map prune every real engine runs. At 100 TB this turns the
    // affected-file discovery from a full-table key scan into a scan
    // of the candidate files only (conservative superset: the
    // semi-join below still computes the EXACT affected set).
    val candidates: Seq[DeltaRead.DeltaFile] =
      if (keyCols.size == 1 &&
        snap.schema(keyCols.head).dataType ==
          org.apache.spark.sql.types.LongType) {
        val k = keyCols.head
        val mm = upd.agg(
          min(col(k)).cast("long"), max(col(k)).cast("long")).head()
        if (mm.isNullAt(0)) Seq.empty // no update keys at all
        else {
          val (lo, hi) = (mm.getLong(0), mm.getLong(1))
          snap.liveFiles.filter(f =>
            DeltaRead.statsOverlap(f.stats, k, lo, hi))
        }
      } else snap.liveFiles
    // affected files: those holding at least one matched key
    val tbl = DeltaRead.scanFiles(spark, tablePath, snap, candidates,
      keepFile = true)
    val affected = tbl
      .join(upd.select(keyExprs: _*), keyCols, "left_semi")
      .select(col("__delta_file")).distinct()
      .collect().map(_.getString(0)).toSet
    val affectedFiles = snap.liveFiles
      .filter(f => affected.contains(DeltaRead.fileKey(fs, root, f)))
    // rewrite: survivors of the affected files + non-delete upserts.
    // The affected list is log-grain metadata (<= MaxLogFiles), so it
    // broadcasts; never an In-list in the plan.
    val affectedDf = {
      import spark.implicits._
      affected.toSeq.toDF("__delta_file")
    }
    val survivors = tbl
      .join(broadcast(affectedDf), Seq("__delta_file"), "left_semi")
      .join(upd.select(keyExprs: _*), keyCols, "left_anti")
      .drop("__delta_file")
    val inserts = deleteCol.fold(upd)(d =>
      upd.where(!coalesce(col(d).cast("boolean"), lit(false))).drop(d))
    val newData = survivors.unionByName(
      inserts.select(snap.schema.map(f => col(f.name)): _*))
    // row obligations: survivors pass by induction, but the upserts
    // are fresh rows — one aggregate over the whole rewrite set
    enforceRowObligations(tablePath, snap, newData)
    val newFiles = writeData(spark, fs, root, newData,
      snap.partitionColumns, collectStats)
    // change-data-feed obligation: when the table enables CDF, a
    // merge commit must carry cdc actions describing every row-level
    // change — downstream [[DeltaRead.readCdf]] consumers replay them
    // instead of refusing on the update-shape (remove+add) commit
    val cdfEnabled = snap.configuration
      .get("delta.enableChangeDataFeed").contains("true")
    val cdcActions: Seq[String] =
      if (!cdfEnabled) Seq.empty
      else {
        if (snap.partitionColumns.nonEmpty)
          fail(tablePath, "CDF merge on a PARTITIONED table is " +
            "unsupported (cdc files would need per-partition layout); " +
            "merge refused rather than dropping change data")
        val isDel = deleteCol
          .map(d => coalesce(col(d).cast("boolean"), lit(false)))
          .getOrElse(lit(false))
        val updKeyFlag = upd
          .withColumn("__is_del", isDel)
          .select((keyExprs :+ col("__is_del")): _*)
        // matched pre-rows: delete rows emit 'delete', updated rows
        // emit 'update_preimage'; the post-rows split by whether the
        // key existed (postimage) or is new (insert)
        val pre = tbl.drop("__delta_file")
          .join(updKeyFlag, keyCols, "inner")
          .withColumn("_change_type",
            when(col("__is_del"), lit("delete"))
              .otherwise(lit("update_preimage")))
          .drop("__is_del")
        val tblKeys = tbl.select(keyExprs: _*).distinct()
        val postExisting = inserts
          .join(tblKeys, keyCols, "left_semi")
          .withColumn("_change_type", lit("update_postimage"))
        val postNew = inserts
          .join(tblKeys, keyCols, "left_anti")
          .withColumn("_change_type", lit("insert"))
        val changes = pre.unionByName(postExisting).unionByName(postNew)
          .select(snap.schema.map(f => col(f.name)) :+
            col("_change_type"): _*)
        writeChangeData(spark, fs, root, changes).map {
          case (rel, size) => DeltaFixture.cdcLine(rel, size)
        }
      }
    beforeCommit()
    val lines = Seq.newBuilder[String]
    lines += commitInfoLine("Merge")
    cdcActions.foreach(lines += _)
    affectedFiles.foreach(f => lines += DeltaFixture.removeLine(f.path))
    newFiles.foreach { f =>
      lines += DeltaFixture.addLine(
        f.relPath, f.size, f.partitionValues, stats = f.stats)
    }
    var version = snap.version + 1
    var attempts = 0
    while (!tryCommit(fs, logDir, version, lines.result())) {
      attempts += 1
      if (attempts > maxRetries)
        fail(tablePath, s"merge lost $maxRetries version races — " +
          "a committer is racing this merge; rerun against the new state")
      // a concurrent commit exists: safe only if the table state this
      // merge computed against is PROVABLY unchanged — live (path, DV)
      // set AND schema AND partition columns AND configuration. The DV
      // half matters: a concurrent DV deleteWhere keeps the PATH set
      // identical while masking rows, and this merge's survivors were
      // computed from the pre-DV scan — committing them would
      // resurrect the concurrently deleted rows.
      val now = DeltaRead.snapshot(spark, tablePath)
      val same =
        now.liveFiles.map(f => (f.path, f.dv)).sortBy(_._1) ==
          snap.liveFiles.map(f => (f.path, f.dv)).sortBy(_._1) &&
        now.schema == snap.schema &&
        now.partitionColumns == snap.partitionColumns &&
        now.configuration == snap.configuration
      if (!same)
        fail(tablePath, "concurrent commit changed the table state " +
          "(live files, schema, partitioning, or configuration) " +
          "during merge — rerun the merge against the new state " +
          "(staged files are inert orphans)")
      version = DeltaRead.versions(spark, tablePath).max + 1
    }
    version
  }

  /** What [[vacuum]] found and (unless dryRun) deleted. */
  final case class VacuumReport(
      removed: Seq[String],
      liveKept: Long,
      recentKept: Long)

  /** VACUUM — delete data files under the table that the CURRENT
    * snapshot does not reference and whose modification time is older
    * than `retainMs` (default 7 days, the engines' standard): the
    * cleanup pass for overwrite/merge tombstones and crashed-writer
    * orphans (staging dirs included). The retention window is what
    * keeps this safe against in-flight writers — their staged-but-
    * uncommitted files are younger than any sane retention — and,
    * exactly like the real engines, time travel to versions whose
    * files were vacuumed stops working (the LOG stays; the data is
    * gone). Never touches `_delta_log`.
    */
  def vacuum(
      spark: SparkSession,
      tablePath: String,
      retainMs: Long = 7L * 24 * 3600 * 1000,
      dryRun: Boolean = false): VacuumReport = {
    require(retainMs >= 0, s"retainMs $retainMs < 0")
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val snap = DeltaRead.snapshot(spark, tablePath)
    // live = data paths PLUS their deletion-vector sidecars: a DV
    // file is as load-bearing as the data file it masks — vacuuming
    // it would silently resurrect deleted rows on the next scan
    val live = (snap.liveFiles.map(f => DeltaRead.fileKey(fs, root, f)) ++
      snap.liveFiles.flatMap(_.dv)
        .flatMap(d => DeletionVectors.sidecarPath(root, d))
        .map(p => DeltaRead.fileKey(fs, root,
          DeltaRead.DeltaFile(fs.makeQualified(p).toUri.toString,
            Map.empty)))).toSet
    val cutoff = System.currentTimeMillis() - retainMs
    val removed = Seq.newBuilder[String]
    var liveKept = 0L
    var recentKept = 0L
    def walk(dir: Path): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          if (name != "_delta_log") {
            walk(st.getPath)
            // drop now-empty dirs (spent partitions, staging shells)
            if (!dryRun && fs.listStatus(st.getPath).isEmpty)
              fs.delete(st.getPath, false): Unit
          }
        } else if (!name.startsWith("_") && !name.startsWith(".")) {
          val key = DeltaRead.fileKey(fs, root,
            DeltaRead.DeltaFile(
              fs.makeQualified(st.getPath).toUri.toString, Map.empty))
          if (live.contains(key)) liveKept += 1
          else if (st.getModificationTime >= cutoff) recentKept += 1
          else {
            removed += key
            if (!dryRun) fs.delete(st.getPath, false): Unit
          }
        }
      }
    walk(root)
    VacuumReport(removed.result().sorted, liveKept, recentKept)
  }

  /** Schema-evolution append: like [[append]], but NEW columns in `df`
    * (absent from the table) extend the schema via a new `metaData`
    * action in the same commit — the standard mergeSchema append.
    * Strictly additive: every EXISTING table column must still be
    * present with its exact type, partition columns cannot change, and
    * dropped/retyped columns refuse. Historical files simply read the
    * new columns as null (parquet missing-column semantics), which is
    * the protocol's own behavior.
    */
  def appendEvolve(
      df: DataFrame,
      tablePath: String,
      partitionBy: Seq[String] = Seq.empty,
      collectStats: Boolean = true,
      maxRetries: Int = 10,
      beforeCommit: () => Unit = () => ()): Long = {
    val spark = df.sparkSession
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val logDir = new Path(root, "_delta_log")
    if (!fs.exists(logDir) || fs.listStatus(logDir).isEmpty)
      return append(df, tablePath, partitionBy, collectStats,
        maxRetries, beforeCommit)
    val snap = DeltaRead.snapshot(spark, tablePath)
    if (partitionBy != snap.partitionColumns)
      fail(tablePath, s"partitionBy ${partitionBy.mkString(",")} != " +
        s"table's ${snap.partitionColumns.mkString(",")}")
    // missing generated columns compute (insert shape) before the
    // additive checks
    val dfE = completeGenerated(snap, df)
    val incoming = dfE.schema.map(f => f.name -> f.dataType).toMap
    snap.schema.foreach { f =>
      incoming.get(f.name) match {
        case None =>
          fail(tablePath, s"appendEvolve drops column '${f.name}' — " +
            "evolution is strictly additive")
        case Some(dt) if dt != f.dataType =>
          fail(tablePath, s"appendEvolve retypes '${f.name}' " +
            s"(${f.dataType.simpleString} -> ${dt.simpleString}) — " +
            "evolution is strictly additive")
        case _ => ()
      }
    }
    val existing = snap.schema.fieldNames.toSet
    val newCols = dfE.schema.filterNot(f => existing.contains(f.name))
    if (newCols.isEmpty)
      return append(df, tablePath, partitionBy, collectStats,
        maxRetries, beforeCommit)
    val merged = StructType(snap.schema.fields ++ newCols)
    writerGate(spark, fs, logDir, root, overwrite = false)
    // row obligations reference existing columns only — the evolved
    // frame carries them all, so they survive evolution
    enforceRowObligations(tablePath, snap, dfE)
    val newFiles = writeData(spark, fs, root,
      dfE.select(merged.map(f => col(f.name)): _*),
      partitionBy, collectStats)
    var version = DeltaRead.versions(spark, tablePath).max + 1
    beforeCommit()
    val lines = Seq.newBuilder[String]
    lines += commitInfoLine("AppendEvolve")
    // the metaData action REPLACES table metadata on replay: carry the
    // table id (protocol requires it stable for the table's lifetime)
    // and the existing configuration (delta.appendOnly etc.) through —
    // only the schemaString changes
    lines += DeltaFixture.metaDataLine(
      snap.metaId, merged, partitionBy,
      configuration = snap.configuration)
    newFiles.foreach { f =>
      lines += DeltaFixture.addLine(
        f.relPath, f.size, f.partitionValues, stats = f.stats)
    }
    var attempts = 0
    while (!tryCommit(fs, logDir, version, lines.result())) {
      attempts += 1
      if (attempts > maxRetries)
        fail(tablePath, s"appendEvolve lost $maxRetries version races")
      // re-validate: a racer may have evolved the schema themselves
      val now = DeltaRead.snapshot(spark, tablePath)
      now.schema.foreach { f =>
        if (!merged.fieldNames.contains(f.name) ||
          merged(f.name).dataType != f.dataType)
          fail(tablePath, "concurrent schema change during " +
            "appendEvolve — rerun against the new schema")
      }
      version = DeltaRead.versions(spark, tablePath).max + 1
    }
    version
  }

  /** RESTORE the table to the state it had at `toVersion` — as a NEW
    * commit (history stays intact; time travel still reaches the
    * states in between): removes for live files the target lacks,
    * re-adds (verbatim partitionValues/stats/size/DV) for target
    * files no longer live, and a metaData action restoring the target
    * schema/partitioning/configuration when they differ (table id
    * stays — protocol requires it stable). Every re-added file (and
    * its DV sidecar) must still exist on disk: vacuum beyond the
    * target version makes that state unrestorable, exactly like the
    * real engines — refused loudly, never a silent partial restore.
    */
  def restore(
      spark: SparkSession,
      tablePath: String,
      toVersion: Long,
      maxRetries: Int = 10): Long = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val logDir = new Path(root, "_delta_log")
    if (!fs.exists(logDir) || fs.listStatus(logDir).isEmpty)
      fail(tablePath, "restore of a non-existent table")
    val target = DeltaRead.snapshot(spark, tablePath, Some(toVersion))
    writerGate(spark, fs, logDir, root, overwrite = true)
    var attempts = 0
    while (true) {
      val now = DeltaRead.snapshot(spark, tablePath)
      if (now.configuration.get("delta.enableChangeDataFeed")
        .contains("true"))
        fail(tablePath, "restore of a change-data-feed-enabled table " +
          "would need full cdc files — unsupported; disable CDF first")
      val nowPaths = now.liveFiles.map(_.path).toSet
      val targetPaths = target.liveFiles.map(_.path).toSet
      val removes = now.liveFiles.filterNot(f => targetPaths(f.path))
      val readds = target.liveFiles.filterNot(f => nowPaths(f.path))
      // unrestorable once vacuumed: check data files AND DV sidecars
      readds.foreach { f =>
        val fp =
          if (f.path.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*"))
            new Path(new java.net.URI(f.path))
          else new Path(root, DeltaRead.decodePath(f.path))
        if (!fs.exists(fp))
          fail(tablePath, s"restore target file ${f.path} was " +
            s"vacuumed — version $toVersion is unrestorable")
        f.dv.flatMap(DeletionVectors.sidecarPath(root, _)).foreach { dvp =>
          if (!fs.exists(dvp))
            fail(tablePath, s"restore target DV sidecar $dvp was " +
              s"vacuumed — version $toVersion is unrestorable")
        }
      }
      val lines = Seq.newBuilder[String]
      lines += commitInfoLine("Restore")
      if (now.schema != target.schema ||
        now.partitionColumns != target.partitionColumns ||
        now.configuration != target.configuration)
        lines += DeltaFixture.metaDataLine(
          now.metaId, target.schema, target.partitionColumns,
          configuration = target.configuration)
      removes.foreach(f => lines += DeltaFixture.removeLine(f.path))
      readds.foreach { f =>
        lines += DeltaFixture.addLine(
          f.path, f.size, f.partitionValues, stats = f.stats, dv = f.dv)
      }
      val version = now.version + 1
      if (tryCommit(fs, logDir, version, lines.result()))
        return version
      attempts += 1
      if (attempts > maxRetries)
        fail(tablePath, s"restore lost $maxRetries version races")
    }
    sys.error("unreachable")
  }

  /** What [[optimize]] rewrote. */
  final case class OptimizeReport(
      rewrittenFiles: Long,
      newFiles: Long,
      version: Option[Long])

  /** OPTIMIZE — bin-packing small-file compaction as a Delta commit:
    * live files under `targetFileBytes` (skipping DV-carrying files —
    * materializing deletes is a rewrite, not a compaction) group by
    * partition; groups of ≥2 rewrite through ONE distributed scan
    * into ~totalBytes/target files, committed as dataChange=false
    * remove/add pairs — the shape [[DeltaRead.readChanges]] and
    * [[DeltaRead.readCdf]] correctly treat as invisible (bytes move,
    * data does not). Allowed on delta.appendOnly tables for the same
    * reason. Stats re-collect so zone-map pruning survives
    * compaction.
    */
  def optimize(
      spark: SparkSession,
      tablePath: String,
      targetFileBytes: Long = 128L << 20,
      maxRetries: Int = 10,
      beforeCommit: () => Unit = () => ()): OptimizeReport = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val logDir = new Path(root, "_delta_log")
    if (!fs.exists(logDir) || fs.listStatus(logDir).isEmpty)
      fail(tablePath, "optimize of a non-existent table")
    val snap = DeltaRead.snapshot(spark, tablePath)
    writerGate(spark, fs, logDir, root, overwrite = false)
    val groups = snap.liveFiles
      .filter(f => f.size > 0 && f.size < targetFileBytes && f.dv.isEmpty)
      .groupBy(_.partitionValues)
      .filter(_._2.size >= 2)
    val toRewrite = groups.values.flatten.toSeq
    if (toRewrite.isEmpty) return OptimizeReport(0, 0, None)
    val data = DeltaRead.scanFiles(spark, tablePath, snap, toRewrite)
    val totalBytes = toRewrite.map(_.size).sum
    val n = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val packed =
      if (snap.partitionColumns.nonEmpty)
        data.repartition(math.max(n, groups.size),
          snap.partitionColumns.map(col): _*)
      else data.repartition(n)
    val newFiles = writeData(spark, fs, root, packed,
      snap.partitionColumns, collectStats = true)
    beforeCommit()
    val lines = Seq.newBuilder[String]
    lines += commitInfoLine("Optimize")
    toRewrite.foreach(f =>
      lines += DeltaFixture.removeLine(f.path, dataChange = false))
    newFiles.foreach { f =>
      lines += DeltaFixture.addLine(
        f.relPath, f.size, f.partitionValues, stats = f.stats,
        dataChange = false)
    }
    var version = snap.version + 1
    var attempts = 0
    while (!tryCommit(fs, logDir, version, lines.result())) {
      attempts += 1
      if (attempts > maxRetries)
        fail(tablePath, s"optimize lost $maxRetries version races")
      // safe to retry ONLY if every rewritten file is still live WITH
      // ITS DV UNCHANGED: a racing merge/overwrite may have removed
      // one, and a racing deleteWhere/updateWhere re-adds the SAME
      // path with a DV attached — either way the compacted files were
      // written from the pre-race scan and would resurrect rows
      val now = DeltaRead.snapshot(spark, tablePath)
      val nowDv = now.liveFiles.map(f => f.path -> f.dv).toMap
      if (!toRewrite.forall(f => nowDv.get(f.path).contains(f.dv)))
        fail(tablePath, "concurrent commit removed or DV-masked a " +
          "file mid-optimize — rerun (staged files are inert orphans)")
      version = DeltaRead.versions(spark, tablePath).max + 1
    }
    OptimizeReport(toRewrite.size.toLong, newFiles.size.toLong,
      Some(version))
  }

  /** What [[deleteWhere]] did. */
  final case class DeleteReport(
      deletedRows: Long,
      filesTouched: Long,
      filesFullyRemoved: Long,
      version: Option[Long])

  /** DELETE without rewrite — the deletion-vector DML every
    * DML-heavy lakehouse runs: rows matching `predicate` get masked
    * by per-file roaring bitmaps ([[DeletionVectors]]) attached via
    * remove/re-add pairs; no data file is rewritten. DV AUTHORING IS
    * DISTRIBUTED: matched (file, row_index) pairs group by file and
    * each task serializes + writes that file's DV sidecar (merging
    * the file's existing DV — scans only yield live rows, so fresh
    * and old indexes are disjoint); only the log-grain descriptor
    * rows (one per touched file) reach the driver. A file whose
    * every physical row is dead (DV cardinality = stats numRecords)
    * is plainly REMOVED instead of carrying an all-dead DV. Under
    * CDF, the commit carries cdc delete rows (computed from the same
    * matched scan). Refuses unless the table's protocol DECLARES
    * deletionVectors (writing DVs a v1 reader would ignore silently
    * resurrects rows downstream) and on delta.appendOnly tables.
    */
  def deleteWhere(
      spark: SparkSession,
      tablePath: String,
      predicate: Column,
      maxRetries: Int = 10): DeleteReport = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val logDir = new Path(root, "_delta_log")
    if (!fs.exists(logDir) || fs.listStatus(logDir).isEmpty)
      fail(tablePath, "deleteWhere on a non-existent table")
    val snap = DeltaRead.snapshot(spark, tablePath)
    writerGate(spark, fs, logDir, root, overwrite = true)
    if (!dvDeclared(spark, fs, logDir))
      fail(tablePath, "table protocol does not declare the " +
        "deletionVectors feature — DVs written here would be " +
        "silently IGNORED by non-DV readers (resurrected rows); " +
        "use merge for copy-on-write deletes")
    // matched (file, row) pairs over LIVE rows only: scanFiles
    // already applies existing DVs, so fresh indexes are disjoint
    // from each file's old DV by construction
    val scan = DeltaRead.scanFiles(spark, tablePath, snap,
      snap.liveFiles, keepFile = true, keepRowIndex = true)
    val cdfEnabled = snap.configuration
      .get("delta.enableChangeDataFeed").contains("true")
    // scratch-truncation rule: the matched set feeds the per-file
    // count, the DV authoring AND (under CDF) the cdc write — stage
    // it once at MATCHED volume instead of re-scanning the table per
    // consumer (at 100 TB with a sparse predicate the scratch
    // round-trip is orders cheaper than a second full scan)
    val matchedAll = graft.ScratchSpace.materialize(
      scan.where(predicate), "delta_del_matched_")
    val cdcActions: Seq[String] =
      if (!cdfEnabled) Seq.empty
      else {
        if (snap.partitionColumns.nonEmpty)
          fail(tablePath, "CDF deleteWhere on a PARTITIONED table " +
            "is unsupported; refused rather than dropping change data")
        writeChangeData(spark, fs, root,
          matchedAll.select(snap.schema.map(f => col(f.name)) :+
            lit("delete").as("_change_type"): _*)).map {
          case (rel, size) => DeltaFixture.cdcLine(rel, size)
        }
      }
    val byKey = snap.liveFiles
      .map(f => DeltaRead.fileKey(fs, root, f) -> f).toMap
    // per-file matched counts FIRST (one map-side-partial aggregate):
    // a file whose every LIVE row matched is plainly REMOVED without
    // authoring a DV at all — the whole-table DELETE degenerates to
    // metadata-only removals instead of concentrating every row index
    // of a file in one authoring task (round-17 verdict residual)
    val perFile: Map[String, Long] = matchedAll
      .groupBy(col("__delta_file")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (perFile.isEmpty) return DeleteReport(0L, 0L, 0L, None)
    def numRecords(f: DeltaRead.DeltaFile): Option[Long] =
      f.stats.flatMap { s =>
        try Option(mapper.readTree(s).get("numRecords"))
          .filter(_.isNumber).map(_.asLong())
        catch { case _: Exception => None }
      }
    def liveRows(f: DeltaRead.DeltaFile): Option[Long] =
      numRecords(f).map(_ - f.dv.map(_.cardinality).getOrElse(0L))
    val fullyDead: Set[String] = perFile.keySet.filter { k =>
      byKey.get(k).exists(f => liveRows(f).contains(perFile(k)))
    }
    // files without stats cannot PROVE full death — they take the DV
    // path, which is correct either way (an all-dead DV still masks)
    val partialKeys = (perFile.keySet -- fullyDead).toSeq.sorted
    val touched =
      if (partialKeys.isEmpty)
        Array.empty[(String, String, Int, Int, Long, Long)]
      else {
        import spark.implicits._
        val partialDf = partialKeys.toDF("__delta_file")
        authorDvs(spark, fs, root, byKey,
          matchedAll.join(broadcast(partialDf), Seq("__delta_file"),
            "left_semi")
            .select(col("__delta_file"), col("__row_index")))
      }
    val lines = Seq.newBuilder[String]
    lines += commitInfoLine("Delete")
    cdcActions.foreach(lines += _)
    fullyDead.toSeq.sorted.foreach { key =>
      lines += DeltaFixture.removeLine(byKey(key).path)
    }
    touched.foreach { case (key, enc, off, size, card, _) =>
      val f = byKey.getOrElse(key,
        fail(tablePath, s"matched rows from unknown file $key"))
      lines += DeltaFixture.removeLine(f.path)
      lines += DeltaFixture.addLine(
        f.path, f.size, f.partitionValues, stats = f.stats,
        dv = Some(DeletionVectors.DvDescriptor(
          "u", enc, Some(off), size, card)))
    }
    var version = snap.version + 1
    var attempts = 0
    while (!tryCommit(fs, logDir, version, lines.result())) {
      attempts += 1
      if (attempts > maxRetries)
        fail(tablePath, s"deleteWhere lost $maxRetries version races")
      // retry is safe only if the matched files are all still live
      // with the SAME DVs this pass read
      val now = DeltaRead.snapshot(spark, tablePath)
      val nowByKey = now.liveFiles
        .map(f => DeltaRead.fileKey(fs, root, f) -> f).toMap
      val stable = perFile.keySet.forall { key =>
        nowByKey.get(key).exists(f => f.dv == byKey(key).dv)
      }
      if (!stable)
        fail(tablePath, "concurrent commit changed a touched file " +
          "mid-delete — rerun against the new state")
      version = DeltaRead.versions(spark, tablePath).max + 1
    }
    DeleteReport(perFile.values.sum, perFile.size.toLong,
      fullyDead.size.toLong, Some(version))
  }

  /** Distributed DV authoring shared by [[deleteWhere]] and
    * [[updateWhere]]: matched (fileKey, row_index) pairs group by
    * file; each executor task merges the file's EXISTING DV rows
    * (scans yield live rows only, so the sets are disjoint),
    * serializes the bitmap and writes the sidecar. Returns ONE
    * log-grain row per touched file: (fileKey, z85 uuid payload,
    * offset, sizeInBytes, total cardinality, fresh rows this pass).
    */
  private def authorDvs(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path,
      byKey: Map[String, DeltaRead.DeltaFile],
      matched: DataFrame): Array[(String, String, Int, Int, Long, Long)] = {
    import spark.implicits._
    val confH = new graft.operators.HadoopConfHolder(
      spark.sessionState.newHadoopConf())
    val rootStr = root.toString
    val oldDvs: Map[String, DeletionVectors.DvDescriptor] =
      byKey.collect { case (k, f) if f.dv.nonEmpty => k -> f.dv.get }
    matched.as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (fileKey, it) =>
        val tableRoot = new Path(rootStr)
        val dfs = tableRoot.getFileSystem(confH.value)
        val fresh = it.map(_._2).toArray
        val old = oldDvs.get(fileKey)
          .map(d => DeletionVectors.load(dfs, tableRoot, d))
          .getOrElse(Array.empty[Long])
        val all = (fresh ++ old).distinct.sorted
        val uuid = java.util.UUID.randomUUID()
        val sidecar = new Path(tableRoot, s"deletion_vector_$uuid.bin")
        val spans = DeletionVectors.writeDvFile(dfs, sidecar, Seq(all))
        val ub = java.nio.ByteBuffer.allocate(16)
        ub.putLong(uuid.getMostSignificantBits)
        ub.putLong(uuid.getLeastSignificantBits)
        (fileKey, DeletionVectors.z85Encode(ub.array()),
          spans.head._1, spans.head._2, all.length.toLong,
          fresh.length.toLong)
      }.collect() // log grain: ONE row per touched file
  }

  /** What [[updateWhere]] did. */
  final case class UpdateReport(
      updatedRows: Long,
      filesTouched: Long,
      newFiles: Long,
      version: Option[Long])

  /** UPDATE via deletion vectors — matched rows get DV-masked in
    * their original files (no rewrite of the untouched rows) and
    * their UPDATED images append as new data files, ONE commit: the
    * remove/re-add-with-DV pairs plus dataChange adds. `set` maps
    * column name → new-value expression (evaluated over the matched
    * row); partition columns cannot change (that is a move, not an
    * update). Under CDF the commit carries update_preimage/
    * update_postimage cdc rows. Same preconditions as
    * [[deleteWhere]]: the protocol must declare deletionVectors,
    * appendOnly refuses.
    */
  def updateWhere(
      spark: SparkSession,
      tablePath: String,
      predicate: Column,
      set: Map[String, Column],
      maxRetries: Int = 10): UpdateReport = {
    require(set.nonEmpty, "updateWhere needs at least one SET column")
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val logDir = new Path(root, "_delta_log")
    if (!fs.exists(logDir) || fs.listStatus(logDir).isEmpty)
      fail(tablePath, "updateWhere on a non-existent table")
    val snap = DeltaRead.snapshot(spark, tablePath)
    val genMap = generatedCols(snap).toMap
    set.keys.foreach { c =>
      if (!snap.schema.fieldNames.contains(c))
        fail(tablePath, s"SET column '$c' not in the table schema")
      if (snap.partitionColumns.contains(c))
        fail(tablePath, s"SET column '$c' is a partition column — " +
          "moving rows between partitions is not an in-place update")
      if (genMap.contains(c))
        fail(tablePath, s"SET column '$c' is a GENERATED column — " +
          "it is derived; update its source columns and the value " +
          "recomputes automatically")
    }
    writerGate(spark, fs, logDir, root, overwrite = true)
    if (!dvDeclared(spark, fs, logDir))
      fail(tablePath, "table protocol does not declare the " +
        "deletionVectors feature — use merge for copy-on-write updates")
    val scan = DeltaRead.scanFiles(spark, tablePath, snap,
      snap.liveFiles, keepFile = true, keepRowIndex = true)
    // scratch-truncation rule: the matched set feeds the image write,
    // the DV authoring AND (under CDF) the cdc write — stage it once
    // at matched-volume grain instead of re-scanning the table per
    // consumer
    val matchedAll = graft.ScratchSpace.materialize(
      scan.where(predicate), "delta_upd_matched_")
    // apply the SETs, then RECOMPUTE generated columns over the
    // updated images (their sources may have changed)
    val setApplied = matchedAll.select(snap.schema.map(f =>
      set.getOrElse(f.name, col(f.name)).as(f.name)): _*)
    val updatedRowsDf = setApplied.select(snap.schema.map(f =>
      genMap.get(f.name).map(e => expr(e).as(f.name))
        .getOrElse(col(f.name))): _*)
    // row obligations over the updated images (the only fresh rows)
    enforceRowObligations(tablePath, snap, updatedRowsDf)
    val cdfEnabled = snap.configuration
      .get("delta.enableChangeDataFeed").contains("true")
    val cdcActions: Seq[String] =
      if (!cdfEnabled) Seq.empty
      else {
        if (snap.partitionColumns.nonEmpty)
          fail(tablePath, "CDF updateWhere on a PARTITIONED table " +
            "is unsupported; refused rather than dropping change data")
        val pre = matchedAll.select(snap.schema.map(f =>
          col(f.name)) :+ lit("update_preimage").as("_change_type"): _*)
        val post = updatedRowsDf
          .withColumn("_change_type", lit("update_postimage"))
        writeChangeData(spark, fs, root, pre.unionByName(post)).map {
          case (rel, size) => DeltaFixture.cdcLine(rel, size)
        }
      }
    val byKey = snap.liveFiles
      .map(f => DeltaRead.fileKey(fs, root, f) -> f).toMap
    // per-file matched counts first — fully-updated files are plainly
    // REMOVED (their images re-append below) without authoring an
    // all-dead DV, the same whole-file fast path as deleteWhere
    val perFile: Map[String, Long] = matchedAll
      .groupBy(col("__delta_file")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (perFile.isEmpty) return UpdateReport(0L, 0L, 0L, None)
    def numRecords(f: DeltaRead.DeltaFile): Option[Long] =
      f.stats.flatMap { s =>
        try Option(mapper.readTree(s).get("numRecords"))
          .filter(_.isNumber).map(_.asLong())
        catch { case _: Exception => None }
      }
    def liveRows(f: DeltaRead.DeltaFile): Option[Long] =
      numRecords(f).map(_ - f.dv.map(_.cardinality).getOrElse(0L))
    val fullyDead: Set[String] = perFile.keySet.filter { k =>
      byKey.get(k).exists(f => liveRows(f).contains(perFile(k)))
    }
    val partialKeys = (perFile.keySet -- fullyDead).toSeq.sorted
    val touched =
      if (partialKeys.isEmpty)
        Array.empty[(String, String, Int, Int, Long, Long)]
      else {
        import spark.implicits._
        val partialDf = partialKeys.toDF("__delta_file")
        authorDvs(spark, fs, root, byKey,
          matchedAll.join(broadcast(partialDf), Seq("__delta_file"),
            "left_semi")
            .select(col("__delta_file"), col("__row_index")))
      }
    // the updated images append as ordinary data files
    val newFiles = writeData(spark, fs, root, updatedRowsDf,
      snap.partitionColumns, collectStats = true)
    val lines = Seq.newBuilder[String]
    lines += commitInfoLine("Update")
    cdcActions.foreach(lines += _)
    fullyDead.toSeq.sorted.foreach { key =>
      lines += DeltaFixture.removeLine(byKey(key).path)
    }
    touched.foreach { case (key, enc, off, size, card, _) =>
      val f = byKey.getOrElse(key,
        fail(tablePath, s"matched rows from unknown file $key"))
      lines += DeltaFixture.removeLine(f.path)
      lines += DeltaFixture.addLine(
        f.path, f.size, f.partitionValues, stats = f.stats,
        dv = Some(DeletionVectors.DvDescriptor(
          "u", enc, Some(off), size, card)))
    }
    newFiles.foreach { f =>
      lines += DeltaFixture.addLine(
        f.relPath, f.size, f.partitionValues, stats = f.stats)
    }
    var version = snap.version + 1
    var attempts = 0
    while (!tryCommit(fs, logDir, version, lines.result())) {
      attempts += 1
      if (attempts > maxRetries)
        fail(tablePath, s"updateWhere lost $maxRetries version races")
      val now = DeltaRead.snapshot(spark, tablePath)
      val nowByKey = now.liveFiles
        .map(f => DeltaRead.fileKey(fs, root, f) -> f).toMap
      val stable = perFile.keySet.forall { key =>
        nowByKey.get(key).exists(f => f.dv == byKey(key).dv)
      }
      if (!stable)
        fail(tablePath, "concurrent commit changed a touched file " +
          "mid-update — rerun against the new state")
      version = DeltaRead.versions(spark, tablePath).max + 1
    }
    UpdateReport(perFile.values.sum, perFile.size.toLong,
      newFiles.size.toLong, Some(version))
  }

  /** True when any protocol action in the log chain declares the
    * deletionVectors reader feature (JSON commits or checkpoint
    * protocol rows).
    */
  private def dvDeclared(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      logDir: Path): Boolean = {
    val names = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
    val inJson = names.filter(_.matches("\\d{20}\\.json")).exists { n =>
      val bytes = graft.ScratchSpace.readBytes(
        spark, new Path(logDir, n).toString)
      new String(bytes, "UTF-8").linesIterator
        .map(_.trim).filter(_.nonEmpty)
        .flatMap { line =>
          try Some(mapper.readTree(line))
          catch { case _: Exception => None }
        }
        .exists { node =>
          Option(node.get("protocol")).exists(p =>
            Option(p.get("readerFeatures")).exists(rf =>
              rf.toString.contains("deletionVectors")))
        }
    }
    inJson || names.filter(_.matches("\\d{20}\\.checkpoint\\.parquet"))
      .exists { n =>
        val cp = spark.read.parquet(new Path(logDir, n).toString)
        cp.schema.fieldNames.contains("protocol") && {
          val pf = cp.schema("protocol").dataType
            .asInstanceOf[StructType].fieldNames.toSet
          pf.contains("readerFeatures") &&
          cp.where(col("protocol").isNotNull)
            .select(col("protocol.readerFeatures").cast("string"))
            .collect()
            .exists(r => !r.isNullAt(0) &&
              r.getString(0).contains("deletionVectors"))
        }
      }
  }

  private def write(
      df: DataFrame,
      tablePath: String,
      partitionBy: Seq[String],
      overwrite: Boolean,
      collectStats: Boolean,
      maxRetries: Int,
      beforeCommit: () => Unit,
      txn: Option[(String, Long)]): Option[Long] = {
    val spark = df.sparkSession
    partitionBy.foreach { c =>
      if (!df.columns.contains(c))
        fail(tablePath, s"partition column '$c' not in DataFrame " +
          s"(have ${df.columns.mkString(",")})")
    }
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val logDir = new Path(root, "_delta_log")
    LakeCommit.gate(spark, root) // table-create path has no writerGate
    val exists = fs.exists(logDir) && fs.listStatus(logDir).nonEmpty
    if (!exists && overwrite)
      fail(tablePath, "overwrite of a non-existent table — create it " +
        "with append first (an overwrite that silently creates hides " +
        "path typos)")

    // existing-table gates: reader replay (validates reader version),
    // schema equality (after completing MISSING generated columns —
    // the standard insert shape), writer version / features /
    // appendOnly, and the row obligations (constraints, invariants,
    // generated-value consistency)
    val existingSnap =
      if (exists) Some(DeltaRead.snapshot(spark, tablePath)) else None
    val dfW = existingSnap.map(completeGenerated(_, df)).getOrElse(df)
    existingSnap.foreach { snap =>
      checkSchema(tablePath, dfW.schema, partitionBy, snap)
      writerGate(spark, fs, logDir, root, overwrite)
      enforceRowObligations(tablePath, snap, dfW)
      // an overwrite is an update-shape commit (removes + adds):
      // under CDF the protocol requires cdc files for it, and this
      // writer does not synthesize full-table change rows — refuse
      // rather than silently breaking the feed (appends derive)
      if (overwrite && snap.configuration
        .get("delta.enableChangeDataFeed").contains("true"))
        fail(tablePath, "overwrite of a change-data-feed-enabled " +
          "table would need full-table cdc files — unsupported; " +
          "merge writes the feed, or disable CDF first")
    }

    val newFiles = writeData(spark, fs, root, dfW, partitionBy, collectStats)

    var attempt = 0
    var version =
      existingSnap.map(_ => DeltaRead.versions(spark, tablePath).max + 1)
        .getOrElse(0L)
    var removes: Seq[String] =
      if (overwrite) existingSnap.get.liveFiles.map(_.path) else Seq.empty
    while (true) {
      beforeCommit()
      val lines = Seq.newBuilder[String]
      lines += commitInfoLine(if (overwrite) "Overwrite" else "Append")
      if (version == 0L) {
        lines += DeltaFixture.protocolLine()
        lines += DeltaFixture.metaDataLine(
          java.util.UUID.randomUUID().toString, df.schema, partitionBy)
      }
      txn.foreach { case (app, v) =>
        lines += DeltaFixture.txnLine(app, v)
      }
      removes.foreach(lines += DeltaFixture.removeLine(_))
      newFiles.foreach { f =>
        lines += DeltaFixture.addLine(
          f.relPath, f.size, f.partitionValues, stats = f.stats)
      }
      if (tryCommit(fs, logDir, version, lines.result()))
        return Some(version)
      attempt += 1
      if (attempt > maxRetries)
        fail(tablePath, s"commit lost $maxRetries version races — " +
          "giving up (staged files are inert orphans)")
      // a concurrent writer took this version: re-validate at the tip
      txn.foreach { case (app, v) =>
        if (lastTxnVersion(spark, tablePath, app) >= v)
          return None // the racer WAS this txn — already committed
      }
      val snap = DeltaRead.snapshot(spark, tablePath)
      checkSchema(tablePath, dfW.schema, partitionBy, snap)
      if (overwrite) removes = snap.liveFiles.map(_.path)
      version = DeltaRead.versions(spark, tablePath).max + 1
    }
    None // unreachable
  }

  /** The table's highest committed `txn` version for `appId`, or -1
    * when none exists.
    */
  def lastTxnVersion(
      spark: SparkSession,
      tablePath: String,
      appId: String): Long =
    txnVersions(spark, tablePath).getOrElse(appId, -1L)

  /** Every appId's highest committed `txn` version — from the JSON
    * commit chain plus (when present) single-part classic
    * checkpoints' txn rows. A checkpoint writer must persist this map
    * or log cleanup would reset every streaming sink's idempotence
    * counter.
    */
  def txnVersions(
      spark: SparkSession,
      tablePath: String): Map[String, Long] = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(fs.makeQualified(p), "_delta_log")
    if (!fs.exists(logDir)) return Map.empty
    val names = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
    val best = scala.collection.mutable.Map.empty[String, Long]
    def offer(app: String, v: Long): Unit =
      if (v > best.getOrElse(app, Long.MinValue)) best(app) = v
    names.filter(_.matches("\\d{20}\\.json")).foreach { n =>
      val bytes = {
        val fp = new Path(logDir, n)
        val st = fs.getFileStatus(fp)
        val buf = new Array[Byte](st.getLen.toInt)
        val in = fs.open(fp)
        try in.readFully(0L, buf) finally in.close()
        buf
      }
      new String(bytes, "UTF-8").linesIterator
        .map(_.trim).filter(_.nonEmpty).foreach { line =>
          val node =
            try mapper.readTree(line)
            catch { case _: Exception => null }
          val t = if (node == null) null else node.get("txn")
          if (t != null) {
            val app = Option(t.get("appId")).filter(!_.isNull)
              .map(_.asText()).getOrElse("")
            val v = Option(t.get("version")).map(_.asLong(-1L))
              .getOrElse(-1L)
            if (app.nonEmpty) offer(app, v)
          }
        }
    }
    names.filter(_.matches("\\d{20}\\.checkpoint\\.parquet")).foreach { n =>
      val cp = spark.read.parquet(new Path(logDir, n).toString)
      if (cp.schema.fieldNames.contains("txn")) {
        cp.where(col("txn").isNotNull)
          .groupBy(col("txn.appId").as("__a"))
          .agg(max(col("txn.version")).as("__v"))
          .collect().foreach { r =>
            if (!r.isNullAt(0) && !r.isNullAt(1))
              offer(r.getString(0), r.getLong(1))
          }
      }
    }
    best.toMap
  }

  /** Write a single-part CLASSIC checkpoint at the table's latest
    * version (+ the `_last_checkpoint` pointer) — the log-compaction
    * step that lets [[cleanupLog]] retire old JSON commits while
    * [[DeltaRead]]'s checkpoint path keeps the table readable. The
    * checkpoint carries everything replay needs: protocol, metaData
    * with the table's ORIGINAL id and configuration (losing
    * `delta.appendOnly` here would erase the constraint for every
    * post-cleanup reader), every live add WITH its stats and size
    * (metadata-only counts and zone-map pruning survive compaction),
    * and every appId's highest txn version (idempotent streaming
    * sinks keep their replay protection). Returns the checkpointed
    * version.
    */
  def checkpoint(spark: SparkSession, tablePath: String): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val logDir = new Path(root, "_delta_log")
    val snap = DeltaRead.snapshot(spark, tablePath)
    writerGate(spark, fs, logDir, root, overwrite = false)
    // the classic checkpoint rows this writer emits carry no
    // deletionVector struct — checkpointing a DV-carrying live set
    // would ERASE the masks and resurrect deleted rows for every
    // post-cleanup reader. Real DV tables are already refused by the
    // writer gate (minWriterVersion 7); this guards the
    // protocol-inconsistent hand-planted case too.
    if (snap.liveFiles.exists(_.dv.nonEmpty))
      fail(tablePath, "live files carry deletion vectors — this " +
        "writer's checkpoint format would erase the masks; refuse")
    val txns = txnVersions(spark, tablePath)
    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("format",
        StructType(Seq(StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration",
        MapType(StringType, StringType, valueContainsNull = true))))
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues",
        MapType(StringType, StringType, valueContainsNull = true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))
    val txnT = StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))
    val cpT = StructType(Seq(
      StructField("protocol", protocolT, nullable = true),
      StructField("metaData", metaT, nullable = true),
      StructField("add", addT, nullable = true),
      StructField("txn", txnT, nullable = true)))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(Row(1, 2), null, null, null))
    rows.add(Row(null,
      Row(if (snap.metaId.nonEmpty) snap.metaId
      else java.util.UUID.randomUUID().toString,
        Row("parquet"), snap.schema.json, snap.partitionColumns,
        snap.configuration),
      null, null))
    snap.liveFiles.foreach { f =>
      rows.add(Row(null, null,
        Row(f.path, f.partitionValues.map { case (k, v) => k -> v.orNull },
          f.size, 0L, true, f.stats.orNull),
        null))
    }
    txns.toSeq.sortBy(_._1).foreach { case (app, v) =>
      rows.add(Row(null, null, null, Row(app, v)))
    }
    val df = spark.createDataFrame(rows, cpT)
    DeltaFixture.plantDataFile(spark, df, tablePath,
      f"_delta_log/${snap.version}%020d.checkpoint.parquet"): Unit
    // verify the written checkpoint replays before advertising it
    val check = DeltaRead.snapshot(spark, tablePath)
    if (check.liveFiles.map(_.path).sorted !=
      snap.liveFiles.map(_.path).sorted)
      fail(tablePath, "checkpoint verification failed — live sets differ")
    val lc = mapper.createObjectNode()
    lc.put("version", snap.version)
    lc.put("size", rows.size().toLong)
    graft.ScratchSpace.writeBytes(spark, tablePath,
      "_delta_log/_last_checkpoint",
      (mapper.writeValueAsString(lc) + "\n").getBytes("UTF-8"))
    snap.version
  }

  /** Retire JSON commits at or below the newest single-part classic
    * checkpoint — the log-cleanup half of [[checkpoint]]. Refuses
    * when no checkpoint exists; verifies the post-cleanup chain
    * replays (by construction it must: base = checkpoint, tail =
    * surviving JSONs). Returns the number of commit files removed.
    * Time travel below the checkpoint stops working, exactly like the
    * real engines' log retention.
    */
  def cleanupLog(spark: SparkSession, tablePath: String): Int = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(fs.makeQualified(p), "_delta_log")
    if (!fs.exists(logDir)) fail(tablePath, "no _delta_log")
    val names = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
    val cps = names.filter(_.matches("\\d{20}\\.checkpoint\\.parquet"))
      .map(_.take(20).toLong)
    if (cps.isEmpty)
      fail(tablePath, "cleanupLog without a checkpoint — write one " +
        "first (DeltaWrite.checkpoint)")
    val c = cps.max
    val victims = names.filter(_.matches("\\d{20}\\.json"))
      .filter(_.take(20).toLong <= c)
    victims.foreach(n => fs.delete(new Path(logDir, n), false): Unit)
    // the surviving chain must still replay to the same tip
    DeltaRead.snapshot(spark, tablePath): Unit
    victims.size
  }

  /** The table's CURRENT protocol after log replay: (minReader,
    * minWriter, readerFeatures, writerFeatures). Replay order: the
    * newest classic checkpoint's protocol row (when present), then
    * every later JSON commit's protocol action ascending — last wins,
    * the reader's own rule.
    */
  private def currentProtocol(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      logDir: Path): (Int, Int, Set[String], Set[String]) = {
    var state = (1, 2, Set.empty[String], Set.empty[String])
    def featSet(s: String): Set[String] =
      s.replaceAll("[\\[\\]\"\\s]", "").split(",").filter(_.nonEmpty).toSet
    val names = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
    val cpVersions = names.filter(_.matches("\\d{20}\\.checkpoint\\.parquet"))
      .map(_.take(20).toLong)
    val base = cpVersions.maxOption
    base.foreach { v =>
      val cp = spark.read.parquet(
        new Path(logDir, f"$v%020d.checkpoint.parquet").toString)
      if (cp.schema.fieldNames.contains("protocol")) {
        val pf = cp.schema("protocol").dataType
          .asInstanceOf[StructType].fieldNames.toSet
        val rCol = if (pf.contains("readerFeatures"))
          col("protocol.readerFeatures").cast("string")
        else lit(null).cast("string")
        val wCol = if (pf.contains("writerFeatures"))
          col("protocol.writerFeatures").cast("string")
        else lit(null).cast("string")
        cp.where(col("protocol").isNotNull)
          .select(col("protocol.minReaderVersion"),
            col("protocol.minWriterVersion"), rCol, wCol)
          .collect().foreach { r =>
            state = (
              if (r.isNullAt(0)) 1 else r.getInt(0),
              if (r.isNullAt(1)) 2 else r.getInt(1),
              if (r.isNullAt(2)) Set.empty else featSet(r.getString(2)),
              if (r.isNullAt(3)) Set.empty else featSet(r.getString(3)))
          }
      }
    }
    names.filter(_.matches("\\d{20}\\.json"))
      .map(n => (n.take(20).toLong, n))
      .filter { case (v, _) => base.forall(v > _) }
      .sortBy(_._1)
      .foreach { case (_, n) =>
        val bytes = graft.ScratchSpace.readBytes(
          spark, new Path(logDir, n).toString)
        new String(bytes, "UTF-8").linesIterator
          .map(_.trim).filter(_.nonEmpty)
          .flatMap { line =>
            try Some(mapper.readTree(line))
            catch { case _: Exception => None }
          }
          .foreach { node =>
            val p = node.get("protocol")
            if (p != null) {
              state = (
                Option(p.get("minReaderVersion")).map(_.asInt(1))
                  .getOrElse(1),
                Option(p.get("minWriterVersion")).map(_.asInt(2))
                  .getOrElse(2),
                Option(p.get("readerFeatures")).filter(!_.isNull)
                  .map(n => featSet(n.toString)).getOrElse(Set.empty),
                Option(p.get("writerFeatures")).filter(!_.isNull)
                  .map(n => featSet(n.toString)).getOrElse(Set.empty))
            }
          }
      }
    state
  }

  /** The legacy writer features a pre-v7 minWriterVersion IMPLIES
    * (public protocol's table-features appendix) — an upgrade to v7
    * must list them explicitly or their obligations silently vanish
    * for future writers.
    */
  private def legacyWriterFeatures(minWriter: Int): Set[String] = {
    val ladder = Seq(
      2 -> Set("appendOnly", "invariants"),
      3 -> Set("checkConstraints"),
      4 -> Set("changeDataFeed", "generatedColumns"),
      5 -> Set("columnMapping"),
      6 -> Set("identityColumns"))
    ladder.filter(_._1 <= minWriter).flatMap(_._2).toSet
  }

  private def legacyReaderFeatures(minReader: Int): Set[String] =
    if (minReader >= 2) Set("columnMapping") else Set.empty

  /** Feature-upgrade verb — the "ALTER TABLE enable feature" step the
    * real engines run implicitly on SET TBLPROPERTIES: ONE commit
    * whose protocol action raises the version and lists the feature,
    * so the DV DML verbs ([[deleteWhere]]/[[updateWhere]] — which
    * refuse unless the protocol DECLARES deletionVectors) work on
    * ordinary tables, not only fixture-born ones.
    *
    * Supported: `deletionVectors` (minReader→3 / minWriter→7,
    * reader+writer feature, sets `delta.enableDeletionVectors=true`)
    * and `changeDataFeed` (minWriter→7 writer feature + the
    * `delta.enableChangeDataFeed=true` configuration in the same
    * commit — config without protocol would be half an upgrade).
    * The upgrade carries existing v7 features forward and lists the
    * legacy features the old writer version implied (spec rule —
    * dropping them would erase their obligations for future writers);
    * readers below the new minReaderVersion refuse the table
    * afterward, exactly the engines' contract. Returns the committed
    * version; a feature already declared returns the current version
    * (no empty commits).
    */
  def enableFeature(
      spark: SparkSession,
      tablePath: String,
      feature: String,
      maxRetries: Int = 10): Long = {
    val supported = Map(
      "deletionVectors" -> (3, true),
      "changeDataFeed" -> (1, false))
    val (reqReader, isReaderFeature) = supported.getOrElse(feature,
      fail(tablePath, s"enableFeature('$feature') unsupported — " +
        s"supported: ${supported.keys.toSeq.sorted.mkString(", ")}"))
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val logDir = new Path(root, "_delta_log")
    if (!fs.exists(logDir) || fs.listStatus(logDir).isEmpty)
      fail(tablePath, "enableFeature on a non-existent table")
    writerGate(spark, fs, logDir, root, overwrite = false)
    var attempts = 0
    while (true) {
      val (minR, minW, rFeats, wFeats) =
        currentProtocol(spark, fs, logDir)
      if (wFeats.contains(feature) &&
        (!isReaderFeature || rFeats.contains(feature)))
        return DeltaRead.versions(spark, tablePath).max
      val newMinR = math.max(minR, reqReader)
      val newRFeats =
        (if (newMinR >= 3)
          legacyReaderFeatures(minR) ++ rFeats ++
            (if (isReaderFeature) Set(feature) else Set.empty)
        else Set.empty[String]).toSeq.sorted
      val newWFeats = (legacyWriterFeatures(minW) ++ wFeats +
        feature).toSeq.sorted
      val snap = DeltaRead.snapshot(spark, tablePath)
      val cfgKey = feature match {
        case "deletionVectors" => "delta.enableDeletionVectors"
        case "changeDataFeed" => "delta.enableChangeDataFeed"
      }
      val lines = Seq(
        commitInfoLine("EnableFeature"),
        DeltaFixture.protocolFeaturesLine(newMinR, 7,
          newRFeats, newWFeats),
        DeltaFixture.metaDataLine(snap.metaId, snap.schema,
          snap.partitionColumns,
          configuration = snap.configuration + (cfgKey -> "true")))
      val version = snap.version + 1
      if (tryCommit(fs, logDir, version, lines)) return version
      attempts += 1
      if (attempts > maxRetries)
        fail(tablePath, s"enableFeature lost $maxRetries version races")
    }
    sys.error("unreachable")
  }

  /** The schema's GENERATED columns: (column, generation SQL). */
  private def generatedCols(
      snap: DeltaRead.DeltaSnapshot): Seq[(String, String)] =
    snap.schema.fields.toSeq.flatMap { f =>
      if (f.metadata.contains("delta.generationExpression"))
        Some(f.name -> f.metadata.getString("delta.generationExpression"))
      else None
    }

  /** The schema's column INVARIANTS: (column, predicate SQL). Delta
    * stores them as field metadata `delta.invariants` =
    * `{"expression":{"expression":"<pred>"}}`; an unparseable
    * invariant refuses loudly (an obligation we cannot read cannot be
    * honored).
    */
  private def invariantsOf(
      tablePath: String,
      snap: DeltaRead.DeltaSnapshot): Seq[(String, String)] =
    snap.schema.fields.toSeq.flatMap { f =>
      if (!f.metadata.contains("delta.invariants")) None
      else {
        val raw = f.metadata.getString("delta.invariants")
        val pred =
          try Option(mapper.readTree(raw).path("expression")
            .path("expression")).filter(_.isTextual).map(_.asText())
          catch { case _: Exception => None }
        Some(f.name -> pred.getOrElse(
          fail(tablePath, s"column '${f.name}' declares an invariant " +
            s"this writer cannot parse ($raw) — write refused")))
      }
    }

  /** Fill MISSING generated columns by computing their expressions —
    * the standard insert shape (real engines let writers omit them).
    * Columns the caller DID provide pass through and get validated
    * against the expression in [[enforceRowObligations]].
    */
  private def completeGenerated(
      snap: DeltaRead.DeltaSnapshot,
      df: DataFrame): DataFrame =
    generatedCols(snap).foldLeft(df) { case (acc, (c, e)) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, expr(e))
    }

  /** Enforce every row-level write obligation the table declares over
    * the freshly written rows, in ONE aggregate: CHECK constraints
    * (`delta.constraints.<name>`, writer v3), column INVARIANTS
    * (field metadata, writer v2), and GENERATED-column consistency
    * (caller-provided values must null-safely equal the declared
    * expression, writer v4) — honored rather than refused. Any
    * violation refuses the commit loudly with the obligation's name.
    * NULL CHECK/invariant results PASS (SQL CHECK semantics); deletes
    * need no check (removing rows cannot violate a row predicate).
    */
  private def enforceRowObligations(
      tablePath: String,
      snap: DeltaRead.DeltaSnapshot,
      df: DataFrame): Unit = {
    val checks: Seq[(String, Column)] =
      snap.configuration.toSeq
        .filter(_._1.startsWith("delta.constraints."))
        .map { case (k, v) =>
          (s"CHECK constraint '${k.stripPrefix("delta.constraints.")}' ($v)",
            !coalesce(expr(v).cast("boolean"), lit(true)))
        } ++
        invariantsOf(tablePath, snap).map { case (c, v) =>
          (s"invariant on column '$c' ($v)",
            !coalesce(expr(v).cast("boolean"), lit(true)))
        } ++
        generatedCols(snap).map { case (c, e) =>
          (s"generated column '$c' ($e)", !(col(c) <=> expr(e)))
        }
    if (checks.isEmpty) return
    val sorted = checks.sortBy(_._1)
    val aggs = sorted.map { case (_, bad) =>
      count(when(bad, lit(1)))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    sorted.zipWithIndex.foreach { case ((name, _), i) =>
      val v = row.getLong(i)
      if (v > 0)
        fail(tablePath, s"$name violated by $v incoming row(s) — " +
          "commit refused")
    }
  }

  /** Exact schema + partitioning match against the table (names and
    * types positionally by name; nullability ignored — parquet makes
    * no promises there anyway).
    */
  private def checkSchema(
      path: String,
      incoming: StructType,
      partitionBy: Seq[String],
      snap: DeltaRead.DeltaSnapshot): Unit = {
    if (partitionBy != snap.partitionColumns)
      fail(path, s"partitionBy ${partitionBy.mkString(",")} != table's " +
        s"partition columns ${snap.partitionColumns.mkString(",")}")
    val want = snap.schema.map(f => f.name -> f.dataType).toMap
    val got = incoming.map(f => f.name -> f.dataType).toMap
    if (want != got)
      fail(path, "schema mismatch — table has " +
        s"${snap.schema.map(f => s"${f.name}:${f.dataType.simpleString}")
          .mkString(",")} vs incoming " +
        s"${incoming.map(f => s"${f.name}:${f.dataType.simpleString}")
          .mkString(",")}; schema evolution is not a silent write " +
        "side effect")
  }

  /** Writer-side protocol gate over everything the log chain declares:
    * JSON commits' protocol/metaData actions plus (when the readable
    * head is a checkpoint) the checkpoint's protocol/metaData rows.
    * Writer versions 1-4 pass with ALL their obligations honored:
    * appendOnly (overwrites refuse), CHECK constraints + column
    * invariants + generated-column consistency (enforced per commit
    * via [[completeGenerated]] + [[enforceRowObligations]]), and
    * change data feed ([[merge]]/DML write cdc actions under
    * `delta.enableChangeDataFeed=true`). Writer version 7 passes when
    * its EXPLICIT feature list is a subset of the features this
    * writer honors; anything else refuses loudly.
    */
  private def writerGate(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      logDir: Path,
      root: Path,
      overwrite: Boolean): Unit = {
    LakeCommit.gate(spark, root)
    val names = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
    // v7 feature lists are EXPLICIT obligations: accept only the ones
    // this writer honors — deletionVectors (DV-aware scans/merges,
    // DV-safe vacuum), changeDataFeed (cdc actions on merge/DML),
    // appendOnly (gateConfig), and checkConstraints / invariants /
    // generatedColumns (all ENFORCED on every write path via
    // completeGenerated + enforceRowObligations)
    val supportedWriterFeatures = Set("deletionVectors",
      "changeDataFeed", "appendOnly", "invariants", "checkConstraints",
      "generatedColumns")
    def gateProtocol(minWriter: Int, feats: String): Unit = {
      val featSet = feats.replaceAll("[\\[\\]\"\\s]", "")
        .split(",").filter(_.nonEmpty).toSet
      if (minWriter == 7 && featSet.nonEmpty &&
        featSet.subsetOf(supportedWriterFeatures))
        () // explicit features, all honored (featureless v7 refuses —
      // a v7 table that listed nothing is malformed, not trusted)
      else if (minWriter > 4 || featSet.nonEmpty)
        fail(root.toString, s"table requires writer version $minWriter" +
          (if (feats.nonEmpty) s" with features $feats" else "") +
          " — only writer versions <= 4 (no writer features) or v7 " +
          s"with features ⊆ ${supportedWriterFeatures.mkString(",")} " +
          "are supported")
    }
    def gateConfig(cfg: Map[String, String]): Unit =
      if (overwrite && cfg.get("delta.appendOnly").contains("true"))
        fail(root.toString,
          "table is delta.appendOnly=true — overwrite refused")
    names.filter(_.matches("\\d{20}\\.json")).foreach { n =>
      val bytes = graft.ScratchSpace.readBytes(
        spark, new Path(logDir, n).toString)
      // an unparseable line skips ONLY itself: pre-checkpoint commits
      // are never replayed by the reader, so bailing out of the whole
      // gate on first garbage would let one bad line disable the
      // protocol/appendOnly check for every later commit
      new String(bytes, "UTF-8").linesIterator
        .map(_.trim).filter(_.nonEmpty)
        .flatMap { line =>
          try Some(mapper.readTree(line))
          catch { case _: Exception => None }
        }
        .foreach { node =>
          val proto = node.get("protocol")
          if (proto != null)
            gateProtocol(
              Option(proto.get("minWriterVersion")).map(_.asInt(2))
                .getOrElse(2),
              // a present-but-EMPTY writerFeatures array declares
              // nothing — stringify only the non-empty case
              Option(proto.get("writerFeatures"))
                .filter(n => !n.isNull && n.size() > 0)
                .map(_.toString).getOrElse(""))
          val meta = node.get("metaData")
          if (meta != null) {
            val cfgNode = meta.get("configuration")
            if (cfgNode != null && !cfgNode.isNull) {
              val it = cfgNode.properties().iterator()
              val b = Map.newBuilder[String, String]
              while (it.hasNext) {
                val e = it.next()
                b += e.getKey -> e.getValue.asText()
              }
              gateConfig(b.result())
            }
          }
        }
    }
    names.filter(_.matches("\\d{20}\\.checkpoint\\.parquet")).foreach { n =>
      val cp = spark.read.parquet(new Path(logDir, n).toString)
      val top = cp.schema.fieldNames.toSet
      if (top.contains("protocol")) {
        val pf = cp.schema("protocol").dataType
          .asInstanceOf[StructType].fieldNames.toSet
        val featCol =
          if (pf.contains("writerFeatures"))
            col("protocol.writerFeatures").cast("string")
          else lit(null).cast("string")
        cp.where(col("protocol").isNotNull)
          .select(col("protocol.minWriterVersion"), featCol)
          .collect().foreach { r =>
            gateProtocol(
              if (r.isNullAt(0)) 2 else r.getInt(0),
              if (r.isNullAt(1)) "" else r.getString(1))
          }
      }
      if (top.contains("metaData")) {
        val mf = cp.schema("metaData").dataType
          .asInstanceOf[StructType].fieldNames.toSet
        if (mf.contains("configuration"))
          cp.where(col("metaData").isNotNull)
            .select(col("metaData.configuration"))
            .collect().foreach { r =>
              if (!r.isNullAt(0))
                gateConfig(r.getMap[String, String](0).toMap)
            }
      }
    }
  }

  /** Stage-write change rows into `_change_data/` (unpartitioned cdc
    * files for [[DeltaRead.readCdf]]); returns (relPath, size) per
    * file for the commit's cdc actions. Distributed write — no
    * single-file coalesce; empty change sets produce no files
    * (zero-row parts drop via ONE aggregated per-file count, the
    * [[writeData]] shape — never a driver-side job per part file).
    */
  private def writeChangeData(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path,
      df: DataFrame): Seq[(String, Long)] = {
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(root, s"_staging-cdc-$nonce")
    df.write.mode("overwrite").parquet(stage.toString)
    val parts = fs.listStatus(stage).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-") &&
        st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    // path forms differ between the scan's _metadata.file_path and
    // makeQualified().toUri (file:/ vs file:///) — match on the
    // scheme-normalized form, DeltaRead's file-identity rule
    val nonEmpty: Set[String] =
      if (parts.isEmpty) Set.empty
      else spark.read.parquet(parts.map(_.getPath.toString): _*)
        .groupBy(col("_metadata.file_path")).count()
        .collect().map(r => DeltaRead.normalizeStr(r.getString(0))).toSet
    val out = Seq.newBuilder[(String, Long)]
    var i = 0
    parts.foreach { st =>
      if (nonEmpty.contains(DeltaRead.normalizeStr(
        fs.makeQualified(st.getPath).toUri.toString))) {
        val rel = s"_change_data/cdc-$nonce-$i.parquet"
        val dest = new Path(root, rel)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(st.getPath, dest))
          fail(root.toString, s"rename to $dest failed")
        out += ((rel, fs.getFileStatus(dest).getLen))
        i += 1
      }
    }
    fs.delete(stage, true): Unit
    out.result()
  }

  /** Stage-write the DataFrame inside the table, rename part files to
    * their final partition locations, and (optionally) collect
    * per-file stats with one aggregate over the fresh files.
    */
  private def writeData(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path,
      df: DataFrame,
      partitionBy: Seq[String],
      collectStats: Boolean): Seq[NewFile] = {
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(root, s"_staging-$nonce")
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(stage.toString)
    // walk the stage tree: every part file's path relative to stage IS
    // its final path relative to the table root (Spark already wrote
    // the <col>=<val>/ layout with partition columns dropped from the
    // data — exactly Delta's physical shape)
    val moved =
      Seq.newBuilder[(String, Map[String, Option[String]], Long, String)]
    def walk(dir: Path, rel: Seq[String]): Unit =
      fs.listStatus(dir).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath, rel :+ name)
        else if (name.startsWith("part-") && name.endsWith(".parquet")) {
          val relPath = (rel :+ name).mkString("/")
          val dest = new Path(root, relPath)
          fs.mkdirs(dest.getParent)
          if (!fs.rename(st.getPath, dest))
            fail(root.toString, s"rename to $dest failed")
          val pvs = rel.filter(_.contains('=')).map { seg =>
            val k = seg.takeWhile(_ != '=')
            val v = unescapePathName(seg.drop(k.length + 1))
            k -> (if (v == "__HIVE_DEFAULT_PARTITION__") None else Some(v))
          }.toMap
          // stats key = the scan's `_metadata.file_path` form (URI-
          // encoded, qualified) — part file NAMES repeat across
          // partition dirs of one job, so names cannot key anything
          moved += ((relPath, pvs, st.getLen,
            fs.makeQualified(dest).toUri.toString))
        }
      }
    walk(stage, Seq.empty)
    fs.delete(stage, true): Unit
    val files = moved.result()
    if (files.isEmpty) return Seq.empty
    val statsByPath: Map[String, String] =
      if (!collectStats) Map.empty
      else {
        val dataSchema = StructType(
          df.schema.filterNot(f => partitionBy.contains(f.name)))
        val longCols = dataSchema.fields
          .filter(_.dataType == LongType).map(_.name).toSeq
        val aggs = count(lit(1)).as("__n") +:
          longCols.flatMap(c => Seq(
            min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))
        val paths = files.map(f => new Path(root, f._1).toString)
        spark.read.schema(dataSchema).parquet(paths: _*)
          .groupBy(col("_metadata.file_path").as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val mm = longCols.flatMap { c =>
              val lo = r.getAs[Any](s"__min_$c")
              val hi = r.getAs[Any](s"__max_$c")
              if (lo == null || hi == null) None
              else
                Some(c -> ((lo.asInstanceOf[Long], hi.asInstanceOf[Long])))
            }.toMap
            r.getString(0) -> DeltaFixture.statsJson(r.getAs[Long]("__n"), mm)
          }.toMap
      }
    files.flatMap { case (rel, pvs, size, uriPath) =>
      val stats = statsByPath.get(uriPath)
      if (collectStats && stats.isEmpty) {
        // no stats group = the file produced no rows in the aggregate.
        // A ZERO-ROW part file (Spark writes them when a shuffle
        // partition lands empty) is dropped from the commit — real
        // writers never add empty files. A NON-empty file missing its
        // stats would be a writer/scan path-form mismatch: fail loudly
        // rather than commit partial stats.
        val dest = new Path(root, rel)
        val n = spark.read.parquet(dest.toString).count()
        if (n > 0)
          fail(root.toString, s"stats pass missed non-empty file " +
            s"$uriPath (${statsByPath.size} stats rows) — path-form " +
            "mismatch between writer and scan; refusing a " +
            "partial-stats commit")
        fs.delete(dest, false): Unit
        None
      } else Some(NewFile(encodeRelPath(rel), size, pvs, stats))
    }
  }

  /** Delta add paths are RFC 2396 URI-encoded relative paths. */
  private[sources] def encodeRelPath(rel: String): String =
    new java.net.URI(null, null, rel, null).getRawPath

  /** Inverse of Spark's partition-dir escaping (`%XX` hex pairs);
    * malformed escapes stay literal.
    */
  private[sources] def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        isHexDigit(s.charAt(i + 1)) && isHexDigit(s.charAt(i + 2))) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
      (c >= 'A' && c <= 'F')

  private def commitInfoLine(op: String): String = {
    val root = mapper.createObjectNode()
    val ci = root.putObject("commitInfo")
    ci.put("operation", op)
    ci.put("timestamp", System.currentTimeMillis())
    ci.put("engineInfo", "graft")
    mapper.writeValueAsString(root)
  }

  /** Torn-write debris younger than this is NEVER healed: a racing
    * committer's file is legitimately visible-but-partial between its
    * `fs.create()` and `close()`, and deleting it would let two
    * writers both succeed at one version (losing a commit's adds).
    * One hour is far beyond any close() latency and far below any
    * operational cleanup cadence.
    */
  private[sources] val HealStalenessMs = 3600L * 1000

  /** One create-exclusive commit file; false = version taken. A
    * leftover file that fails even a JSON-line parse AND is older than
    * [[HealStalenessMs]] is a torn write from a committer that crashed
    * long ago: deleted and retried once (the [[DatasetIO]] manifest
    * self-heal rule). A RECENT unparseable file is treated as an
    * in-flight concurrent commit — never deleted; the caller loses the
    * version race and retries at the next version.
    *
    * Mutual-exclusion caveat (mirrors the real Delta LogStore
    * requirement): `fs.create(path, overwrite=false)` is only atomic
    * on HDFS-class filesystems. On raw S3 (and RawLocalFileSystem)
    * it is check-then-create, so concurrent committers from SEPARATE
    * processes can race undetected; single-writer-per-table (or an
    * external lock) is the deployment contract there, exactly as
    * delta-io documents for S3 without a coordinating LogStore.
    */
  private def tryCommit(
      fs: org.apache.hadoop.fs.FileSystem,
      logDir: Path,
      version: Long,
      lines: Seq[String]): Boolean = {
    fs.mkdirs(logDir)
    val dest = new Path(logDir, f"$version%020d.json")
    val bytes = (lines.mkString("\n") + "\n").getBytes("UTF-8")
    def attempt(): Boolean =
      try {
        val out = fs.create(dest, /*overwrite=*/ false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: java.io.IOException if fs.exists(dest) => false
      }
    if (attempt()) return true
    // parseable existing file = a committed version; unparseable AND
    // stale = torn crash debris, heal once; unparseable but FRESH =
    // a concurrent committer mid-close — hands off
    val healable =
      try {
        val st = fs.getFileStatus(dest)
        val stale =
          System.currentTimeMillis() - st.getModificationTime >
            HealStalenessMs
        if (!stale) false
        else {
          val buf = new Array[Byte](st.getLen.toInt)
          val in = fs.open(dest)
          try in.readFully(0L, buf) finally in.close()
          val text = new String(buf, "UTF-8")
          !(buf.nonEmpty && text.endsWith("\n") &&
            text.linesIterator.filter(_.trim.nonEmpty)
              .forall(l => try { mapper.readTree(l); true }
                catch { case _: Exception => false }))
        }
      } catch { case _: Exception => false }
    if (!healable) false
    else {
      fs.delete(dest, false)
      attempt()
    }
  }
}
