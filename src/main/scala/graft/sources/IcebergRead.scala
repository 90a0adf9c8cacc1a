package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.file.DataFileReader
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}
import org.apache.spark.sql.types._

/** Read-only Apache Iceberg table scan — the lake's OTHER table
  * format after Delta ([[DeltaRead]]): metadata-JSON → manifest-list
  * (Avro OCF) → manifests (Avro OCF) → live parquet files, per the
  * PUBLIC Iceberg table spec (iceberg.apache.org/spec). Avro decoding
  * rides the Apache Avro core library already on every Spark
  * classpath (avro-1.12 — Spark's own IPC/shuffle dependency), read
  * through the Hadoop FS API ([[FsInput]]) so `s3a://` tables work
  * like local ones.
  *
  * Scope (refuse-loudly outside it):
  *  - format-version 1 and 2 metadata; the CURRENT metadata file is
  *    found via `metadata/version-hint.text` or the highest
  *    `v<N>.metadata.json`;
  *  - snapshots via `manifest-list` (the modern shape) or the v1
  *    inline `manifests` array; time travel by snapshot-id (each
  *    snapshot reads with ITS schema-id when present) or by
  *    timestamp ([[snapshotIdAt]] — latest `timestamp-ms` at or
  *    before the asked instant);
  *  - columns resolve BY FIELD ID, the spec's rule: the schema JSON's
  *    per-field `id` rides into the requested Spark schema as
  *    `parquet.field.id` metadata and Spark's parquet reader matches
  *    footer field ids — renamed columns read correctly (old files
  *    keep old physical names, same ids). Data files WITHOUT footer
  *    field ids refuse loudly (Spark's ignoreMissing=false path)
  *    rather than silently resolving by name;
  *  - v2 merge-on-read POSITION deletes read: delete files' rows of
  *    (file_path, pos) anti-join the scan on the file's canonical
  *    identity + `_metadata.row_index`. EQUALITY deletes read too:
  *    per equality-id group, a distributed anti-join on null-safe
  *    column equality gated by the spec's sequence-number rule
  *    (a delete applies only to data files with a STRICTLY SMALLER
  *    data sequence number). Partition-scoped equality deletes (a
  *    non-empty partition spec) refuse loudly — applying them
  *    table-wide could over-delete;
  *  - schema: primitives (boolean/int/long/float/double/date/string/
  *    binary/decimal/timestamp/timestamptz) + struct/list/map,
  *    converted from the Iceberg schema JSON; uuid/fixed/time refuse.
  *
  * Unlike Delta/Hive, Iceberg data files CONTAIN their identity
  * partition columns, so the scan needs no partition re-attach: the
  * live-file list feeds ONE distributed parquet read with the
  * metadata schema enforced. The metadata walk is driver-side (it is
  * metadata, like the reference's key listing); manifests carry
  * `record_count` per file, which powers the metadata-only
  * [[countRows]] exactly like Delta's stats path. Delete application
  * is fully distributed: the only driver-grain state is the
  * manifest-bounded file list (≤ MaxFiles), broadcast as the
  * file-identity map.
  */
object IcebergRead {

  private val mapper = new ObjectMapper()
  private val MaxFiles = 100000

  private def fail(path: String, why: String): Nothing =
    throw new IllegalArgumentException(s"IcebergRead: $path — $why")

  /** One live data file from the manifest walk. `seq` is the data
    * sequence number (entry's own, else inherited from its
    * manifest-list row when ADDED); None when unresolvable — benign
    * unless equality deletes are present (then the read refuses).
    * `partition` carries the manifest entry's identity-partition
    * values, stringified (null values absent) — what [[readPruned]]
    * skips files by.
    */
  final case class IcebergFile(
      path: String,
      recordCount: Long,
      seq: Option[Long] = None,
      partition: Map[String, String] = Map.empty)

  /** One live equality-delete file: its rows delete any data row
    * whose `equalityIds` columns all match (null-safe) in data files
    * with data sequence number < `seq`.
    */
  final case class EqDeleteFile(
      path: String,
      seq: Long,
      equalityIds: Seq[Int])

  /** The resolved state of a snapshot. `deleteFiles` are live
    * POSITION-delete parquet files (v2 merge-on-read): rows of
    * (file_path, pos) masking data rows by file + row position;
    * `eqDeleteFiles` are EQUALITY-delete files.
    */
  final case class IcebergSnapshot(
      snapshotId: Long,
      schema: StructType,
      liveFiles: Seq[IcebergFile],
      deleteFiles: Seq[IcebergFile] = Seq.empty,
      eqDeleteFiles: Seq[EqDeleteFile] = Seq.empty)

  /** Snapshot ids present in the table metadata, ascending. */
  def snapshots(spark: SparkSession, path: String): Seq[Long] = {
    val (meta, _, _) = loadMetadata(spark, path)
    snapshotNodes(meta).map(_.get("snapshot-id").asLong()).sorted
  }

  /** Snapshot ids in COMMIT order — by sequence number (monotonic per
    * the v2 spec), ties/absences by timestamp then metadata-array
    * position. Snapshot IDS are arbitrary (external writers use
    * random longs), so id order must never stand in for history
    * order; the incremental readers walk THIS order.
    */
  def snapshotsInCommitOrder(
      spark: SparkSession,
      path: String): Seq[Long] = {
    val (meta, _, _) = loadMetadata(spark, path)
    snapshotNodes(meta).zipWithIndex.sortBy { case (s, i) =>
      (Option(s.get("sequence-number")).filter(_.isNumber)
        .map(_.asLong()).getOrElse(Long.MinValue),
        Option(s.get("timestamp-ms")).filter(_.isNumber)
          .map(_.asLong()).getOrElse(Long.MinValue),
        i.toLong)
    }.map(_._1.get("snapshot-id").asLong())
  }

  /** Resolve a timestamp (epoch millis) to the snapshot the table was
    * at: the LATEST snapshot whose `timestamp-ms` <= the instant —
    * the resolution humans use for time travel. Refuses before the
    * first snapshot (the table did not exist yet).
    */
  def snapshotIdAt(
      spark: SparkSession,
      path: String,
      timestampMs: Long): Long = {
    val (meta, _, _) = loadMetadata(spark, path)
    val stamped = snapshotNodes(meta).map { s =>
      val ts = Option(s.get("timestamp-ms")).filter(_.isNumber)
        .map(_.asLong())
        .getOrElse(fail(path,
          s"snapshot ${s.get("snapshot-id")} without timestamp-ms"))
      (ts, s.get("snapshot-id").asLong())
    }.sorted
    if (stamped.isEmpty) fail(path, "table has no snapshots")
    val atOrBefore = stamped.takeWhile(_._1 <= timestampMs)
    if (atOrBefore.isEmpty)
      fail(path, s"timestamp $timestampMs precedes the first snapshot " +
        s"(${stamped.head._1}) — the table did not exist yet")
    atOrBefore.last._2
  }

  private def snapshotNodes(meta: JsonNode): Seq[JsonNode] =
    Option(meta.get("snapshots")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get(_)))
      .getOrElse(Seq.empty)

  private[sources] def loadMetadata(
      spark: SparkSession,
      path: String): (JsonNode, Path, org.apache.hadoop.fs.FileSystem) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val metaDir = new Path(root, "metadata")
    if (!fs.exists(metaDir))
      fail(path, "no metadata/ directory — not an Iceberg table")
    // the hint is ADVISORY: commits are create-exclusive monotonic
    // version files, so the true current version is the newer of the
    // hint and the highest listed v<N> — a hint gone stale mid-commit
    // (or planted) must never fork history for readers or appenders
    val hint = new Path(metaDir, "version-hint.text")
    val hinted: Option[Long] =
      if (!fs.exists(hint)) None
      else {
        val in = fs.open(hint)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        Some(txt.toLongOption.getOrElse(
          fail(path, s"unparseable version-hint.text: '$txt'")))
      }
    val re = "v(\\d+)\\.metadata\\.json".r
    val listed = fs.listStatus(metaDir).toSeq
      .map(_.getPath.getName)
      .flatMap {
        case re(n) => Some(n.toLong)
        case _ => None
      }
    val metaFile = (hinted ++ listed).maxOption match {
      case None =>
        fail(path, "no v<N>.metadata.json and no version-hint.text — " +
          "unrecognized metadata layout")
      case Some(v) => new Path(metaDir, s"v$v.metadata.json")
    }
    if (!fs.exists(metaFile))
      fail(path, s"metadata file ${metaFile.getName} missing")
    val in = fs.open(metaFile)
    val node =
      try mapper.readTree(in)
      finally in.close()
    val fv = Option(node.get("format-version")).map(_.asInt())
      .getOrElse(fail(path, "metadata without format-version"))
    if (fv != 1 && fv != 2)
      fail(path, s"format-version $fv unsupported (1 and 2 only)")
    (node, root, fs)
  }

  /** True when any partition spec in the metadata carries fields —
    * the table is (or was) partitioned. v2 `partition-specs`, v1
    * `partition-spec`.
    */
  private def hasPartitionFields(meta: JsonNode): Boolean = {
    val v2 = Option(meta.get("partition-specs")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get(_)))
      .getOrElse(Seq.empty)
      .exists(s => Option(s.get("fields")).exists(f =>
        f.isArray && f.size() > 0))
    val v1 = Option(meta.get("partition-spec"))
      .exists(f => f.isArray && f.size() > 0)
    v2 || v1
  }

  /** Resolve a snapshot (default: current) to its schema + live data
    * files via the manifest-list / manifest Avro walk.
    */
  def snapshot(
      spark: SparkSession,
      path: String,
      snapshotId: Option[Long] = None): IcebergSnapshot = {
    val (meta, root, fs) = loadMetadata(spark, path)
    val conf = spark.sessionState.newHadoopConf()
    val snaps = snapshotNodes(meta)
    if (snaps.isEmpty) fail(path, "table has no snapshots")
    val wantId = snapshotId.orElse(
      Option(meta.get("current-snapshot-id")).filter(_.isNumber)
        .map(_.asLong()).filter(_ != -1L))
      .getOrElse(fail(path, "no current-snapshot-id in metadata"))
    val snap = snaps.find(_.get("snapshot-id").asLong() == wantId)
      .getOrElse(fail(path, s"snapshot $wantId not in metadata (have " +
        s"${snaps.map(_.get("snapshot-id").asLong()).sorted.mkString(",")})"))
    val schema = schemaFor(path, meta, snap)
    // manifest paths with their manifest-list content code (0 = data,
    // 1 = deletes) and sequence number: the modern manifest-list
    // Avro, or v1's inline list (no sequence numbers there)
    val manifestPaths: Seq[(String, Long, Option[Long])] =
      Option(snap.get("manifest-list")).filter(!_.isNull) match {
        case Some(ml) =>
          readAvro(fs, conf, resolve(root, ml.asText()), path).map {
            rec =>
              val mp = str(rec, "manifest_path").getOrElse(
                fail(path, "manifest_file without manifest_path"))
              (mp, long(rec, "content").getOrElse(0L),
                long(rec, "sequence_number"))
          }
        case None =>
          Option(snap.get("manifests")).filter(_.isArray)
            .map(a => (0 until a.size()).map(i =>
              (a.get(i).asText(), 0L, None: Option[Long])))
            .getOrElse(fail(path,
              "snapshot has neither manifest-list nor manifests"))
      }
    val live = Seq.newBuilder[IcebergFile]
    val deletes = Seq.newBuilder[IcebergFile]
    val eqDeletes = Seq.newBuilder[EqDeleteFile]
    var n = 0
    manifestPaths.foreach { case (mp, mContent, mSeq) =>
      readAvro(fs, conf, resolve(root, mp), path).foreach { rec =>
        val status = long(rec, "status").getOrElse(0L)
        if (status != 2L) { // 2 = DELETED
          val df = Option(rec.get("data_file"))
            .collect { case r: GenericRecord => r }
            .getOrElse(fail(path, "manifest_entry without data_file"))
          val content = long(df, "content").getOrElse(0L)
          val fp = str(df, "file_path").getOrElse(
            fail(path, "data_file without file_path"))
          val fmt = str(df, "file_format").getOrElse("PARQUET")
          if (!fmt.equalsIgnoreCase("parquet"))
            fail(path, s"data file format '$fmt' unsupported " +
              "(parquet only)")
          val rc = long(df, "record_count").getOrElse(
            fail(path, "data_file without record_count"))
          // spec inheritance: an entry's own sequence_number wins; an
          // ADDED (status 1) entry without one inherits its manifest's
          val seq = long(rec, "sequence_number")
            .orElse(if (status == 1L) mSeq else None)
          // identity-partition values ride in the entry's partition
          // record (absent field or null values = unpartitioned)
          val pvals: Map[String, String] =
            if (df.getSchema.getField("partition") == null) Map.empty
            else Option(df.get("partition"))
              .collect { case r: GenericRecord => r }
              .map(r => r.getSchema.getFields.asScala.flatMap { f =>
                Option(r.get(f.name)).map(v => f.name -> v.toString)
              }.toMap).getOrElse(Map.empty)
          (mContent, content) match {
            case (0L, 0L) => live += IcebergFile(fp, rc, seq, pvals)
            case (1L, 1L) => deletes += IcebergFile(fp, rc, seq)
            case (1L, 2L) =>
              eqDeletes += EqDeleteFile(fp,
                seq.getOrElse(fail(path,
                  s"equality-delete file $fp without a resolvable " +
                    "sequence number")),
                ints(df, "equality_ids").getOrElse(fail(path,
                  s"equality-delete file $fp without equality_ids")))
            case (mc, dc) =>
              fail(path, s"manifest content=$mc carries a data_file " +
                s"with content=$dc — malformed manifest")
          }
          n += 1
          if (n > MaxFiles)
            fail(path, s"snapshot holds > $MaxFiles live files — " +
              "driver metadata walk refused; read with a full engine")
        }
      }
    }
    val eq = eqDeletes.result()
    if (eq.nonEmpty && hasPartitionFields(meta))
      fail(path, "snapshot carries EQUALITY delete files on a " +
        "PARTITIONED table — partition-scoped equality deletes are " +
        "unsupported (applying them table-wide could over-delete); " +
        "read with a full engine")
    IcebergSnapshot(wantId, schema, live.result(), deletes.result(), eq)
  }

  /** Scan the live data of an Iceberg table (optionally at a past
    * snapshot): ONE distributed parquet read with the metadata schema
    * enforced, columns resolved by FIELD ID (identity partition
    * columns live IN the files — no re-attach join needed).
    *
    * POSITION deletes (v2 merge-on-read) fold in as ONE distributed
    * anti-join keyed on the file's CANONICAL identity: the manifest
    * walk yields every live file's spec-verbatim `file_path` AND its
    * qualified-URI forms, broadcast as a (variant → canonical) map;
    * the scan side keys by `_metadata.file_path` (an exact
    * qualified-URI match — no lossy string normalization, so paths
    * with spaces/percent/unicode match exactly), the delete side
    * translates its raw `file_path` strings through the same map
    * (stale rows referencing vanished files drop in the translate
    * join — harmless by construction). Sequence numbers need no
    * bookkeeping for position deletes: data files are immutable with
    * unique paths, so a delete row either matches its original
    * target or nothing.
    *
    * EQUALITY deletes apply after: per distinct equality-id set, the
    * delete files' rows anti-join the scan on null-safe equality of
    * the id-resolved columns, gated by data_seq < delete_seq (the
    * spec's strict rule — rows re-inserted AFTER the delete survive).
    */
  def read(
      spark: SparkSession,
      path: String,
      snapshotId: Option[Long] = None): DataFrame =
    readInternal(spark, path, snapshotId, keepPos = false)

  /** [[read]] plus each row's source identity for DML writers:
    * `__file_path` (the data file's MANIFEST-VERBATIM path spelling —
    * what a position-delete file must reference per the spec) and
    * `__pos` (the row's position in its file).
    */
  private[sources] def readWithPos(
      spark: SparkSession,
      path: String,
      snapshotId: Option[Long] = None): DataFrame =
    readInternal(spark, path, snapshotId, keepPos = true)

  /** Partition-pruned scan: files whose manifest identity-partition
    * values match EVERY (column → stringified value) pair scan; every
    * other file is SKIPPED at the manifest walk — the metadata prune
    * that makes a partitioned 100 TB table pay for only the
    * partitions a query names. Matching is exact on the stringified
    * identity value (int/long/string transforms — the ones
    * [[IcebergWrite]] produces); a column absent from a file's
    * partition record never matches (partition evolution is not
    * guessed around).
    */
  def readPruned(
      spark: SparkSession,
      path: String,
      partitionEquals: Map[String, String],
      snapshotId: Option[Long] = None): DataFrame =
    readInternal(spark, path, snapshotId, keepPos = false,
      partitionEquals = partitionEquals)

  private def readInternal(
      spark: SparkSession,
      path: String,
      snapshotId: Option[Long],
      keepPos: Boolean,
      partitionEquals: Map[String, String] = Map.empty): DataFrame = {
    val snap0 = snapshot(spark, path, snapshotId)
    val snap =
      if (partitionEquals.isEmpty) snap0
      else snap0.copy(liveFiles = snap0.liveFiles.filter(f =>
        partitionEquals.forall { case (k, v) =>
          f.partition.get(k).contains(v)
        }))
    val outSchema =
      if (!keepPos) snap.schema
      else snap.schema.add("__file_path", StringType)
        .add("__pos", LongType)
    if (snap.liveFiles.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[Row](), outSchema)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    // field-id resolution: inert for schemas without id metadata,
    // load-bearing here — the session flag is how Spark's parquet
    // reader is told to match footer ids instead of names (per-read
    // options are ignored for this key; see [[FieldIds]])
    FieldIds.ensureReadEnabled(spark)
    val files = snap.liveFiles.map(f => resolve(root, f.path).toString)
    val scan0 = spark.read.schema(snap.schema).parquet(files: _*)
    if (!keepPos && snap.deleteFiles.isEmpty &&
      snap.eqDeleteFiles.isEmpty)
      return scan0.select(snap.schema.map(f => col(f.name)): _*)

    // canonical file identity: the qualified URI (what
    // _metadata.file_path carries), with every spelling a writer may
    // have used as a variant key
    def canonical(raw: String): String =
      fs.makeQualified(resolve(root, raw)).toUri.toString
    def variants(raw: String): Seq[String] = {
      val q = fs.makeQualified(resolve(root, raw))
      Seq(raw, q.toString, q.toUri.toString).distinct
    }
    val ss = spark
    import ss.implicits._
    val tagged = scan0
      .withColumn("__fp", col("_metadata.file_path"))
      .withColumn("__ri", col("_metadata.row_index"))

    val afterPos =
      if (snap.deleteFiles.isEmpty) tagged
      else {
        val variantRows = snap.liveFiles.flatMap { f =>
          val canon = canonical(f.path)
          variants(f.path).map(v => (v, canon))
        }.distinct
        val variantDf = variantRows.toDF("__variant", "__canon")
        val delPaths = snap.deleteFiles
          .map(f => resolve(root, f.path).toString)
        val delSchema = StructType(Seq(
          StructField("file_path", StringType),
          StructField("pos", LongType)))
        val dels = spark.read.schema(delSchema).parquet(delPaths: _*)
          .join(broadcast(variantDf),
            col("file_path") === col("__variant"))
          .select(col("__canon").as("__del_file"),
            col("pos").as("__del_pos"))
        tagged.join(dels,
          tagged("__fp") === dels("__del_file") &&
            tagged("__ri") === dels("__del_pos"),
          "left_anti")
      }

    val afterEq =
      if (snap.eqDeleteFiles.isEmpty) afterPos
      else {
        // data-side sequence numbers: broadcast (canonical → seq);
        // refuse if any live file's seq is unresolvable — applying
        // the strict < rule against a guessed seq would be silently
        // wrong in one direction or the other
        val seqRows = snap.liveFiles.map { f =>
          (canonical(f.path), f.seq.getOrElse(fail(path,
            s"data file ${f.path} has no resolvable sequence number " +
              "but the snapshot carries equality deletes")))
        }
        val seqDf = seqRows.toDF("__seq_canon", "__data_seq")
        val withSeq = afterPos.join(broadcast(seqDf),
          col("__fp") === col("__seq_canon"))
          .drop("__seq_canon")
        val idToName = fieldNamesById(snap.schema)
        snap.eqDeleteFiles.groupBy(_.equalityIds.sorted).toSeq
          .sortBy(_._1.mkString(","))
          .foldLeft(withSeq) { case (acc, (ids, delFiles)) =>
            val cols = ids.map(id => idToName.getOrElse(id,
              fail(path, s"equality_ids field id $id not in the " +
                "snapshot schema")))
            val delSchema = StructType(
              cols.map(c => snap.schema(c)))
            val dels = delFiles.map { d =>
              spark.read.schema(delSchema)
                .parquet(resolve(root, d.path).toString)
                .withColumn("__del_seq", lit(d.seq))
            }.reduce(_ unionByName _)
              .select(cols.map(c =>
                col(c).as(s"__del_$c")) :+ col("__del_seq"): _*)
            val cond = cols.map(c =>
              acc(c) <=> dels(s"__del_$c")).reduce(_ && _) &&
              acc("__data_seq") < dels("__del_seq")
            acc.join(dels, cond, "left_anti")
          }
      }
    if (!keepPos)
      afterEq.select(snap.schema.map(f => col(f.name)): _*)
    else {
      // attach the MANIFEST-VERBATIM file path (what delete files
      // must reference) via the same log-grain broadcast map shape
      val verbatim = snap.liveFiles
        .map(f => (canonical(f.path), f.path)).distinct
        .toDF("__v_canon", "__v_path")
      afterEq.join(broadcast(verbatim), col("__fp") === col("__v_canon"))
        .select(snap.schema.map(f => col(f.name)) ++ Seq(
          col("__v_path").as("__file_path"),
          col("__ri").as("__pos")): _*)
    }
  }

  /** [[read]] at the snapshot the table was at a given instant
    * (epoch millis) — [[snapshotIdAt]] resolution.
    */
  def readAsOfTimestamp(
      spark: SparkSession,
      path: String,
      timestampMs: Long): DataFrame =
    read(spark, path, Some(snapshotIdAt(spark, path, timestampMs)))

  /** Incremental (snapshot-range) read — the Iceberg twin of
    * [[DeltaRead.readChanges]] and the same semantics real engines
    * give `start-snapshot-id`: rows ADDED strictly AFTER
    * `afterSnapshotId` (exclusive) up to `toSnapshotId` (inclusive,
    * default current), each tagged `__snapshot_id` with the snapshot
    * that added its file. At 100 TB this is the difference between
    * consuming one day's appends and rescanning the table.
    *
    * Strict pure-append semantics: each in-range snapshot must be an
    * APPEND against its predecessor — a snapshot that introduces
    * delete files (position or equality) or drops live data files
    * (rewrite/overwrite) refuses loudly, because its row-level
    * changes cannot be attributed by file diff (updates/deletes would
    * double-count). Attribution is the LIVE-FILE SET DIFFERENCE
    * between consecutive snapshots (metadata-grain, driver-side —
    * like every manifest walk); the scan is ONE distributed parquet
    * read of the added files with the (file → snapshot) map
    * broadcast-attached.
    */
  def readIncremental(
      spark: SparkSession,
      path: String,
      afterSnapshotId: Long,
      toSnapshotId: Option[Long] = None): DataFrame = {
    // COMMIT order, never id order: snapshot ids are arbitrary longs
    // for external writers ([[snapshotsInCommitOrder]])
    val ids = snapshotsInCommitOrder(spark, path)
    val upTo = toSnapshotId.getOrElse(ids.last)
    if (!ids.contains(afterSnapshotId))
      fail(path, s"afterSnapshotId $afterSnapshotId is not a known " +
        s"snapshot (have ${ids.mkString(",")})")
    if (!ids.contains(upTo))
      fail(path, s"toSnapshotId $upTo is not a known snapshot")
    val fromIdx = ids.indexOf(afterSnapshotId)
    val toIdx = ids.indexOf(upTo)
    if (toIdx < fromIdx)
      fail(path, s"snapshot range $afterSnapshotId..$upTo is inverted")
    val range = ids.slice(fromIdx, toIdx + 1)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    def canonical(raw: String): String =
      fs.makeQualified(resolve(root, raw)).toUri.toString
    val endSnap = snapshot(spark, path, Some(upTo))
    val added = Seq.newBuilder[(String, Long)] // canonical -> snap id
    range.sliding(2).foreach {
      case Seq(a, b) =>
        val sa = snapshot(spark, path, Some(a))
        val sb = snapshot(spark, path, Some(b))
        val newDeletes =
          (sb.deleteFiles.map(f => canonical(f.path)).toSet --
            sa.deleteFiles.map(f => canonical(f.path)).toSet) ++
            (sb.eqDeleteFiles.map(f => canonical(f.path)).toSet --
              sa.eqDeleteFiles.map(f => canonical(f.path)).toSet)
        if (newDeletes.nonEmpty)
          fail(path, s"snapshot $b introduces DELETE files — not a " +
            "pure append (updates/deletes cannot be attributed by " +
            "file diff); re-read the full table instead")
        val aLive = sa.liveFiles.map(f => canonical(f.path)).toSet
        val bLive = sb.liveFiles.map(f => canonical(f.path)).toSet
        if (!(aLive -- bLive).isEmpty)
          fail(path, s"snapshot $b DROPS live data files — a " +
            "rewrite/overwrite, not an append; incremental read " +
            "refused")
        sb.liveFiles.filterNot(f => aLive(canonical(f.path)))
          .foreach(f => added += ((canonical(f.path), b)))
      case _ => () // single-snapshot range: nothing after `after`
    }
    val files = added.result()
    val outSchema = endSnap.schema.add("__snapshot_id", LongType)
    if (files.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[Row](), outSchema)
    FieldIds.ensureReadEnabled(spark)
    val ss = spark
    import ss.implicits._
    val tagMap = files.toDF("__inc_canon", "__snapshot_id")
    // scan paths derive from the SAME canonical URIs as the map keys,
    // so `_metadata.file_path` matches them exactly (the proven
    // readInternal pattern — no lossy normalization)
    val scan = spark.read.schema(endSnap.schema)
      .parquet(files.map(f =>
        new Path(new java.net.URI(f._1)).toString): _*)
    scan
      .withColumn("__fp", col("_metadata.file_path"))
      .join(broadcast(tagMap), col("__fp") === col("__inc_canon"))
      .select(endSnap.schema.map(f => col(f.name)) :+
        col("__snapshot_id"): _*)
  }

  /** field-id → field name for a schema produced by [[schemaFor]]
    * (ids ride in `parquet.field.id` metadata).
    */
  private def fieldNamesById(schema: StructType): Map[Int, String] =
    schema.fields.flatMap { f =>
      IcebergFixture.fieldIdOf(f).map(id => id.toInt -> f.name)
    }.toMap

  /** Metadata-only row count from the manifests' per-file
    * `record_count` — the Iceberg twin of [[DeltaRead.countRows]].
    * REFUSES when the snapshot carries delete files of either kind:
    * delete rows may be stale (their target vanished) or duplicated,
    * so a metadata subtraction would be silently wrong — scan instead
    * (exactly the stance real Iceberg engines take for merge-on-read
    * counts).
    */
  def countRows(
      spark: SparkSession,
      path: String,
      snapshotId: Option[Long] = None): Long = {
    val snap = snapshot(spark, path, snapshotId)
    if (snap.deleteFiles.nonEmpty || snap.eqDeleteFiles.nonEmpty)
      fail(path, "snapshot carries position-delete or equality-delete " +
        "files — a metadata-only count cannot subtract them exactly " +
        "(stale/duplicate delete rows); scan the table instead")
    snap.liveFiles.map(_.recordCount).sum
  }

  // ----------------------------------------------------------------
  // helpers
  // ----------------------------------------------------------------

  private def resolve(root: Path, raw: String): Path =
    if (raw.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*"))
      new Path(new java.net.URI(raw))
    else new Path(root, raw)

  private def str(rec: GenericRecord, field: String): Option[String] =
    if (rec.getSchema.getField(field) == null) None
    else Option(rec.get(field)).map(_.toString)

  private def long(rec: GenericRecord, field: String): Option[Long] =
    if (rec.getSchema.getField(field) == null) None
    else Option(rec.get(field)).collect {
      case n: java.lang.Number => n.longValue()
    }

  private def ints(rec: GenericRecord, field: String): Option[Seq[Int]] =
    if (rec.getSchema.getField(field) == null) None
    else Option(rec.get(field)).collect {
      // GenericArray implements java.util.List — one case covers both
      case l: java.util.List[_] =>
        l.asScala.toSeq.collect { case n: java.lang.Number => n.intValue() }
    }.filter(_.nonEmpty)

  /** All records of one Avro OCF file through the Hadoop FS API. */
  private[sources] def readAvro(
      fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      p: Path,
      table: String): Seq[GenericRecord] = {
    if (!fs.exists(p)) fail(table, s"manifest ${p.getName} missing")
    val reader =
      try new DataFileReader[GenericRecord](
        new FsInput(p, conf), new GenericDatumReader[GenericRecord]())
      catch {
        case e: java.io.IOException =>
          fail(table, s"unreadable Avro manifest ${p.getName}: " +
            e.getMessage)
      }
    try reader.iterator().asScala.toVector
    finally reader.close()
  }

  /** The snapshot's schema: its `schema-id` when present, else the
    * table's current schema (v2 `schemas`/`current-schema-id`, v1
    * `schema`).
    */
  private def schemaFor(
      path: String,
      meta: JsonNode,
      snap: JsonNode): StructType = {
    val schemasNode = Option(meta.get("schemas")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get(_)))
    val wanted = Option(snap.get("schema-id")).filter(_.isNumber)
      .map(_.asInt())
      .orElse(Option(meta.get("current-schema-id")).filter(_.isNumber)
        .map(_.asInt()))
    val node = (schemasNode, wanted) match {
      case (Some(ss), Some(id)) =>
        ss.find(s => Option(s.get("schema-id")).exists(_.asInt() == id))
          .getOrElse(fail(path, s"schema-id $id not in schemas"))
      case _ =>
        Option(meta.get("schema")).getOrElse(
          fail(path, "metadata without schema/schemas"))
    }
    toStruct(path, node)
  }

  private def toStruct(path: String, node: JsonNode): StructType = {
    val fields = Option(node.get("fields")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get(_)))
      .getOrElse(fail(path, "struct type without fields"))
    StructType(fields.map { f =>
      val name = f.get("name").asText()
      val required = Option(f.get("required")).exists(_.asBoolean(false))
      // the field id rides into the Spark schema: this is what makes
      // the parquet scan resolve columns by id (the spec's rule)
      val md = Option(f.get("id")).filter(_.isNumber)
        .map(id => new MetadataBuilder()
          .putLong(IcebergFixture.FieldIdKey, id.asLong()).build())
        .getOrElse(Metadata.empty)
      StructField(name, toType(path, f.get("type")), !required, md)
    })
  }

  private def toType(path: String, t: JsonNode): DataType =
    if (t.isTextual) t.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "string" => StringType
      case "binary" => BinaryType
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case dec if dec.startsWith("decimal(") =>
        val inner = dec.stripPrefix("decimal(").stripSuffix(")")
        val Array(p9, s9) = inner.split(",").map(_.trim.toInt)
        DecimalType(p9, s9)
      case other =>
        fail(path, s"Iceberg type '$other' unsupported " +
          "(uuid/fixed/time are out of scope)")
    } else Option(t.get("type")).map(_.asText()) match {
      case Some("struct") => toStruct(path, t)
      case Some("list") =>
        val req = Option(t.get("element-required"))
          .exists(_.asBoolean(false))
        ArrayType(toType(path, t.get("element")), !req)
      case Some("map") =>
        val req = Option(t.get("value-required"))
          .exists(_.asBoolean(false))
        MapType(toType(path, t.get("key")),
          toType(path, t.get("value")), !req)
      case other =>
        fail(path, s"unrecognized Iceberg type node '$other'")
    }
}
