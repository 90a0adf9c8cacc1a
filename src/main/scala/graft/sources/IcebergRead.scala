package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.file.DataFileReader
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  *    snapshot reads with ITS schema-id when present);
  *  - v2 merge-on-read POSITION deletes read (delete manifests'
  *    parquet files of (file_path, pos) anti-join the scan on
  *    `_metadata.row_index`); EQUALITY delete files refuse loudly,
  *    as does any non-parquet file format;
  *  - schema: primitives (boolean/int/long/float/double/date/string/
  *    binary/decimal/timestamp/timestamptz) + struct/list/map,
  *    converted from the Iceberg schema JSON; uuid/fixed/time refuse.
  *    Column resolution is BY NAME: tables that renamed columns keep
  *    old names inside old data files (Iceberg resolves by field id —
  *    parquet field-id resolution is out of scope), so renamed tables
  *    read wrong and are the caller's contract to avoid — documented
  *    bound, same class as [[DeltaRead]]'s nested-mapping refusal.
  *
  * Unlike Delta/Hive, Iceberg data files CONTAIN their identity
  * partition columns, so the scan needs no partition re-attach: the
  * live-file list feeds ONE distributed parquet read with the
  * metadata schema enforced. The metadata walk is driver-side (it is
  * metadata, like the reference's key listing); manifests carry
  * `record_count` per file, which powers the metadata-only
  * [[countRows]] exactly like Delta's stats path.
  */
object IcebergRead {

  private val mapper = new ObjectMapper()
  private val MaxFiles = 100000

  private def fail(path: String, why: String): Nothing =
    throw new IllegalArgumentException(s"IcebergRead: $path — $why")

  /** One live data file from the manifest walk. */
  final case class IcebergFile(path: String, recordCount: Long)

  /** The resolved state of a snapshot. `deleteFiles` are live
    * POSITION-delete parquet files (v2 merge-on-read): rows of
    * (file_path, pos) masking data rows by file + row position.
    */
  final case class IcebergSnapshot(
      snapshotId: Long,
      schema: StructType,
      liveFiles: Seq[IcebergFile],
      deleteFiles: Seq[IcebergFile] = Seq.empty)

  /** Snapshot ids present in the table metadata, ascending. */
  def snapshots(spark: SparkSession, path: String): Seq[Long] = {
    val (meta, _, _) = loadMetadata(spark, path)
    val snaps = Option(meta.get("snapshots")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get(_)))
      .getOrElse(Seq.empty)
    snaps.map(s => s.get("snapshot-id").asLong()).sorted
  }

  private def loadMetadata(
      spark: SparkSession,
      path: String): (JsonNode, Path, org.apache.hadoop.fs.FileSystem) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val metaDir = new Path(root, "metadata")
    if (!fs.exists(metaDir))
      fail(path, "no metadata/ directory — not an Iceberg table")
    val hint = new Path(metaDir, "version-hint.text")
    val metaFile =
      if (fs.exists(hint)) {
        val in = fs.open(hint)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        val v = txt.toLongOption.getOrElse(
          fail(path, s"unparseable version-hint.text: '$txt'"))
        new Path(metaDir, s"v$v.metadata.json")
      } else {
        val re = "v(\\d+)\\.metadata\\.json".r
        val versions = fs.listStatus(metaDir).toSeq
          .map(_.getPath.getName)
          .flatMap {
            case re(n) => Some(n.toLong)
            case _ => None
          }
        if (versions.isEmpty)
          fail(path, "no v<N>.metadata.json and no version-hint.text — " +
            "unrecognized metadata layout")
        new Path(metaDir, s"v${versions.max}.metadata.json")
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

  /** Resolve a snapshot (default: current) to its schema + live data
    * files via the manifest-list / manifest Avro walk.
    */
  def snapshot(
      spark: SparkSession,
      path: String,
      snapshotId: Option[Long] = None): IcebergSnapshot = {
    val (meta, root, fs) = loadMetadata(spark, path)
    val conf = spark.sessionState.newHadoopConf()
    val snaps = Option(meta.get("snapshots")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get(_)))
      .getOrElse(Seq.empty)
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
    // 1 = deletes): the modern manifest-list Avro, or v1's inline list
    val manifestPaths: Seq[(String, Long)] =
      Option(snap.get("manifest-list")).filter(!_.isNull) match {
        case Some(ml) =>
          readAvro(fs, conf, resolve(root, ml.asText()), path).map {
            rec =>
              val mp = str(rec, "manifest_path").getOrElse(
                fail(path, "manifest_file without manifest_path"))
              (mp, long(rec, "content").getOrElse(0L))
          }
        case None =>
          Option(snap.get("manifests")).filter(_.isArray)
            .map(a => (0 until a.size()).map(i => (a.get(i).asText(), 0L)))
            .getOrElse(fail(path,
              "snapshot has neither manifest-list nor manifests"))
      }
    val live = Seq.newBuilder[IcebergFile]
    val deletes = Seq.newBuilder[IcebergFile]
    var n = 0
    manifestPaths.foreach { case (mp, mContent) =>
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
          (mContent, content) match {
            case (0L, 0L) => live += IcebergFile(fp, rc)
            case (1L, 1L) => deletes += IcebergFile(fp, rc)
            case (1L, 2L) =>
              fail(path, "snapshot carries EQUALITY delete files — " +
                "equality-delete merge-on-read is unsupported " +
                "(position deletes are); read with a full engine")
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
    IcebergSnapshot(wantId, schema, live.result(), deletes.result())
  }

  /** Scan the live data of an Iceberg table (optionally at a past
    * snapshot): ONE distributed parquet read with the metadata schema
    * enforced (identity partition columns live IN the files — no
    * re-attach join needed). POSITION deletes (v2 merge-on-read) fold
    * in as ONE distributed anti-join of the data scan's
    * (`_metadata.file_path`, `_metadata.row_index`) against the
    * delete files' (file_path, pos) rows — both sides normalized
    * scheme-insensitively. Sequence numbers need no bookkeeping here:
    * Iceberg data files are immutable with unique paths, so a delete
    * row can never alias a LATER data file's rows — it either matches
    * its original target or nothing.
    */
  def read(
      spark: SparkSession,
      path: String,
      snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val snap = snapshot(spark, path, snapshotId)
    if (snap.liveFiles.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[Row](), snap.schema)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val files = snap.liveFiles.map(f => resolve(root, f.path).toString)
    val scan0 = spark.read.schema(snap.schema).parquet(files: _*)
    val scan =
      if (snap.deleteFiles.isEmpty) scan0
      else {
        val delPaths = snap.deleteFiles
          .map(f => resolve(root, f.path).toString)
        val delSchema = StructType(Seq(
          StructField("file_path", StringType),
          StructField("pos", LongType)))
        val dels = spark.read.schema(delSchema).parquet(delPaths: _*)
          .select(normalizeCol(col("file_path")).as("__del_file"),
            col("pos").as("__del_pos"))
        val tagged = scan0
          .withColumn("__file", normalizeCol(col("_metadata.file_path")))
          .withColumn("__ri", col("_metadata.row_index"))
        tagged.join(dels,
          tagged("__file") === dels("__del_file") &&
            tagged("__ri") === dels("__del_pos"),
          "left_anti")
      }
    scan.select(snap.schema.map(f =>
      org.apache.spark.sql.functions.col(f.name)): _*)
  }

  private def normalizeCol(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.regexp_replace(
      c, "^[A-Za-z][A-Za-z0-9+.-]*:/+", "/")

  /** Metadata-only row count from the manifests' per-file
    * `record_count` — the Iceberg twin of [[DeltaRead.countRows]].
    * REFUSES when the snapshot carries delete files: delete rows may
    * be stale (their target vanished) or duplicated, so a metadata
    * subtraction would be silently wrong — scan instead (exactly the
    * stance real Iceberg engines take for merge-on-read counts).
    */
  def countRows(
      spark: SparkSession,
      path: String,
      snapshotId: Option[Long] = None): Long = {
    val snap = snapshot(spark, path, snapshotId)
    if (snap.deleteFiles.nonEmpty)
      fail(path, "snapshot carries position-delete files — a " +
        "metadata-only count cannot subtract them exactly (stale/" +
        "duplicate delete rows); scan the table instead")
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

  /** All records of one Avro OCF file through the Hadoop FS API. */
  private def readAvro(
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
      StructField(name, toType(path, f.get("type")), !required)
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
