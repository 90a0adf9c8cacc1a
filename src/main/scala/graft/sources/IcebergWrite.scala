package graft.sources

import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit}

/** Transactional APPEND-ONLY Apache Iceberg writer — the produce-side
  * twin of [[IcebergRead]], per the public table spec's
  * filesystem-table commit rule (HadoopTables): a commit IS the
  * atomic CREATE-EXCLUSIVE of the next `v<N>.metadata.json`; losers
  * of the race re-read and retry, `version-hint.text` is an advisory
  * pointer updated after the commit point. Everything the reader
  * walks is written for real: parquet data files WITH footer field
  * ids, an Avro manifest of ADDED entries (sequence numbers
  * inherited from the manifest list), a new manifest list carrying
  * every previous manifest verbatim plus the new one, and a metadata
  * JSON that deep-copies the previous version (table uuid, schemas,
  * specs preserved) appending one snapshot.
  *
  * Scope (refuse-loudly outside it):
  *  - append only — no overwrite/delete/compaction;
  *  - unpartitioned tables (a partition spec with fields refuses);
  *  - format-version 2 (created tables are v2; appends to v1 tables
  *    refuse — their sequence-number-less manifests would corrupt
  *    delete semantics);
  *  - exact schema match on append (names + types; evolution is not
  *    a silent write side effect — same stance as [[DeltaWrite]]).
  */
object IcebergWrite {

  private def fail(path: String, why: String): Nothing =
    throw new IllegalArgumentException(s"IcebergWrite: $path — $why")

  /** Append `df` to the Iceberg table at `tablePath`, creating the
    * table (format-version 2, field ids 1..n) when absent. Returns
    * the committed snapshot id. The data write is distributed (no
    * single-file coalesce); the metadata walk and commit are
    * driver-side, like every metadata operation here.
    */
  def append(
      df: DataFrame,
      tablePath: String,
      maxRetries: Int = 10): Long = {
    val spark = df.sparkSession
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val metaDir = new Path(root, "metadata")
    val exists = fs.exists(metaDir) &&
      fs.listStatus(metaDir).exists(
        _.getPath.getName.matches("v\\d+\\.metadata\\.json"))
    if (!exists) create(df, tablePath, fs, root, maxRetries)
    else appendExisting(df, tablePath, fs, root, maxRetries)
  }

  private def create(
      df: DataFrame,
      tablePath: String,
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path,
      maxRetries: Int): Long = {
    val spark = df.sparkSession
    val ids = df.schema.fields.zipWithIndex.map { case (f, i) =>
      IcebergFixture.fieldIdOf(f).map(_.toInt).getOrElse(i + 1)
    }.toSeq
    val schema = IcebergFixture.withFieldIds(df.schema, ids)
    val files = writeDataFiles(df, fs, root, ids)
    val snapshotId = 1L
    val mName = s"m-${java.util.UUID.randomUUID()}.avro"
    val mLen = IcebergFixture.writeManifest(spark, tablePath, mName,
      files.map { case (rel, rc, _) => IcebergFixture.Entry(1, rel, rc) })
    val mlName = s"snap-$snapshotId-${java.util.UUID.randomUUID()}.avro"
    IcebergFixture.writeManifestList(spark, tablePath, mlName,
      Seq((mName, mLen, 0, 1L)))
    val meta = freshMetadata(tablePath, schema, snapshotId, mlName)
    if (tryCommit(fs, root, 1L, meta)) {
      writeHint(spark, fs, root, 1L)
      snapshotId
    } else {
      // a racer created the table first — this becomes an append and
      // must satisfy the append contract against THEIR schema
      appendExisting(df, tablePath, fs, root, maxRetries)
    }
  }

  private def appendExisting(
      df: DataFrame,
      tablePath: String,
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path,
      maxRetries: Int): Long = {
    val spark = df.sparkSession
    val snap = validateV2Unpartitioned(spark, tablePath)
    val want = snap.schema.map(f => f.name -> f.dataType)
    val got = df.schema.map(f => f.name -> f.dataType)
    if (want != got)
      fail(tablePath, "schema mismatch — table has " +
        s"${want.map { case (n, t) => s"$n:${t.simpleString}" }
          .mkString(",")} vs incoming " +
        s"${got.map { case (n, t) => s"$n:${t.simpleString}" }
          .mkString(",")}; evolution is not a silent write side " +
        "effect")
    val ids = snap.schema.fields.map(f =>
      IcebergFixture.fieldIdOf(f).map(_.toInt).getOrElse(
        fail(tablePath, s"table schema field '${f.name}' has no " +
          "field id — cannot write conformant data files"))).toSeq
    // data + manifest write ONCE; only the commit tail retries
    val files = writeDataFiles(
      df.select(snap.schema.map(f => col(f.name)): _*), fs, root, ids)
    val mName = s"m-${java.util.UUID.randomUUID()}.avro"
    val mLen = IcebergFixture.writeManifest(spark, tablePath, mName,
      files.map { case (rel, rc, _) => IcebergFixture.Entry(1, rel, rc) })
    commitNewSnapshot(spark, tablePath, fs, root, mName, mLen,
      content = 0, maxRetries)
  }

  /** The shared v2 precondition: current metadata is format-version 2
    * with an UNPARTITIONED spec; returns the current snapshot.
    */
  private def validateV2Unpartitioned(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String): IcebergRead.IcebergSnapshot = {
    val (meta, _, _) = IcebergRead.loadMetadata(spark, tablePath)
    val fv = meta.get("format-version").asInt()
    if (fv != 2)
      fail(tablePath, s"write to a format-version $fv table is " +
        "unsupported (v2 only — v1 manifests lack sequence numbers)")
    val specs = Option(meta.get("partition-specs")).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get(_))).getOrElse(Seq.empty)
    if (specs.exists(s => Option(s.get("fields"))
      .exists(f => f.isArray && f.size() > 0)))
      fail(tablePath, "write to a PARTITIONED table is unsupported")
    IcebergRead.snapshot(spark, tablePath)
  }

  /** The commit tail shared by append and delete: carry the CURRENT
    * snapshot's manifests verbatim, add the new manifest (data or
    * delete by `content`) at the next sequence number, write the
    * manifest list + metadata, and CREATE-EXCLUSIVE the next version
    * file — re-reading the latest state on every race retry (the
    * already-written data/manifest files are reused; losers never
    * rewrite data).
    */
  private def commitNewSnapshot(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path,
      mName: String,
      mLen: Long,
      content: Int,
      maxRetries: Int): Long = {
    val conf = spark.sessionState.newHadoopConf()
    var attempts = 0
    while (true) {
      val (meta, _, _) = IcebergRead.loadMetadata(spark, tablePath)
      val lastSeq = Option(meta.get("last-sequence-number"))
        .filter(_.isNumber).map(_.asLong()).getOrElse(0L)
      val newSeq = lastSeq + 1
      val snaps = Option(meta.get("snapshots")).filter(_.isArray)
        .map(a => (0 until a.size()).map(a.get(_))).getOrElse(Seq.empty)
      val snapshotId = snaps.map(_.get("snapshot-id").asLong())
        .maxOption.getOrElse(0L) + 1
      val currentId = Option(meta.get("current-snapshot-id"))
        .filter(_.isNumber).map(_.asLong()).getOrElse(
          fail(tablePath, "no current-snapshot-id"))
      val current = snaps.find(
        _.get("snapshot-id").asLong() == currentId).getOrElse(
        fail(tablePath, "current snapshot vanished from metadata"))
      val prevMl = Option(current.get("manifest-list")).filter(!_.isNull)
        .map(_.asText())
        .getOrElse(fail(tablePath,
          "current snapshot has no manifest-list (v1 inline shape) — " +
            "write unsupported"))
      val prevManifests = IcebergRead.readAvro(fs, conf,
        resolve(root, prevMl), tablePath).map { rec =>
        (rec.get("manifest_path").toString,
          rec.get("manifest_length").asInstanceOf[java.lang.Number]
            .longValue(),
          Option(rec.get("content"))
            .collect { case n: java.lang.Number => n.intValue() }
            .getOrElse(0),
          Option(rec.get("sequence_number"))
            .collect { case n: java.lang.Number => n.longValue() }
            .getOrElse(0L))
      }
      val mlName = s"snap-$snapshotId-${java.util.UUID.randomUUID()}.avro"
      IcebergFixture.writeManifestListPaths(spark, tablePath, mlName,
        prevManifests :+ (s"metadata/$mName", mLen, content, newSeq))
      val prevTs = snaps.map(s =>
        Option(s.get("timestamp-ms")).filter(_.isNumber)
          .map(_.asLong()).getOrElse(0L)).maxOption.getOrElse(0L)
      val ts = math.max(System.currentTimeMillis(), prevTs + 1)
      val newMeta = nextMetadata(meta, snapshotId, newSeq, ts, mlName)
      val version = currentVersion(fs, root) + 1
      if (tryCommit(fs, root, version, newMeta)) {
        writeHint(spark, fs, root, version)
        return snapshotId
      }
      attempts += 1
      if (attempts > maxRetries)
        fail(tablePath, s"lost $maxRetries commit races — a committer " +
          "is racing this write; rerun (staged files are inert " +
          "orphans)")
    }
    sys.error("unreachable")
  }

  /** DELETE rows matching `predicate` via POSITION-DELETE files (v2
    * merge-on-read — no data rewrite): the live scan (existing
    * deletes applied) yields matched (file_path, pos) pairs with the
    * file path in its MANIFEST-VERBATIM spelling per the spec; they
    * sort by (file_path, pos), write as delete parquet under `data/`
    * (distributed), and commit as a delete manifest (content 1) in a
    * new snapshot. Returns the committed snapshot id, or the current
    * one when nothing matched (no empty commits).
    */
  def deleteWhere(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      predicate: org.apache.spark.sql.Column,
      maxRetries: Int = 10): Long = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(p)
    val snap = validateV2Unpartitioned(spark, tablePath)
    val matched = IcebergRead.readWithPos(spark, tablePath)
      .where(predicate)
      .select(col("__file_path").as("file_path"), col("__pos").as("pos"))
      .sort("file_path", "pos")
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(root, s"_staging-icedel-$nonce")
    matched.write.mode("overwrite").parquet(stage.toString)
    val moved = Seq.newBuilder[(String, Path)]
    var i = 0
    fs.listStatus(stage).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-") &&
        st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .foreach { st =>
        val rel = s"data/delete-$nonce-$i.parquet"
        val dest = new Path(root, rel)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(st.getPath, dest))
          fail(root.toString, s"rename to $dest failed")
        moved += ((rel, dest))
        i += 1
      }
    fs.delete(stage, true): Unit
    val files = moved.result()
    val counts =
      if (files.isEmpty) Map.empty[String, Long]
      else spark.read.parquet(files.map(_._2.toString): _*)
        .groupBy(col("_metadata.file_path").as("__f"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("__n"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val entries = files.flatMap { case (rel, dest) =>
      val rc = counts.getOrElse(
        fs.makeQualified(dest).toUri.toString, 0L)
      if (rc == 0L) { fs.delete(dest, false); None }
      else Some(IcebergFixture.Entry(1, rel, rc, content = 1))
    }
    if (entries.isEmpty) return snap.snapshotId // nothing matched
    val mName = s"m-${java.util.UUID.randomUUID()}.avro"
    val mLen = IcebergFixture.writeManifest(spark, tablePath, mName,
      entries)
    commitNewSnapshot(spark, tablePath, fs, root, mName, mLen,
      content = 1, maxRetries)
  }

  /** What [[expireSnapshots]] removed. */
  final case class ExpireReport(
      expiredSnapshots: Seq[Long],
      deletedFiles: Long,
      version: Long)

  /** EXPIRE old snapshots — the Iceberg maintenance verb (the vacuum
    * twin): keep the newest `keepLast` snapshots (by timestamp, then
    * id), commit a metadata version WITHOUT the expired ones
    * (create-exclusive, same rule as [[append]]), then physically
    * delete everything reachable ONLY from expired snapshots —
    * their manifest lists, manifests no kept snapshot references,
    * and data/delete files no kept snapshot's non-DELETED entries
    * reference. Deletion happens strictly AFTER the commit point, so
    * a crash leaves inert orphans, never a kept snapshot missing
    * files. Time travel to expired snapshots stops working — exactly
    * the engines' contract. The current snapshot must survive; v2
    * manifest-list tables only.
    */
  def expireSnapshots(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String,
      keepLast: Int,
      maxRetries: Int = 10): ExpireReport = {
    require(keepLast >= 1, s"keepLast $keepLast < 1")
    val conf = spark.sessionState.newHadoopConf()
    var attempts = 0
    while (true) {
      val (meta, root, fs) = IcebergRead.loadMetadata(spark, tablePath)
      if (meta.get("format-version").asInt() != 2)
        fail(tablePath, "expire on a format-version 1 table is " +
          "unsupported")
      val snaps = Option(meta.get("snapshots")).filter(_.isArray)
        .map(a => (0 until a.size()).map(a.get(_))).getOrElse(Seq.empty)
      val ordered = snaps.sortBy(s => (
        Option(s.get("timestamp-ms")).filter(_.isNumber)
          .map(_.asLong()).getOrElse(0L),
        s.get("snapshot-id").asLong()))
      val keep = ordered.takeRight(keepLast)
      val expired = ordered.dropRight(keepLast)
      if (expired.isEmpty)
        return ExpireReport(Seq.empty, 0L,
          currentVersion(fs, root))
      val currentId = Option(meta.get("current-snapshot-id"))
        .filter(_.isNumber).map(_.asLong()).getOrElse(-1L)
      if (!keep.exists(_.get("snapshot-id").asLong() == currentId))
        fail(tablePath, s"expire would drop the CURRENT snapshot " +
          s"$currentId — keepLast $keepLast is too aggressive")
      // reachability walks: qualified-path keyed
      def qual(raw: String): String =
        fs.makeQualified(resolve(root, raw)).toUri.toString
      def walk(snapNodes: Seq[com.fasterxml.jackson.databind.JsonNode],
          liveOnly: Boolean): Set[String] = {
        val out = Set.newBuilder[String]
        snapNodes.foreach { s =>
          val ml = Option(s.get("manifest-list")).filter(!_.isNull)
            .map(_.asText())
            .getOrElse(fail(tablePath,
              "snapshot without manifest-list (v1 inline shape) — " +
                "expire unsupported"))
          out += qual(ml)
          IcebergRead.readAvro(fs, conf, resolve(root, ml), tablePath)
            .foreach { mrec =>
              val mp = mrec.get("manifest_path").toString
              out += qual(mp)
              IcebergRead.readAvro(fs, conf, resolve(root, mp),
                tablePath).foreach { e =>
                val status = Option(e.get("status"))
                  .collect { case n: java.lang.Number => n.intValue() }
                  .getOrElse(0)
                if (!liveOnly || status != 2) {
                  val df = e.get("data_file")
                    .asInstanceOf[org.apache.avro.generic.GenericRecord]
                  out += qual(df.get("file_path").toString)
                }
              }
            }
        }
        out.result()
      }
      val keepSet = walk(keep, liveOnly = true)
      val expiredReachable = walk(expired, liveOnly = false)
      val deleteSet = expiredReachable -- keepSet
      // commit the shrunken snapshot list FIRST (deletes are then
      // garbage collection of unreferenced objects)
      val newRoot = meta.deepCopy[ObjectNode]()
      val arr = newRoot.putArray("snapshots")
      keep.foreach(s => arr.add(s.deepCopy
        [com.fasterxml.jackson.databind.JsonNode]()): Unit)
      // externally-written tables may carry a snapshot-log: trim the
      // entries that now point at expired snapshots
      val keepIds = keep.map(_.get("snapshot-id").asLong()).toSet
      Option(newRoot.get("snapshot-log")).filter(_.isArray).foreach {
        logArr =>
          val trimmed = newRoot.putArray("__snapshot-log-trim")
          (0 until logArr.size()).map(logArr.get(_)).foreach { e =>
            if (Option(e.get("snapshot-id")).filter(_.isNumber)
              .exists(id => keepIds(id.asLong())))
              trimmed.add(e.deepCopy
                [com.fasterxml.jackson.databind.JsonNode]()): Unit
          }
          newRoot.set("snapshot-log", trimmed): Unit
          newRoot.remove("__snapshot-log-trim"): Unit
      }
      newRoot.put("last-updated-ms", System.currentTimeMillis())
      val version = currentVersion(fs, root) + 1
      if (tryCommit(fs, root, version,
        mapper.writerWithDefaultPrettyPrinter()
          .writeValueAsString(newRoot))) {
        writeHint(spark, fs, root, version)
        var deleted = 0L
        deleteSet.foreach { uri =>
          val fp = new Path(new java.net.URI(uri))
          if (fs.exists(fp)) { fs.delete(fp, false); deleted += 1 }
        }
        return ExpireReport(
          expired.map(_.get("snapshot-id").asLong()), deleted, version)
      }
      attempts += 1
      if (attempts > maxRetries)
        fail(tablePath, s"expire lost $maxRetries commit races")
    }
    sys.error("unreachable")
  }

  private def currentVersion(
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Long = {
    val re = "v(\\d+)\\.metadata\\.json".r
    fs.listStatus(new Path(root, "metadata")).toSeq
      .map(_.getPath.getName)
      .flatMap { case re(n) => Some(n.toLong); case _ => None }
      .maxOption.getOrElse(fail(root.toString, "no metadata versions"))
  }

  /** Stage-write `df` as parquet with the table's footer field ids,
    * rename parts to `data/<uuid>-<i>.parquet`, and return (relPath,
    * recordCount, size) per non-empty file — record counts from ONE
    * distributed per-file count, the manifests' statistics source.
    */
  private def writeDataFiles(
      df: DataFrame,
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path,
      ids: Seq[Int]): Seq[(String, Long, Long)] = {
    val spark = df.sparkSession
    val tagged = IcebergFixture.withFieldIds(df.schema, ids)
    val withMeta = df.select(tagged.fields.map(f =>
      col(f.name).as(f.name, f.metadata)).toSeq: _*)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val stage = new Path(root, s"_staging-ice-$nonce")
    withMeta.write.mode("overwrite").parquet(stage.toString)
    val moved = Seq.newBuilder[(String, Path)]
    var i = 0
    fs.listStatus(stage).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-") &&
        st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
      .foreach { st =>
        val rel = s"data/$nonce-$i.parquet"
        val dest = new Path(root, rel)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(st.getPath, dest))
          fail(root.toString, s"rename to $dest failed")
        moved += ((rel, dest))
        i += 1
      }
    fs.delete(stage, true): Unit
    val files = moved.result()
    if (files.isEmpty) return Seq.empty
    val counts = spark.read.schema(tagged)
      .parquet(files.map(_._2.toString): _*)
      .groupBy(col("_metadata.file_path").as("__f"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    files.flatMap { case (rel, dest) =>
      val key = fs.makeQualified(dest).toUri.toString
      val rc = counts.getOrElse(key, 0L)
      // zero-row parts (empty shuffle partitions) carry nothing and
      // are dropped from the manifest rather than committed
      if (rc == 0L) { fs.delete(dest, false); None }
      else Some((rel, rc, fs.getFileStatus(dest).getLen))
    }
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def freshMetadata(
      tablePath: String,
      schema: org.apache.spark.sql.types.StructType,
      snapshotId: Long,
      mlName: String): String = {
    val root = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid", java.util.UUID.randomUUID().toString)
    root.put("location", tablePath)
    root.put("last-sequence-number", 1L)
    root.put("last-updated-ms", System.currentTimeMillis())
    root.put("last-column-id", schema.size)
    root.put("current-schema-id", 0)
    val schemasArr = root.putArray("schemas")
    val s = schemasArr.addObject()
    s.put("type", "struct")
    s.put("schema-id", 0)
    val fields = s.putArray("fields")
    schema.zipWithIndex.foreach { case (sf, i) =>
      val f = fields.addObject()
      f.put("id", IcebergFixture.fieldIdOf(sf).getOrElse((i + 1).toLong))
      f.put("name", sf.name)
      f.put("required", !sf.nullable)
      f.put("type", sf.dataType match {
        case org.apache.spark.sql.types.BooleanType => "boolean"
        case org.apache.spark.sql.types.IntegerType => "int"
        case org.apache.spark.sql.types.LongType => "long"
        case org.apache.spark.sql.types.FloatType => "float"
        case org.apache.spark.sql.types.DoubleType => "double"
        case org.apache.spark.sql.types.DateType => "date"
        case org.apache.spark.sql.types.StringType => "string"
        case org.apache.spark.sql.types.BinaryType => "binary"
        case d: org.apache.spark.sql.types.DecimalType =>
          s"decimal(${d.precision}, ${d.scale})"
        case other =>
          fail(tablePath, s"cannot write Spark type $other")
      })
    }
    root.put("default-spec-id", 0)
    val specs = root.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    spec0.putArray("fields")
    root.put("last-partition-id", 999)
    root.put("default-sort-order-id", 0)
    val orders = root.putArray("sort-orders")
    val order0 = orders.addObject()
    order0.put("order-id", 0)
    order0.putArray("fields")
    root.put("current-snapshot-id", snapshotId)
    val snapsArr = root.putArray("snapshots")
    val n = snapsArr.addObject()
    n.put("snapshot-id", snapshotId)
    n.put("sequence-number", 1L)
    n.put("timestamp-ms", System.currentTimeMillis())
    n.put("schema-id", 0)
    val sum = n.putObject("summary")
    sum.put("operation", "append")
    n.put("manifest-list", s"metadata/$mlName")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Deep-copy the previous metadata and append one snapshot — table
    * uuid, schemas, specs, sort orders and snapshot history survive
    * verbatim.
    */
  private def nextMetadata(
      prev: com.fasterxml.jackson.databind.JsonNode,
      snapshotId: Long,
      seq: Long,
      timestampMs: Long,
      mlName: String): String = {
    val root = prev.deepCopy[ObjectNode]()
    root.put("last-sequence-number", seq)
    root.put("last-updated-ms", timestampMs)
    root.put("current-snapshot-id", snapshotId)
    val snaps = Option(root.get("snapshots"))
      .collect { case a: com.fasterxml.jackson.databind.node.ArrayNode => a }
      .getOrElse(root.putArray("snapshots"))
    val n = snaps.addObject()
    n.put("snapshot-id", snapshotId)
    n.put("sequence-number", seq)
    n.put("timestamp-ms", timestampMs)
    Option(root.get("current-schema-id")).filter(_.isNumber)
      .foreach(id => n.put("schema-id", id.asInt()): Unit)
    val sum = n.putObject("summary")
    sum.put("operation", "append")
    n.put("manifest-list", s"metadata/$mlName")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** The atomic commit: create-exclusive `metadata/v<N>.metadata.json`.
    * False when the version was claimed by a racer.
    */
  private def tryCommit(
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path,
      version: Long,
      metaJson: String): Boolean = {
    val dest = new Path(new Path(root, "metadata"),
      s"v$version.metadata.json")
    val out =
      try fs.create(dest, false)
      catch { case _: java.io.IOException => return false }
    try {
      out.write(metaJson.getBytes("UTF-8"))
      true
    } finally out.close()
  }

  /** Advisory pointer update — FORWARD-ONLY, so a slow committer can
    * never roll readers back behind a racer's newer version.
    */
  private def writeHint(
      spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: Path,
      version: Long): Unit = {
    val hint = new Path(new Path(root, "metadata"), "version-hint.text")
    val current: Long =
      if (!fs.exists(hint)) -1L
      else {
        val in = fs.open(hint)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          .toLongOption.getOrElse(-1L)
        finally in.close()
      }
    if (version > current)
      graft.ScratchSpace.writeBytes(spark, root.toString,
        "metadata/version-hint.text", version.toString.getBytes("UTF-8"))
  }

  private def resolve(root: Path, raw: String): Path =
    if (raw.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*"))
      new Path(new java.net.URI(raw))
    else new Path(root, raw)
}
