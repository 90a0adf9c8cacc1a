package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Log-authoring twin of [[DeltaRead]] — plants protocol-exact
  * `_delta_log` fixtures (the [[graft.multimodal.Wav]].encode /
  * Mp4.encode pattern: every decoder ships the encoder that proves
  * it). This is NOT a transactional Delta writer: no optimistic
  * concurrency, no checkpoints, no stats — just spec-shaped action
  * lines for tests and the q219 gate.
  */
object DeltaFixture {

  private val mapper = new ObjectMapper()

  def protocolLine(minReader: Int = 1, minWriter: Int = 2): String = {
    val root = mapper.createObjectNode()
    val p = root.putObject("protocol")
    p.put("minReaderVersion", minReader)
    p.put("minWriterVersion", minWriter)
    mapper.writeValueAsString(root)
  }

  def metaDataLine(
      id: String,
      schema: StructType,
      partitionColumns: Seq[String] = Seq.empty,
      provider: String = "parquet"): String = {
    val root = mapper.createObjectNode()
    val m = root.putObject("metaData")
    m.put("id", id)
    val f = m.putObject("format")
    f.put("provider", provider)
    f.putObject("options")
    m.put("schemaString", schema.json)
    val pc = m.putArray("partitionColumns")
    partitionColumns.foreach(pc.add)
    m.putObject("configuration")
    m.put("createdTime", 0L)
    mapper.writeValueAsString(root)
  }

  def addLine(
      path: String,
      size: Long,
      partitionValues: Map[String, Option[String]] = Map.empty,
      withDeletionVector: Boolean = false,
      stats: Option[String] = None): String = {
    val root = mapper.createObjectNode()
    val a = root.putObject("add")
    a.put("path", path)
    val pv = a.putObject("partitionValues")
    partitionValues.foreach {
      case (k, Some(v)) => pv.put(k, v): Unit
      case (k, None)    => pv.putNull(k): Unit
    }
    a.put("size", size)
    a.put("modificationTime", 0L)
    a.put("dataChange", true)
    stats.foreach(s => a.put("stats", s): Unit)
    if (withDeletionVector) {
      val dv = a.putObject("deletionVector")
      dv.put("storageType", "u")
      dv.put("pathOrInlineDv", "x")
      dv.put("offset", 0)
      dv.put("sizeInBytes", 1)
      dv.put("cardinality", 1L)
    }
    mapper.writeValueAsString(root)
  }

  /** The per-file `stats` JSON real Delta writers attach to adds:
    * numRecords + per-column min/max (long-valued columns here — the
    * zone-map input of [[DeltaRead.readPruned]]).
    */
  def statsJson(
      numRecords: Long,
      minMax: Map[String, (Long, Long)]): String = {
    val root = mapper.createObjectNode()
    root.put("numRecords", numRecords)
    val mins = root.putObject("minValues")
    val maxs = root.putObject("maxValues")
    minMax.foreach { case (c, (lo, hi)) =>
      mins.put(c, lo): Unit
      maxs.put(c, hi): Unit
    }
    mapper.writeValueAsString(root)
  }

  /** A `txn` action — the streaming-sink idempotence marker
    * ([[DeltaWrite.idempotentAppend]]).
    */
  def txnLine(appId: String, version: Long): String = {
    val root = mapper.createObjectNode()
    val t = root.putObject("txn")
    t.put("appId", appId)
    t.put("version", version)
    t.put("lastUpdated", 0L)
    mapper.writeValueAsString(root)
  }

  def removeLine(path: String): String = {
    val root = mapper.createObjectNode()
    val r = root.putObject("remove")
    r.put("path", path)
    r.put("deletionTimestamp", 0L)
    r.put("dataChange", true)
    mapper.writeValueAsString(root)
  }

  /** Write `_delta_log/<version, 20 digits>.json` with the given
    * action lines (newline-delimited JSON, per the protocol).
    */
  def writeCommit(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      lines: Seq[String]): Unit =
    graft.ScratchSpace.writeBytes(spark, tablePath,
      f"_delta_log/$version%020d.json",
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))

  /** Write a single-part CLASSIC checkpoint at
    * `_delta_log/<version>.checkpoint.parquet` — the net replay state
    * (one protocol row, one metaData row, one add row per live file)
    * in the protocol's top-level-struct-per-action parquet layout —
    * plus the `_last_checkpoint` pointer JSON. The authoring twin of
    * [[DeltaRead]]'s checkpoint path, for tests and the gate.
    */
  def writeCheckpoint(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String] = Seq.empty,
      adds: Seq[(String, Map[String, Option[String]])] = Seq.empty,
      minReader: Int = 1,
      txns: Seq[(String, Long)] = Seq.empty): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("format",
        StructType(Seq(StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType))))
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues",
        MapType(StringType, StringType, valueContainsNull = true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
    val txnT = StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))
    val cpT = StructType(Seq(
      StructField("protocol", protocolT, nullable = true),
      StructField("metaData", metaT, nullable = true),
      StructField("add", addT, nullable = true),
      StructField("txn", txnT, nullable = true)))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(Row(minReader, 2), null, null, null))
    rows.add(Row(null,
      Row("cp-fixture", Row("parquet"), schema.json, partitionColumns),
      null, null))
    adds.foreach { case (p, pvs) =>
      rows.add(Row(null, null,
        Row(p, pvs.map { case (k, v) => k -> v.orNull }, 1L, 0L, true),
        null))
    }
    txns.foreach { case (app, v) =>
      rows.add(Row(null, null, null, Row(app, v)))
    }
    val df = spark.createDataFrame(rows, cpT)
    plantDataFile(spark, df, tablePath,
      f"_delta_log/$version%020d.checkpoint.parquet"): Unit
    val lc = mapper.createObjectNode()
    lc.put("version", version)
    lc.put("size", rows.size().toLong)
    graft.ScratchSpace.writeBytes(spark, tablePath,
      "_delta_log/_last_checkpoint",
      (mapper.writeValueAsString(lc) + "\n").getBytes("UTF-8"))
  }

  /** Write `df` as ONE parquet file at `tablePath/name` (staged via
    * scratch — the tiny fixture-planting single-file write, same
    * class as the streaming parity staging writes) and return its
    * byte size for the add action.
    */
  def plantDataFile(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      name: String): Long = {
    val stage = graft.ScratchSpace.dir(spark, "delta_plant_")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val sp = new Path(stage)
    val fs = sp.getFileSystem(spark.sessionState.newHadoopConf())
    val part = fs.listStatus(sp)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath)
      .headOption
      .getOrElse(throw new IllegalStateException(s"no part file in $stage"))
    graft.ScratchSpace.copyIn(spark, part.toString, tablePath, name)
    graft.ScratchSpace.delete(spark, stage)
    val out = new Path(tablePath, name)
    out.getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(out).getLen
  }
}
