package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Spec-shaped Iceberg table authoring twin of [[IcebergRead]] — the
  * [[DeltaFixture]] pattern: plant REAL bytes (metadata JSON, Avro
  * OCF manifest list + manifests via the Apache Avro reference
  * library, parquet data files WITH parquet field ids) so the reader
  * is exercised against the public spec's physical layout, and the
  * driver's DuckDB oracle replays the planted content from the source
  * tables. Not a transactional writer — fixtures and gates only
  * ([[IcebergWrite]] is the transactional append path).
  */
object IcebergFixture {

  private val mapper = new ObjectMapper()

  /** The parquet field-id metadata key Spark's reader/writer use. */
  val FieldIdKey = "parquet.field.id"

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":"long","default":0}]}"""
      .stripMargin)

  private val manifestSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int"},
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"},
      |{"name":"equality_ids","type":["null",
      |  {"type":"array","items":"int"}],"default":null}]}}]}"""
      .stripMargin)

  /** Avro type name for an identity-partition column (the supported
    * partition value types).
    */
  private def avroPartitionType(
      dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.IntegerType => "int"
    case org.apache.spark.sql.types.LongType => "long"
    case org.apache.spark.sql.types.StringType => "string"
    case other => throw new IllegalArgumentException(
      s"identity partition value type $other unsupported " +
        "(int/long/string only)")
  }

  /** [[manifestSchema]] extended with the spec's `partition` record
    * (named r102, one nullable field per partition column) — the form
    * partitioned writers emit and the pruning walk reads.
    */
  private[sources] def manifestSchemaWithPartition(
      partitionFields: Seq[(String, org.apache.spark.sql.types.DataType)])
      : Schema = {
    val fields = partitionFields.map { case (n, dt) =>
      s"""{"name":"${n}","type":["null","${avroPartitionType(dt)}"],""" +
        """"default":null}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int"},
         |{"name":"sequence_number","type":["null","long"],"default":null},
         |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
         |{"name":"content","type":"int"},
         |{"name":"file_path","type":"string"},
         |{"name":"file_format","type":"string"},
         |{"name":"partition","type":{"type":"record","name":"r102",
         |  "fields":[$fields]}},
         |{"name":"record_count","type":"long"},
         |{"name":"file_size_in_bytes","type":"long"},
         |{"name":"equality_ids","type":["null",
         |  {"type":"array","items":"int"}],"default":null}]}}]}"""
        .stripMargin)
  }

  /** One manifest entry: status (1 added / 0 existing / 2 deleted),
    * data-file path relative to the table root (or absolute URI),
    * record count, the data_file content code (0 data / 1 position
    * deletes / 2 equality deletes), the entry's explicit data
    * sequence number (None = inherit the manifest's when ADDED), the
    * equality-field ids for content=2 files, and the real file size
    * ([[IcebergWrite]] records actual byte lengths; fixtures that
    * never read the field back may keep the placeholder).
    */
  final case class Entry(
      status: Int,
      filePath: String,
      recordCount: Long,
      content: Int = 0,
      seq: Option[Long] = None,
      equalityIds: Seq[Int] = Seq.empty,
      sizeBytes: Long = 1L,
      partition: Map[String, Option[String]] = Map.empty)

  /** Attach explicit Iceberg field ids to a flat Spark schema (as
    * `parquet.field.id` metadata): [[plantDataFile]] then writes them
    * into the parquet footer and [[writeMetadata]] writes the same
    * ids into the schema JSON.
    */
  def withFieldIds(schema: StructType, ids: Seq[Int]): StructType = {
    require(ids.length == schema.length,
      s"${ids.length} ids for ${schema.length} fields")
    StructType(schema.fields.zip(ids).map { case (f, id) =>
      f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putLong(FieldIdKey, id.toLong).build())
    })
  }

  private[sources] def fieldIdOf(f: StructField): Option[Long] =
    if (f.metadata.contains(FieldIdKey))
      Some(f.metadata.getLong(FieldIdKey))
    else None

  /** Plant `df` as ONE parquet data file whose footer carries the
    * given Iceberg field ids (positional) — the form every conformant
    * Iceberg writer produces and [[IcebergRead]] resolves columns by.
    */
  def plantDataFile(
      spark: SparkSession,
      df: DataFrame,
      tablePath: String,
      name: String,
      fieldIds: Seq[Int]): Long = {
    import org.apache.spark.sql.functions.col
    val tagged = withFieldIds(df.schema, fieldIds)
    val withMeta = df.select(tagged.fields.map(f =>
      col(f.name).as(f.name, f.metadata)).toSeq: _*)
    // the footer ids are the whole point of this planting path; the
    // write is eager, so the flag save/restores around it
    FieldIds.withWriteEnabled(spark) {
      DeltaFixture.plantDataFile(spark, withMeta, tablePath, name)
    }
  }

  /** Write one Avro OCF manifest holding `entries`; returns the
    * manifest's byte length (the manifest-list field).
    */
  def writeManifest(
      spark: SparkSession,
      tablePath: String,
      name: String,
      entries: Seq[Entry],
      partitionFields: Seq[(String, org.apache.spark.sql.types.DataType)] =
        Seq.empty): Long = {
    val schema =
      if (partitionFields.isEmpty) manifestSchema
      else manifestSchemaWithPartition(partitionFields)
    val p = new Path(new Path(tablePath, "metadata"), name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    entries.foreach { e =>
      val dfSchema = schema.getField("data_file").schema()
      val df = new GenericData.Record(dfSchema)
      df.put("content", e.content)
      df.put("file_path", e.filePath)
      df.put("file_format", "PARQUET")
      df.put("record_count", e.recordCount)
      df.put("file_size_in_bytes", e.sizeBytes)
      if (partitionFields.nonEmpty) {
        val pSchema = dfSchema.getField("partition").schema()
        val pRec = new GenericData.Record(pSchema)
        partitionFields.foreach { case (n, dt) =>
          e.partition.getOrElse(n, None).foreach { v =>
            val typed: AnyRef = dt match {
              case org.apache.spark.sql.types.IntegerType =>
                Integer.valueOf(v.toInt)
              case org.apache.spark.sql.types.LongType =>
                java.lang.Long.valueOf(v.toLong)
              case _ => v
            }
            pRec.put(n, typed)
          }
        }
        df.put("partition", pRec)
      }
      if (e.equalityIds.nonEmpty) {
        val arr = new java.util.ArrayList[Integer]()
        e.equalityIds.foreach(i => arr.add(Integer.valueOf(i)))
        df.put("equality_ids", arr)
      }
      val rec = new GenericData.Record(schema)
      rec.put("status", e.status)
      e.seq.foreach(s => rec.put("sequence_number", java.lang.Long.valueOf(s)))
      rec.put("data_file", df)
      w.append(rec)
    }
    w.close()
    fs.getFileStatus(p).getLen
  }

  /** Write one Avro OCF manifest LIST naming `(manifestName, length,
    * content, sequenceNumber)` manifests — content 1 marks a delete
    * manifest; the sequence number is what ADDED entries without an
    * explicit one inherit. Names resolve under `metadata/`.
    */
  def writeManifestList(
      spark: SparkSession,
      tablePath: String,
      name: String,
      manifests: Seq[(String, Long, Int, Long)]): Unit =
    writeManifestListPaths(spark, tablePath, name,
      manifests.map { case (mName, len, content, seq) =>
        (s"metadata/$mName", len, content, seq)
      })

  /** [[writeManifestList]] with VERBATIM manifest paths — the form
    * [[IcebergWrite]] needs to carry forward a previous snapshot's
    * manifest entries whatever spelling they used.
    */
  def writeManifestListPaths(
      spark: SparkSession,
      tablePath: String,
      name: String,
      manifests: Seq[(String, Long, Int, Long)]): Unit = {
    val p = new Path(new Path(tablePath, "metadata"), name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](manifestListSchema))
    w.create(manifestListSchema, out)
    manifests.foreach { case (mPath, len, content, seq) =>
      val rec = new GenericData.Record(manifestListSchema)
      rec.put("manifest_path", mPath)
      rec.put("manifest_length", len)
      rec.put("partition_spec_id", 0)
      rec.put("content", content)
      rec.put("sequence_number", seq)
      w.append(rec)
    }
    w.close()
  }

  /** One snapshot for [[writeMetadata]]. `timestampMs` defaults to a
    * deterministic (index+1)*1000 ladder — distinct ascending commit
    * times for the timestamp-time-travel gates.
    */
  final case class Snap(
      snapshotId: Long,
      manifestListName: String,
      schemaId: Int = 0,
      timestampMs: Option[Long] = None)

  /** Spark → Iceberg type JSON for the fixture's schema block. */
  private def icebergType(dt: org.apache.spark.sql.types.DataType): String =
    dt match {
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
        throw new IllegalArgumentException(
          s"fixture cannot express Spark type $other")
    }

  /** Write `v<version>.metadata.json` + `version-hint.text` for a
    * table whose schema(s) and snapshots are given; `currentSnapshot`
    * defaults to the last snapshot. `schemas` maps schema-id →
    * StructType (flat primitive fields); a field's Iceberg id is its
    * `parquet.field.id` metadata when present ([[withFieldIds]]),
    * else position+1. `partitionFieldNames` writes an identity
    * partition spec over those current-schema columns (for the
    * partition-scoped-delete refusal fixtures).
    */
  def writeMetadata(
      spark: SparkSession,
      tablePath: String,
      version: Long,
      schemas: Map[Int, StructType],
      snapshots: Seq[Snap],
      currentSchemaId: Int = 0,
      currentSnapshot: Option[Long] = None,
      formatVersion: Int = 2,
      partitionFieldNames: Seq[String] = Seq.empty): Unit = {
    val root = mapper.createObjectNode()
    root.put("format-version", formatVersion)
    root.put("table-uuid", "00000000-0000-0000-0000-00000000abcd")
    root.put("location", tablePath)
    root.put("last-sequence-number", snapshots.size.toLong)
    root.put("last-updated-ms", 0L)
    root.put("last-column-id",
      schemas.values.map(_.size).maxOption.getOrElse(0))
    root.put("current-schema-id", currentSchemaId)
    val schemasArr = root.putArray("schemas")
    schemas.toSeq.sortBy(_._1).foreach { case (id, st) =>
      val s = schemasArr.addObject()
      s.put("type", "struct")
      s.put("schema-id", id)
      val fields = s.putArray("fields")
      st.zipWithIndex.foreach { case (sf, i) =>
        val f = fields.addObject()
        f.put("id", fieldIdOf(sf).getOrElse((i + 1).toLong))
        f.put("name", sf.name)
        f.put("required", !sf.nullable)
        f.put("type", icebergType(sf.dataType))
      }
    }
    root.put("default-spec-id", 0)
    val specs = root.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    val specFields = spec0.putArray("fields")
    val curSchema = schemas.getOrElse(currentSchemaId,
      schemas.values.headOption.getOrElse(StructType(Seq.empty)))
    partitionFieldNames.zipWithIndex.foreach { case (n, i) =>
      val sf = curSchema.fields.zipWithIndex.find(_._1.name == n)
        .getOrElse(throw new IllegalArgumentException(
          s"partition field '$n' not in current schema"))
      val pf = specFields.addObject()
      pf.put("field-id", 1000 + i)
      pf.put("name", n)
      pf.put("transform", "identity")
      pf.put("source-id",
        fieldIdOf(sf._1).getOrElse((sf._2 + 1).toLong))
    }
    root.put("last-partition-id", 999)
    root.put("default-sort-order-id", 0)
    val orders = root.putArray("sort-orders")
    val order0 = orders.addObject()
    order0.put("order-id", 0)
    order0.putArray("fields")
    root.put("current-snapshot-id",
      currentSnapshot.getOrElse(snapshots.last.snapshotId))
    val snapsArr = root.putArray("snapshots")
    snapshots.zipWithIndex.foreach { case (s, i) =>
      val n = snapsArr.addObject()
      n.put("snapshot-id", s.snapshotId)
      n.put("sequence-number", (i + 1).toLong)
      n.put("timestamp-ms", s.timestampMs.getOrElse((i + 1) * 1000L))
      n.put("schema-id", s.schemaId)
      val sum = n.putObject("summary")
      sum.put("operation", "append")
      n.put("manifest-list", s"metadata/${s.manifestListName}")
    }
    graft.ScratchSpace.writeBytes(spark, tablePath,
      s"metadata/v$version.metadata.json",
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
        .getBytes("UTF-8"))
    graft.ScratchSpace.writeBytes(spark, tablePath,
      "metadata/version-hint.text",
      version.toString.getBytes("UTF-8"))
  }
}
