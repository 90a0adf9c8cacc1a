package graft.sources

import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.sources.{IcebergFixture => IFx}

class IcebergReadSpec extends SparkTestBase {

  private val schema = IFx.withFieldIds(StructType(Seq(
    StructField("k", LongType),
    StructField("name", StringType))), Seq(1, 2))

  private def fresh(): String =
    graft.ScratchSpace.dir(spark, "icespec_")

  private def plantKv(t: String, name: String, lo: Int, hi: Int): Long = {
    val ss = spark
    import ss.implicits._
    IFx.plantDataFile(spark,
      (lo until hi).map(i => (i.toLong, s"row$i")).toDF("k", "name"),
      t, name, Seq(1, 2))
    (hi - lo).toLong
  }

  test("two-snapshot table: manifest walk, live set, time travel, " +
    "metadata-only count") {
    val t = fresh()
    val nA = plantKv(t, "data/a.parquet", 0, 5)
    val nB = plantKv(t, "data/b.parquet", 10, 13)
    val nC = plantKv(t, "data/c.parquet", 20, 24)
    // snapshot 1: a + b (one manifest)
    val m1 = IFx.writeManifest(spark, t, "m1.avro", Seq(
      IFx.Entry(1, "data/a.parquet", nA),
      IFx.Entry(1, "data/b.parquet", nB)))
    IFx.writeManifestList(spark, t, "ml1.avro",
      Seq(("m1.avro", m1, 0, 1L)))
    // snapshot 2: b deleted, c added (two manifests: carried + new)
    val m2 = IFx.writeManifest(spark, t, "m2.avro", Seq(
      IFx.Entry(0, "data/a.parquet", nA),
      IFx.Entry(2, "data/b.parquet", nB)))
    val m3 = IFx.writeManifest(spark, t, "m3.avro", Seq(
      IFx.Entry(1, "data/c.parquet", nC)))
    IFx.writeManifestList(spark, t, "ml2.avro", Seq(
      ("m2.avro", m2, 0, 1L), ("m3.avro", m3, 0, 2L)))
    IFx.writeMetadata(spark, t, 3, Map(0 -> schema), Seq(
      IFx.Snap(101L, "ml1.avro"), IFx.Snap(202L, "ml2.avro")))
    // current = snapshot 202: a + c
    val got = IcebergRead.read(spark, t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq ==
      ((0 until 5) ++ (20 until 24)).map(i => (i.toLong, s"row$i")))
    assert(IcebergRead.countRows(spark, t) == nA + nC)
    // time travel to snapshot 101: a + b
    val past = IcebergRead.read(spark, t, snapshotId = Some(101L))
      .orderBy("k").collect().map(_.getLong(0))
    assert(past.toSeq == ((0 until 5) ++ (10 until 13)).map(_.toLong))
    assert(IcebergRead.countRows(spark, t, Some(101L)) == nA + nB)
    assert(IcebergRead.snapshots(spark, t) == Seq(101L, 202L))
  }

  test("timestamp time travel: latest snapshot at-or-before; " +
    "pre-table instants refuse") {
    val t = fresh()
    val nA = plantKv(t, "data/a.parquet", 0, 3)
    val nB = plantKv(t, "data/b.parquet", 10, 12)
    val m1 = IFx.writeManifest(spark, t, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", nA)))
    IFx.writeManifestList(spark, t, "ml1.avro",
      Seq(("m1.avro", m1, 0, 1L)))
    val m2 = IFx.writeManifest(spark, t, "m2.avro", Seq(
      IFx.Entry(0, "data/a.parquet", nA),
      IFx.Entry(1, "data/b.parquet", nB)))
    IFx.writeManifestList(spark, t, "ml2.avro",
      Seq(("m2.avro", m2, 0, 2L)))
    // default Snap timestamps: 1000, 2000
    IFx.writeMetadata(spark, t, 2, Map(0 -> schema), Seq(
      IFx.Snap(101L, "ml1.avro"), IFx.Snap(202L, "ml2.avro")))
    assert(IcebergRead.snapshotIdAt(spark, t, 1000L) == 101L)
    assert(IcebergRead.snapshotIdAt(spark, t, 1999L) == 101L)
    assert(IcebergRead.snapshotIdAt(spark, t, 2000L) == 202L)
    assert(IcebergRead.snapshotIdAt(spark, t, 99999L) == 202L)
    assert(IcebergRead.readAsOfTimestamp(spark, t, 1500L).count() == nA)
    assert(IcebergRead.readAsOfTimestamp(spark, t, 2500L)
      .count() == nA + nB)
    val e = intercept[IllegalArgumentException] {
      IcebergRead.snapshotIdAt(spark, t, 999L)
    }
    assert(e.getMessage.contains("precedes the first snapshot"),
      e.getMessage)
  }

  test("per-snapshot schema-id: an added column reads with ITS " +
    "snapshot's schema") {
    val ss = spark
    import ss.implicits._
    val t = fresh()
    IFx.plantDataFile(spark,
      Seq((1L, "one")).toDF("k", "name"), t, "data/a.parquet", Seq(1, 2))
    IFx.plantDataFile(spark,
      Seq((2L, "two", "x")).toDF("k", "name", "tag"),
      t, "data/b.parquet", Seq(1, 2, 3))
    val wide = IFx.withFieldIds(StructType(Seq(
      StructField("k", LongType),
      StructField("name", StringType),
      StructField("tag", StringType))), Seq(1, 2, 3))
    val m1 = IFx.writeManifest(spark, t, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 1L)))
    IFx.writeManifestList(spark, t, "ml1.avro",
      Seq(("m1.avro", m1, 0, 1L)))
    val m2 = IFx.writeManifest(spark, t, "m2.avro", Seq(
      IFx.Entry(0, "data/a.parquet", 1L),
      IFx.Entry(1, "data/b.parquet", 1L)))
    IFx.writeManifestList(spark, t, "ml2.avro",
      Seq(("m2.avro", m2, 0, 2L)))
    IFx.writeMetadata(spark, t, 2, Map(0 -> schema, 1 -> wide), Seq(
      IFx.Snap(1L, "ml1.avro", schemaId = 0),
      IFx.Snap(2L, "ml2.avro", schemaId = 1)),
      currentSchemaId = 1)
    val now = IcebergRead.read(spark, t).orderBy("k").collect()
    assert(now.map(_.length).toSeq == Seq(3, 3))
    assert(now(0).isNullAt(2) && now(1).getString(2) == "x")
    // the old snapshot reads with the NARROW schema
    val old = IcebergRead.read(spark, t, Some(1L))
    assert(old.schema.fieldNames.toSeq == Seq("k", "name"))
    assert(old.count() == 1L)
  }

  test("renamed column resolves by FIELD ID: old files' physical " +
    "name reads into the renamed logical column") {
    val t = fresh()
    val ss = spark
    import ss.implicits._
    // a.parquet written under the OLD name "k" (field id 1)
    plantKv(t, "data/a.parquet", 0, 4): Unit
    // b.parquet written under the NEW name (same id)
    IFx.plantDataFile(spark,
      (10 until 12).map(i => (i.toLong, s"row$i"))
        .toDF("key_renamed", "name"),
      t, "data/b.parquet", Seq(1, 2))
    val renamed = IFx.withFieldIds(StructType(Seq(
      StructField("key_renamed", LongType),
      StructField("name", StringType))), Seq(1, 2))
    val m1 = IFx.writeManifest(spark, t, "m1.avro", Seq(
      IFx.Entry(1, "data/a.parquet", 4L),
      IFx.Entry(1, "data/b.parquet", 2L)))
    IFx.writeManifestList(spark, t, "ml1.avro",
      Seq(("m1.avro", m1, 0, 1L)))
    IFx.writeMetadata(spark, t, 1, Map(1 -> renamed),
      Seq(IFx.Snap(1L, "ml1.avro", schemaId = 1)),
      currentSchemaId = 1)
    val got = IcebergRead.read(spark, t).orderBy("key_renamed")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq ==
      ((0 until 4) ++ (10 until 12)).map(i => (i.toLong, s"row$i")))
  }

  test("data files WITHOUT footer field ids refuse loudly instead " +
    "of silently resolving by name") {
    val ss = spark
    import ss.implicits._
    val t = fresh()
    // planted via the PLAIN writer — no footer ids
    DeltaFixture.plantDataFile(spark,
      Seq((1L, "one")).toDF("k", "name"), t, "data/a.parquet"): Unit
    val m1 = IFx.writeManifest(spark, t, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 1L)))
    IFx.writeManifestList(spark, t, "ml1.avro",
      Seq(("m1.avro", m1, 0, 1L)))
    IFx.writeMetadata(spark, t, 1, Map(0 -> schema),
      Seq(IFx.Snap(1L, "ml1.avro")))
    val e = intercept[Exception] {
      IcebergRead.read(spark, t).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.toLowerCase.contains("field id")), messages(e).mkString(" | "))
  }

  test("position deletes: (file_path, pos) rows mask exactly their " +
    "targets; metadata count refuses; pre-delete snapshot intact") {
    val ss = spark
    import ss.implicits._
    val t = fresh()
    plantKv(t, "data/a.parquet", 0, 5): Unit
    plantKv(t, "data/b.parquet", 10, 13): Unit
    val m1 = IFx.writeManifest(spark, t, "m1.avro", Seq(
      IFx.Entry(1, "data/a.parquet", 5L),
      IFx.Entry(1, "data/b.parquet", 3L)))
    IFx.writeManifestList(spark, t, "ml1.avro",
      Seq(("m1.avro", m1, 0, 1L)))
    // the DELETE: kill a.parquet rows at pos 1 and 3, plus one STALE
    // row referencing a vanished file (must be harmless)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(t))
    val aUri = new org.apache.hadoop.fs.Path(root, "data/a.parquet")
      .toUri.toString
    DeltaFixture.plantDataFile(spark,
      Seq((aUri, 1L), (aUri, 3L), (s"$root/data/gone.parquet", 0L))
        .toDF("file_path", "pos"),
      t, "data/del1.parquet"): Unit
    val m2 = IFx.writeManifest(spark, t, "m2.avro", Seq(
      IFx.Entry(0, "data/a.parquet", 5L),
      IFx.Entry(0, "data/b.parquet", 3L)))
    val md = IFx.writeManifest(spark, t, "md.avro", Seq(
      IFx.Entry(1, "data/del1.parquet", 3L, content = 1)))
    IFx.writeManifestList(spark, t, "ml2.avro", Seq(
      ("m2.avro", m2, 0, 1L), ("md.avro", md, 1, 2L)))
    IFx.writeMetadata(spark, t, 2, Map(0 -> schema), Seq(
      IFx.Snap(1L, "ml1.avro"), IFx.Snap(2L, "ml2.avro")))
    val got = IcebergRead.read(spark, t).orderBy("k")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 2L, 4L, 10L, 11L, 12L))
    // pre-delete snapshot reads everything
    assert(IcebergRead.read(spark, t, Some(1L)).count() == 8L)
    assert(IcebergRead.countRows(spark, t, Some(1L)) == 8L)
    // metadata-only count refuses under merge-on-read
    val e = intercept[IllegalArgumentException] {
      IcebergRead.countRows(spark, t)
    }
    assert(e.getMessage.contains("position-delete"), e.getMessage)
  }

  test("position deletes match files with SPACES and PERCENT in the " +
    "path exactly (canonical-identity join, no lossy normalization)") {
    val ss = spark
    import ss.implicits._
    val t = fresh()
    // a path Path.toUri percent-encodes: space and literal percent
    val dataName = "data dir %x/a b %20.parquet"
    IFx.plantDataFile(spark,
      (0 until 4).map(i => (i.toLong, s"row$i")).toDF("k", "name"),
      t, dataName, Seq(1, 2))
    val m1 = IFx.writeManifest(spark, t, "m1.avro",
      Seq(IFx.Entry(1, dataName, 4L)))
    IFx.writeManifestList(spark, t, "ml1.avro",
      Seq(("m1.avro", m1, 0, 1L)))
    // delete rows reference the file by its RAW (unencoded) absolute
    // path string — the spec-verbatim manifest form
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(t))
    val rawAbs = new org.apache.hadoop.fs.Path(root, dataName).toString
    DeltaFixture.plantDataFile(spark,
      Seq((rawAbs, 1L), (rawAbs, 2L)).toDF("file_path", "pos"),
      t, "data/del1.parquet"): Unit
    val m2 = IFx.writeManifest(spark, t, "m2.avro",
      Seq(IFx.Entry(0, dataName, 4L)))
    val md = IFx.writeManifest(spark, t, "md.avro",
      Seq(IFx.Entry(1, "data/del1.parquet", 2L, content = 1)))
    IFx.writeManifestList(spark, t, "ml2.avro", Seq(
      ("m2.avro", m2, 0, 1L), ("md.avro", md, 1, 2L)))
    IFx.writeMetadata(spark, t, 2, Map(0 -> schema), Seq(
      IFx.Snap(1L, "ml1.avro"), IFx.Snap(2L, "ml2.avro")))
    val got = IcebergRead.read(spark, t).orderBy("k")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 3L),
      "rows 1 and 2 must be masked despite the encodable path")
  }

  test("equality deletes: null-safe column match gated by the " +
    "strict sequence rule; re-inserted rows survive; stale and " +
    "duplicate delete rows harmless") {
    val ss = spark
    import ss.implicits._
    val t = fresh()
    plantKv(t, "data/a.parquet", 0, 6): Unit // seq 1
    // delete k in {1,3} (+ dup 3, + stale 99) at seq 2
    IFx.plantDataFile(spark,
      Seq(1L, 3L, 3L, 99L).toDF("k"), t, "data/eq1.parquet", Seq(1))
    // re-insert k=3 at seq 3 — survives the seq-2 delete
    IFx.plantDataFile(spark,
      Seq((3L, "row3b")).toDF("k", "name"), t, "data/c.parquet",
      Seq(1, 2))
    val m1 = IFx.writeManifest(spark, t, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 6L)))
    val me = IFx.writeManifest(spark, t, "me.avro",
      Seq(IFx.Entry(1, "data/eq1.parquet", 4L, content = 2,
        equalityIds = Seq(1))))
    val m3 = IFx.writeManifest(spark, t, "m3.avro",
      Seq(IFx.Entry(1, "data/c.parquet", 1L)))
    IFx.writeManifestList(spark, t, "ml1.avro", Seq(
      ("m1.avro", m1, 0, 1L), ("me.avro", me, 1, 2L),
      ("m3.avro", m3, 0, 3L)))
    IFx.writeMetadata(spark, t, 1, Map(0 -> schema),
      Seq(IFx.Snap(1L, "ml1.avro")))
    val got = IcebergRead.read(spark, t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((0L, "row0"), (2L, "row2"), (3L, "row3b"),
      (4L, "row4"), (5L, "row5")))
    // metadata count refuses under equality MOR too
    val e = intercept[IllegalArgumentException] {
      IcebergRead.countRows(spark, t)
    }
    assert(e.getMessage.contains("equality-delete"), e.getMessage)
  }

  test("equality-delete refusals: partitioned table; unresolvable " +
    "sequence numbers") {
    val ss = spark
    import ss.implicits._
    // partitioned table + eq deletes -> refuse (partition-scoped
    // deletes applied table-wide could over-delete)
    val t = fresh()
    plantKv(t, "data/a.parquet", 0, 2): Unit
    IFx.plantDataFile(spark, Seq(1L).toDF("k"),
      t, "data/eq1.parquet", Seq(1))
    val m1 = IFx.writeManifest(spark, t, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 2L)))
    val me = IFx.writeManifest(spark, t, "me.avro",
      Seq(IFx.Entry(1, "data/eq1.parquet", 1L, content = 2,
        equalityIds = Seq(1))))
    IFx.writeManifestList(spark, t, "ml1.avro", Seq(
      ("m1.avro", m1, 0, 1L), ("me.avro", me, 1, 2L)))
    IFx.writeMetadata(spark, t, 1, Map(0 -> schema),
      Seq(IFx.Snap(1L, "ml1.avro")),
      partitionFieldNames = Seq("name"))
    val e1 = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, t)
    }
    assert(e1.getMessage.contains("PARTITIONED"), e1.getMessage)
    // a data file whose sequence number cannot resolve (EXISTING
    // entry, no explicit seq) + eq deletes -> refuse at read
    val t2 = fresh()
    plantKv(t2, "data/a.parquet", 0, 2): Unit
    IFx.plantDataFile(spark, Seq(1L).toDF("k"),
      t2, "data/eq1.parquet", Seq(1))
    val m2 = IFx.writeManifest(spark, t2, "m1.avro",
      Seq(IFx.Entry(0, "data/a.parquet", 2L))) // EXISTING, no seq
    val me2 = IFx.writeManifest(spark, t2, "me.avro",
      Seq(IFx.Entry(1, "data/eq1.parquet", 1L, content = 2,
        equalityIds = Seq(1))))
    IFx.writeManifestList(spark, t2, "ml1.avro", Seq(
      ("m1.avro", m2, 0, 1L), ("me.avro", me2, 1, 2L)))
    IFx.writeMetadata(spark, t2, 1, Map(0 -> schema),
      Seq(IFx.Snap(1L, "ml1.avro")))
    val e2 = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, t2)
    }
    assert(e2.getMessage.contains("sequence number"), e2.getMessage)
    // an eq-delete ENTRY with no resolvable seq refuses at the walk
    val t3 = fresh()
    plantKv(t3, "data/a.parquet", 0, 2): Unit
    IFx.plantDataFile(spark, Seq(1L).toDF("k"),
      t3, "data/eq1.parquet", Seq(1))
    val m3 = IFx.writeManifest(spark, t3, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 2L)))
    val me3 = IFx.writeManifest(spark, t3, "me.avro",
      Seq(IFx.Entry(0, "data/eq1.parquet", 1L, content = 2,
        equalityIds = Seq(1)))) // EXISTING, no inherit
    IFx.writeManifestList(spark, t3, "ml1.avro", Seq(
      ("m1.avro", m3, 0, 1L), ("me.avro", me3, 1, 2L)))
    IFx.writeMetadata(spark, t3, 1, Map(0 -> schema),
      Seq(IFx.Snap(1L, "ml1.avro")))
    val e3 = intercept[IllegalArgumentException] {
      IcebergRead.snapshot(spark, t3)
    }
    assert(e3.getMessage.contains("sequence number"), e3.getMessage)
  }

  test("refusals: malformed manifest, unknown snapshot, not a " +
    "table, bad type") {
    val t2 = fresh()
    plantKv(t2, "data/a.parquet", 0, 2): Unit
    // malformed: data_file with content=1 inside a DATA manifest
    val m2 = IFx.writeManifest(spark, t2, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 2L, content = 1)))
    IFx.writeManifestList(spark, t2, "ml1.avro",
      Seq(("m1.avro", m2, 0, 1L)))
    IFx.writeMetadata(spark, t2, 1, Map(0 -> schema),
      Seq(IFx.Snap(1L, "ml1.avro")))
    val e2 = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, t2)
    }
    assert(e2.getMessage.contains("malformed"), e2.getMessage)
    // unknown snapshot id
    val t3 = fresh()
    plantKv(t3, "data/a.parquet", 0, 2): Unit
    val m3 = IFx.writeManifest(spark, t3, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 2L)))
    IFx.writeManifestList(spark, t3, "ml1.avro",
      Seq(("m1.avro", m3, 0, 1L)))
    IFx.writeMetadata(spark, t3, 1, Map(0 -> schema),
      Seq(IFx.Snap(1L, "ml1.avro")))
    val e3 = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, t3, Some(99L))
    }
    assert(e3.getMessage.contains("snapshot 99"), e3.getMessage)
    // not a table
    val e4 = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, fresh())
    }
    assert(e4.getMessage.contains("metadata/"), e4.getMessage)
    // unsupported type in schema JSON
    val t5 = fresh()
    plantKv(t5, "data/a.parquet", 0, 2): Unit
    val m5 = IFx.writeManifest(spark, t5, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 2L)))
    IFx.writeManifestList(spark, t5, "ml1.avro",
      Seq(("m1.avro", m5, 0, 1L)))
    IFx.writeMetadata(spark, t5, 1, Map(0 -> schema),
      Seq(IFx.Snap(1L, "ml1.avro")))
    val fs = new org.apache.hadoop.fs.Path(t5)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val mf = new org.apache.hadoop.fs.Path(t5, "metadata/v1.metadata.json")
    val in = fs.open(mf)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val out = fs.create(mf, true)
    try out.write(txt.replace("\"long\"", "\"uuid\"").getBytes("UTF-8"))
    finally out.close()
    val e5 = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, t5)
    }
    assert(e5.getMessage.contains("uuid"), e5.getMessage)
  }

  test("v1 metadata with an inline manifests array reads") {
    val t = fresh()
    plantKv(t, "data/a.parquet", 0, 3): Unit
    IFx.writeManifest(spark, t, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 3L))): Unit
    // hand-author v1 metadata: "schema" (no schemas), inline manifests
    val metaJson =
      s"""{"format-version": 1,
         |"table-uuid": "00000000-0000-0000-0000-000000000001",
         |"location": "$t",
         |"last-updated-ms": 0,
         |"last-column-id": 2,
         |"schema": {"type": "struct", "fields": [
         |  {"id": 1, "name": "k", "required": false, "type": "long"},
         |  {"id": 2, "name": "name", "required": false,
         |   "type": "string"}]},
         |"partition-spec": [],
         |"current-snapshot-id": 7,
         |"snapshots": [{"snapshot-id": 7, "timestamp-ms": 0,
         |  "manifests": ["metadata/m1.avro"]}]}""".stripMargin
    graft.ScratchSpace.writeBytes(spark, t, "metadata/v1.metadata.json",
      metaJson.getBytes("UTF-8"))
    // no version-hint: discovery falls back to the highest v<N>
    assert(IcebergRead.read(spark, t).orderBy("k")
      .collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    assert(IcebergRead.countRows(spark, t) == 3L)
  }
}
