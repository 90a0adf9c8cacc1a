package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class DeltaReadSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("name", StringType),
    StructField("src", StringType)))

  private def freshTable(): String =
    graft.ScratchSpace.dir(spark, "deltaspec_")

  private def plantKv(t: String, name: String, lo: Int, hi: Int): Long = {
    val ss = spark
    import ss.implicits._
    DeltaFixture.plantDataFile(spark,
      (lo until hi).map(i => (i.toLong, s"row$i")).toDF("k", "name"),
      t, name)
  }

  test("multi-commit replay: adds, remove, partition values from log") {
    val t = freshTable()
    val sa = plantKv(t, "a.parquet", 0, 5)
    val sb = plantKv(t, "b.parquet", 5, 9)
    val sc = plantKv(t, "c.parquet", 100, 103)
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("spec", schema, Seq("src")),
      DeltaFixture.addLine("a.parquet", sa, Map("src" -> Some("x"))),
      DeltaFixture.addLine("b.parquet", sb, Map("src" -> Some("y")))))
    DeltaFixture.writeCommit(spark, t, 1, Seq(
      DeltaFixture.addLine("c.parquet", sc, Map("src" -> Some("z")))))
    DeltaFixture.writeCommit(spark, t, 2, Seq(
      DeltaFixture.removeLine("b.parquet")))
    val out = DeltaRead.read(spark, t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq ==
      (0 until 5).map(i => (i.toLong, s"row$i", "x")) ++
        (100 until 103).map(i => (i.toLong, s"row$i", "z")))
    // time travel: version 1 still sees b.parquet; version 0 lacks c
    assert(DeltaRead.read(spark, t, asOf = Some(1L)).count() == 12)
    val v0 = DeltaRead.read(spark, t, asOf = Some(0L))
    assert(v0.count() == 9)
    assert(v0.where(col("src") === "y").count() == 4)
    assert(DeltaRead.versions(spark, t) == Seq(0L, 1L, 2L))
    // schema order + types follow the log schema
    assert(DeltaRead.read(spark, t).schema == schema)
  }

  test("unpartitioned table, empty live set, and schema on empty") {
    val t = freshTable()
    val plain = StructType(schema.dropRight(1))
    val sa = plantKv(t, "a.parquet", 0, 3)
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("spec", plain),
      DeltaFixture.addLine("a.parquet", sa)))
    assert(DeltaRead.read(spark, t).count() == 3)
    DeltaFixture.writeCommit(spark, t, 1, Seq(
      DeltaFixture.removeLine("a.parquet")))
    val empty = DeltaRead.read(spark, t)
    assert(empty.count() == 0 && empty.schema == plain)
  }

  test("null and integer-typed partition values cast from the log") {
    val t = freshTable()
    val ps = StructType(Seq(
      StructField("k", LongType),
      StructField("name", StringType),
      StructField("part_n", IntegerType)))
    val sa = plantKv(t, "a.parquet", 0, 2)
    val sb = plantKv(t, "b.parquet", 2, 4)
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("spec", ps, Seq("part_n")),
      DeltaFixture.addLine("a.parquet", sa, Map("part_n" -> Some("7"))),
      DeltaFixture.addLine("b.parquet", sb, Map("part_n" -> None))))
    val out = DeltaRead.read(spark, t).orderBy("k").collect()
    assert(out.map(r => if (r.isNullAt(2)) -1 else r.getInt(2)).toSeq ==
      Seq(7, 7, -1, -1))
  }

  test("last-action-wins: re-add after remove resurrects the file") {
    val t = freshTable()
    val sa = plantKv(t, "a.parquet", 0, 4)
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("spec", StructType(schema.dropRight(1))),
      DeltaFixture.addLine("a.parquet", sa)))
    DeltaFixture.writeCommit(spark, t, 1, Seq(
      DeltaFixture.removeLine("a.parquet"),
      DeltaFixture.addLine("a.parquet", sa)))
    assert(DeltaRead.read(spark, t).count() == 4)
  }

  test("URI-encoded relative paths decode (percent escapes)") {
    val t = freshTable()
    val sa = plantKv(t, "part a.parquet", 0, 3)
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("spec", StructType(schema.dropRight(1))),
      DeltaFixture.addLine("part%20a.parquet", sa)))
    assert(DeltaRead.read(spark, t).count() == 3)
    assert(DeltaRead.decodePath("part%20a.parquet") == "part a.parquet")
    assert(DeltaRead.decodePath("no escapes.parquet") == "no escapes.parquet")
  }

  test("checkpoint replay: vacuumed head resolves through the checkpoint") {
    val t = freshTable()
    val sa = plantKv(t, "a.parquet", 0, 5)
    plantKv(t, "b.parquet", 5, 9): Unit
    val sc = plantKv(t, "c.parquet", 100, 103)
    val sd = plantKv(t, "d.parquet", 200, 202)
    // JSONs 0-1 were vacuumed; checkpoint 2 carries the net state at
    // v2 (a live with partition x, c live with partition z — b was
    // added and removed before the checkpoint); JSON 3 then adds d,
    // JSON 4 removes c
    DeltaFixture.writeCheckpoint(spark, t, 2, schema, Seq("src"),
      adds = Seq(
        "a.parquet" -> Map("src" -> Some("x")),
        "c.parquet" -> Map("src" -> Some("z"))))
    DeltaFixture.writeCommit(spark, t, 3, Seq(
      DeltaFixture.addLine("d.parquet", sd, Map("src" -> Some("w")))))
    DeltaFixture.writeCommit(spark, t, 4, Seq(
      DeltaFixture.removeLine("c.parquet")))
    val out = DeltaRead.read(spark, t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq ==
      (0 until 5).map(i => (i.toLong, s"row$i", "x")) ++
        (200 until 202).map(i => (i.toLong, s"row$i", "w")))
    // time travel INTO the checkpoint version and past it
    assert(DeltaRead.read(spark, t, asOf = Some(2L)).count() == 8)
    assert(DeltaRead.read(spark, t, asOf = Some(3L)).count() == 10)
    // a version before the checkpoint is unreachable — loud refusal
    val e = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, t, asOf = Some(1L))
    }
    assert(e.getMessage.contains("version 1"), e.getMessage)
    // versions() lists the checkpoint-only version too — it is the
    // oldest readable version of a vacuumed-head table
    assert(DeltaRead.versions(spark, t) == Seq(2L, 3L, 4L))
    // a fresh commit on top keeps replaying incrementally
    DeltaFixture.writeCommit(spark, t, 5, Seq(
      DeltaFixture.removeLine("a.parquet")))
    assert(DeltaRead.read(spark, t).count() == 2)
    assert(sa > 0 && sc > 0)
  }

  test("checkpoint preferred over a complete JSON chain only when needed") {
    // full JSON chain 0..2 AND a checkpoint at 1: the pure-JSON path
    // must win (checkpoints are a fallback, not a shortcut) — and the
    // result must be identical either way
    val t = freshTable()
    val sa = plantKv(t, "a.parquet", 0, 4)
    val sb = plantKv(t, "b.parquet", 10, 13)
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("spec", StructType(schema.dropRight(1))),
      DeltaFixture.addLine("a.parquet", sa)))
    DeltaFixture.writeCommit(spark, t, 1, Seq(
      DeltaFixture.addLine("b.parquet", sb)))
    DeltaFixture.writeCommit(spark, t, 2, Seq(
      DeltaFixture.removeLine("a.parquet")))
    DeltaFixture.writeCheckpoint(spark, t,
      1, StructType(schema.dropRight(1)),
      adds = Seq(
        "a.parquet" -> Map.empty,
        "b.parquet" -> Map.empty))
    assert(DeltaRead.read(spark, t).count() == 3)
    assert(DeltaRead.read(spark, t, asOf = Some(1L)).count() == 7)
  }

  test("checkpoint refusals: v2 columns, reader version, multi-part") {
    // v2 sidecar column
    val t1 = freshTable()
    plantKv(t1, "a.parquet", 0, 2): Unit
    val ss = spark
    import ss.implicits._
    val cpDir = s"$t1/_delta_log"
    // hand-plant a parquet with a sidecar column at checkpoint name
    DeltaFixture.plantDataFile(spark,
      Seq(("x", "y")).toDF("sidecar", "other"),
      t1, f"_delta_log/${0L}%020d.checkpoint.parquet"): Unit
    val e1 = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, t1)
    }
    assert(e1.getMessage.contains("sidecar"), e1.getMessage)
    // reader version 4 recorded IN the checkpoint protocol row
    // (v3 with no unsupported features now READS — see below)
    val t2 = freshTable()
    plantKv(t2, "a.parquet", 0, 2): Unit
    DeltaFixture.writeCheckpoint(spark, t2, 0,
      StructType(schema.dropRight(1)),
      adds = Seq("a.parquet" -> Map.empty), minReader = 4)
    val e2 = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, t2)
    }
    assert(e2.getMessage.contains("reader version 4"), e2.getMessage)
    // v3 checkpoint with empty features reads fine
    val t2b = freshTable()
    plantKv(t2b, "a.parquet", 0, 2): Unit
    DeltaFixture.writeCheckpoint(spark, t2b, 0,
      StructType(schema.dropRight(1)),
      adds = Seq("a.parquet" -> Map.empty), minReader = 3)
    assert(DeltaRead.read(spark, t2b).count() == 2L)
    // multi-part checkpoint is refused loudly
    val t3 = freshTable()
    plantKv(t3, "a.parquet", 0, 2): Unit
    DeltaFixture.plantDataFile(spark,
      Seq((1, 2)).toDF("a", "b"),
      t3, f"_delta_log/${0L}%020d.checkpoint.0000000001.0000000002.parquet")
      : Unit
    val e3 = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, t3)
    }
    assert(e3.getMessage.toLowerCase.contains("multi-part"), e3.getMessage)
    assert(cpDir.nonEmpty)
  }

  test("readPruned: file-list pruning, conservative stats, exact rows") {
    val t = freshTable()
    val sa = plantKv(t, "a.parquet", 0, 5)    // k 0-4
    val sb = plantKv(t, "b.parquet", 10, 15)  // k 10-14
    val sc = plantKv(t, "c.parquet", 20, 25)  // k 20-24
    val sd = plantKv(t, "d.parquet", 30, 35)  // k 30-34, no stats
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("spec", schema, Seq("src")),
      DeltaFixture.addLine("a.parquet", sa, Map("src" -> Some("x")),
        stats = Some(DeltaFixture.statsJson(5, Map("k" -> ((0L, 4L)))))),
      DeltaFixture.addLine("b.parquet", sb, Map("src" -> Some("x")),
        stats = Some(DeltaFixture.statsJson(5, Map("k" -> ((10L, 14L)))))),
      DeltaFixture.addLine("c.parquet", sc, Map("src" -> Some("y")),
        stats = Some(DeltaFixture.statsJson(5, Map("k" -> ((20L, 24L)))))),
      DeltaFixture.addLine("d.parquet", sd, Map("src" -> Some("x")))))
    // partition pruning alone: src=y reads ONE file
    val py = DeltaRead.readPruned(spark, t,
      partitionEquals = Map("src" -> "y"))
    assert(py.count() == 5 && py.inputFiles.length == 1)
    // stats skipping: k in [11, 12] proves a and c out; d (no stats)
    // must be KEPT in the scan and row-filtered to nothing
    val pr = DeltaRead.readPruned(spark, t, range = Some(("k", 11L, 12L)))
    assert(pr.inputFiles.length == 2, pr.inputFiles.mkString(","))
    assert(pr.collect().map(_.getLong(0)).sorted.toSeq == Seq(11L, 12L))
    // combined predicates are bit-identical to read().where()
    val both = DeltaRead.readPruned(spark, t,
      partitionEquals = Map("src" -> "x"), range = Some(("k", 3L, 11L)))
    val ref = DeltaRead.read(spark, t)
      .where(col("src") === "x" && col("k") >= 3 && col("k") <= 11)
    assert(both.collect().map(_.toSeq).toSet ==
      ref.collect().map(_.toSeq).toSet)
    assert(both.inputFiles.length == 3) // a, b by range; d unprovable
    // boundary inclusivity: range hitting a file's exact max keeps it
    assert(DeltaRead.readPruned(spark, t,
      range = Some(("k", 4L, 4L))).count() == 1)
    // a NULL partition value never matches an equality
    val t2 = freshTable()
    val s2 = plantKv(t2, "a.parquet", 0, 3)
    DeltaFixture.writeCommit(spark, t2, 0, Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("spec", schema, Seq("src")),
      DeltaFixture.addLine("a.parquet", s2, Map("src" -> None))))
    assert(DeltaRead.readPruned(spark, t2,
      partitionEquals = Map("src" -> "x")).count() == 0)
    // malformed / column-less stats keep the file
    assert(DeltaRead.statsOverlap(Some("{not json"), "k", 0, 1))
    assert(DeltaRead.statsOverlap(
      Some("""{"numRecords": 3}"""), "k", 0, 1))
    assert(DeltaRead.statsOverlap(None, "k", 0, 1))
    assert(!DeltaRead.statsOverlap(
      Some("""{"minValues":{"k":5},"maxValues":{"k":9}}"""), "k", 0, 4))
    assert(DeltaRead.statsOverlap(
      Some("""{"minValues":{"k":5},"maxValues":{"k":9}}"""), "k", 9, 20))
    // refusals: unknown partition column / unknown range column / lo>hi
    val e1 = intercept[IllegalArgumentException] {
      DeltaRead.readPruned(spark, t, partitionEquals = Map("name" -> "x"))
    }
    assert(e1.getMessage.contains("not a partition column"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DeltaRead.readPruned(spark, t, range = Some(("nope", 0L, 1L)))
    }
    assert(e2.getMessage.contains("unknown column"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      DeltaRead.readPruned(spark, t, range = Some(("k", 5L, 1L)))
    }
    assert(e3.getMessage.contains("lo"), e3.getMessage)
  }

  test("countRows: metadata-only, refuses on any stats-less live file") {
    val t = freshTable()
    val sa = plantKv(t, "a.parquet", 0, 5)
    val sb = plantKv(t, "b.parquet", 5, 9)
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("spec", StructType(schema.dropRight(1))),
      DeltaFixture.addLine("a.parquet", sa,
        stats = Some(DeltaFixture.statsJson(5, Map("k" -> ((0L, 4L)))))),
      DeltaFixture.addLine("b.parquet", sb,
        stats = Some(DeltaFixture.statsJson(4, Map.empty)))))
    assert(DeltaRead.countRows(spark, t) == 9L)
    // removing a file drops its count
    DeltaFixture.writeCommit(spark, t, 1, Seq(
      DeltaFixture.removeLine("a.parquet")))
    assert(DeltaRead.countRows(spark, t) == 4L)
    assert(DeltaRead.countRows(spark, t, asOf = Some(0L)) == 9L)
    // a live file without numRecords refuses loudly
    val s3 = plantKv(t, "c.parquet", 9, 12)
    DeltaFixture.writeCommit(spark, t, 2, Seq(
      DeltaFixture.addLine("c.parquet", s3)))
    val e = intercept[IllegalArgumentException] {
      DeltaRead.countRows(spark, t)
    }
    assert(e.getMessage.contains("numRecords"), e.getMessage)
    // ... but the pre-commit version still counts
    assert(DeltaRead.countRows(spark, t, asOf = Some(1L)) == 4L)
  }

  test("refusals are loud: reader v2, features, DV, gaps, provider, no log") {
    val t = freshTable()
    val sa = plantKv(t, "a.parquet", 0, 2)
    def expectRefusal(lines: Seq[(Long, Seq[String])], needle: String) = {
      val tt = freshTable()
      val s2 = plantKv(tt, "a.parquet", 0, 2)
      lines.foreach { case (v, ls) =>
        DeltaFixture.writeCommit(spark, tt, v,
          ls.map(_.replace("SIZE", s2.toString)))
      }
      val e = intercept[IllegalArgumentException] {
        DeltaRead.read(spark, tt)
      }
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    val meta = DeltaFixture.metaDataLine("spec", StructType(schema.dropRight(1)))
    // column mapping ID mode whose schema lacks delta.columnMapping.id
    // metadata — malformed; well-formed id mode reads (own test below)
    expectRefusal(Seq(0L -> Seq(
      DeltaFixture.protocolLine(minReader = 2),
      DeltaFixture.metaDataLine("spec", StructType(schema.dropRight(1)),
        configuration = Map("delta.columnMapping.mode" -> "id")),
      DeltaFixture.addLine("a.parquet", 1))), "delta.columnMapping.id")
    // unsupported reader FEATURE (v2 checkpoints)
    expectRefusal(Seq(0L -> Seq(
      DeltaFixture.protocolFeaturesLine(3, 7, Seq("v2Checkpoint")), meta,
      DeltaFixture.addLine("a.parquet", 1))), "v2Checkpoint")
    // reader version beyond 3
    expectRefusal(Seq(0L -> Seq(
      DeltaFixture.protocolLine(minReader = 4), meta,
      DeltaFixture.addLine("a.parquet", 1))), "reader version 4")
    // a CORRUPT deletion vector declines at scan time, loudly (the
    // fixture's garbage descriptor carries an undecodable payload)
    locally {
      val tt = freshTable()
      val s2 = plantKv(tt, "a.parquet", 0, 2)
      DeltaFixture.writeCommit(spark, tt, 0, Seq(
        DeltaFixture.protocolFeaturesLine(3, 7, Seq("deletionVectors")),
        meta,
        DeltaFixture.addLine("a.parquet", s2,
          withDeletionVector = true)))
      // snapshot replays fine; the damage surfaces on data access
      assert(DeltaRead.snapshot(spark, tt).liveFiles.head.dv.nonEmpty)
      val e = intercept[Exception] {
        DeltaRead.read(spark, tt).count()
      }
      def msgs(x: Throwable): String =
        if (x == null) ""
        else Option(x.getMessage).getOrElse("") + "|" + msgs(x.getCause)
      assert(msgs(e).contains("too short"), msgs(e))
    }
    // log gap (version 1 missing)
    expectRefusal(Seq(
      0L -> Seq(DeltaFixture.protocolLine(), meta,
        DeltaFixture.addLine("a.parquet", 1)),
      2L -> Seq(DeltaFixture.removeLine("a.parquet"))), "gap")
    // non-parquet provider
    expectRefusal(Seq(0L -> Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("spec",
        StructType(schema.dropRight(1)), provider = "csv"),
      DeltaFixture.addLine("a.parquet", 1))), "csv")
    // log not starting at 0 (vacuumed after checkpoint)
    expectRefusal(Seq(3L -> Seq(
      DeltaFixture.protocolLine(), meta,
      DeltaFixture.addLine("a.parquet", 1))), "checkpoint")
    // no metaData at all
    expectRefusal(Seq(0L -> Seq(
      DeltaFixture.protocolLine(),
      DeltaFixture.addLine("a.parquet", 1))), "metaData")
    // not a delta table
    val e = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, t)
    }
    assert(e.getMessage.contains("_delta_log"), e.getMessage)
    // unknown asOf version
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(), meta,
      DeltaFixture.addLine("a.parquet", sa)))
    val e2 = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, t, asOf = Some(9L))
    }
    assert(e2.getMessage.contains("version 9"), e2.getMessage)
  }

  private def mappedField(
      name: String,
      dt: org.apache.spark.sql.types.DataType,
      phys: String,
      id: Long): StructField =
    StructField(name, dt, nullable = true,
      new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id)
        .build())

  test("column mapping (name mode): physical parquet names map back " +
    "to logical; partition values keyed by physical name") {
    val ss = spark
    import ss.implicits._
    val t = freshTable()
    // data files carry PHYSICAL names; the schema maps them
    val sa = DeltaFixture.plantDataFile(spark,
      Seq((1L, "one"), (2L, "two")).toDF("col-k9x", "col-n2y"),
      t, "a.parquet")
    val mapped = StructType(Seq(
      mappedField("k", LongType, "col-k9x", 1),
      mappedField("name", StringType, "col-n2y", 2),
      mappedField("src", StringType, "col-s3z", 3)))
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(minReader = 2, minWriter = 5),
      DeltaFixture.metaDataLine("cm", mapped,
        partitionColumns = Seq("src"),
        configuration = Map("delta.columnMapping.mode" -> "name")),
      // partitionValues keyed by the PHYSICAL partition column name
      DeltaFixture.addLine("a.parquet", sa,
        partitionValues = Map("col-s3z" -> Some("alpha")))))
    val got = DeltaRead.read(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, "one", "alpha"), (2L, "two", "alpha")))
    // logical names drive readPruned's partitionEquals and range
    val pruned = DeltaRead.readPruned(spark, t,
      partitionEquals = Map("src" -> "alpha"))
    assert(pruned.count() == 2L)
    assert(DeltaRead.readPruned(spark, t,
      partitionEquals = Map("src" -> "beta")).count() == 0L)
  }

  test("column mapping: nested mappings refuse loudly") {
    val ss = spark
    import ss.implicits._
    val t = freshTable()
    val sa = plantKv(t, "a.parquet", 0, 2)
    val nested = StructType(Seq(
      mappedField("k", LongType, "pk", 1),
      StructField("obj", StructType(Seq(
        mappedField("inner", StringType, "pi", 2))))))
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(minReader = 2, minWriter = 5),
      DeltaFixture.metaDataLine("cmn", nested,
        configuration = Map("delta.columnMapping.mode" -> "name")),
      DeltaFixture.addLine("a.parquet", sa)))
    val e = intercept[IllegalArgumentException] {
      DeltaRead.read(spark, t)
    }
    assert(e.getMessage.contains("NESTED"), e.getMessage)
  }

  test("column mapping (id mode): columns resolve by parquet footer " +
    "FIELD ID — physical names free to differ per file; partitioned") {
    val ss = spark
    import ss.implicits._
    val t = freshTable()
    // two files, SAME field ids, DIFFERENT physical column names —
    // only id resolution can read both
    val sa = IcebergFixture.plantDataFile(spark,
      Seq((1L, "one"), (2L, "two")).toDF("col-k9x", "col-n2y"),
      t, "a.parquet", Seq(1, 2))
    val sb = IcebergFixture.plantDataFile(spark,
      Seq((10L, "ten")).toDF("x1", "x2"),
      t, "b.parquet", Seq(1, 2))
    val mapped = StructType(Seq(
      mappedField("k", LongType, "col-k9x", 1),
      mappedField("name", StringType, "col-n2y", 2),
      mappedField("src", StringType, "col-s3z", 3)))
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(minReader = 2, minWriter = 5),
      DeltaFixture.metaDataLine("cmid", mapped,
        partitionColumns = Seq("src"),
        configuration = Map("delta.columnMapping.mode" -> "id",
          "delta.columnMapping.maxColumnId" -> "3")),
      // partitionValues keyed by the PHYSICAL partition column name
      DeltaFixture.addLine("a.parquet", sa,
        partitionValues = Map("col-s3z" -> Some("alpha"))),
      DeltaFixture.addLine("b.parquet", sb,
        partitionValues = Map("col-s3z" -> Some("beta")))))
    val got = DeltaRead.read(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, "one", "alpha"), (2L, "two", "alpha"),
      (10L, "ten", "beta")))
    // logical names drive readPruned through the id mapping too
    assert(DeltaRead.readPruned(spark, t,
      partitionEquals = Map("src" -> "beta")).count() == 1L)
  }

  test("readCdf: cdc files replay verbatim, add-only derives " +
    "inserts, remove-only derives deletes; update-shape without " +
    "cdc refuses") {
    val ss = spark
    import ss.implicits._
    val t = freshTable()
    val meta2 = DeltaFixture.metaDataLine("cdf",
      StructType(schema.dropRight(1)))
    // v0: add-only -> derived inserts
    val sa = plantKv(t, "a.parquet", 0, 3)
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolLine(), meta2,
      DeltaFixture.addLine("a.parquet", sa)))
    // v1: an update commit WITH a cdc file (replayed verbatim)
    val sb = plantKv(t, "b.parquet", 10, 12)
    val cdcSize = DeltaFixture.plantDataFile(spark,
      Seq((0L, "row0", "update_preimage"), (0L, "row0x", "update_postimage"))
        .toDF("k", "name", "_change_type"),
      t, "_change_data/cdc-spec.parquet")
    DeltaFixture.writeCommit(spark, t, 1, Seq(
      DeltaFixture.cdcLine("_change_data/cdc-spec.parquet", cdcSize),
      DeltaFixture.removeLine("a.parquet"),
      DeltaFixture.addLine("b.parquet", sb)))
    // v2: remove-only -> derived deletes (b's content at v1)
    DeltaFixture.writeCommit(spark, t, 2, Seq(
      DeltaFixture.removeLine("b.parquet")))
    val got = DeltaRead.readCdf(spark, t, 0)
      .orderBy("_commit_version", "_change_type", "k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, "row0", "insert", 0L), (1L, "row1", "insert", 0L),
      (2L, "row2", "insert", 0L),
      (0L, "row0x", "update_postimage", 1L),
      (0L, "row0", "update_preimage", 1L),
      (10L, "row10", "delete", 2L), (11L, "row11", "delete", 2L)))
    // a bounded range reads only its commits
    assert(DeltaRead.readCdf(spark, t, 2).count() == 2L)
    // update-shape commit WITHOUT cdc refuses loudly
    val t2 = freshTable()
    val s2a = plantKv(t2, "a.parquet", 0, 2)
    val s2b = plantKv(t2, "b.parquet", 5, 6)
    DeltaFixture.writeCommit(spark, t2, 0, Seq(
      DeltaFixture.protocolLine(), meta2,
      DeltaFixture.addLine("a.parquet", s2a)))
    DeltaFixture.writeCommit(spark, t2, 1, Seq(
      DeltaFixture.removeLine("a.parquet"),
      DeltaFixture.addLine("b.parquet", s2b)))
    val e = intercept[IllegalArgumentException] {
      DeltaRead.readCdf(spark, t2, 0)
    }
    assert(e.getMessage.contains("never recorded"), e.getMessage)
  }

  test("versionTimestamps: monotonic; versionAt resolves instants " +
    "and refuses pre-table ones") {
    val t = freshTable()
    val sa = plantKv(t, "a.parquet", 0, 2)
    def ci(ts: Long) =
      s"""{"commitInfo":{"timestamp":$ts,"operation":"spec"}}"""
    DeltaFixture.writeCommit(spark, t, 0, Seq(ci(5000L),
      DeltaFixture.protocolLine(),
      DeltaFixture.metaDataLine("ts", StructType(schema.dropRight(1))),
      DeltaFixture.addLine("a.parquet", sa)))
    // v1's planted timestamp goes BACKWARD — monotonicity clamps it
    val sb = plantKv(t, "b.parquet", 5, 7)
    DeltaFixture.writeCommit(spark, t, 1, Seq(ci(3000L),
      DeltaFixture.addLine("b.parquet", sb)))
    val sc = plantKv(t, "c.parquet", 8, 9)
    DeltaFixture.writeCommit(spark, t, 2, Seq(ci(7000L),
      DeltaFixture.addLine("c.parquet", sc)))
    val stamped = versionTs(t)
    assert(stamped.map(_._1) == Seq(0L, 1L, 2L))
    assert(stamped.map(_._2) == Seq(5000L, 5000L, 7000L))
    assert(DeltaRead.versionAt(spark, t, 5000L) == 1L) // clamp ties
    assert(DeltaRead.versionAt(spark, t, 6999L) == 1L)
    assert(DeltaRead.versionAt(spark, t, 7000L) == 2L)
    assert(DeltaRead.readAsOfTimestamp(spark, t, 5000L).count() == 4L)
    val e = intercept[IllegalArgumentException] {
      DeltaRead.versionAt(spark, t, 4999L)
    }
    assert(e.getMessage.contains("precedes"), e.getMessage)
  }

  private def versionTs(t: String): Seq[(Long, Long)] =
    DeltaRead.versionTimestamps(spark, t)

  test("deletion vectors: inline and on-disk DVs drop exactly the " +
    "masked row indexes; countRows subtracts cardinality") {
    val ss = spark
    import ss.implicits._
    val t = freshTable()
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(t))
    // file a: rows k=0..4, inline DV kills row indexes 1 and 3
    val sa = DeltaFixture.plantDataFile(spark,
      (0 until 5).map(i => (i.toLong, s"row$i")).toDF("k", "name")
        .coalesce(1).orderBy("k"),
      t, "a.parquet")
    val inlineData = DeletionVectors.serialize(Array(1L, 3L))
    val dvInline = DeletionVectors.DvDescriptor("i",
      DeletionVectors.z85Encode(inlineData), None, inlineData.length, 2L)
    // file b: rows k=10..14, on-disk 'u' DV kills row index 0
    val sb = DeltaFixture.plantDataFile(spark,
      (10 until 15).map(i => (i.toLong, s"row$i")).toDF("k", "name")
        .coalesce(1).orderBy("k"),
      t, "b.parquet")
    val uuid = java.util.UUID.randomUUID()
    val spans = DeletionVectors.writeDvFile(fs,
      new org.apache.hadoop.fs.Path(root, s"deletion_vector_$uuid.bin"),
      Seq(Array(0L)))
    val ub = java.nio.ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits)
    ub.putLong(uuid.getLeastSignificantBits)
    val dvU = DeletionVectors.DvDescriptor("u",
      DeletionVectors.z85Encode(ub.array()),
      Some(spans.head._1), spans.head._2, 1L)
    val schema2 = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType)))
    DeltaFixture.writeCommit(spark, t, 0, Seq(
      DeltaFixture.protocolFeaturesLine(3, 7, Seq("deletionVectors")),
      DeltaFixture.metaDataLine("dv", schema2),
      DeltaFixture.addLine("a.parquet", sa, dv = Some(dvInline),
        stats = Some(DeltaFixture.statsJson(5, Map("k" -> (0L, 4L))))),
      DeltaFixture.addLine("b.parquet", sb, dv = Some(dvU),
        stats = Some(DeltaFixture.statsJson(5, Map("k" -> (10L, 14L)))))))
    val got = DeltaRead.read(spark, t).orderBy("k").collect()
      .map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 2L, 4L, 11L, 12L, 13L, 14L))
    // metadata count = physical rows minus DV cardinality
    assert(DeltaRead.countRows(spark, t) == 7L)
    // pruning composes with DVs (file b pruned by range; a's DV holds)
    val pruned = DeltaRead.readPruned(spark, t,
      range = Some(("k", 0L, 4L)))
    assert(pruned.orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 2L, 4L))
  }

  test("readChanges: version-range incremental read tags commit " +
    "versions; deletes refuse without ignoreDeletes; compaction " +
    "rewrites are skipped") {
    val ss = spark
    import ss.implicits._
    def kv(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, s"row$i")).toDF("k", "name")
    val t = freshTable()
    DeltaWrite.append(kv(0, 3), t): Unit // v0
    DeltaWrite.append(kv(10, 12), t): Unit // v1
    DeltaWrite.append(kv(20, 21), t): Unit // v2
    val got = DeltaRead.readChanges(spark, t, fromVersion = 1)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 1L), (11L, 1L), (20L, 2L)))
    // full range = full table
    assert(DeltaRead.readChanges(spark, t, 0).count() == 6L)
    // toVersion bounds the range
    assert(DeltaRead.readChanges(spark, t, 1, Some(1L)).count() == 2L)
    // a dataChange remove in range refuses...
    DeltaWrite.overwrite(kv(50, 51), t): Unit // v3: removes + adds
    val e = intercept[IllegalArgumentException] {
      DeltaRead.readChanges(spark, t, 3)
    }
    assert(e.getMessage.contains("REMOVES"), e.getMessage)
    // ...unless ignoreDeletes (emits the overwrite's adds)
    assert(DeltaRead.readChanges(spark, t, 3, ignoreDeletes = true)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(50L))
    // dataChange=false actions (compaction shape) are invisible
    val snap = DeltaRead.snapshot(spark, t)
    val fLine = DeltaFixture
      .addLine(snap.liveFiles.head.path, 1L)
      .replace("\"dataChange\":true", "\"dataChange\":false")
    val rLine = DeltaFixture.removeLine(snap.liveFiles.head.path)
      .replace("\"dataChange\":true", "\"dataChange\":false")
    DeltaFixture.writeCommit(spark, t, 4, Seq(rLine, fLine))
    assert(DeltaRead.readChanges(spark, t, 4).count() == 0L)
    // checkpoint-compacted history refuses (version has no JSON)
    val t2 = freshTable()
    val schema2 = kv(0, 1).schema
    DeltaFixture.plantDataFile(spark, kv(0, 4), t2, "a.parquet"): Unit
    DeltaFixture.writeCheckpoint(spark, t2, 2, schema2,
      adds = Seq("a.parquet" -> Map.empty))
    DeltaWrite.append(kv(10, 11), t2): Unit // v3
    val e2 = intercept[IllegalArgumentException] {
      DeltaRead.readChanges(spark, t2, 2)
    }
    assert(e2.getMessage.contains("no JSON commit"), e2.getMessage)
    assert(DeltaRead.readChanges(spark, t2, 3).count() == 1L)
  }

  test("multi-part checkpoint: all parts union into the base state; " +
    "JSON tail replays on top") {
    val ss = spark
    import ss.implicits._
    val t = freshTable()
    val schema2 = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType)))
    // three one-file adds spread across 2 checkpoint parts at v5
    Seq(("a.parquet", 0), ("b.parquet", 10), ("c.parquet", 20)).foreach {
      case (n, lo) => plantKv(t, n, lo, lo + 2): Unit
    }
    DeltaFixture.writeMultiCheckpoint(spark, t, 5, schema2, nParts = 2,
      adds = Seq("a.parquet" -> Map.empty, "b.parquet" -> Map.empty,
        "c.parquet" -> Map.empty))
    // JSON tail: v6 removes c
    DeltaFixture.writeCommit(spark, t, 6, Seq(
      DeltaFixture.removeLine("c.parquet")))
    val got = DeltaRead.read(spark, t).orderBy("k").collect()
      .map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 1L, 10L, 11L))
    assert(DeltaRead.versions(spark, t) == Seq(5L, 6L))
    // time travel to the checkpoint version sees all three files
    assert(DeltaRead.read(spark, t, asOf = Some(5L)).count() == 6L)
  }
}
