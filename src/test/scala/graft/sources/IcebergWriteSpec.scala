package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.sources.{IcebergFixture => IFx}

class IcebergWriteSpec extends SparkTestBase {

  private def fresh(): String =
    graft.ScratchSpace.dir(spark, "icewspec_")

  private def kv(lo: Int, hi: Int) = {
    val ss = spark
    import ss.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i")).toDF("k", "name")
  }

  test("create + append roundtrip: the reader walks real manifests, " +
    "counts from record_count, time-travels to the first snapshot") {
    val t = fresh()
    assert(IcebergWrite.append(kv(0, 5), t) == 1L)
    assert(IcebergWrite.append(kv(10, 13), t) == 2L)
    val got = IcebergRead.read(spark, t).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq ==
      ((0 until 5) ++ (10 until 13)).map(i => (i.toLong, s"row$i")))
    // metadata-only count and snapshot time travel work on OUR output
    assert(IcebergRead.countRows(spark, t) == 8L)
    assert(IcebergRead.snapshots(spark, t) == Seq(1L, 2L))
    assert(IcebergRead.read(spark, t, Some(1L)).count() == 5L)
    assert(IcebergRead.countRows(spark, t, Some(1L)) == 5L)
    // a third append keeps carrying manifests forward
    assert(IcebergWrite.append(kv(20, 22), t) == 3L)
    assert(IcebergRead.countRows(spark, t) == 10L)
  }

  test("written files carry footer field ids (renamed-read safe)") {
    val t = fresh()
    IcebergWrite.append(kv(0, 3), t): Unit
    // simulate a rename by rewriting metadata with a renamed schema at
    // the same field ids — the data must still resolve
    val renamed = IFx.withFieldIds(StructType(Seq(
      StructField("key_renamed", LongType),
      StructField("name", StringType))), Seq(1, 2))
    val (meta, root, fs) = IcebergRead.loadMetadata(spark, t)
    val snap = meta.get("snapshots").get(0)
    val ml = snap.get("manifest-list").asText()
      .stripPrefix("metadata/")
    IFx.writeMetadata(spark, t, 2, Map(0 -> renamed),
      Seq(IFx.Snap(1L, ml)))
    val got = IcebergRead.read(spark, t).orderBy("key_renamed")
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 1L, 2L))
    assert(root != null && fs != null)
  }

  test("schema mismatch, partitioned tables and v1 tables refuse") {
    val ss = spark
    import ss.implicits._
    val t = fresh()
    IcebergWrite.append(kv(0, 2), t): Unit
    val e1 = intercept[IllegalArgumentException] {
      IcebergWrite.append(Seq((1L, "x", "y")).toDF("k", "name", "z"), t)
    }
    assert(e1.getMessage.contains("schema mismatch"), e1.getMessage)
    // partitioned table (fixture-authored spec with fields)
    val t2 = fresh()
    val schema = IFx.withFieldIds(StructType(Seq(
      StructField("k", LongType),
      StructField("name", StringType))), Seq(1, 2))
    IFx.plantDataFile(spark, kv(0, 2), t2, "data/a.parquet", Seq(1, 2))
    val m = IFx.writeManifest(spark, t2, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 2L)))
    IFx.writeManifestList(spark, t2, "ml1.avro",
      Seq(("m1.avro", m, 0, 1L)))
    IFx.writeMetadata(spark, t2, 1, Map(0 -> schema),
      Seq(IFx.Snap(1L, "ml1.avro")),
      partitionFieldNames = Seq("name"))
    // an append that does not NAME the table's identity partitioning
    // refuses (explicitness rule); non-identity transforms refuse in
    // validateV2 (covered by the readers' transform gate)
    val e2 = intercept[IllegalArgumentException] {
      IcebergWrite.append(kv(5, 6), t2)
    }
    assert(e2.getMessage.contains("identity partition columns"),
      e2.getMessage)
    // v1 table
    val t3 = fresh()
    IFx.plantDataFile(spark, kv(0, 2), t3, "data/a.parquet", Seq(1, 2))
    val m3 = IFx.writeManifest(spark, t3, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 2L)))
    IFx.writeManifestList(spark, t3, "ml1.avro",
      Seq(("m1.avro", m3, 0, 1L)))
    IFx.writeMetadata(spark, t3, 1, Map(0 -> schema),
      Seq(IFx.Snap(1L, "ml1.avro")), formatVersion = 1)
    val e3 = intercept[IllegalArgumentException] {
      IcebergWrite.append(kv(5, 6), t3)
    }
    assert(e3.getMessage.contains("format-version 1"), e3.getMessage)
  }

  test("commit is create-exclusive: a claimed version loses the race " +
    "and retries onto the next one") {
    val t = fresh()
    IcebergWrite.append(kv(0, 2), t): Unit
    // claim v2 out from under the next append (a racer's commit)
    val fs = new Path(t).getFileSystem(
      spark.sessionState.newHadoopConf())
    val racer = IcebergRead.loadMetadata(spark, t)._1.deepCopy()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val out = fs.create(
      new Path(t, "metadata/v2.metadata.json"), false)
    try out.write(racer.toString.getBytes("UTF-8")) finally out.close()
    // the append must land on v3, not clobber v2
    assert(IcebergWrite.append(kv(10, 12), t) == 2L)
    assert(fs.exists(new Path(t, "metadata/v3.metadata.json")))
    assert(IcebergRead.read(spark, t).count() == 4L)
  }

  test("expireSnapshots: expired-only files delete AFTER the commit, " +
    "kept snapshots stay whole, expired ids stop resolving") {
    val t = fresh()
    // fixture shape: snap 1 = {a, b}; snap 2 = {a EXISTING, b DELETED,
    // c ADDED} — expiring snap 1 must delete ONLY b and snap 1's
    // manifest list (m1 and a are still referenced/live via snap 2)
    val schema = IFx.withFieldIds(StructType(Seq(
      StructField("k", LongType),
      StructField("name", StringType))), Seq(1, 2))
    IFx.plantDataFile(spark, kv(0, 4), t, "data/a.parquet", Seq(1, 2))
    IFx.plantDataFile(spark, kv(10, 12), t, "data/b.parquet", Seq(1, 2))
    IFx.plantDataFile(spark, kv(20, 22), t, "data/c.parquet", Seq(1, 2))
    val m1 = IFx.writeManifest(spark, t, "m1.avro", Seq(
      IFx.Entry(1, "data/a.parquet", 4L),
      IFx.Entry(1, "data/b.parquet", 2L)))
    IFx.writeManifestList(spark, t, "ml1.avro",
      Seq(("m1.avro", m1, 0, 1L)))
    val m2 = IFx.writeManifest(spark, t, "m2.avro", Seq(
      IFx.Entry(0, "data/a.parquet", 4L, seq = Some(1L)),
      IFx.Entry(2, "data/b.parquet", 2L)))
    val m3 = IFx.writeManifest(spark, t, "m3.avro", Seq(
      IFx.Entry(1, "data/c.parquet", 2L)))
    IFx.writeManifestList(spark, t, "ml2.avro", Seq(
      ("m2.avro", m2, 0, 1L), ("m3.avro", m3, 0, 2L)))
    IFx.writeMetadata(spark, t, 1, Map(0 -> schema), Seq(
      IFx.Snap(101L, "ml1.avro"), IFx.Snap(202L, "ml2.avro")))
    val rep = IcebergWrite.expireSnapshots(spark, t, keepLast = 1)
    assert(rep.expiredSnapshots == Seq(101L))
    // deleted: b.parquet, ml1.avro AND m1.avro (only ml1 referenced
    // it); a survives — snap 2's own m2 lists it EXISTING
    assert(rep.deletedFiles == 3L, rep.toString)
    val fs = new Path(t).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(!fs.exists(new Path(t, "data/b.parquet")))
    assert(!fs.exists(new Path(t, "metadata/ml1.avro")))
    assert(!fs.exists(new Path(t, "metadata/m1.avro")))
    assert(fs.exists(new Path(t, "data/a.parquet")))
    assert(fs.exists(new Path(t, "metadata/m2.avro")))
    // the kept snapshot reads whole; the expired id stops resolving
    assert(IcebergRead.snapshots(spark, t) == Seq(202L))
    assert(IcebergRead.read(spark, t).orderBy("k")
      .collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 2L, 3L, 20L, 21L))
    val e = intercept[IllegalArgumentException] {
      IcebergRead.read(spark, t, Some(101L))
    }
    assert(e.getMessage.contains("snapshot 101"), e.getMessage)
    // nothing left to expire
    assert(IcebergWrite.expireSnapshots(spark, t, 1)
      .expiredSnapshots.isEmpty)
  }

  test("deleteWhere: position-delete DML — no rewrite, deletes " +
    "accumulate, history intact, counts refuse under MOR") {
    import org.apache.spark.sql.functions.col
    val t = fresh()
    assert(IcebergWrite.append(kv(0, 6), t) == 1L)
    assert(IcebergWrite.append(kv(10, 12), t) == 2L)
    val s3 = IcebergWrite.deleteWhere(spark, t,
      col("k").isin(1L, 3L, 10L))
    assert(s3 == 3L)
    assert(IcebergRead.read(spark, t).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 5L, 11L))
    // pre-delete history still reads whole
    assert(IcebergRead.read(spark, t, Some(2L)).count() == 8L)
    // metadata-only counts refuse under merge-on-read
    intercept[IllegalArgumentException] {
      IcebergRead.countRows(spark, t)
    }
    // deletes ACCUMULATE across snapshots
    assert(IcebergWrite.deleteWhere(spark, t, col("k") === 2L) == 4L)
    assert(IcebergRead.read(spark, t).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 4L, 5L, 11L))
    // appends AFTER a delete: re-inserted rows are NOT masked (the
    // position delete targets the ORIGINAL file only)
    assert(IcebergWrite.append(kv(1, 2), t) == 5L)
    assert(IcebergRead.read(spark, t).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == Seq(0L, 1L, 4L, 5L, 11L))
    // nothing matched -> no new snapshot
    assert(IcebergWrite.deleteWhere(spark, t, col("k") === 999L) == 5L)
    assert(IcebergRead.snapshots(spark, t) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("partitioned append: identity spec in metadata, partition " +
    "values in manifests, files contain the partition column, " +
    "readPruned skips non-matching files") {
    val ss = spark
    import ss.implicits._
    val t = fresh()
    val df = (0 until 12).map(i =>
      (i.toLong, s"row$i", if (i % 3 == 0) "a" else if (i % 3 == 1) "b"
      else "c")).toDF("k", "name", "src")
    assert(IcebergWrite.append(df, t, partitionBy = Seq("src")) == 1L)
    // full read: partition columns live IN the files
    val back = IcebergRead.read(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(back.length == 12 && back.forall { case (k, s) =>
      s == Seq("a", "b", "c")((k % 3).toInt) })
    // manifest entries carry the partition tuple; every file maps to
    // exactly one value
    val snap = IcebergRead.snapshot(spark, t)
    assert(snap.liveFiles.nonEmpty)
    assert(snap.liveFiles.forall(f => f.partition.keySet == Set("src")))
    val bySrc = snap.liveFiles.groupBy(_.partition("src"))
    assert(bySrc.keySet == Set("a", "b", "c"))
    // pruning: only 'a' files scan; rows correct
    val pruned = IcebergRead.readPruned(spark, t, Map("src" -> "a"))
    assert(pruned.orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 3L, 6L, 9L))
    // the prune really skips files (not a post-scan filter): the
    // pruned file set is strictly smaller
    assert(bySrc("a").size < snap.liveFiles.size)
    // second append must name the same partitioning
    intercept[IllegalArgumentException] {
      IcebergWrite.append(df, t)
    }
    assert(IcebergWrite.append(
      Seq((100L, "x", "a")).toDF("k", "name", "src"), t,
      partitionBy = Seq("src")) == 2L)
    assert(IcebergRead.readPruned(spark, t, Map("src" -> "a"))
      .count() == 5L)
    // physical layout: src=a dirs under data/
    val fs = new Path(t).getFileSystem(
      spark.sessionState.newHadoopConf())
    val dirs = fs.listStatus(new Path(t, "data"))
      .map(_.getPath.getName).sorted
    assert(dirs.toSeq == Seq("src=a", "src=b", "src=c"), dirs.toSeq)
    // metadata-only count still works (record_count per file)
    assert(IcebergRead.countRows(spark, t) == 13L)
    // eq-delete upsert refuses on partitioned tables
    intercept[IllegalArgumentException] {
      IcebergWrite.upsert(
        Seq((1L, "x", "a")).toDF("k", "name", "src"), t, Seq("k"))
    }
  }

  test("partitioned DML: position deletes are partition-scoped (one " +
    "partition tuple per delete file), pruned reads apply them, and " +
    "rewrite compacts per partition") {
    import org.apache.spark.sql.functions.col
    val ss = spark
    import ss.implicits._
    val t = fresh()
    val df = (0 until 12).map(i =>
      (i.toLong, s"row$i", if (i % 2 == 0) "a" else "b"))
      .toDF("k", "name", "src")
    assert(IcebergWrite.append(df, t, partitionBy = Seq("src")) == 1L)
    // delete keys across BOTH partitions
    assert(IcebergWrite.deleteWhere(spark, t,
      col("k").isin(0L, 1L, 2L)) == 2L)
    assert(IcebergRead.read(spark, t).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == (3L to 11L))
    // each delete FILE holds one partition tuple, recorded in its
    // manifest entry AND its physical dir
    val snap = IcebergRead.snapshot(spark, t)
    assert(snap.deleteFiles.nonEmpty)
    snap.deleteFiles.foreach { f =>
      assert(f.path.matches("data/src=[ab]/delete-.*\\.parquet"), f.path)
    }
    // pruned reads apply the deletes too
    assert(IcebergRead.readPruned(spark, t, Map("src" -> "a"))
      .orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(4L, 6L, 8L, 10L))
    // rewrite folds the deletes in, per partition
    val rep = IcebergWrite.rewriteDataFiles(spark, t)
    assert(rep.droppedDeleteFiles == snap.deleteFiles.size.toLong &&
      rep.version.nonEmpty, rep.toString)
    val after = IcebergRead.snapshot(spark, t)
    assert(after.deleteFiles.isEmpty)
    assert(after.liveFiles.forall(f => f.partition.keySet == Set("src")))
    assert(IcebergRead.read(spark, t).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == (3L to 11L))
    assert(IcebergRead.readPruned(spark, t, Map("src" -> "b"))
      .orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(3L, 5L, 7L, 9L, 11L))
    assert(IcebergRead.countRows(spark, t) == 9L)
    // pre-delete history still whole
    assert(IcebergRead.read(spark, t, Some(1L)).count() == 12L)
  }

  test("upsert: equality-delete + data manifests in ONE snapshot; " +
    "strict seq rule keeps the batch's own rows; deletes and " +
    "re-inserts work; duplicate keys refuse") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions.col
    val t = fresh()
    assert(IcebergWrite.append(kv(0, 5), t) == 1L)
    // batch 1: update k=1, insert k=10, delete k=3
    val b1 = Seq((1L, "row1_v2", false), (10L, "row10", false),
      (3L, "gone", true)).toDF("k", "name", "__del")
    assert(IcebergWrite.upsert(b1, t, Seq("k"),
      deleteCol = Some("__del")) == 2L)
    assert(IcebergRead.read(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((0L, "row0"), (1L, "row1_v2"), (2L, "row2"), (4L, "row4"),
        (10L, "row10")))
    // batch 2: RE-INSERT the deleted key 3 and update 1 again
    val b2 = Seq((3L, "row3_back", false), (1L, "row1_v3", false))
      .toDF("k", "name", "__del")
    assert(IcebergWrite.upsert(b2, t, Seq("k"),
      deleteCol = Some("__del")) == 3L)
    assert(IcebergRead.read(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((0L, "row0"), (1L, "row1_v3"), (2L, "row2"),
        (3L, "row3_back"), (4L, "row4"), (10L, "row10")))
    // history: pre-upsert snapshots still read whole
    assert(IcebergRead.read(spark, t, Some(1L)).count() == 5L)
    assert(IcebergRead.read(spark, t, Some(2L)).count() == 5L)
    // duplicate keys in one batch refuse
    intercept[IllegalArgumentException] {
      IcebergWrite.upsert(Seq((7L, "a", false), (7L, "b", false))
        .toDF("k", "name", "__del"), t, Seq("k"),
        deleteCol = Some("__del"))
    }
    // null keys refuse
    intercept[IllegalArgumentException] {
      IcebergWrite.upsert(
        Seq((null.asInstanceOf[java.lang.Long], "n"))
          .toDF("k", "name").select(col("k").cast("long"), col("name")),
        t, Seq("k"))
    }
    // the delete files carry the key field id as equality_ids
    val snap = IcebergRead.snapshot(spark, t)
    assert(snap.eqDeleteFiles.nonEmpty &&
      snap.eqDeleteFiles.forall(_.equalityIds == Seq(1)))
  }

  test("rewriteDataFiles: position deletes fold into rewritten " +
    "files, delete files drop, untouched files carry forward, time " +
    "travel intact") {
    import org.apache.spark.sql.functions.col
    val t = fresh()
    assert(IcebergWrite.append(kv(0, 6), t) == 1L)
    assert(IcebergWrite.append(kv(10, 14), t) == 2L)
    // no deletes -> no-op
    assert(IcebergWrite.rewriteDataFiles(spark, t) ==
      IcebergWrite.RewriteReport(0L, 0L, 0L, None))
    IcebergWrite.deleteWhere(spark, t, col("k").isin(1L, 3L)): Unit
    IcebergWrite.deleteWhere(spark, t, col("k") === 11L): Unit
    val before = IcebergRead.read(spark, t).orderBy("k").collect()
      .map(_.getLong(0)).toSeq
    val snapBefore = IcebergRead.snapshot(spark, t)
    assert(snapBefore.deleteFiles.nonEmpty)
    val rep = IcebergWrite.rewriteDataFiles(spark, t)
    assert(rep.rewrittenDataFiles > 0L && rep.droppedDeleteFiles ==
      snapBefore.deleteFiles.size.toLong && rep.version.nonEmpty,
      rep.toString)
    val snapAfter = IcebergRead.snapshot(spark, t)
    // zero delete files; content identical; counts work again
    assert(snapAfter.deleteFiles.isEmpty &&
      snapAfter.eqDeleteFiles.isEmpty)
    assert(IcebergRead.read(spark, t).orderBy("k").collect()
      .map(_.getLong(0)).toSeq == before)
    assert(IcebergRead.countRows(spark, t) == before.size.toLong)
    // old snapshots still time travel (pre-delete state whole)
    assert(IcebergRead.read(spark, t, Some(2L)).count() == 10L)
    // idempotent: nothing left to rewrite
    assert(IcebergWrite.rewriteDataFiles(spark, t).version.isEmpty)
  }

  test("appendEvolve: new columns get fresh field ids, old files " +
    "read NULL, past snapshots keep their schema; drops/retypes " +
    "refuse") {
    val ss = spark
    import ss.implicits._
    val t = fresh()
    assert(IcebergWrite.append(kv(0, 3), t) == 1L)
    val evolved = Seq((10L, "row10", "x"), (11L, "row11", "y"))
      .toDF("k", "name", "extra")
    assert(IcebergWrite.appendEvolve(evolved, t) == 2L)
    val got = IcebergRead.read(spark, t).orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(2))))
    assert(got.toSeq == Seq((0L, None), (1L, None), (2L, None),
      (10L, Some("x")), (11L, Some("y"))))
    // the past snapshot reads under ITS schema (no extra column)
    assert(IcebergRead.read(spark, t, Some(1L)).columns.toSeq ==
      Seq("k", "name"))
    // the new column's field id is FRESH (last-column-id advanced)
    val (meta, _, _) = IcebergRead.loadMetadata(spark, t)
    assert(meta.get("last-column-id").asInt() == 3)
    assert(meta.get("current-schema-id").asInt() == 1)
    // further appends use the evolved schema; old-shape appends refuse
    assert(IcebergWrite.append(
      Seq((20L, "row20", "z")).toDF("k", "name", "extra"), t) == 3L)
    intercept[IllegalArgumentException] {
      IcebergWrite.append(kv(30, 31), t)
    }
    // drops and retypes refuse
    intercept[IllegalArgumentException] {
      IcebergWrite.appendEvolve(Seq((1L, "x")).toDF("k", "extra2"), t)
    }
    intercept[IllegalArgumentException] {
      IcebergWrite.appendEvolve(
        Seq((1, "a", "b")).toDF("k", "name", "extra"), t)
    }
    // no new columns -> plain append
    assert(IcebergWrite.appendEvolve(
      Seq((40L, "row40", "w")).toDF("k", "name", "extra"), t) == 4L)
    assert(IcebergRead.read(spark, t).count() == 7L)
  }

  test("idempotentAppend: snapshot-summary txn guard — replays " +
    "no-op, create path included, expire bounds the memory") {
    val t = fresh()
    // first batch CREATES the table with the txn summary
    assert(IcebergWrite.idempotentAppend(kv(0, 3), t, "app", 0L)
      .contains(1L))
    // exact replay: no-op
    assert(IcebergWrite.idempotentAppend(kv(0, 3), t, "app", 0L).isEmpty)
    // next batch commits; replay of BOTH no-ops
    assert(IcebergWrite.idempotentAppend(kv(3, 5), t, "app", 1L)
      .contains(2L))
    assert(IcebergWrite.idempotentAppend(kv(3, 5), t, "app", 1L).isEmpty)
    assert(IcebergWrite.idempotentAppend(kv(0, 3), t, "app", 0L).isEmpty)
    assert(IcebergRead.read(spark, t).count() == 5L)
    // a DIFFERENT app id is independent
    assert(IcebergWrite.idempotentAppend(kv(10, 11), t, "other", 0L)
      .contains(3L))
    assert(IcebergWrite.lastTxnVersion(spark, t, "app") == 1L)
    assert(IcebergWrite.lastTxnVersion(spark, t, "other") == 0L)
    assert(IcebergWrite.lastTxnVersion(spark, t, "nope") == -1L)
    // ordinary appends carry no txn and never collide
    assert(IcebergWrite.append(kv(20, 21), t) == 4L)
    assert(IcebergWrite.lastTxnVersion(spark, t, "app") == 1L)
    // expire bounds the idempotence memory (documented contract):
    // keeping only the newest snapshot forgets app's txn history
    IcebergWrite.expireSnapshots(spark, t, keepLast = 1): Unit
    assert(IcebergWrite.lastTxnVersion(spark, t, "app") == -1L)
  }

  test("readIncremental: snapshot-range file-diff attribution; " +
    "rewrites and deletes refuse; empty and bounded ranges") {
    import org.apache.spark.sql.functions.col
    val t = fresh()
    assert(IcebergWrite.append(kv(0, 3), t) == 1L)
    assert(IcebergWrite.append(kv(3, 5), t) == 2L)
    assert(IcebergWrite.append(kv(5, 9), t) == 3L)
    val inc = IcebergRead.readIncremental(spark, t, 1L)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("__snapshot_id")))
    assert(inc.toSeq == Seq((3L, 2L), (4L, 2L), (5L, 3L), (6L, 3L),
      (7L, 3L), (8L, 3L)))
    // bounded + empty ranges
    assert(IcebergRead.readIncremental(spark, t, 1L, Some(2L))
      .count() == 2L)
    assert(IcebergRead.readIncremental(spark, t, 3L).isEmpty)
    // unknown / inverted ids refuse
    intercept[IllegalArgumentException] {
      IcebergRead.readIncremental(spark, t, 99L)
    }
    intercept[IllegalArgumentException] {
      IcebergRead.readIncremental(spark, t, 3L, Some(1L))
    }
    // a delete-introducing snapshot refuses
    IcebergWrite.deleteWhere(spark, t, col("k") === 3L): Unit
    intercept[IllegalArgumentException] {
      IcebergRead.readIncremental(spark, t, 2L)
    }
    // ...but a range STOPPING before it still reads
    assert(IcebergRead.readIncremental(spark, t, 1L, Some(3L))
      .count() == 6L)
    // a rewrite (drops live files) refuses too
    val t2 = fresh()
    assert(IcebergWrite.append(kv(0, 4), t2) == 1L)
    IcebergWrite.deleteWhere(spark, t2, col("k") === 0L): Unit
    IcebergWrite.rewriteDataFiles(spark, t2): Unit
    intercept[IllegalArgumentException] {
      IcebergRead.readIncremental(spark, t2, 1L)
    }
  }

  test("readIncremental walks COMMIT order (sequence numbers), " +
    "never id order — external tables use arbitrary snapshot ids") {
    val t = fresh()
    val schema = IFx.withFieldIds(StructType(Seq(
      StructField("k", LongType),
      StructField("name", StringType))), Seq(1, 2))
    // snapshot ids DESCEND while commit order ascends: id 900 first,
    // id 5 second
    IFx.plantDataFile(spark, kv(0, 2), t, "data/a.parquet", Seq(1, 2))
    IFx.plantDataFile(spark, kv(2, 5), t, "data/b.parquet", Seq(1, 2))
    val m1 = IFx.writeManifest(spark, t, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 2L)))
    val m2 = IFx.writeManifest(spark, t, "m2.avro",
      Seq(IFx.Entry(0, "data/a.parquet", 2L, seq = Some(1L)),
        IFx.Entry(1, "data/b.parquet", 3L)))
    IFx.writeManifestList(spark, t, "ml1.avro",
      Seq(("m1.avro", m1, 0, 1L)))
    IFx.writeManifestList(spark, t, "ml2.avro",
      Seq(("m1.avro", m1, 0, 1L), ("m2.avro", m2, 0, 2L)))
    IFx.writeMetadata(spark, t, 1, Map(0 -> schema),
      Seq(IFx.Snap(900L, "ml1.avro"), IFx.Snap(5L, "ml2.avro")))
    assert(IcebergRead.snapshotsInCommitOrder(spark, t) ==
      Seq(900L, 5L))
    // incremental after the FIRST commit (id 900) yields the SECOND
    // commit's (id 5) additions — id order would invert this
    val inc = IcebergRead.readIncremental(spark, t, 900L)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("__snapshot_id")))
    assert(inc.toSeq == Seq((2L, 5L), (3L, 5L), (4L, 5L)),
      inc.mkString(";"))
    assert(IcebergRead.readIncremental(spark, t, 5L).isEmpty)
  }

  test("position-delete files carry the spec's RESERVED footer field " +
    "ids and manifests record REAL file sizes") {
    import org.apache.spark.sql.functions.col
    val t = fresh()
    IcebergWrite.append(kv(0, 6), t): Unit
    IcebergWrite.deleteWhere(spark, t, col("k").isin(1L, 3L)): Unit
    val (meta, root, fs) = IcebergRead.loadMetadata(spark, t)
    val conf = spark.sessionState.newHadoopConf()
    // find the delete manifest (content=1) in the current snapshot
    val snaps = meta.get("snapshots")
    val cur = (0 until snaps.size()).map(snaps.get(_))
      .find(_.get("snapshot-id").asLong() ==
        meta.get("current-snapshot-id").asLong()).get
    val mlPath = new Path(root, cur.get("manifest-list").asText())
    val delManifests = IcebergRead.readAvro(fs, conf, mlPath, t)
      .filter(r => r.get("content").asInstanceOf[Number].intValue() == 1)
    assert(delManifests.nonEmpty)
    val delEntries = delManifests.flatMap(m =>
      IcebergRead.readAvro(fs, conf,
        new Path(root, m.get("manifest_path").toString), t))
    assert(delEntries.nonEmpty)
    delEntries.foreach { e =>
      val df = e.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      val rel = df.get("file_path").toString
      val declared = df.get("file_size_in_bytes")
        .asInstanceOf[Number].longValue()
      val actual = fs.getFileStatus(new Path(root, rel)).getLen
      assert(declared == actual && declared > 1L,
        s"delete entry $rel declares $declared bytes, actual $actual")
      // footer resolution by the RESERVED ids: request renamed
      // columns tagged with the spec ids — values must still resolve
      val want = IFx.withFieldIds(StructType(Seq(
        StructField("renamed_path", StringType),
        StructField("renamed_pos", LongType))),
        Seq(IcebergWrite.PosDeleteFilePathId, IcebergWrite.PosDeletePosId))
      FieldIds.ensureReadEnabled(spark)
      val rows = spark.read.schema(want)
        .parquet(new Path(root, rel).toString)
        .orderBy("renamed_pos").collect()
      assert(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
        "reserved-id resolution failed — footer ids missing")
      assert(rows.length == 2 &&
        rows.forall(_.getString(0).contains("data/")),
        rows.mkString(";"))
    }
  }

  test("expireSnapshots refuses to drop the CURRENT snapshot") {
    val t = fresh()
    val schema = IFx.withFieldIds(StructType(Seq(
      StructField("k", LongType),
      StructField("name", StringType))), Seq(1, 2))
    IFx.plantDataFile(spark, kv(0, 2), t, "data/a.parquet", Seq(1, 2))
    IFx.plantDataFile(spark, kv(5, 6), t, "data/b.parquet", Seq(1, 2))
    val m1 = IFx.writeManifest(spark, t, "m1.avro",
      Seq(IFx.Entry(1, "data/a.parquet", 2L)))
    IFx.writeManifestList(spark, t, "ml1.avro",
      Seq(("m1.avro", m1, 0, 1L)))
    val m2 = IFx.writeManifest(spark, t, "m2.avro",
      Seq(IFx.Entry(1, "data/b.parquet", 1L)))
    IFx.writeManifestList(spark, t, "ml2.avro",
      Seq(("m2.avro", m2, 0, 2L)))
    // CURRENT pinned to the OLDER snapshot
    IFx.writeMetadata(spark, t, 1, Map(0 -> schema), Seq(
      IFx.Snap(101L, "ml1.avro"), IFx.Snap(202L, "ml2.avro")),
      currentSnapshot = Some(101L))
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.expireSnapshots(spark, t, 1)
    }
    assert(e.getMessage.contains("CURRENT"), e.getMessage)
  }

  test("zero-row appends commit no data files but advance the " +
    "snapshot; hint never rolls backward") {
    val t = fresh()
    IcebergWrite.append(kv(0, 3), t): Unit
    assert(IcebergWrite.append(kv(0, 0), t) == 2L)
    assert(IcebergRead.countRows(spark, t) == 3L)
    assert(IcebergRead.snapshots(spark, t) == Seq(1L, 2L))
    // hint forward-only: plant a stale hint, next append overwrites
    graft.ScratchSpace.writeBytes(spark, t,
      "metadata/version-hint.text", "1".getBytes("UTF-8"))
    IcebergWrite.append(kv(5, 6), t): Unit
    val fs = new Path(t).getFileSystem(
      spark.sessionState.newHadoopConf())
    val in = fs.open(new Path(t, "metadata/version-hint.text"))
    val hint = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.trim finally in.close()
    assert(hint == "3")
  }
}
