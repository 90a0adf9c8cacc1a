package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Scheme-independence proof (VERDICT r10 item 9): the catalog and IO
  * surface runs unmodified against `s3a://bucket/key` URIs — a mock
  * object-store FileSystem registered via `fs.s3a.impl`, the same
  * extension point a real S3A connector uses. Path semantics, glob
  * selection, write/read roundtrips, move/remove, and dynamic-
  * partition overwrite are exercised end-to-end on the s3a scheme.
  */
class S3aSchemeSpec extends SparkTestBase {

  private def withMockS3a[T](f: String => T): T = {
    val root = Files.createTempDirectory("mock_s3a_").toString
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[MockS3aFileSystem].getName)
    hc.set("fs.s3a.mock.dir", root)
    // a fresh scheme binding per test: drop any cached s3a instance
    org.apache.hadoop.fs.FileSystem.closeAll()
    new java.io.File(s"$root/bkt").mkdirs()
    f("s3a://bkt")
  }

  test("catalog list/select work on s3a:// URIs with s3a-schemed results") {
    withMockS3a { base =>
      val hc = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(hc)
      for (n <- Seq("a.csv", "b.csv", "c.json")) {
        val out = fs.create(new org.apache.hadoop.fs.Path(s"$base/data/$n"))
        out.write("x,y\n1,2\n".getBytes("UTF-8")); out.close()
      }
      val catalog = new DatasetCatalog(spark)
      val all = catalog.list(s"$base/data").toSeq.sortBy(_.name)
      assert(all.map(_.name) == Seq("a.csv", "b.csv", "c.json"))
      // returned refs carry the OBJECT-STORE path, not a local leak
      assert(all.forall(_.path.startsWith("s3a://bkt/")))
      val sel = catalog.select(s"$base/data", "*.csv", MatchMode.Glob)
      assert(sel.map(_.name) == Seq("a.csv", "b.csv"))
    }
  }

  test("IO write/read/move/remove roundtrip on s3a:// URIs") {
    withMockS3a { base =>
      val io = new DatasetIO(spark)
      val nation = spark.read.parquet(s"$sf001/nation.parquet")
      io.write(nation, s"$base/lake/nation.parquet")
      val back = io.read(s"$base/lake/nation.parquet")
      assert(back.count() == nation.count())
      assert(back.agg(sum("n_nationkey")).head.getLong(0) ==
        nation.agg(sum("n_nationkey")).head.getLong(0))
      io.move(s"$base/lake", "nation.parquet", MatchMode.Exact,
        s"$base/lake", destName = Some("nation_v2.parquet"))
      val moved = io.read(s"$base/lake/nation_v2.parquet")
      assert(moved.count() == nation.count())
      val catalog = new DatasetCatalog(spark)
      assert(catalog.list(s"$base/lake").toSeq.map(_.name) ==
        Seq("nation_v2.parquet"))
      io.remove(s"$base/lake", "nation_v2.parquet", MatchMode.Exact)
      assert(catalog.list(s"$base/lake").toSeq.isEmpty)
    }
  }

  test("lake commits REFUSE s3a:// roots without the single-writer " +
    "acknowledgement — the typed commit-safety statement") {
    withMockS3a { base =>
      val ss = spark
      import ss.implicits._
      spark.conf.unset(LakeCommit.SingleWriterAckKey)
      val df = Seq((1L, "a")).toDF("k", "name")
      val eD = intercept[UnsafeCommitStoreException] {
        DeltaWrite.append(df, s"$base/lake/refuse_delta")
      }
      assert(eD.getMessage.contains("create-exclusive") &&
        eD.getMessage.contains(LakeCommit.SingleWriterAckKey),
        eD.getMessage)
      val eI = intercept[UnsafeCommitStoreException] {
        IcebergWrite.append(df, s"$base/lake/refuse_ice")
      }
      assert(eI.getMessage.contains(LakeCommit.SingleWriterAckKey))
      // nothing landed
      val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(
        s"$base/lake/refuse_delta/_delta_log")))
    }
  }

  test("Delta write lifecycle end-to-end on s3a:// URIs: append, " +
    "idempotent txn, merge, checkpoint + cleanup, vacuum, read back") {
    withMockS3a { base =>
      val ss = spark
      import ss.implicits._
      // single-writer acknowledgement: the documented S3 deployment
      // contract under which create-exclusive commits are race-free
      spark.conf.set(LakeCommit.SingleWriterAckKey, "true")
      try testDeltaLifecycle(base)
      finally spark.conf.unset(LakeCommit.SingleWriterAckKey)
    }
  }

  private def testDeltaLifecycle(base: String): Unit = {
      val ss = spark
      import ss.implicits._
      val t = s"$base/lake/delta_tbl"
      def kv(lo: Int, hi: Int) =
        (lo until hi).map(i => (i.toLong, s"row$i")).toDF("k", "name")
      assert(DeltaWrite.append(kv(0, 5), t) == 0L)
      assert(DeltaWrite.idempotentAppend(kv(5, 8), t, "app", 0L)
        .contains(1L))
      assert(DeltaWrite.idempotentAppend(kv(5, 8), t, "app", 0L).isEmpty)
      DeltaWrite.merge(
        Seq((2L, "UPD", false), (100L, "NEW", false), (4L, "x", true))
          .toDF("k", "name", "del"),
        t, Seq("k"), deleteCol = Some("del")): Unit
      assert(DeltaWrite.checkpoint(spark, t) == 2L)
      assert(DeltaWrite.cleanupLog(spark, t) == 3)
      DeltaWrite.vacuum(spark, t, retainMs = 0): Unit
      val got = DeltaRead.read(spark, t).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq(0L -> "row0", 1L -> "row1", 2L -> "UPD",
        3L -> "row3", 5L -> "row5", 6L -> "row6", 7L -> "row7",
        100L -> "NEW"))
      assert(DeltaRead.countRows(spark, t) == 8L)
      // txn idempotence survives checkpoint+cleanup on the s3a scheme
      assert(DeltaWrite.idempotentAppend(kv(5, 8), t, "app", 0L).isEmpty)
      // every path the log references stays on the object-store scheme
      DeltaRead.snapshot(spark, t).liveFiles.foreach(f =>
        assert(!f.path.startsWith("file:"), f.path))
  }

  test("dynamic-partition overwrite honors partition grain on s3a://") {
    withMockS3a { base =>
      val io = new DatasetIO(spark)
      val nation = spark.read.parquet(s"$sf001/nation.parquet")
      io.write(nation, s"$base/lake/nation_part",
        partitionBy = Seq("n_regionkey"))
      io.overwritePartitions(
        nation.where(col("n_regionkey") === 0)
          .withColumn("n_name", lower(col("n_name"))),
        s"$base/lake/nation_part", partitionBy = Seq("n_regionkey"))
      val back = io.read(s"$base/lake/nation_part")
      assert(back.count() == nation.count())
      // only region 0 names were rewritten (TPC-H names are uppercase)
      val lower0 = back.where(col("n_regionkey") === 0)
        .select("n_name").collect().map(_.getString(0))
      assert(lower0.nonEmpty && lower0.forall(n => n == n.toLowerCase))
      val others = back.where(col("n_regionkey") =!= 0)
        .select("n_name").collect().map(_.getString(0))
      assert(others.nonEmpty && others.forall(n => n == n.toUpperCase))
    }
  }
}
