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
    // reader version 2 (column mapping era)
    expectRefusal(Seq(0L -> Seq(
      DeltaFixture.protocolLine(minReader = 2), meta,
      DeltaFixture.addLine("a.parquet", 1))), "reader version 2")
    // readerFeatures present
    expectRefusal(Seq(0L -> Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"]}}""", meta,
      DeltaFixture.addLine("a.parquet", 1))), "deletionVectors")
    // deletion vector on an add
    expectRefusal(Seq(0L -> Seq(
      DeltaFixture.protocolLine(), meta,
      DeltaFixture.addLine("a.parquet", 1,
        withDeletionVector = true))), "deletion vector")
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
}
