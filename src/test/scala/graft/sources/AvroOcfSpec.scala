package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.types._

import graft.SparkTestBase

class AvroOcfSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("plain + deflate objects read; values roundtrip exactly") {
    val t = graft.ScratchSpace.dir(spark, "avrospec_")
    AvroOcfFixture.write(spark, t, "a.avro", schema, Seq(
      Seq(1L, "alpha", "en"),
      Seq(2L, "quote \" tab\t newline\n", "de")))
    AvroOcfFixture.write(spark, t, "b.avro", schema, Seq(
      Seq(3L, "deflated", "fr")), deflate = true)
    val (good, bad) = AvroOcf.split(AvroOcf.readDir(spark, t, schema))
    assert(bad.count() == 0)
    val got = good.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, "alpha", "en"),
      (2L, "quote \" tab\t newline\n", "de"),
      (3L, "deflated", "fr")))
  }

  test("missing fields and null values fill nulls; extra writer " +
    "fields are ignored; wrong-type values null out") {
    val t = graft.ScratchSpace.dir(spark, "avrospec2_")
    // writer schema: id long, lang INT (type mismatch vs caller's
    // string), extra column, no text at all
    val writerSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("lang", IntegerType),
      StructField("extra", StringType)))
    AvroOcfFixture.write(spark, t, "w.avro", writerSchema, Seq(
      Seq(5L, 42, "ignored"),
      Seq(null, null, null)))
    val rows = AvroOcf.readDir(spark, t, schema)
      .orderBy(org.apache.spark.sql.functions.col("id").asc_nulls_last)
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 5L && rows(0).isNullAt(1) &&
      rows(0).isNullAt(2)) // text absent, lang int -> null
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("numeric widening: int writer values land in long/double " +
    "columns") {
    val t = graft.ScratchSpace.dir(spark, "avrospec3_")
    val writer = StructType(Seq(
      StructField("id", IntegerType), StructField("x", IntegerType)))
    val target = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType)))
    AvroOcfFixture.write(spark, t, "n.avro", writer, Seq(Seq(7, 9)))
    val r = AvroOcf.readDir(spark, t, target).collect().head
    assert(r.getLong(0) == 7L && r.getDouble(1) == 9.0)
  }

  test("narrowing reads NULL instead of wrapping/truncating: " +
    "Avro long into int target, double into float target") {
    val t = graft.ScratchSpace.dir(spark, "avrospec3n_")
    val writer = StructType(Seq(
      StructField("id", LongType), StructField("x", DoubleType)))
    val target = StructType(Seq(
      StructField("id", IntegerType), StructField("x", FloatType)))
    // id wraps to a NEGATIVE int under Number.intValue; x truncates
    // under floatValue — both must null per the coercion contract
    AvroOcfFixture.write(spark, t, "w.avro", writer,
      Seq(Seq[Any](Int.MaxValue.toLong + 7L, 1.0e300)))
    val r = AvroOcf.readDir(spark, t, target).collect().head
    assert(r.isNullAt(0), "long->int must null, not wrap")
    assert(r.isNullAt(1), "double->float must null, not truncate")
  }

  test("container damage: salvaged prefix + ONE quarantine marker " +
    "row; a truncated header quarantines alone") {
    val t = graft.ScratchSpace.dir(spark, "avrospec4_")
    AvroOcfFixture.write(spark, t, "d.avro", schema, Seq(
      Seq(1L, "keep-one", "en"),
      Seq(2L, "keep-two", "en")))
    // corrupt: truncate inside the (single) data block
    val p = new org.apache.hadoop.fs.Path(t, "d.avro")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val len = fs.getFileStatus(p).getLen
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0L, bytes) finally in.close()
    val out = fs.create(p, true)
    try out.write(bytes, 0, len.toInt - 8) finally out.close()
    val (good, bad) = AvroOcf.split(AvroOcf.readDir(spark, t, schema))
    // one block: the truncation kills the whole block -> 0 salvaged
    // records but exactly one loud marker
    assert(good.count() + bad.count() >= 1)
    val markers = bad.collect().map(_.getString(0))
    assert(markers.length == 1 && markers(0).contains("avro-damage"),
      markers.mkString(";"))
    // header-truncated file: marker only
    val t2 = graft.ScratchSpace.dir(spark, "avrospec5_")
    graft.ScratchSpace.writeBytes(spark, t2, "h.avro",
      "Objgarbage".getBytes(UTF_8))
    val (g2, b2) = AvroOcf.split(AvroOcf.readDir(spark, t2, schema))
    assert(g2.count() == 0)
    assert(b2.collect().map(_.getString(0))
      .count(_.contains("avro-damage")) == 1)
  }

  test("multi-block file salvages complete blocks before the damage") {
    val t = graft.ScratchSpace.dir(spark, "avrospec6_")
    // force multiple blocks via many records (default block ~64KB —
    // use sync interval through many small writes; the reference
    // writer flushes a block per ~syncInterval bytes)
    val rows = (0 until 5000).map(i =>
      Seq(i.toLong, "x" * 50, "en"))
    AvroOcfFixture.write(spark, t, "m.avro", schema, rows)
    val p = new org.apache.hadoop.fs.Path(t, "m.avro")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val len = fs.getFileStatus(p).getLen
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0L, bytes) finally in.close()
    val out = fs.create(p, true)
    try out.write(bytes, 0, len.toInt - 100) finally out.close()
    val (good, bad) = AvroOcf.split(AvroOcf.readDir(spark, t, schema))
    val n = good.count()
    assert(n > 0 && n < 5000, s"salvaged $n")
    assert(bad.count() == 1)
    // the salvage is a PREFIX: ids 0..n-1
    assert(good.agg(org.apache.spark.sql.functions.max("id"))
      .collect().head.getLong(0) == n - 1)
  }

  test("streaming twin drains the same rows per micro-batch") {
    val t = graft.ScratchSpace.dir(spark, "avrostream_")
    AvroOcfFixture.write(spark, t, "s.avro", schema, Seq(
      Seq(11L, "s-one", "en"), Seq(12L, "s-two", "en")))
    val outDir = graft.ScratchSpace.dir(spark, "avrostream_out_")
    val q = AvroOcf.readStreamDir(spark, t, schema)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation",
        graft.ScratchSpace.dir(spark, "avrostream_ck_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.read
      .schema(schema.add(AvroOcf.Corrupt, StringType))
      .parquet(outDir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((11L, "s-one"), (12L, "s-two")))
  }

  test("reserved corrupt column and unsupported target types refuse") {
    intercept[IllegalArgumentException] {
      AvroOcf.readDir(spark, "/nonexistent",
        schema.add("_corrupt", StringType))
    }
    intercept[IllegalArgumentException] {
      AvroOcf.readDir(spark, "/nonexistent", StructType(Seq(
        StructField("m", MapType(StringType, StringType)))))
    }
  }
}
