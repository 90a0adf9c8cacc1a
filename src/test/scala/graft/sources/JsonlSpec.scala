package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class JsonlSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def plant(lines: Seq[String]): String = {
    val t = graft.ScratchSpace.dir(spark, "jsonlspec_")
    graft.ScratchSpace.writeBytes(spark, t, "a.jsonl",
      lines.mkString("\n").getBytes(UTF_8))
    t
  }

  test("good lines parse; corrupt lines quarantine with the RAW line") {
    val t = plant(Seq(
      """{"id":1,"text":"alpha","lang":"en"}""",
      """not json at all {{{""",
      """{"id":2,"text":"beta","lang":"de"}""",
      """{"id":3,"text":"truncated"""" // unterminated
    ))
    val df = Jsonl.readDir(spark, t, schema)
    val (good, bad) = Jsonl.split(df)
    assert(good.count() == 2)
    assert(good.columns.toSeq == Seq("id", "text", "lang"))
    val rows = good.orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "alpha")
    val quarantined = bad.collect().map(_.getString(0)).sorted
    assert(quarantined.length == 2)
    assert(quarantined.contains("not json at all {{{"))
  }

  test("missing fields fill nulls without quarantining") {
    val t = plant(Seq("""{"id":7,"text":"no lang"}"""))
    val (good, bad) = Jsonl.split(Jsonl.readDir(spark, t, schema))
    assert(bad.count() == 0)
    val r = good.collect().head
    assert(r.getLong(0) == 7L && r.isNullAt(2))
  }

  test("non-object scalar lines quarantine") {
    val t = plant(Seq("42", """"just a string"""",
      """{"id":1,"text":"x","lang":"y"}"""))
    val (good, bad) = Jsonl.split(Jsonl.readDir(spark, t, schema))
    assert(good.count() == 1)
    assert(bad.count() == 2)
  }

  test("write/read gzip roundtrip preserves every value exactly") {
    val ss = spark
    import ss.implicits._
    // text with JSON-hostile content: quotes, backslashes, newlines
    // stay line-safe because to_json escapes them
    val src = Seq(
      (1L, "plain", "en"),
      (2L, "quote \" backslash \\ tab\t", "de"),
      (3L, "newline\ninside", "fr"),
      (4L, null.asInstanceOf[String], "xx"))
      .toDF("id", "text", "lang")
    val t = graft.ScratchSpace.dir(spark, "jsonlspec_rt_")
    Jsonl.write(src, t, gzip = true)
    // the text datasource wrote .txt.gz part files
    val back = Jsonl.readDir(spark, t, schema, glob = "part-*")
    val (good, bad) = Jsonl.split(back)
    assert(bad.count() == 0)
    val got = good.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, "plain", "en"),
      (2L, "quote \" backslash \\ tab\t", "de"),
      (3L, "newline\ninside", "fr"),
      (4L, null, "xx")))
  }

  test("reserved corrupt column name is refused in caller schemas") {
    val badSchema = schema.add("_corrupt", StringType)
    intercept[IllegalArgumentException] {
      Jsonl.readDir(spark, "/nonexistent", badSchema)
    }
  }

  test("per-file parallelism: input_file_name distinguishes objects") {
    val t = graft.ScratchSpace.dir(spark, "jsonlspec_files_")
    graft.ScratchSpace.writeBytes(spark, t, "f1.jsonl",
      """{"id":1,"text":"a","lang":"en"}""".getBytes(UTF_8))
    graft.ScratchSpace.writeBytes(spark, t, "f2.jsonl",
      """{"id":2,"text":"b","lang":"en"}""".getBytes(UTF_8))
    val df = Jsonl.readDir(spark, t, schema)
      .withColumn("f", regexp_extract(input_file_name(), "f(\\d+)\\.jsonl", 1))
    val got = df.select("id", "f").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "1"), (2L, "2")))
  }

  private def zst(lines: Seq[String]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(
      (lines.mkString("\n") + "\n").getBytes(UTF_8))

  test("zstd objects read through the same parse; a MIXED dir of " +
    "plain + gzip + zstd unions cleanly") {
    val t = graft.ScratchSpace.dir(spark, "jsonlzst_")
    graft.ScratchSpace.writeBytes(spark, t, "a.jsonl",
      """{"id":1,"text":"plain","lang":"en"}""".getBytes(UTF_8))
    val gz = new java.io.ByteArrayOutputStream()
    val go = new java.util.zip.GZIPOutputStream(gz)
    go.write("""{"id":2,"text":"gzipped","lang":"de"}""".getBytes(UTF_8))
    go.close()
    graft.ScratchSpace.writeBytes(spark, t, "b.jsonl.gz", gz.toByteArray)
    graft.ScratchSpace.writeBytes(spark, t, "c.jsonl.zst", zst(Seq(
      """{"id":3,"text":"zstd","lang":"fr"}""",
      """broken line""",
      """{"id":4,"text":"more","lang":"fr"}""")))
    val (good, bad) = Jsonl.split(Jsonl.readDir(spark, t, schema))
    val got = good.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "plain"), (2L, "gzipped"),
      (3L, "zstd"), (4L, "more")))
    // the zst file's bad line quarantines like any other
    assert(bad.collect().map(_.getString(0)).toSeq == Seq("broken line"))
  }

  test("multi-frame zstd decodes end-to-end; container damage " +
    "salvages the prefix and quarantines a marker line") {
    val t = graft.ScratchSpace.dir(spark, "jsonlzst2_")
    // two independent frames concatenated — the Dolma shard layout
    val twoFrames = zst(Seq("""{"id":1,"text":"f1","lang":"en"}""")) ++
      zst(Seq("""{"id":2,"text":"f2","lang":"en"}"""))
    graft.ScratchSpace.writeBytes(spark, t, "m.jsonl.zst", twoFrames)
    val (good, _) = Jsonl.split(Jsonl.readDir(spark, t, schema))
    assert(good.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L))
    // damaged tail: a ~100 KB valid frame + garbage that still sniffs
    // as zstd. Prefix-salvage is WINDOW-bounded (FileStreams caps the
    // decode window at 8 KB): every line outside the final window
    // survives, the marker line quarantines.
    val t2 = graft.ScratchSpace.dir(spark, "jsonlzst3_")
    val pad = "x" * 1000
    val lines = (1 to 100).map(i =>
      s"""{"id":$i,"text":"$pad","lang":"en"}""")
    val damaged = zst(lines) ++
      Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte, 9, 9, 9, 9)
    graft.ScratchSpace.writeBytes(spark, t2, "d.jsonl.zst", damaged)
    val (good2, bad2) = Jsonl.split(Jsonl.readDir(spark, t2, schema))
    val ids = good2.collect().map(_.getLong(0)).sorted
    // loss bound: 8 KB window + one partial line ≈ 9 lines of ~1 KB
    assert(ids.length >= 85, s"salvaged only ${ids.length} lines")
    assert(ids.take(ids.length).sameElements(1L to ids.length.toLong),
      "salvage must be a PREFIX — no holes")
    val markers = bad2.collect().map(_.getString(0))
      .filter(_.contains("zstd-damage"))
    assert(markers.length == 1, markers.mkString("; "))
  }

  test("zstd streaming twin: a .zst glob reads per micro-batch " +
    "through the same parse") {
    val t = graft.ScratchSpace.dir(spark, "jsonlzststream_")
    graft.ScratchSpace.writeBytes(spark, t, "s1.jsonl.zst", zst(Seq(
      """{"id":11,"text":"s-one","lang":"en"}""",
      """{"id":12,"text":"s-two","lang":"en"}""")))
    val out = graft.ScratchSpace.dir(spark, "jsonlzststream_out_")
    val q = Jsonl.readStreamDir(spark, t, schema, glob = "*.zst")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation",
        graft.ScratchSpace.dir(spark, "jsonlzststream_ck_"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.read.schema(schema.add("_corrupt", StringType))
      .parquet(out).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((11L, "s-one"), (12L, "s-two")))
  }
}
