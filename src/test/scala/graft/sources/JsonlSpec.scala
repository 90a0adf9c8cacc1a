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
}
