package graft.multimodal

import java.security.MessageDigest

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("packText + extractFeatures: deterministic byte-level features") {
    val ss = spark
    import ss.implicits._
    val df = spark.createDataFrame(Seq(
      (7L, "hello"), (8L, "héllo"))).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(
      Multimodal.packText(df, "doc_id", "text").as[MediaRecord])
      .collect().map(f => f.doc_id -> f).toMap

    val h = feats(7L)
    assert(h.byte_len == 5L)
    assert(h.header_hex == "68656C6C") // 'hell'
    val sha = MessageDigest.getInstance("SHA-256")
      .digest("hello".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(h.content_sha == sha)
    // stubbed decode: no dimensions
    assert(h.width.isEmpty && h.height.isEmpty)

    // multi-byte utf-8 counted as bytes, not chars
    assert(feats(8L).byte_len == 6L)
  }

  test("binary column survives a parquet roundtrip (schema plumbing)") {
    val ss = spark
    import ss.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mm_").toString
    val df = spark.createDataFrame(Seq((1L, "payload"))).toDF("doc_id", "text")
    Multimodal.packText(df, "doc_id", "text")
      .write.mode("overwrite").parquet(s"file:$tmp/media.parquet")
    val back = spark.read.parquet(s"file:$tmp/media.parquet")
    assert(back.schema("media").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(back.as[MediaRecord]).head()
    assert(feats.byte_len == 7L)
  }
}
