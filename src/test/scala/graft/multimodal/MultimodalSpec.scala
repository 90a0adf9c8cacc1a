package graft.multimodal

import java.security.MessageDigest

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  test("readBinaryDir ingests raw files with derived id and mime") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files.createTempDirectory("media").toFile
    try {
      java.nio.file.Files.write(
        new java.io.File(dir, "img_0042.png").toPath,
        Array[Byte](0x89.toByte, 'P', 'N', 'G'))
      java.nio.file.Files.write(
        new java.io.File(dir, "clip_7.wav").toPath,
        "RIFFdata".getBytes("UTF-8"))
      val rows = Multimodal.readBinaryDir(spark, dir.getAbsolutePath)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Array[Byte]](1).length, r.getString(2))).toMap
      assert(rows(42L) == (4, "image/png"))
      assert(rows(7L) == (8, "audio/wav"))

      // the ingested records feed the same feature pass
      val feats = Multimodal.extractFeatures(
        Multimodal.readBinaryDir(spark, dir.getAbsolutePath)
          .as[MediaRecord])
        .collect().map(f => f.doc_id -> f.header_hex).toMap
      assert(feats(42L) == "89504E47") // PNG magic
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete()
    }
  }

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
