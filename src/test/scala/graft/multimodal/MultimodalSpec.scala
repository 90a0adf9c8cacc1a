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
      // legacy digit-id scheme, opted into explicitly
      val rows = Multimodal.readBinaryDir(
        spark, dir.getAbsolutePath, idFromPath = Multimodal.digitId)
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Array[Byte]](1).length, r.getString(2))).toMap
      assert(rows(42L) == (4, "image/png"))
      assert(rows(7L) == (8, "audio/wav"))

      // the ingested records feed the same feature pass
      val feats = Multimodal.extractFeatures(
        Multimodal.readBinaryDir(
          spark, dir.getAbsolutePath, idFromPath = Multimodal.digitId)
          .as[MediaRecord])
        .collect().map(f => f.doc_id -> f.header_hex).toMap
      assert(feats(42L) == "89504E47") // PNG magic
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete()
    }
  }

  test("readBinaryDir default ids are path hashes: same digits never collide") {
    val dir = java.nio.file.Files.createTempDirectory("media_ids").toFile
    try {
      // identical trailing digits — the digit scheme would collide on 1
      java.nio.file.Files.write(
        new java.io.File(dir, "a1.png").toPath, Array[Byte](1, 2))
      java.nio.file.Files.write(
        new java.io.File(dir, "b1.png").toPath, Array[Byte](3, 4))
      val ids = Multimodal.readBinaryDir(spark, dir.getAbsolutePath)
        .collect().map(_.getLong(0)).toSet
      assert(ids.size == 2) // xxhash64(path) keeps them distinct
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

  test("PNG/GIF header decode yields dimensions; malformed headers yield null") {
    val ss = spark
    import ss.implicits._
    // minimal PNG prefix: 8-byte signature, IHDR length+type, then
    // width 640 / height 480 as big-endian u32 at bytes 17-24
    val png = Array[Int](
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, 'I', 'H', 'D', 'R',     // IHDR chunk head
      0x00, 0x00, 0x02, 0x80,                          // width  = 640
      0x00, 0x00, 0x01, 0xE0                           // height = 480
    ).map(_.toByte)
    // GIF89a header: width 320 / height 200 little-endian u16 at 7-10
    val gif = Array[Int](
      'G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01, // width  = 320
      0xC8, 0x00  // height = 200
    ).map(_.toByte)
    // hostile PNG: width field 0xFFFFFFFF overflows int — must be null,
    // not an ANSI CAST_OVERFLOW job failure
    val badPng = png.clone()
    (16 until 20).foreach(i => badPng(i) = 0xFF.toByte)
    // JPEG with a zero-length APP0 segment: malformed (length includes
    // itself, so must be >= 2) — the marker scan bails to null
    val jpeg = Array[Int](0xFF, 0xD8, 0xFF, 0xE0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)

    val recs = Seq(
      MediaRecord(1L, png, "image/png"),
      MediaRecord(2L, gif, "image/gif"),
      MediaRecord(3L, badPng, "image/png"),
      MediaRecord(4L, jpeg, "image/jpeg"))
    val feats = Multimodal.extractFeatures(recs.toDS())
      .collect().map(f => f.doc_id -> (f.width, f.height)).toMap
    assert(feats(1L) == (Some(640), Some(480)))
    assert(feats(2L) == (Some(320), Some(200)))
    assert(feats(3L) == (None, Some(480))) // width malformed, height fine
    assert(feats(4L) == (None, None)) // malformed segment length
  }

  /** A structurally valid JPEG prefix: SOI, the given leading segments,
    * then a frame header of `kind` (0xC0 baseline / 0xC2 progressive)
    * with the given dims. Only the bytes the scan reads are emitted.
    */
  private def jpegBytes(
      w: Int, h: Int, kind: Int = 0xC0,
      leading: Seq[Array[Int]] = Nil): Array[Byte] = {
    val sof = Array(0xFF, kind, 0x00, 0x11, 0x08,
      (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF)
    (Array(0xFF, 0xD8) ++ leading.flatten ++ sof).map(_.toByte)
  }

  /** APPn segment of `payload` bytes (length field covers itself). */
  private def appSeg(marker: Int, payload: Int): Array[Int] =
    Array(0xFF, marker, ((payload + 2) >> 8) & 0xFF, (payload + 2) & 0xFF) ++
      Array.fill(payload)(0)

  test("JPEG SOF marker scan decodes dimensions without a codec") {
    val ss = spark
    import ss.implicits._
    val jfif = appSeg(0xE0, 14) // typical JFIF APP0
    val exif = appSeg(0xE1, 256) // a large EXIF blob the scan must skip
    val recs = Seq(
      // baseline SOF0 behind JFIF + EXIF + a quantization table
      MediaRecord(1L, jpegBytes(320, 240,
        leading = Seq(jfif, exif, appSeg(0xDB, 65))), "image/jpeg"),
      // progressive SOF2, bare
      MediaRecord(2L, jpegBytes(1920, 1080, kind = 0xC2), "image/jpeg"),
      // fill bytes (repeated 0xFF) before the frame marker are legal
      MediaRecord(3L, (Array(0xFF, 0xD8, 0xFF).map(_.toByte) ++
        jpegBytes(64, 32).drop(2)), "image/jpeg"),
      // DHT (0xC4) is NOT a frame header — must be skipped, then SOF0 read
      MediaRecord(4L, jpegBytes(800, 600,
        leading = Seq(appSeg(0xC4, 29))), "image/jpeg"),
      // truncated: EXIF length points past the end of the buffer
      MediaRecord(5L, Array(0xFF, 0xD8, 0xFF, 0xE1, 0x7F, 0xFF, 0, 0)
        .map(_.toByte), "image/jpeg"),
      // scan data (SOS) before any SOF: malformed
      MediaRecord(6L, Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0, 0, 0, 0)
        .map(_.toByte), "image/jpeg"))
    val feats = Multimodal.extractFeatures(recs.toDS())
      .collect().map(f => f.doc_id -> (f.width, f.height)).toMap
    assert(feats(1L) == (Some(320), Some(240)))
    assert(feats(2L) == (Some(1920), Some(1080)))
    assert(feats(3L) == (Some(64), Some(32)))
    assert(feats(4L) == (Some(800), Some(600)))
    assert(feats(5L) == (None, None))
    assert(feats(6L) == (None, None))
  }

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** PCM WAV with the given byte rate and data size (data present). */
  private def wavBytes(
      byteRate: Int, dataSize: Int,
      extraChunk: Option[(String, Int)] = None): Array[Byte] = {
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(byteRate) ++ le16(2) ++ le16(16)
    val extra = extraChunk.map { case (id, n) =>
      ascii(id) ++ le32(n) ++ Array.fill[Byte](n)(0)
    }.getOrElse(Array.emptyByteArray)
    val data = ascii("data") ++ le32(dataSize) ++
      Array.fill[Byte](dataSize)(0)
    val body = ascii("WAVE") ++ fmt ++ extra ++ data
    ascii("RIFF") ++ le32(body.length) ++ body
  }

  test("WAV duration decodes from the RIFF chunk walk, codec-free") {
    val ss = spark
    import ss.implicits._
    val recs = Seq(
      // 16000 B/s, 4000 bytes -> 250 ms
      MediaRecord(1L, wavBytes(16000, 4000), "audio/wav"),
      // a LIST metadata chunk between fmt and data must be skipped
      MediaRecord(2L, wavBytes(32000, 8000,
        extraChunk = Some(("LIST", 26))), "audio/wav"),
      // zero byte rate: malformed -> no duration, no division error
      MediaRecord(3L, wavBytes(0, 4000), "audio/wav"),
      // truncated: data size field points past the end of the buffer
      MediaRecord(4L, wavBytes(16000, 100).dropRight(90), "audio/wav"))
    val feats = Multimodal.extractFeatures(recs.toDS())
      .collect().map(f => f.doc_id -> f.duration_ms).toMap
    assert(feats(1L) == Some(250L))
    assert(feats(2L) == Some(250L)) // 8000/32000 s
    assert(feats(3L).isEmpty)
    assert(feats(4L).isEmpty)
    // and images don't get durations
    val png = Array[Int](0x89, 0x50, 0x4E, 0x47).map(_.toByte)
    val img = Multimodal.extractFeatures(
      Seq(MediaRecord(9L, png, "image/png")).toDS()).head()
    assert(img.duration_ms.isEmpty)
    // data-size field that fits under the TOTAL length but overruns the
    // bytes remaining after its header: truncated, never an overstated
    // duration (144-byte file cut to 114; size 100 > 70 remaining)
    assert(Multimodal.decodeWavDurationMs(
      wavBytes(16000, 100).dropRight(30)).isEmpty)
  }

  /** CBR MP3: MPEG1 Layer3 128 kbps 44.1 kHz (header FFFB90..) with
    * `audioBytes` of frame data; 128 kbps -> audioBytes/16 ms.
    */
  private def mp3Cbr(audioBytes: Int, id3Payload: Int = 0): Array[Byte] = {
    val id3 =
      if (id3Payload == 0) Array.emptyByteArray
      else ascii("ID3") ++ Array[Byte](3, 0, 0,
        ((id3Payload >> 21) & 0x7F).toByte, ((id3Payload >> 14) & 0x7F).toByte,
        ((id3Payload >> 7) & 0x7F).toByte, (id3Payload & 0x7F).toByte) ++
        Array.fill[Byte](id3Payload)(0)
    id3 ++ Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte) ++
      Array.fill[Byte](audioBytes - 4)(0)
  }

  /** VBR MP3: same first header (stereo -> 32-byte side info), Xing tag
    * with the frames flag and a big-endian u32 frame count.
    */
  private def mp3Xing(frames: Int): Array[Byte] =
    Array(0xFF, 0xFB, 0x90, 0x00).map(_.toByte) ++
      Array.fill[Byte](32)(0) ++ ascii("Xing") ++
      Array[Byte](0, 0, 0, 1) ++ Array(
        (frames >> 24) & 0xFF, (frames >> 16) & 0xFF,
        (frames >> 8) & 0xFF, frames & 0xFF).map(_.toByte) ++
      Array.fill[Byte](64)(0)

  test("MP3 duration decodes from MPEG frame headers, codec-free") {
    val ss = spark
    import ss.implicits._
    val recs = Seq(
      // CBR: 4000 audio bytes at 128 kbps -> 250 ms
      MediaRecord(1L, mp3Cbr(4000), "audio/mpeg"),
      // the ID3v2 tag's 200 bytes must be skipped via the syncsafe size
      MediaRecord(2L, mp3Cbr(4000, id3Payload = 200), "audio/mpeg"),
      // Xing VBR: 441 frames x 1152 samples at 44100 Hz -> 11520 ms
      MediaRecord(3L, mp3Xing(441), "audio/mpeg"),
      // reserved version bits (FFEB): malformed -> None
      MediaRecord(4L, Array(0xFF, 0xEB, 0x90, 0x00).map(_.toByte), "audio/mpeg"),
      // reserved sample-rate index (b2 = 0x9C): malformed -> None
      MediaRecord(5L, Array(0xFF, 0xFB, 0x9C, 0x00).map(_.toByte), "audio/mpeg"),
      // free-format bitrate (index 0) without a Xing header -> None
      MediaRecord(6L, Array(0xFF, 0xFB, 0x00, 0x00).map(_.toByte) ++
        Array.fill[Byte](64)(0), "audio/mpeg"),
      // ID3 tag whose size points past the end: truncated -> None
      MediaRecord(7L, (ascii("ID3") ++ Array[Byte](3, 0, 0, 0, 0, 0x7F, 0x7F))
        , "audio/mpeg"))
    val feats = Multimodal.extractFeatures(recs.toDS())
      .collect().map(f => f.doc_id -> f.duration_ms).toMap
    assert(feats(1L) == Some(250L))
    assert(feats(2L) == Some(250L))
    assert(feats(3L) == Some(11520L))
    assert(feats(4L).isEmpty)
    assert(feats(5L).isEmpty)
    assert(feats(6L).isEmpty)
    assert(feats(7L).isEmpty)
  }

  test("digitId never reads the extension: digit-less stems hash, not collide") {
    val dir = java.nio.file.Files.createTempDirectory("media_noext").toFile
    try {
      // stems carry NO digits; the only digit is in ".mp3" — the legacy
      // scheme must fall back to xxhash64, never extract the '3'
      java.nio.file.Files.write(
        new java.io.File(dir, "song.mp3").toPath, Array[Byte](1))
      java.nio.file.Files.write(
        new java.io.File(dir, "track.mp3").toPath, Array[Byte](2))
      val ids = Multimodal.readBinaryDir(
        spark, dir.getAbsolutePath, idFromPath = Multimodal.digitId)
        .collect().map(_.getLong(0)).toSet
      assert(ids.size == 2) // distinct hashes — no shared id 3
      assert(!ids.contains(3L))
    } finally {
      dir.listFiles.foreach(_.delete()); dir.delete()
    }
  }

  test("MP3 CBR duration excludes a trailing ID3v1 TAG block") {
    // 4000 audio bytes at 128 kbps = 250 ms; the 128-byte ID3v1 trailer
    // is metadata, not audio — counting it would read 258 ms
    val tagged = mp3Cbr(4000) ++ ascii("TAG") ++ Array.fill[Byte](125)(0)
    assert(Multimodal.decodeMp3DurationMs(tagged) == Some(250L))
    assert(Multimodal.decodeMp3DurationMs(mp3Cbr(4000)) == Some(250L))
  }

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v)
  private def mp4Box(tp: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ ascii(tp) ++ payload

  /** Minimal ISO-BMFF: ftyp + moov{mvhd, trak{tkhd}} with the given
    * movie timescale/duration and 16.16 fixed track dims (0 = audio).
    */
  private def mp4Bytes(
      w: Int, h: Int, timescale: Int, duration: Long,
      v1: Boolean = false): Array[Byte] = {
    val ftyp = mp4Box("ftyp", ascii("isom") ++ be32(0x200))
    val mvhd =
      if (v1) mp4Box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(timescale.toLong) ++ be64(duration) ++ Array.fill[Byte](80)(0))
      else mp4Box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(timescale.toLong) ++ be32(duration) ++ Array.fill[Byte](80)(0))
    val tkhd =
      if (v1) mp4Box("tkhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(1) ++ be32(0) ++ be64(duration) ++ Array.fill[Byte](52)(0) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
      else mp4Box("tkhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(1) ++ be32(0) ++ be32(duration) ++ Array.fill[Byte](52)(0) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    ftyp ++ mp4Box("moov", mvhd ++ mp4Box("trak", tkhd))
  }

  test("MP4 metadata decodes from the ISO-BMFF box walk, codec-free") {
    val ss = spark
    import ss.implicits._
    // a moov carried under a u64 largesize header (size32 == 1)
    val large = {
      val plain = mp4Bytes(320, 240, 1000, 2000)
      val ftypLen = 16
      val moov = plain.drop(ftypLen)
      plain.take(ftypLen) ++ be32(1L) ++ ascii("moov") ++
        be64(moov.length + 8L) ++ moov.drop(8)
    }
    val recs = Seq(
      // v0 boxes: 90000-tick timescale, 270000 ticks -> 3000 ms
      MediaRecord(1L, mp4Bytes(1920, 1080, 90000, 270000), "video/mp4"),
      // v1 (64-bit) mvhd/tkhd variant
      MediaRecord(2L, mp4Bytes(640, 360, 1000, 12345, v1 = true), "video/mp4"),
      // audio-only: tkhd dims are zero -> no dimensions, duration kept
      MediaRecord(3L, mp4Bytes(0, 0, 600, 1800), "video/mp4"),
      MediaRecord(4L, large, "video/mp4"),
      // box size overruns the enclosing box: malformed -> all None
      MediaRecord(5L, mp4Bytes(320, 240, 1000, 2000).dropRight(40), "video/mp4"),
      // no leading ftyp: not BMFF
      MediaRecord(6L, Array.fill[Byte](32)(0), "video/mp4"))
    val feats = Multimodal.extractFeatures(recs.toDS())
      .collect().map(f => f.doc_id -> (f.width, f.height, f.duration_ms)).toMap
    assert(feats(1L) == (Some(1920), Some(1080), Some(3000L)))
    assert(feats(2L) == (Some(640), Some(360), Some(12345L)))
    assert(feats(3L) == (None, None, Some(3000L)))
    assert(feats(4L) == (Some(320), Some(240), Some(2000L)))
    assert(feats(5L) == (None, None, None))
    assert(feats(6L) == (None, None, None))
  }

  test("byte walkers survive 10k random/truncated/bit-flipped inputs") {
    val ss = spark
    import ss.implicits._
    // Property: every decoder returns (not throws) on hostile bytes —
    // the corrupt-safety the Scaladocs claim, now fuzz-tested. Seeded
    // RNG keeps failures reproducible.
    val rnd = new scala.util.Random(20260813)
    val seeds: IndexedSeq[Array[Byte]] = IndexedSeq(
      jpegBytes(320, 240, leading = Seq(appSeg(0xE0, 14), appSeg(0xE1, 64))),
      wavBytes(16000, 400, extraChunk = Some(("LIST", 26))),
      mp3Cbr(400, id3Payload = 30),
      mp3Xing(441),
      mp4Bytes(1920, 1080, 90000, 270000),
      mp4Bytes(640, 360, 1000, 12345, v1 = true),
      (Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A,
        0, 0, 0, 0x0D) ++ "IHDR".map(_.toInt).toArray ++
        Array(0, 0, 2, 0x80, 0, 0, 1, 0xE0)).map(_.toByte),
      ("GIF89a".map(_.toInt).toArray ++ Array(0x40, 1, 0xC8, 0)).map(_.toByte))
    def mutate(b: Array[Byte]): Array[Byte] = rnd.nextInt(4) match {
      case 0 => b.take(rnd.nextInt(b.length + 1)) // truncate
      case 1 => // flip 1-8 random bits
        val c = b.clone()
        (0 until 1 + rnd.nextInt(8)).foreach { _ =>
          val i = rnd.nextInt(c.length)
          c(i) = (c(i) ^ (1 << rnd.nextInt(8))).toByte
        }
        c
      case 2 => // random garbage, incl. empty
        Array.fill[Byte](rnd.nextInt(64))(rnd.nextInt().toByte)
      case _ => // truncate AND corrupt
        val c = b.take(1 + rnd.nextInt(b.length))
        if (c.nonEmpty) {
          val i = rnd.nextInt(c.length)
          c(i) = (c(i) ^ 0xFF).toByte
        }
        c
    }
    val cases = (0 until 10000).map(i => mutate(seeds(i % seeds.size)))
    cases.foreach { bs => // typed walkers: direct calls, must not throw
      Multimodal.decodeJpegDims(bs): Unit
      Multimodal.decodeWavDurationMs(bs): Unit
      Multimodal.decodeMp3DurationMs(bs): Unit
      Multimodal.decodeMp4Meta(bs): Unit
    }
    // and the full feature pass (codegen'd PNG/GIF Columns + the typed
    // dispatch) must complete over the same corpus
    val recs = cases.zipWithIndex.map { case (b, i) =>
      MediaRecord(i.toLong, b, "application/octet-stream")
    }
    assert(Multimodal.extractFeatures(recs.toDS()).count() == 10000L)
  }
}
