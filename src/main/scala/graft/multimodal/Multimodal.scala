package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One opaque media object: bytes + typed metadata. At 100 TB the
  * binary column stays columnar (parquet binary chunks); only the
  * per-partition decode pass materializes bytes, and partition sizing
  * is governed by `spark.sql.files.maxPartitionBytes` like any scan.
  */
final case class MediaRecord(doc_id: Long, media: Array[Byte], mime: String)

/** Decoded features. `width`/`height` come from the header decoders;
  * all fields are real and oracle-checked.
  */
final case class MediaFeatures(
    doc_id: Long,
    byte_len: Long,
    header_hex: String,
    content_sha: String,
    width: Option[Int],
    height: Option[Int],
    duration_ms: Option[Long])

/** Multimodal-column plumbing: schema, partitioning, and the
  * per-partition decode pass are real, and so is metadata decode for
  * every headered or frame-structured format (PNG/GIF as codegen'd
  * Columns, JPEG via a SOF marker scan, WAV duration via a RIFF chunk
  * walk, MP3 duration via MPEG frame-header arithmetic, MP4 duration +
  * dimensions via an ISO-BMFF box walk), and PNG compressed-payload
  * decode is real too ([[PngDecoder]]: stdlib inflate + defilter +
  * RGBA). Other codecs' payloads (JPEG entropy data, MP3 samples)
  * report unknown rather than guess — no codec libraries exist in
  * this environment by contract.
  */
object Multimodal {

  /** Pack a text column as a binary media column — stands in for
    * image/audio payload ingestion. DuckDB: `encode(text)`.
    */
  def packText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("text/plain").as("mime"))

  /** Ingest raw media objects from a directory via Spark's binaryFile
    * source — the real multimodal ingestion path (each file becomes one
    * row of path/length/bytes, read distributed, partition-sized by
    * `spark.sql.files.maxPartitionBytes`). Ids default to
    * `xxhash64(path)` — collision-free across directories, unlike
    * name-digit schemes where `a1.png` and `b1.png` would collide; pass
    * `idFromPath` (e.g. the digit extractor) when file names carry a
    * caller-guaranteed-unique id. Mime comes from the extension.
    */
  def readBinaryDir(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      glob: String = "*",
      idFromPath: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        p => xxhash64(p)): DataFrame = {
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        idFromPath(col("path")).cast("long").as("doc_id"),
        col("content").as("media"),
        when(ext === "png", "image/png")
          .when(ext === "gif", "image/gif")
          .when(ext === "jpg" || ext === "jpeg", "image/jpeg")
          .when(ext === "wav", "audio/wav")
          .when(ext === "mp3", "audio/mpeg")
          .when(ext === "mp4", "video/mp4")
          .when(ext === "txt", "text/plain")
          .otherwise(concat(lit("application/"), ext)).as("mime"))
  }

  /** Trailing-digit id extractor for [[readBinaryDir]] — the legacy
    * naming scheme (`img_0042.png` -> 42). The extension is STRIPPED
    * before extraction, so a digit in the extension itself never
    * hijacks the id — neither for digit-bearing stems (`clip_5.mp3`)
    * nor digit-less ones (`song.mp3`, which falls through to the
    * xxhash64 fallback). Only safe when the caller guarantees digit
    * uniqueness across the tree.
    */
  def digitId(path: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val stem = regexp_replace(path, "\\.[A-Za-z0-9]+$", "")
    val digits = regexp_extract(stem, "(\\d+)[^/\\d]*$", 1)
    when(digits =!= "", digits.cast("long")).otherwise(xxhash64(path))
  }

  // ---- header-format dimension decode: pure byte arithmetic ----
  // PNG and GIF store dimensions at fixed header offsets, so decode is
  // `substring`/`conv` Column expressions — whole-stage codegen'd, no
  // codec library, no typed pass. (1-indexed byte positions.)

  /** PNG signature (8 bytes) + room for the IHDR dims at bytes 17-24. */
  private def isPng(media: Column): Column =
    length(media) >= 24 &&
      hex(substring(media, 1, 8)) === "89504E470D0A1A0A"

  /** GIF87a/GIF89a signature + room for the 4 dim bytes at 7-10. */
  private def isGif(media: Column): Column =
    length(media) >= 10 &&
      hex(substring(media, 1, 6)).isin("474946383761", "474946383961")

  /** Big-endian u32 at byte `pos` (PNG IHDR ints). The PNG spec caps
    * dimensions at 2^31-1, but a corrupt/hostile header can claim more
    * and Spark 4's ANSI cast would fail the whole job on overflow — so
    * read as long (any u32 fits) and null out out-of-spec values.
    */
  private def beU32(media: Column, pos: Int): Column = {
    val v = conv(hex(substring(media, pos, 4)), 16, 10).cast("long")
    when(v <= Int.MaxValue, v.cast("int")) // else null (malformed header)
  }

  /** Little-endian u16 at byte `pos` (GIF logical-screen dims). */
  private def leU16(media: Column, pos: Int): Column =
    (conv(hex(substring(media, pos, 1)), 16, 10).cast("int") +
      conv(hex(substring(media, pos + 1, 1)), 16, 10).cast("int") * 256)

  /** Decoded pixel width: PNG IHDR bytes 17-20 (big-endian), GIF bytes
    * 7-8 (little-endian); null for formats that need a real codec.
    */
  def mediaWidth(media: Column): Column =
    when(isPng(media), beU32(media, 17))
      .when(isGif(media), leU16(media, 7))
      .otherwise(lit(null).cast("int"))

  /** Decoded pixel height: PNG IHDR bytes 21-24, GIF bytes 9-10. */
  def mediaHeight(media: Column): Column =
    when(isPng(media), beU32(media, 21))
      .when(isGif(media), leU16(media, 9))
      .otherwise(lit(null).cast("int"))

  /** JPEG dimensions via a bounded SOF marker scan — pure byte logic,
    * no codec. A JPEG is SOI (FFD8) followed by segments of
    * [FF, marker, u16 big-endian length, payload]; the frame header
    * SOFn (FFC0-FFCF minus DHT FFC4 / JPG FFC8 / DAC FFCC) carries
    * [u8 precision, u16 height, u16 width] at payload offsets 0-4
    * (ISO/IEC 10918-1 B.2.2). The scan walks segment lengths — it never
    * touches entropy-coded data — so EXIF/JFIF APPn blobs of any size
    * are skipped in O(#segments). Returns (None, None) for truncated,
    * desynced, or non-JPEG bytes rather than throwing: at 100 TB some
    * inputs WILL be corrupt, and one bad object must not fail the job.
    */
  private[multimodal] def decodeJpegDims(
      media: Array[Byte]): (Option[Int], Option[Int]) = {
    def u8(i: Int): Int = media(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val n = media.length
    if (n < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return (None, None)
    var i = 2
    var guard = 0 // hostile input: a segment loop must stay bounded
    while (i + 1 < n && guard < 4096) {
      guard += 1
      if (u8(i) != 0xFF) return (None, None) // desynced — not at a marker
      var m = u8(i + 1)
      while (m == 0xFF && i + 2 < n) { i += 1; m = u8(i + 1) } // fill bytes
      m match {
        case 0xD8 | 0x01 => i += 2 // SOI / TEM: standalone, no length
        case x if x >= 0xD0 && x <= 0xD7 => i += 2 // RSTn: no length
        case 0xD9 | 0xDA => return (None, None) // EOI / scan data, no SOF
        case x if x >= 0xC0 && x <= 0xCF && x != 0xC4 && x != 0xC8 && x != 0xCC =>
          if (i + 8 >= n) return (None, None) // truncated frame header
          val h = u16(i + 5)
          val w = u16(i + 7)
          return (if (w > 0) Some(w) else None, if (h > 0) Some(h) else None)
        case _ =>
          if (i + 3 >= n) return (None, None) // truncated segment length
          val len = u16(i + 2)
          if (len < 2) return (None, None) // length includes itself: >= 2
          i += 2 + len
      }
    }
    (None, None)
  }

  /** WAV (RIFF) duration via a bounded chunk walk — pure byte logic,
    * no codec: RIFF is [4-byte id][LE u32 size][payload] chunks after
    * the 12-byte RIFF/WAVE preamble; the `fmt ` chunk carries the
    * byte rate at payload offset 8-11 and the `data` chunk's size is
    * the payload byte count, so duration_ms = dataSize·1000/byteRate.
    * Tolerates extra chunks (LIST, fact) in any order; returns None on
    * truncated/desynced/zero-rate input instead of throwing — at
    * 100 TB some objects WILL be corrupt.
    */
  private[multimodal] def decodeWavDurationMs(
      media: Array[Byte]): Option[Long] = {
    def u8(i: Int): Int = media(i) & 0xFF
    def leU32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        (u8(i + 3).toLong << 24)
    def tag(i: Int): String =
      new String(media.slice(i, i + 4), "US-ASCII")
    val n = media.length
    if (n < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var byteRate = 0L
    var dataSize = -1L
    var guard = 0
    while (i + 8 <= n && guard < 4096 && (byteRate == 0 || dataSize < 0)) {
      guard += 1
      val id = tag(i)
      val size = leU32(i + 4)
      // Validate against the bytes REMAINING after this header, not the
      // total length: a truncated file whose data-size field fits under
      // n but overruns the buffer must be None, not an overstated
      // duration. (leU32 is unsigned — no negative-size branch needed.)
      if (size > n - i - 8) return None // truncated/hostile size field
      if (id == "fmt " && i + 20 <= n) byteRate = leU32(i + 16)
      if (id == "data") dataSize = size
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (byteRate > 0 && dataSize >= 0) Some(dataSize * 1000 / byteRate)
    else None
  }

  // ---- MP3 duration: MPEG audio frame-header arithmetic, no codec ----
  // An MPEG audio frame header is 4 bytes: an 11-bit sync (FFE..),
  // 2 version bits, 2 layer bits, then bitrate/samplerate indices into
  // the published tables (ISO/IEC 11172-3 2.4.2.3). Duration needs no
  // decoding: CBR duration = audio_bytes·8/bitrate, and VBR files
  // carry a Xing/Info header with the total frame count, so duration =
  // frames·samples_per_frame/sample_rate.

  /** Bitrate tables in kbps, indexed by the header's 4-bit bitrate
    * index (0 = "free" and 15 = invalid — both map to 0 = undecodable).
    */
  private val Mpeg1L1Kbps =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0)
  private val Mpeg1L2Kbps =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0)
  private val Mpeg1L3Kbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mpeg2L1Kbps =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0)
  private val Mpeg2L23Kbps =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)

  /** Sample rates by version bits (3=MPEG1, 2=MPEG2, 0=MPEG2.5). */
  private val MpegSampleRates = Map(
    3 -> Array(44100, 48000, 32000),
    2 -> Array(22050, 24000, 16000),
    0 -> Array(11025, 12000, 8000))

  /** MP3 (MPEG audio) duration via frame-header arithmetic — pure byte
    * logic, no codec: skip an ID3v2 tag (syncsafe u28 size), sync on
    * the first FFE frame header within a bounded scan, read
    * version/layer/bitrate/samplerate from the table indices, then
    * either the Xing/Info VBR frame count (frames·samplesPerFrame/
    * sampleRate) or the CBR byte arithmetic (audioBytes·8/bitrate).
    * Returns None for desynced/truncated/reserved-field input instead
    * of throwing — at 100 TB some objects WILL be corrupt.
    */
  private[multimodal] def decodeMp3DurationMs(
      media: Array[Byte]): Option[Long] = {
    def u8(i: Int): Int = media(i) & 0xFF
    def beU32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val n = media.length
    // ID3v2 preamble: "ID3" + 2 version + 1 flags + syncsafe u28 size
    var i =
      if (n >= 10 && u8(0) == 'I' && u8(1) == 'D' && u8(2) == '3')
        10 + (((u8(6) & 0x7F) << 21) | ((u8(7) & 0x7F) << 14) |
          ((u8(8) & 0x7F) << 7) | (u8(9) & 0x7F))
      else 0
    if (i + 4 > n) return None
    // bounded sync scan: real encoders emit at most a little junk
    // before the first frame; a file with no sync in 4 KB is not MP3
    val scanEnd = math.min(n - 4, i + 4096)
    while (i <= scanEnd && !(u8(i) == 0xFF && (u8(i + 1) & 0xE0) == 0xE0))
      i += 1
    if (i > scanEnd) return None
    val b1 = u8(i + 1); val b2 = u8(i + 2); val b3 = u8(i + 3)
    val ver = (b1 >> 3) & 3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    val layerBits = (b1 >> 1) & 3 // 3=L1, 2=L2, 1=L3, 0=reserved
    if (ver == 1 || layerBits == 0) return None
    val srIdx = (b2 >> 2) & 3
    if (srIdx == 3) return None // reserved sample-rate index
    val sampleRate = MpegSampleRates(ver)(srIdx)
    val samplesPerFrame =
      if (layerBits == 3) 384 // Layer 1
      else if (layerBits == 2) 1152 // Layer 2
      else if (ver == 3) 1152 else 576 // Layer 3: MPEG1 vs MPEG2/2.5
    // VBR first: the Xing/Info header sits right after the side info
    // (MPEG1: 17 mono / 32 stereo; MPEG2/2.5: 9 / 17), flag bit 0 =
    // "frame count present" as a big-endian u32.
    val mono = ((b3 >> 6) & 3) == 3
    val sideInfo =
      if (ver == 3) { if (mono) 17 else 32 } else { if (mono) 9 else 17 }
    val x = i + 4 + sideInfo
    if (x + 12 <= n) {
      val tag = new String(media.slice(x, x + 4), "US-ASCII")
      if ((tag == "Xing" || tag == "Info") && (beU32(x + 4) & 1L) == 1L) {
        val frames = beU32(x + 8)
        if (frames > 0)
          return Some(frames * samplesPerFrame * 1000L / sampleRate)
      }
    }
    // CBR: everything from the first sync is audio frames
    val kbps = ((ver, layerBits) match {
      case (3, 3) => Mpeg1L1Kbps
      case (3, 2) => Mpeg1L2Kbps
      case (3, 1) => Mpeg1L3Kbps
      case (_, 3) => Mpeg2L1Kbps
      case _ => Mpeg2L23Kbps
    })((b2 >> 4) & 0xF)
    if (kbps == 0) return None // free-format/invalid bitrate index
    // Trailing metadata is NOT audio: an ID3v1 tag is a fixed 128-byte
    // "TAG"-prefixed trailer — include it in the byte count and every
    // tagged CBR file overstates duration (~8 ms at 128 kbps).
    val end =
      if (n - i > 128 && u8(n - 128) == 'T' && u8(n - 127) == 'A' &&
        u8(n - 126) == 'G') n - 128
      else n
    Some((end - i).toLong * 8000L / (kbps * 1000L))
  }

  /** One indexed MPEG-audio frame. */
  private[multimodal] final case class Mp3Frame(
      frameNo: Int,
      offset: Long,
      size: Int,
      kbps: Int,
      sampleRate: Int,
      samples: Int)

  /** MP3 frame index — the audio twin of the MP4 keyframe walk
    * (row 212): per-frame byte ranges + header fields, the index an
    * audio decode/sampling stage slices on, no codec. Walks
    * back-to-back frame headers from the first sync (ID3v2 preamble
    * skipped, ID3v1 trailer tolerated), each length from the public
    * layer formulas — L1 `((12·bps/sr)+pad)·4`, L2 and MPEG1-L3
    * `144·bps/sr+pad`, MPEG2/2.5-L3 `72·bps/sr+pad` (integer
    * division). VBR streams index naturally — every frame carries its
    * own bitrate. ANY mid-stream violation (bad sync, reserved field,
    * free-format bitrate, frame overrunning EOF) declines the whole
    * file: real decoders resync heuristically, and heuristic output
    * is not something an exactness gate should bless.
    */
  private[multimodal] def mp3FrameWalk(
      media: Array[Byte],
      everyK: Int,
      maxFrames: Int): Option[Seq[Mp3Frame]] = {
    require(everyK >= 1 && maxFrames >= 1, "everyK/maxFrames must be >= 1")
    def u8(i: Int): Int = media(i) & 0xFF
    val n = media.length
    var i =
      if (n >= 10 && u8(0) == 'I' && u8(1) == 'D' && u8(2) == '3')
        10 + (((u8(6) & 0x7F) << 21) | ((u8(7) & 0x7F) << 14) |
          ((u8(8) & 0x7F) << 7) | (u8(9) & 0x7F))
      else 0
    if (i + 4 > n) return None
    val scanEnd = math.min(n - 4, i + 4096)
    while (i <= scanEnd && !(u8(i) == 0xFF && (u8(i + 1) & 0xE0) == 0xE0))
      i += 1
    if (i > scanEnd) return None
    val end =
      if (n - i > 128 && u8(n - 128) == 'T' && u8(n - 127) == 'A' &&
        u8(n - 126) == 'G') n - 128
      else n
    val out = Seq.newBuilder[Mp3Frame]
    var kept = 0
    var no = 0
    while (i < end) {
      if (i + 4 > end) return None
      if (!(u8(i) == 0xFF && (u8(i + 1) & 0xE0) == 0xE0)) return None
      val b1 = u8(i + 1); val b2 = u8(i + 2)
      val ver = (b1 >> 3) & 3
      val layerBits = (b1 >> 1) & 3
      if (ver == 1 || layerBits == 0) return None
      val srIdx = (b2 >> 2) & 3
      if (srIdx == 3) return None
      val sampleRate = MpegSampleRates(ver)(srIdx)
      val kbps = ((ver, layerBits) match {
        case (3, 3) => Mpeg1L1Kbps
        case (3, 2) => Mpeg1L2Kbps
        case (3, 1) => Mpeg1L3Kbps
        case (_, 3) => Mpeg2L1Kbps
        case _ => Mpeg2L23Kbps
      })((b2 >> 4) & 0xF)
      if (kbps == 0) return None
      val pad = (b2 >> 1) & 1
      val (size, samples) =
        if (layerBits == 3) ((12 * kbps * 1000 / sampleRate + pad) * 4, 384)
        else if (layerBits == 2) (144 * kbps * 1000 / sampleRate + pad, 1152)
        else if (ver == 3) (144 * kbps * 1000 / sampleRate + pad, 1152)
        else (72 * kbps * 1000 / sampleRate + pad, 576)
      if (i + size > end) return None
      no += 1
      if ((no - 1) % everyK == 0 && kept < maxFrames) {
        out += Mp3Frame(no, i.toLong, size, kbps, sampleRate, samples)
        kept += 1
      }
      i += size
    }
    Some(out.result())
  }

  /** Record-grain MP3 frame indexing over a media Dataset: one row per
    * sampled frame (every `everyK`-th, capped at `maxFrames`), one
    * all-null row per undecodable file.
    */
  def mp3FrameIndex(
      ds: Dataset[MediaRecord],
      everyK: Int = 1,
      maxFrames: Int = 16): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        (if (isMp3(rec.media)) mp3FrameWalk(rec.media, everyK, maxFrames)
        else None) match {
          case Some(fs) =>
            fs.map(f => (rec.doc_id, Some(f.frameNo), Some(f.offset),
              Some(f.size.toLong), Some(f.kbps), Some(f.sampleRate),
              Some(f.samples)))
          case None =>
            Seq((rec.doc_id, None: Option[Int], None: Option[Long],
              None: Option[Long], None: Option[Int], None: Option[Int],
              None: Option[Int]))
        }
      }
    }.toDF("doc_id", "frame_no", "byte_offset", "byte_size", "kbps",
      "sample_rate", "samples")
  }

  /** Exact audio resampling at record grain — the sample-rate
    * normalization verb (every training pipeline resamples its corpus
    * to one rate before feature extraction). Each WAV decodes through
    * the [[Wav.decodeSamples]] kernel and linear-resamples to
    * `dstRate` via [[Wav.resampleLinear]]: one row per output sample
    * (capped at `maxOutFrames` frames) carrying the EXACT integer
    * numerator over the constant `denom` = dstRate — no float in the
    * pipeline, so the gate hashes interpolation arithmetic itself.
    * Undecodable files emit one all-null row.
    */
  def audioResample(
      ds: Dataset[MediaRecord],
      dstRate: Int,
      maxOutFrames: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        (if (Wav.isWav(rec.media)) Wav.decodeSamples(rec.media)
        else None) match {
          case Some(pcm) =>
            val (nums, denom) = Wav.resampleLinear(pcm, dstRate)
            val ch = pcm.channels
            val frames = nums.length / ch
            (0 until math.min(frames, maxOutFrames)).flatMap { j =>
              (0 until ch).map { c =>
                (rec.doc_id, Some(j), Some(c),
                  Some(nums(j * ch + c)), Some(denom))
              }
            }
          case None =>
            Seq((rec.doc_id, None: Option[Int], None: Option[Int],
              None: Option[Long], None: Option[Long]))
        }
      }
    }.toDF("doc_id", "out_idx", "ch", "num", "denom")
  }

  /** MP3-shaped bytes: an ID3v2 preamble or an immediate frame sync.
    * (JPEG's FFD8 magic fails the sync test: 0xD8 & 0xE0 != 0xE0.)
    */
  private def isMp3(media: Array[Byte]): Boolean =
    media.length >= 4 &&
      (((media(0) & 0xFF) == 0xFF && (media(1) & 0xE0) == 0xE0) ||
        (media(0) == 'I'.toByte && media(1) == 'D'.toByte &&
          media(2) == '3'.toByte))

  // ---- MP4 (ISO-BMFF) metadata: a bounded box walk, no codec ----
  // An ISO-BMFF file is a sequence of boxes [u32 size][4-char type]
  // [payload]; size==1 switches to a following u64 largesize, size==0
  // means "to end of enclosing box" (ISO/IEC 14496-12 4.2). moov and
  // trak are pure containers, so the walk recurses into them; mvhd
  // carries the movie timescale + duration, tkhd carries the 16.16
  // fixed-point presentation width/height (zero on audio tracks). The
  // same bounded-walk discipline as the RIFF code above: sizes are
  // validated against the bytes REMAINING in the enclosing box, and
  // any malformed size yields None rather than a throw or overstated
  // metadata — at 100 TB some objects WILL be corrupt.

  /** (width, height, duration_ms) from moov/mvhd/tkhd; all None on
    * truncated, desynced, or non-BMFF bytes.
    */
  private[multimodal] def decodeMp4Meta(
      media: Array[Byte]): (Option[Int], Option[Int], Option[Long]) = {
    val n = media.length
    def u8(i: Int): Int = media(i) & 0xFF
    def beU32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def beU64(i: Int): Long = (beU32(i) << 32) | beU32(i + 4)
    def tag(i: Int): String = new String(media.slice(i, i + 4), "US-ASCII")
    var durationMs: Option[Long] = None
    var width: Option[Int] = None
    var height: Option[Int] = None
    var guard = 0 // hostile input: the box loop must stay bounded
    // walk boxes in [start, end); false = malformed (abort the decode)
    def walk(start: Int, end: Int, depth: Int): Boolean = {
      var i = start
      while (i + 8 <= end && guard < 4096) {
        guard += 1
        val size32 = beU32(i)
        val id = tag(i + 4)
        var header = 8
        var size: Long = size32
        if (size32 == 1L) { // u64 largesize follows the type
          if (i + 16 > end) return false
          size = beU64(i + 8)
          header = 16
        } else if (size32 == 0L) size = (end - i).toLong // to end of box
        if (size < header || size > (end - i).toLong) return false
        val payload = i + header
        val pend = i + size.toInt
        id match {
          case "moov" | "trak" =>
            if (depth < 4 && !walk(payload, pend, depth + 1)) return false
          case "mvhd" if pend - payload >= 20 =>
            // v0: ver+flags, creation u32, modification u32,
            //     timescale u32 (+12), duration u32 (+16)
            // v1: ver+flags, creation u64, modification u64,
            //     timescale u32 (+20), duration u64 (+24)
            val ver = u8(payload)
            if (ver == 0) {
              val ts = beU32(payload + 12)
              if (ts > 0) durationMs = Some(beU32(payload + 16) * 1000L / ts)
            } else if (ver == 1 && pend - payload >= 32) {
              val ts = beU32(payload + 20)
              if (ts > 0) durationMs = Some(beU64(payload + 24) * 1000L / ts)
            }
          case "tkhd" =>
            // width/height are 16.16 fixed at payload end: v0 +76/+80
            // (84-byte payload), v1 +88/+92 (96-byte payload); audio
            // tracks carry zeros — keep the first non-zero (video)
            val ver = u8(payload)
            val off =
              if (ver == 0 && pend - payload >= 84) 76
              else if (ver == 1 && pend - payload >= 96) 88
              else -1
            if (off >= 0 && width.isEmpty) {
              val w = (beU32(payload + off) >> 16).toInt
              val h = (beU32(payload + off + 4) >> 16).toInt
              if (w > 0 && h > 0) { width = Some(w); height = Some(h) }
            }
          case _ => () // mdat/ftyp/leaf boxes: skip over
        }
        i = pend
      }
      true
    }
    if (n < 12 || tag(4) != "ftyp") (None, None, None)
    else if (!walk(0, n, 0)) (None, None, None)
    else (width, height, durationMs)
  }

  /** ISO-BMFF-shaped bytes: a leading ftyp box. */
  private def isMp4(media: Array[Byte]): Boolean =
    media.length >= 12 &&
      media(4) == 'f'.toByte && media(5) == 't'.toByte &&
      media(6) == 'y'.toByte && media(7) == 'p'.toByte

  private def isRiffWave(media: Array[Byte]): Boolean =
    media.length >= 12 &&
      (media(0) & 0xFF) == 'R' && (media(1) & 0xFF) == 'I' &&
      (media(2) & 0xFF) == 'F' && (media(3) & 0xFF) == 'F' &&
      (media(8) & 0xFF) == 'W' && (media(9) & 0xFF) == 'A' &&
      (media(10) & 0xFF) == 'V' && (media(11) & 0xFF) == 'E'

  /** Non-headered formats this package does not decode dimensions for
    * (JPEG2000, WebP's VP8 payload, ...): report unknown rather than
    * guess. Every in-scope format is real — PNG/GIF headers as
    * codegen'd byte arithmetic in [[mediaWidth]]/[[mediaHeight]], JPEG
    * via [[decodeJpegDims]]'s marker scan, WAV via
    * [[decodeWavDurationMs]]'s chunk walk, MP3 via
    * [[decodeMp3DurationMs]]'s frame-header arithmetic, MP4 via
    * [[decodeMp4Meta]]'s ISO-BMFF box walk, and PNG PIXEL payloads
    * (inflate + defilter + RGBA expansion) via [[PngDecoder.decode]] /
    * [[decodePixelStats]].
    */
  private def decodeDimensionsUnknown(
      media: Array[Byte]): (Option[Int], Option[Int]) =
    (None, None)

  /** Real compressed-payload decode, end-to-end: PNG (inflate →
    * defilter) or GIF (LZW) bytes → RGBA → per-image pixel statistics,
    * one row per input record. Unsupported or corrupt records keep
    * their id with null stats — the schema is total, so the pass
    * composes with mixed-format corpora. Runs in the same
    * per-partition typed pass as [[extractFeatures]]: bytes never
    * leave the executor, output is a few longs per image regardless
    * of raster size.
    *
    * Output: (doc_id, px_w, px_h, n_px, sum_r, sum_g, sum_b) with
    * exact integer channel sums (hash-matchable cross-engine). For
    * GIFs whose first frame is an offset sub-rect, (px_w, px_h) are
    * the LOGICAL-SCREEN (canvas) dimensions — [[GifDecoder.decode]]
    * composites onto the canvas, never the raw rect — so stats are
    * canvas-grain by contract (the q180 oracle bakes this in).
    */
  def decodePixelStats(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        (if (GifDecoder.isGif(rec.media)) GifDecoder.decode(rec.media)
         else if (JpegDecoder.isJpeg(rec.media)) JpegDecoder.decode(rec.media)
         else PngDecoder.decode(rec.media)) match {
          case Some(r) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var px = 0
            val n = r.width * r.height
            while (px < n) {
              sr += r.rgba(4 * px) & 0xFF
              sg += r.rgba(4 * px + 1) & 0xFF
              sb += r.rgba(4 * px + 2) & 0xFF
              px += 1
            }
            (rec.doc_id, Some(r.width), Some(r.height), Some(n.toLong),
              Some(sr), Some(sg), Some(sb))
          case None =>
            (rec.doc_id, None: Option[Int], None: Option[Int],
              None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long])
        }
      }
    }.toDF("doc_id", "px_w", "px_h", "n_px", "sum_r", "sum_g", "sum_b")
  }

  /** Real AUDIO-payload decode, end-to-end: WAV integer-PCM (8/16/24
    * bit) or IEEE float-PCM (32-bit, quantized to the 1/32768 grid —
    * see [[Wav.decodeStats]]) bytes → samples → exact per-recording
    * statistics, one row per record — the audio companion of
    * [[decodePixelStats]]. Non-WAV, compressed or corrupt records
    * keep their id with null stats.
    * Same per-partition typed pass: bytes never leave the executor,
    * output is a few longs per recording regardless of audio length.
    *
    * Output: (doc_id, sample_rate, n_channels, bits, n_frames,
    * peak_abs, sum_squares, n_clipped) — all exact integers
    * (hash-matchable cross-engine; RMS = sqrt(sum_squares/(n_frames·
    * n_channels)) is one caller-side division away).
    */
  def decodeAudioStats(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        Wav.decodeStats(rec.media) match {
          case Some(s) =>
            (rec.doc_id, Some(s.sampleRate), Some(s.channels),
              Some(s.bitsPerSample), Some(s.frames), Some(s.peakAbs),
              Some(s.sumSquares), Some(s.clipped))
          case None =>
            (rec.doc_id, None: Option[Int], None: Option[Int],
              None: Option[Int], None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long])
        }
      }
    }.toDF("doc_id", "sample_rate", "n_channels", "bits", "n_frames",
      "peak_abs", "sum_squares", "n_clipped")
  }

  /** Windowed AUDIO feature extraction — the feature-extract verb for
    * audio (decodeAudioStats is the whole-recording aggregate): one
    * row per (recording, fixed-length window of `windowFrames`
    * frames, last partial), exact integer peak / energy / clipping
    * per window. The silence-detection / VAD / loudness-profiling
    * primitive: window RMS = sqrt(sum_squares/(n_frames·channels)),
    * a silence gate is a peak-or-energy threshold per window, and
    * trim points are the first/last non-silent windows. Same format
    * scope and exact-or-decline contract as [[decodeAudioStats]]
    * (they share one decode pass); non-WAV/corrupt records emit a
    * single null-stats row. Output size is frames/windowFrames rows
    * per recording — bytes never leave the executor.
    *
    * Output: (doc_id, win_idx, sample_rate, n_channels, n_frames,
    * peak_abs, sum_squares, n_clipped).
    */
  def audioWindowStats(
      ds: Dataset[MediaRecord],
      windowFrames: Long): DataFrame = {
    require(windowFrames >= 1, "windowFrames must be >= 1")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        Wav.decodeWindowStats(rec.media, windowFrames) match {
          case Some(w) if w.windows.nonEmpty =>
            w.windows.map(win =>
              (rec.doc_id, Some(win.idx), Some(w.sampleRate),
                Some(w.channels), Some(win.frames), Some(win.peakAbs),
                Some(win.sumSquares), Some(win.clipped)))
          case _ =>
            Seq((rec.doc_id, None: Option[Int], None: Option[Int],
              None: Option[Int], None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Long]))
        }
      }
    }.toDF("doc_id", "win_idx", "sample_rate", "n_channels", "n_frames",
      "peak_abs", "sum_squares", "n_clipped")
  }

  /** Grid TILE feature extraction over decoded pixels — the
    * vision-embedding precursor (a G×G map of exact per-tile channel
    * statistics), the feature-extract verb for images at sub-image
    * grain (decodePixelStats is the whole-image aggregate). Tile
    * (tx, ty) covers x ∈ [tx·W/G, (tx+1)·W/G) by integer division
    * (same for y) — the exact partition both engines can replay —
    * so edge tiles absorb the remainder. Dispatches GIF/JPEG/PNG by
    * magic bytes like [[decodePixelStats]]; corrupt records emit a
    * single null-stats row; images smaller than the grid emit only
    * their non-empty tiles.
    *
    * Output: (doc_id, tile_x, tile_y, n_px, sum_r, sum_g, sum_b).
    */
  def tileFeatures(ds: Dataset[MediaRecord], grid: Int): DataFrame = {
    require(grid >= 1 && grid <= 64, "grid must be in [1, 64]")
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        (if (GifDecoder.isGif(rec.media)) GifDecoder.decode(rec.media)
         else if (JpegDecoder.isJpeg(rec.media)) JpegDecoder.decode(rec.media)
         else PngDecoder.decode(rec.media)) match {
          case Some(r) if r.width > 0 && r.height > 0 =>
            val sr = Array.ofDim[Long](grid * grid)
            val sg = Array.ofDim[Long](grid * grid)
            val sb = Array.ofDim[Long](grid * grid)
            val np = Array.ofDim[Long](grid * grid)
            // boundaries: tile t covers [t*W/G, (t+1)*W/G) — integer
            // division, so edge tiles absorb remainders and the
            // partition replays exactly in any engine
            val xb = Array.tabulate(grid + 1)(t => t * r.width / grid)
            val yb = Array.tabulate(grid + 1)(t => t * r.height / grid)
            var ty = 0
            while (ty < grid) {
              var yy = yb(ty)
              while (yy < yb(ty + 1)) {
                var tx = 0
                while (tx < grid) {
                  val ti = ty * grid + tx
                  var xx = xb(tx)
                  while (xx < xb(tx + 1)) {
                    val px = yy * r.width + xx
                    sr(ti) += r.rgba(4 * px) & 0xFF
                    sg(ti) += r.rgba(4 * px + 1) & 0xFF
                    sb(ti) += r.rgba(4 * px + 2) & 0xFF
                    np(ti) += 1
                    xx += 1
                  }
                  tx += 1
                }
                yy += 1
              }
              ty += 1
            }
            (0 until grid * grid).iterator
              .filter(ti => np(ti) > 0)
              .map { ti =>
                (rec.doc_id, Some(ti % grid), Some(ti / grid),
                  Some(np(ti)), Some(sr(ti)), Some(sg(ti)), Some(sb(ti)))
              }.toSeq
          case _ =>
            Seq((rec.doc_id, None: Option[Int], None: Option[Int],
              None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long]))
        }
      }
    }.toDF("doc_id", "tile_x", "tile_y", "n_px", "sum_r", "sum_g", "sum_b")
  }

  /** Difference hash (dHash) over decoded pixels — the image
    * NEAR-DEDUP fingerprint: downscale to a 9×8 brightness grid
    * (integer-division tile boundaries, exact per-tile channel sums)
    * and emit one bit per horizontally-adjacent tile pair
    * (left-to-right brightness gradient sign), 8×8 = 64 bits. The
    * standard perceptual hash: shifts in absolute brightness/contrast
    * (re-encode, watermark-free brighten) preserve gradient SIGNS, so
    * near-dups land at small Hamming distance — pair with
    * [[graft.operators.Dedup.hammingPairs64]]'s banded join for the
    * scale path.
    *
    * Exactness: tile means are never computed — the gradient compare
    * cross-multiplies exact integer sums (mean_b > mean_a ⟺
    * s_b·n_a > s_a·n_b), so the hash is deterministic in any engine.
    * Brightness is the unweighted r+g+b sum (fractional luma weights
    * would break integer exactness; for grayscale they coincide).
    * Bit (tx, ty) of the result is `1L << (ty*8 + tx)` set when tile
    * (tx+1, ty) is strictly brighter than tile (tx, ty). Images
    * smaller than the 9×8 grid (or corrupt) yield null.
    */
  def dHash64(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        (if (GifDecoder.isGif(rec.media)) GifDecoder.decode(rec.media)
         else if (JpegDecoder.isJpeg(rec.media)) JpegDecoder.decode(rec.media)
         else PngDecoder.decode(rec.media)) match {
          case Some(r) if r.width >= 9 && r.height >= 8 =>
            val xb = Array.tabulate(10)(t => t * r.width / 9)
            val yb = Array.tabulate(9)(t => t * r.height / 8)
            val s = Array.ofDim[Long](9 * 8)
            val n = Array.ofDim[Long](9 * 8)
            var ty = 0
            while (ty < 8) {
              var yy = yb(ty)
              while (yy < yb(ty + 1)) {
                var tx = 0
                while (tx < 9) {
                  val ti = ty * 9 + tx
                  var xx = xb(tx)
                  while (xx < xb(tx + 1)) {
                    val px = yy * r.width + xx
                    s(ti) += (r.rgba(4 * px) & 0xFF) +
                      (r.rgba(4 * px + 1) & 0xFF) +
                      (r.rgba(4 * px + 2) & 0xFF)
                    n(ti) += 1
                    xx += 1
                  }
                  tx += 1
                }
                yy += 1
              }
              ty += 1
            }
            var h = 0L
            var b = 0
            while (b < 64) {
              val tx = b % 8
              val tyy = b / 8
              val ia = tyy * 9 + tx
              val ib = tyy * 9 + tx + 1
              if (BigInt(s(ib)) * n(ia) > BigInt(s(ia)) * n(ib))
                h |= 1L << b
              b += 1
            }
            (rec.doc_id, Some(h))
          case _ => (rec.doc_id, None: Option[Long])
        }
      }
    }.toDF("doc_id", "dhash")
  }

  /** Video-style FRAME SAMPLING over animated GIFs: decode every
    * `everyK`-th composited frame (up to `maxFrames`) and emit one
    * stats row per sampled frame — the "frame-sample" verb of the
    * multimodal mandate on a format this engine decodes for real.
    * Decoding stops once the sample is full, so per-record cost is
    * bounded by the sampled prefix. Non-GIF/corrupt records emit a
    * single null-stats row; exact integer channel sums over the
    * COMPOSITED canvas (only opaque pixels contribute; n_opaque
    * reports the composited coverage).
    *
    * Output: (doc_id, frame_idx, delay_cs, px_w, px_h, n_opaque,
    * sum_r, sum_g, sum_b).
    */
  def sampleGifFrames(
      ds: Dataset[MediaRecord],
      everyK: Int = 1,
      maxFrames: Int = 8): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        GifDecoder.decodeFrames(rec.media, everyK, maxFrames) match {
          case Some(frames) =>
            frames.map { f =>
              var sr = 0L; var sg = 0L; var sb = 0L; var nOp = 0L
              val n = f.raster.width * f.raster.height
              var px = 0
              while (px < n) {
                if (f.raster.rgba(4 * px + 3) != 0) {
                  nOp += 1
                  sr += f.raster.rgba(4 * px) & 0xFF
                  sg += f.raster.rgba(4 * px + 1) & 0xFF
                  sb += f.raster.rgba(4 * px + 2) & 0xFF
                }
                px += 1
              }
              (rec.doc_id, Some(f.index), Some(f.delayCs),
                Some(f.raster.width), Some(f.raster.height), Some(nOp),
                Some(sr), Some(sg), Some(sb))
            }
          case None =>
            Seq((rec.doc_id, None: Option[Int], None: Option[Int],
              None: Option[Int], None: Option[Int], None: Option[Long],
              None: Option[Long], None: Option[Long], None: Option[Long]))
        }
      }
    }.toDF("doc_id", "frame_idx", "delay_cs", "px_w", "px_h", "n_opaque",
      "sum_r", "sum_g", "sum_b")
  }

  /** MP4 keyframe sampling, codec-free — the video face of the
    * frame-sample verb ([[sampleGifFrames]] is the pixel-decode
    * face): per record, walk the ISO-BMFF sample tables
    * ([[Mp4.keyframes]]) and emit one row per KEPT keyframe with its
    * exact presentation time and `mdat` byte range — the index a
    * downstream decode stage slices on, derived without touching a
    * video codec. Non-MP4/corrupt/table-inconsistent records keep
    * their id with null fields (the schema is total). Same
    * per-partition typed pass as [[decodePixelStats]].
    *
    * Output: (doc_id, frame_idx, sample_no, ts_ms, byte_offset,
    * byte_size) — all exact integers.
    */
  def sampleMp4Keyframes(
      ds: Dataset[MediaRecord],
      everyK: Int = 1,
      maxFrames: Int = 8): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        Mp4.keyframes(rec.media, everyK, maxFrames) match {
          case Some(kfs) =>
            kfs.map(f => (rec.doc_id, Some(f.index), Some(f.sampleNo),
              Some(f.tsMs), Some(f.byteOffset), Some(f.byteSize)))
          case None =>
            Seq((rec.doc_id, None: Option[Int], None: Option[Int],
              None: Option[Long], None: Option[Long], None: Option[Long]))
        }
      }
    }.toDF("doc_id", "frame_idx", "sample_no", "ts_ms", "byte_offset",
      "byte_size")
  }

  /** Horizontal mirror — exact pixel permutation. */
  def flipH(r: PngRaster): PngRaster = {
    val out = new Array[Byte](r.rgba.length)
    var y = 0
    while (y < r.height) {
      var x = 0
      while (x < r.width) {
        System.arraycopy(r.rgba, 4 * (y * r.width + x),
          out, 4 * (y * r.width + (r.width - 1 - x)), 4)
        x += 1
      }
      y += 1
    }
    PngRaster(r.width, r.height, out)
  }

  /** Vertical mirror — exact row permutation. */
  def flipV(r: PngRaster): PngRaster = {
    val out = new Array[Byte](r.rgba.length)
    var y = 0
    while (y < r.height) {
      System.arraycopy(r.rgba, 4 * y * r.width,
        out, 4 * (r.height - 1 - y) * r.width, 4 * r.width)
      y += 1
    }
    PngRaster(r.width, r.height, out)
  }

  /** Rectangular crop; None when the box exceeds the image — with a
    * fixed box over a variable-size corpus, too-small images DECLINE
    * rather than silently clamp (a clamped crop is a different
    * augmentation than the one asked for).
    */
  def crop(r: PngRaster, x: Int, y: Int, w: Int, h: Int): Option[PngRaster] = {
    if (x < 0 || y < 0 || w < 1 || h < 1 ||
      x + w > r.width || y + h > r.height) return None
    val out = new Array[Byte](4 * w * h)
    var row = 0
    while (row < h) {
      System.arraycopy(r.rgba, 4 * ((y + row) * r.width + x),
        out, 4 * row * w, 4 * w)
      row += 1
    }
    Some(PngRaster(w, h, out))
  }

  /** Image augmentation at record grain — the vision-training
    * preprocessing pair (flip + crop) with exact integer evidence:
    * decode (PNG/GIF/JPEG by magic), optionally mirror, optionally
    * crop a fixed box, and emit output dims + exact per-channel sums.
    * Flips are pixel permutations (whole-image sums invariant), so
    * an OFF-CENTER crop is what makes the gate flip-sensitive: the
    * left-crop of a mirrored image must equal the mirrored right-crop
    * of the original. Corrupt files and too-small-for-the-box images
    * emit one all-null row each.
    */
  def augmentPixelStats(
      ds: Dataset[MediaRecord],
      flipHorizontal: Boolean = false,
      flipVertical: Boolean = false,
      cropBox: Option[(Int, Int, Int, Int)] = None): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val decoded =
          if (GifDecoder.isGif(rec.media)) GifDecoder.decode(rec.media)
          else if (JpegDecoder.isJpeg(rec.media)) JpegDecoder.decode(rec.media)
          else PngDecoder.decode(rec.media)
        val transformed = decoded
          .map(r => if (flipHorizontal) flipH(r) else r)
          .map(r => if (flipVertical) flipV(r) else r)
          .flatMap(r => cropBox.fold(Option(r)) { case (x, y, w, h) =>
            crop(r, x, y, w, h)
          })
        transformed match {
          case Some(r) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var px = 0
            val n = r.width * r.height
            while (px < n) {
              sr += r.rgba(4 * px) & 0xFF
              sg += r.rgba(4 * px + 1) & 0xFF
              sb += r.rgba(4 * px + 2) & 0xFF
              px += 1
            }
            (rec.doc_id, Some(r.width), Some(r.height), Some(sr),
              Some(sg), Some(sb))
          case None =>
            (rec.doc_id, None: Option[Int], None: Option[Int],
              None: Option[Long], None: Option[Long], None: Option[Long])
        }
      }
    }.toDF("doc_id", "out_w", "out_h", "sum_r", "sum_g", "sum_b")
  }

  /** Nearest-neighbor raster resize: src pixel = floor(dst·src/out) —
    * pure integer index arithmetic, so resized fixtures stay
    * analytically exact (the resize verb of the multimodal mandate).
    * For real downscales prefer [[resizeBilinear]] — nearest aliases
    * badly; both sit behind [[resizePixelStats]]'s `filter` knob.
    */
  def resizeNearest(r: PngRaster, outW: Int, outH: Int): PngRaster = {
    require(outW > 0 && outH > 0, "output dims must be positive")
    val out = new Array[Byte](4 * outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * r.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * r.width / outW
        System.arraycopy(r.rgba, 4 * (sy * r.width + sx),
          out, 4 * (y * outW + x), 4)
        x += 1
      }
      y += 1
    }
    PngRaster(outW, outH, out)
  }

  /** Bilinear raster resize in PURE INTEGER fixed-point — no floats,
    * so the result is bit-identical on every platform and an oracle
    * can re-derive it. Half-pixel-center convention (the standard
    * `align_corners=false`): source coordinate of output x is
    * sx = (x+0.5)·srcW/outW − 0.5, carried exactly as the rational
    * ((2x+1)·srcW − outW) / (2·outW); edges clamp. Each channel is
    * the weight-denominator-exact 4-tap blend, rounded half-up:
    * ((Dy−ry)((D−rx)p00 + rx·p01) + ry((D−rx)p10 + rx·p11) + DDy/2)
    * / (D·Dy) with D = 2·outW, Dy = 2·outH. Uniform regions are
    * EXACT under the kernel (equal taps blend to themselves), which
    * is what makes flat-tile fixtures analytic; gradients get the
    * proper anti-aliased blend [[resizeNearest]] lacks.
    */
  def resizeBilinear(r: PngRaster, outW: Int, outH: Int): PngRaster = {
    require(outW > 0 && outH > 0, "output dims must be positive")
    val dX = 2L * outW
    val dY = 2L * outH
    val half = dX * dY / 2
    val out = new Array[Byte](4 * outW * outH)
    // per-axis taps: x0(clamped), x1(clamped), rx in [0, D)
    val x0s = new Array[Int](outW); val x1s = new Array[Int](outW)
    val rxs = new Array[Long](outW)
    var x = 0
    while (x < outW) {
      val num = (2L * x + 1) * r.width - outW
      if (num <= 0) { x0s(x) = 0; x1s(x) = 0; rxs(x) = 0L }
      else {
        var x0 = (num / dX).toInt
        var rx = num % dX
        if (x0 >= r.width - 1) { x0 = r.width - 1; rx = 0L }
        x0s(x) = x0; x1s(x) = math.min(x0 + 1, r.width - 1); rxs(x) = rx
      }
      x += 1
    }
    var y = 0
    while (y < outH) {
      val numY = (2L * y + 1) * r.height - outH
      var y0 = 0; var ry = 0L
      if (numY > 0) {
        y0 = (numY / dY).toInt
        ry = numY % dY
        if (y0 >= r.height - 1) { y0 = r.height - 1; ry = 0L }
      }
      val y1 = math.min(y0 + 1, r.height - 1)
      var xi = 0
      while (xi < outW) {
        val x0 = x0s(xi); val x1 = x1s(xi); val rx = rxs(xi)
        val i00 = 4 * (y0 * r.width + x0); val i01 = 4 * (y0 * r.width + x1)
        val i10 = 4 * (y1 * r.width + x0); val i11 = 4 * (y1 * r.width + x1)
        val o = 4 * (y * outW + xi)
        var c = 0
        while (c < 4) {
          val top = (dX - rx) * (r.rgba(i00 + c) & 0xFF) +
            rx * (r.rgba(i01 + c) & 0xFF)
          val bot = (dX - rx) * (r.rgba(i10 + c) & 0xFF) +
            rx * (r.rgba(i11 + c) & 0xFF)
          out(o + c) = (((dY - ry) * top + ry * bot + half) / (dX * dY)).toByte
          c += 1
        }
        xi += 1
      }
      y += 1
    }
    PngRaster(outW, outH, out)
  }

  /** Resize filter selector for [[resizePixelStats]]. */
  sealed trait ResizeFilter
  case object Nearest extends ResizeFilter
  case object Bilinear extends ResizeFilter

  /** Decode (PNG/GIF/JPEG — same dispatch as [[decodePixelStats]]),
    * resize to (outW, outH) with the chosen `filter` (default
    * nearest-neighbor; [[Bilinear]] for the anti-aliased thumbnail
    * path), and emit the resized image's exact pixel statistics.
    * Output: (doc_id, px_w, px_h, n_px, sum_r, sum_g, sum_b).
    */
  def resizePixelStats(
      ds: Dataset[MediaRecord],
      outW: Int,
      outH: Int,
      filter: ResizeFilter = Nearest): DataFrame = {
    import ds.sparkSession.implicits._
    val resize: (PngRaster, Int, Int) => PngRaster = filter match {
      case Nearest  => resizeNearest
      case Bilinear => resizeBilinear
    }
    ds.mapPartitions { it =>
      it.map { rec =>
        (if (GifDecoder.isGif(rec.media)) GifDecoder.decode(rec.media)
         else if (JpegDecoder.isJpeg(rec.media)) JpegDecoder.decode(rec.media)
         else PngDecoder.decode(rec.media)).map(resize(_, outW, outH))
        match {
          case Some(r) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var px = 0
            val n = r.width * r.height
            while (px < n) {
              sr += r.rgba(4 * px) & 0xFF
              sg += r.rgba(4 * px + 1) & 0xFF
              sb += r.rgba(4 * px + 2) & 0xFF
              px += 1
            }
            (rec.doc_id, Some(r.width), Some(r.height), Some(n.toLong),
              Some(sr), Some(sg), Some(sb))
          case None =>
            (rec.doc_id, None: Option[Int], None: Option[Int],
              None: Option[Long], None: Option[Long], None: Option[Long],
              None: Option[Long])
        }
      }
    }.toDF("doc_id", "px_w", "px_h", "n_px", "sum_r", "sum_g", "sum_b")
  }

  /** Typed-pass dimension dispatch for formats the codegen'd header
    * Columns don't cover: JPEG gets the real marker scan; everything
    * else reports unknown dimensions.
    */
  private def decodeDimensions(media: Array[Byte]): (Option[Int], Option[Int]) =
    if (media.length >= 2 && (media(0) & 0xFF) == 0xFF &&
      (media(1) & 0xFF) == 0xD8) decodeJpegDims(media)
    else decodeDimensionsUnknown(media)

  /** The deterministic byte-level feature expressions — exactly the
    * codegen'd `length`/`hex(substring)`/`sha2` built-ins, shared by
    * [[deterministicFeatures]] and [[extractFeatures]] so the two can
    * never drift.
    */
  private val featureColumns = Seq(
    length(col("media")).cast("long").as("byte_len"),
    upper(hex(substring(col("media"), 1, 4))).as("header_hex"),
    sha2(col("media"), 256).as("content_sha"))

  /** Deterministic byte-level features as pure Column expressions:
    * whole-stage codegen, no typed pass, no per-record MessageDigest
    * allocation.
    */
  def deterministicFeatures(df: DataFrame): DataFrame =
    df.select(col("doc_id") +: featureColumns: _*)

  /** Full feature extraction: deterministic features AND the PNG/GIF
    * dimension decode via the codegen'd Columns above; ONLY the
    * non-headered-format fallbacks run in the typed per-partition
    * pass, so their cost never taxes the real features.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.toDF()
      .select((col("doc_id") +: featureColumns) ++ Seq(
        mediaWidth(col("media")).as("hdr_w"),
        mediaHeight(col("media")).as("hdr_h"),
        col("media")): _*)
      .as[(Long, Long, String, String, Option[Int], Option[Int], Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, len, hdr, sha, w, h, media) =>
          // the typed decode runs only for non-headered formats (JPEG
          // marker scan, WAV chunk walk, MP4 box walk); a headered
          // file with one malformed field keeps what parsed
          if (isMp4(media)) {
            // dims and duration come from ONE box walk
            val (mw, mh, md) = decodeMp4Meta(media)
            MediaFeatures(id, len, hdr, sha, mw, mh, md)
          } else {
            val (sw, sh) =
              if (w.isDefined || h.isDefined) (None, None)
              else decodeDimensions(media)
            val dur =
              if (isRiffWave(media)) decodeWavDurationMs(media)
              else if (isMp3(media)) decodeMp3DurationMs(media)
              else None
            MediaFeatures(id, len, hdr, sha, w.orElse(sw), h.orElse(sh), dur)
          }
        }
      }
  }
}
