package graft.multimodal

/** MP4 (ISO-BMFF) keyframe sampling — the video extension of the
  * mandate's frame-sample verb: where animated GIF gets full pixel
  * decode ([[GifDecoder.decodeFrames]]), MP4 gets the sample-table
  * walk that locates every keyframe WITHOUT an H.264/H.265 decode —
  * the `stbl` boxes are exactly the index a frame-extraction pipeline
  * ships to its decode stage (sample number, presentation time, byte
  * offset + size inside `mdat`). This is the dominant video-corpus
  * preparation step: a 100 TB video crawl is triaged by keyframe
  * density/spacing and sliced at keyframe byte ranges long before any
  * codec runs.
  *
  * Box walk per ISO/IEC 14496-12 (same bounded-walk discipline as
  * `Multimodal.decodeMp4Meta`): moov → trak → mdia → (mdhd timescale)
  * → minf → stbl → { stss sync-sample numbers, stts decode-time
  * deltas, stsc sample-to-chunk runs, stsz sample sizes, stco/co64
  * chunk offsets }. The FIRST track carrying an stss box wins (audio
  * tracks have no stss). All sizes/counts are validated against the
  * remaining bytes; any inconsistency declines to None — never throw.
  *
  * Timestamps are exact integer arithmetic: decode time of sample n =
  * Σ stts deltas of samples 1..n−1, reported as ts_ms = time·1000 /
  * timescale (integer division). Byte offset of sample n = its
  * chunk's stco offset + Σ sizes of the samples preceding it in that
  * chunk — so planted-fixture oracles can state every output value
  * analytically.
  *
  * Reference behavior anchor: the reference treats object bytes as
  * opaque payloads (amazons3-blueprints download_file.py:60-85); this
  * is engine-side decode per the public ISO-BMFF format.
  */
object Mp4 {

  /** One sampled keyframe: its index among the KEPT keyframes, the
    * 1-based sample number, exact presentation time (ms, integer
    * division), and the byte range inside the file.
    */
  final case class Mp4Keyframe(
      index: Int,
      sampleNo: Int,
      tsMs: Long,
      byteOffset: Long,
      byteSize: Long)

  private val MaxTableEntries = 1 << 20 // 1M samples bounds hostile tables

  /** Sync-sample (keyframe) table walk with GIF-style subsampling:
    * keep every `everyK`-th keyframe up to `maxFrames` kept. None on
    * non-BMFF, truncated, desynced, or table-inconsistent bytes.
    */
  def keyframes(
      media: Array[Byte],
      everyK: Int = 1,
      maxFrames: Int = 64): Option[Seq[Mp4Keyframe]] = try {
    if (media == null || media.length < 12) return None
    if (everyK < 1 || maxFrames < 1) return None
    val n = media.length
    def u8(i: Int): Int = media(i) & 0xFF
    def beU32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def beU64(i: Int): Long = (beU32(i) << 32) | beU32(i + 4)
    def tag(i: Int): String = new String(media.slice(i, i + 4), "US-ASCII")
    if (tag(4) != "ftyp") return None

    // per-trak tables (reset at each trak; kept when the trak has stss)
    var timescale = 0L
    var stss: Array[Int] = null          // sync sample numbers (1-based)
    var sttsRuns: Array[(Long, Long)] = null // (count, delta)
    var stsc: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
    var sizes: Array[Long] = null        // per-sample sizes (expanded)
    var chunkOffsets: Array[Long] = null
    var found = false // first stss-bearing trak wins

    var guard = 0
    def walk(start: Int, end: Int, depth: Int): Boolean = {
      var i = start
      while (i + 8 <= end && guard < 8192) {
        guard += 1
        val size32 = beU32(i)
        val id = tag(i + 4)
        var header = 8
        var size: Long = size32
        if (size32 == 1L) {
          if (i + 16 > end) return false
          size = beU64(i + 8); header = 16
        } else if (size32 == 0L) size = (end - i).toLong
        if (size < header || size > (end - i).toLong) return false
        val payload = i + header
        val pend = i + size.toInt
        id match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            if (depth < 8 && !found && !walk(payload, pend, depth + 1))
              return false
          case "mdhd" if !found && pend - payload >= 20 =>
            val ver = u8(payload)
            if (ver == 0) timescale = beU32(payload + 12)
            else if (ver == 1 && pend - payload >= 32)
              timescale = beU32(payload + 20)
          case "stss" if !found && pend - payload >= 8 =>
            val cnt = beU32(payload + 4)
            if (cnt > MaxTableEntries || payload + 8 + 4 * cnt > pend)
              return false
            stss = Array.tabulate(cnt.toInt)(k =>
              beU32(payload + 8 + 4 * k).toInt)
          case "stts" if !found && pend - payload >= 8 =>
            val cnt = beU32(payload + 4)
            if (cnt > MaxTableEntries || payload + 8 + 8 * cnt > pend)
              return false
            sttsRuns = Array.tabulate(cnt.toInt)(k =>
              (beU32(payload + 8 + 8 * k), beU32(payload + 12 + 8 * k)))
          case "stsc" if !found && pend - payload >= 8 =>
            val cnt = beU32(payload + 4)
            if (cnt > MaxTableEntries || payload + 8 + 12 * cnt > pend)
              return false
            stsc = Array.tabulate(cnt.toInt)(k =>
              (beU32(payload + 8 + 12 * k), beU32(payload + 12 + 12 * k)))
          case "stsz" if !found && pend - payload >= 12 =>
            val fixed = beU32(payload + 4)
            val cnt = beU32(payload + 8)
            if (cnt > MaxTableEntries) return false
            if (fixed != 0L) sizes = Array.fill(cnt.toInt)(fixed)
            else {
              if (payload + 12 + 4 * cnt > pend) return false
              sizes = Array.tabulate(cnt.toInt)(k =>
                beU32(payload + 12 + 4 * k))
            }
          case "stco" if !found && pend - payload >= 8 =>
            val cnt = beU32(payload + 4)
            if (cnt > MaxTableEntries || payload + 8 + 4 * cnt > pend)
              return false
            chunkOffsets = Array.tabulate(cnt.toInt)(k =>
              beU32(payload + 8 + 4 * k))
          case "co64" if !found && pend - payload >= 8 =>
            val cnt = beU32(payload + 4)
            if (cnt > MaxTableEntries || payload + 8 + 8 * cnt > pend)
              return false
            chunkOffsets = Array.tabulate(cnt.toInt)(k =>
              beU64(payload + 8 + 8 * k))
          case _ => ()
        }
        // a trak is complete once its container closes: claim it if
        // it carried an stss (video); otherwise reset for the next
        if (id == "trak" && !found) {
          if (stss != null) found = true
          else {
            timescale = 0L; sttsRuns = null; stsc = null
            sizes = null; chunkOffsets = null
          }
        }
        i = pend
      }
      true
    }
    if (!walk(0, n, 0)) return None
    if (!found || timescale <= 0 || sttsRuns == null || stsc == null ||
      sizes == null || chunkOffsets == null) return None

    val nSamples = sizes.length
    // decode-time of each sample from the stts runs (1-based index)
    val sampleTime = new Array[Long](nSamples + 1)
    var si = 1
    var t = 0L
    var ok = true
    sttsRuns.foreach { case (cnt, delta) =>
      var c = 0L
      while (c < cnt && si <= nSamples) {
        sampleTime(si) = t; t += delta; si += 1; c += 1
      }
      if (cnt < 0 || delta < 0) ok = false
    }
    if (!ok || si <= nSamples) return None // stts must cover all samples
    // chunk index + intra-chunk position per sample from the stsc runs
    val sampleChunk = new Array[Int](nSamples + 1)
    val samplePosInChunk = new Array[Int](nSamples + 1)
    var s = 1
    var run = 0
    var chunk = 1
    while (s <= nSamples && run < stsc.length) {
      val perChunk = stsc(run)._2
      if (perChunk <= 0) return None
      val runEndChunk = // chunks of this run: until the next run starts
        if (run + 1 < stsc.length) stsc(run + 1)._1 else Long.MaxValue
      if (stsc(run)._1 != chunk && chunk < stsc(run)._1) chunk = stsc(run)._1.toInt
      while (s <= nSamples && chunk < runEndChunk) {
        var k = 0
        while (k < perChunk && s <= nSamples) {
          sampleChunk(s) = chunk; samplePosInChunk(s) = k
          s += 1; k += 1
        }
        chunk += 1
      }
      run += 1
    }
    if (s <= nSamples) return None // stsc must cover all samples
    // sample byte offset = chunk offset + sizes of preceding samples
    def offsetOf(sample: Int): Option[Long] = {
      val c = sampleChunk(sample)
      if (c < 1 || c > chunkOffsets.length) return None
      var off = chunkOffsets(c - 1)
      var back = sample - samplePosInChunk(sample)
      while (back < sample) { off += sizes(back - 1); back += 1 }
      Some(off)
    }
    val picked = stss.zipWithIndex
      .collect { case (sn, idx) if idx % everyK == 0 => sn }
      .take(maxFrames)
    val outs = picked.zipWithIndex.map { case (sn, i) =>
      if (sn < 1 || sn > nSamples) return None
      offsetOf(sn) match {
        case Some(off) =>
          Mp4Keyframe(i, sn, sampleTime(sn) * 1000L / timescale,
            off, sizes(sn - 1))
        case None => return None
      }
    }
    Some(outs.toSeq)
  } catch { case _: Throwable => None }

  /** Encoder twin: assemble a minimal-but-spec-shaped MP4 whose
    * sample tables are caller-chosen — the fixture-planting
    * primitive. One video trak (hdlr `vide`, stub stsd), `deltas` per
    * sample in `timescale` units, `sampleSizes` bytes each, packed
    * into chunks of `samplesPerChunk`, keyframes at `syncSamples`
    * (1-based). The mdat payload is deterministic filler; stco
    * offsets are computed so they really point into it.
    */
  def encode(
      timescale: Int,
      deltas: Array[Int],
      sampleSizes: Array[Int],
      samplesPerChunk: Int,
      syncSamples: Array[Int]): Array[Byte] = {
    require(timescale > 0, "timescale must be positive")
    require(deltas.length == sampleSizes.length, "per-sample tables")
    require(samplesPerChunk >= 1, "samplesPerChunk must be >= 1")
    val nSamples = deltas.length
    def flatBox(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length)
      out.put(id.getBytes("US-ASCII"))
      out.put(payload)
      out.array()
    }
    def bytesOf(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      b.toByteArray
    }
    def w16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write((v >> 8) & 0xFF); b.write(v & 0xFF)
    }
    def w32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
      b.write(((v >> 24) & 0xFF).toInt); b.write(((v >> 16) & 0xFF).toInt)
      b.write(((v >> 8) & 0xFF).toInt); b.write((v & 0xFF).toInt)
    }
    val totalDur = deltas.map(_.toLong).sum

    val ftyp = flatBox("ftyp", bytesOf { b =>
      b.write("isom".getBytes("US-ASCII")); w32(b, 0L)
      b.write("isom".getBytes("US-ASCII"))
    })
    val mvhd = flatBox("mvhd", bytesOf { b =>
      w32(b, 0L); w32(b, 0L); w32(b, 0L) // ver/flags, creation, modif
      w32(b, timescale.toLong); w32(b, totalDur)
      w32(b, 0x00010000L); w16(b, 0x0100); w16(b, 0) // rate, volume, rsvd
      w32(b, 0L); w32(b, 0L) // reserved
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(w32(b, _)) // identity matrix
      (0 until 6).foreach(_ => w32(b, 0L)) // pre_defined
      w32(b, 2L) // next track id
    })
    val tkhd = flatBox("tkhd", bytesOf { b =>
      w32(b, 7L); w32(b, 0L); w32(b, 0L) // ver0 + enabled flags
      w32(b, 1L); w32(b, 0L); w32(b, totalDur) // track id, rsvd, duration
      w32(b, 0L); w32(b, 0L) // reserved
      w16(b, 0); w16(b, 0); w16(b, 0); w16(b, 0) // layer, alt, volume, rsvd
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(w32(b, _))
      w32(b, 64L << 16); w32(b, 48L << 16) // 64x48 16.16 fixed
    })
    val mdhd = flatBox("mdhd", bytesOf { b =>
      w32(b, 0L); w32(b, 0L); w32(b, 0L)
      w32(b, timescale.toLong); w32(b, totalDur)
      w16(b, 0x55C4); w16(b, 0) // und language, pre_defined
    })
    val hdlr = flatBox("hdlr", bytesOf { b =>
      w32(b, 0L); w32(b, 0L)
      b.write("vide".getBytes("US-ASCII"))
      w32(b, 0L); w32(b, 0L); w32(b, 0L); b.write(0)
    })
    val stsd = flatBox("stsd", bytesOf { b => w32(b, 0L); w32(b, 0L) })
    val stts = flatBox("stts", bytesOf { b =>
      // run-length encode consecutive equal deltas, the real-file shape
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      deltas.foreach { d =>
        if (runs.nonEmpty && runs.last._2 == d)
          runs(runs.length - 1) = (runs.last._1 + 1, d)
        else runs += ((1, d))
      }
      w32(b, 0L); w32(b, runs.length.toLong)
      runs.foreach { case (c, d) => w32(b, c.toLong); w32(b, d.toLong) }
    })
    val stssB = flatBox("stss", bytesOf { b =>
      w32(b, 0L); w32(b, syncSamples.length.toLong)
      syncSamples.foreach(sn => w32(b, sn.toLong))
    })
    val stsc = flatBox("stsc", bytesOf { b =>
      w32(b, 0L); w32(b, 1L)
      w32(b, 1L); w32(b, samplesPerChunk.toLong); w32(b, 1L)
    })
    val stsz = flatBox("stsz", bytesOf { b =>
      w32(b, 0L); w32(b, 0L); w32(b, nSamples.toLong)
      sampleSizes.foreach(szv => w32(b, szv.toLong))
    })
    val nChunks = (nSamples + samplesPerChunk - 1) / samplesPerChunk
    // chunk byte offsets inside mdat; resolved after moov size is known
    val chunkLens = (0 until nChunks).map { c =>
      (c * samplesPerChunk until math.min((c + 1) * samplesPerChunk, nSamples))
        .map(sampleSizes(_).toLong).sum
    }
    def assemble(stco: Array[Byte]): Array[Byte] = {
      val stbl = flatBox("stbl",
        stsd ++ stts ++ stssB ++ stsc ++ stsz ++ stco)
      val minf = flatBox("minf", stbl)
      val mdia = flatBox("mdia", mdhd ++ hdlr ++ minf)
      val trak = flatBox("trak", tkhd ++ mdia)
      flatBox("moov", mvhd ++ trak)
    }
    // two-pass: stco size is independent of offset VALUES, so sizing
    // with zeros then refilling with real offsets is exact
    val stcoZero = flatBox("stco", bytesOf { b =>
      w32(b, 0L); w32(b, nChunks.toLong)
      (0 until nChunks).foreach(_ => w32(b, 0L))
    })
    val moovLen = assemble(stcoZero).length
    val mdatPayloadStart = ftyp.length + moovLen + 8L
    val offsets = chunkLens.scanLeft(mdatPayloadStart)(_ + _).init
    val stco = flatBox("stco", bytesOf { b =>
      w32(b, 0L); w32(b, nChunks.toLong)
      offsets.foreach(w32(b, _))
    })
    val moov = assemble(stco)
    val mdat = flatBox("mdat",
      Array.tabulate(chunkLens.sum.toInt)(k => (k % 251).toByte))
    ftyp ++ moov ++ mdat
  }
}
