package graft.multimodal

/** WAV (RIFF) PCM sample decode + the encoder twin that plants
  * fixtures — the AUDIO payload decoder next to the pixel decoders
  * ([[PngDecoder]]/[[GifDecoder]]/[[JpegDecoder]]): where
  * `decodeWavDurationMs` only walks chunk headers, this reads the
  * `data` payload and produces per-recording sample statistics.
  *
  * Scope: integer PCM (format 1) at 8/16/24-bit depth, IEEE 32-bit
  * float PCM (format 3 — the other common encoding in ML audio
  * corpora), AND the G.711 companded telephony codecs — A-law
  * (format 6) and µ-law (format 7) at 8 bits/sample, expanded to
  * their exact 13/14-bit linear values by the public ITU G.711
  * segment formulas (table-equivalent; see [[ulawToLinear]]/
  * [[alawToLinear]]) — any channel count/sample rate, extra chunks
  * (LIST, fact) in any order. 8-bit integer PCM is unsigned-centered
  * (sample = byte − 128) per the RIFF spec; 16/24 are little-endian
  * signed. ADPCM, non-32-bit format-3, non-8-bit G.711, and
  * truncated/desynced files decline to None — never throw.
  *
  * All statistics are exact integers (peak |sample|, Σ sample², count
  * at full scale), so planted-fixture oracles hash-match: Σ sample²
  * of 16-bit audio fits a Long up to ~8.6e9 frames (~2 days at 48 kHz)
  * and the decoder guards the payload size far below that. Float
  * samples are QUANTIZED to the 1/32768 grid (sample = rint(f·2¹⁵),
  * IEEE round-half-even — deterministic on every JVM): fixture
  * values that are multiples of 1/32768 are mantissa-exact in
  * float32, so their stats are analytic; clipping = |quantized| ≥
  * 32768 (at-or-beyond full scale on the grid); any non-finite
  * sample (NaN/±Inf) OR any finite sample beyond 2^31 on the grid
  * (65536x full scale — corrupt payload, not audio) declines the
  * whole file, and any Σ sample² that would exceed a Long declines
  * rather than emit inexact statistics.
  *
  * Reference behavior anchor: the reference treats object bytes as
  * opaque payloads (amazons3-blueprints download_file.py:60-85); this
  * is engine-side decode per the public RIFF/WAVE format.
  */
object Wav {

  /** Exact-integer per-recording sample statistics. */
  final case class WavStats(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      frames: Long,
      peakAbs: Long,
      sumSquares: Long,
      clipped: Long)

  /** Exact-integer stats for ONE fixed-length window of frames. */
  final case class WavWindow(
      idx: Int,
      frames: Long,
      peakAbs: Long,
      sumSquares: Long,
      clipped: Long)

  /** Windowed decode result: header fields + per-window stats. */
  final case class WavWindows(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      windows: Seq[WavWindow])

  private val MaxDataBytes = 256 << 20 // same spirit as MaxRgbaBytes

  def isWav(media: Array[Byte]): Boolean =
    media != null && media.length >= 12 &&
      new String(media.slice(0, 4), "US-ASCII") == "RIFF" &&
      new String(media.slice(8, 12), "US-ASCII") == "WAVE"

  /** Decode samples to exact whole-recording statistics — the
    * single-window aggregate of [[decodeWindowStats]] (one pass, same
    * exact-or-decline contract at every format).
    */
  def decodeStats(media: Array[Byte]): Option[WavStats] =
    decodeWindowStats(media, Long.MaxValue).map { w =>
      val frames = w.windows.map(_.frames).sum
      val peak = if (w.windows.isEmpty) 0L else w.windows.map(_.peakAbs).max
      val sumsq = w.windows.map(_.sumSquares).sum
      val clipped = w.windows.map(_.clipped).sum
      WavStats(w.sampleRate, w.channels, w.bitsPerSample,
        frames, peak, sumsq, clipped)
    }

  /** Decode samples to exact PER-WINDOW statistics (windows of
    * `windowFrames` frames, last window partial) — the
    * feature-extract primitive for silence detection / VAD / loudness
    * profiling: window RMS is sqrt(sum_squares/(frames·channels)),
    * one caller-side division away, and a silence gate is a
    * peak-or-energy threshold per window. Same format scope and
    * exact-or-decline contract as [[decodeStats]] (they share this
    * one pass).
    */
  def decodeWindowStats(
      media: Array[Byte],
      windowFrames: Long): Option[WavWindows] = try {
    if (windowFrames < 1) return None
    parsePcm(media) match {
      case None => None
      case Some(pcm) =>
        val out = Seq.newBuilder[WavWindow]
        var peak = 0L
        var sumsq = 0L
        var clipped = 0L
        var wf = 0L
        var widx = 0
        var f = 0L
        var p = pcm.dataAt
        while (f < pcm.frames) {
          var c = 0
          while (c < pcm.channels) {
            val v = pcm.readSample(p)
            val a = math.abs(v)
            if (a > peak) peak = a
            // exact-or-decline: 24-bit full-scale squares times a
            // 256 MiB payload CAN exceed a Long — overflow throws
            // ArithmeticException into the catch-all None instead of
            // emitting wrong statistics
            sumsq = Math.addExact(sumsq, Math.multiplyExact(v, v))
            if (a >= pcm.fullScale) clipped += 1
            p += pcm.bytesPerSample
            c += 1
          }
          f += 1
          wf += 1
          if (wf == windowFrames) {
            out += WavWindow(widx, wf, peak, sumsq, clipped)
            widx += 1
            peak = 0L; sumsq = 0L; clipped = 0L; wf = 0L
          }
        }
        if (wf > 0) out += WavWindow(widx, wf, peak, sumsq, clipped)
        Some(WavWindows(pcm.rate, pcm.channels, pcm.bits, out.result()))
    }
  } catch { case _: Throwable => None }

  /** Parsed RIFF header + a positional per-sample decoder: the ONE
    * kernel behind [[decodeWindowStats]]/[[decodeStats]] and
    * [[decodeSamples]]. `readSample` throws [[WavDecline]] on
    * corrupt sample payloads (NaN/Inf/absurd floats) — callers wrap
    * in the try/catch→None decline.
    */
  private final case class Pcm(
      rate: Int,
      channels: Int,
      bits: Int,
      frames: Long,
      fullScale: Long,
      dataAt: Int,
      bytesPerSample: Int,
      readSample: Int => Long)

  private final class WavDecline extends Exception

  private def parsePcm(media: Array[Byte]): Option[Pcm] = {
    if (!isWav(media)) return None
    def u8(i: Int): Int = media(i) & 0xFF
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def leU32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
        (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(media.slice(i, i + 4), "US-ASCII")
    val n = media.length
    var i = 12
    var fmt = -1
    var channels = 0
    var rate = 0
    var bits = 0
    var dataAt = -1
    var dataLen = 0L
    var guard = 0
    while (i + 8 <= n && guard < 4096 && (fmt < 0 || dataAt < 0)) {
      guard += 1
      val id = tag(i)
      val size = leU32(i + 4)
      if (size > n - i - 8) return None // truncated/hostile size field
      if (id == "fmt " && size >= 16) {
        fmt = leU16(i + 8)
        channels = leU16(i + 10)
        rate = leU32(i + 12).toInt
        bits = leU16(i + 22)
      }
      if (id == "data") { dataAt = i + 8; dataLen = size }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (dataAt < 0) return None
    val isFloat = fmt == 3
    val isAlaw = fmt == 6
    val isUlaw = fmt == 7
    if (!isFloat && !isAlaw && !isUlaw && fmt != 1) {
      return None // ADPCM and other formats declined
    }
    if (channels < 1 || channels > 64 || rate <= 0) return None
    if (isFloat && bits != 32) return None // float PCM is 32-bit only
    if ((isAlaw || isUlaw) && bits != 8) return None // G.711 is 8-bit
    if (fmt == 1 && bits != 8 && bits != 16 && bits != 24) return None
    if (dataLen > MaxDataBytes) return None
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * channels
    val frames = dataLen / frameBytes // trailing partial frame ignored
    // int: 127 / 32767 / 8388607; float: full scale on the 2^15 grid;
    // G.711 expands to 13/14-bit linear — full scale is each codec's
    // maximum decode magnitude (A-law 32256, µ-law 32124)
    val fullScale =
      if (isFloat) 32768L
      else if (isAlaw) 32256L
      else if (isUlaw) 32124L
      else (1L << (bits - 1)) - 1
    val readSample: Int => Long =
      if (isFloat) { p =>
        val fl = java.lang.Float.intBitsToFloat(leU32(p).toInt)
        if (!java.lang.Float.isFinite(fl)) throw new WavDecline // NaN/Inf
        val q = math.rint(fl.toDouble * 32768.0)
        // finite-but-absurd payloads (e.g. 1e30) would silently
        // saturate toLong and overflow the exact sums: any sample
        // beyond 2^31 on the grid (65536x full scale) is corrupt,
        // not audio — decline the file like NaN/Inf does
        if (math.abs(q) > (1L << 31).toDouble) throw new WavDecline
        q.toLong
      }
      else if (isUlaw) p => ulawToLinear(u8(p)).toLong
      else if (isAlaw) p => alawToLinear(u8(p)).toLong
      else bits match {
        case 8 => p => (u8(p) - 128).toLong
        case 16 => p => leU16(p).toShort.toLong
        case _ => p => // 24-bit LE signed: sign-extend via <<8 then >>8
          (((u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16)) << 8) >> 8).toLong
      }
    Some(Pcm(rate, channels, bits, frames, fullScale, dataAt,
      bytesPerSample, readSample))
  }

  /** Decoded interleaved samples (exact linear values, the same
    * decode as [[decodeStats]]).
    */
  final case class WavPcm(
      sampleRate: Int,
      channels: Int,
      bits: Int,
      samples: Array[Long])

  /** Decode the raw sample stream — the input of DSP verbs like
    * [[resampleLinear]]. Bounded by `maxFrames` (whole-file refusal,
    * not truncation: a partial sample dump is not "the samples").
    * Same format scope and exact-or-decline contract as
    * [[decodeStats]]; they share [[parsePcm]].
    */
  def decodeSamples(
      media: Array[Byte],
      maxFrames: Long = 1L << 22): Option[WavPcm] = try {
    parsePcm(media) match {
      case None => None
      case Some(pcm) =>
        if (pcm.frames > maxFrames) return None
        val total = (pcm.frames * pcm.channels).toInt
        val out = new Array[Long](total)
        var k = 0
        var p = pcm.dataAt
        while (k < total) {
          out(k) = pcm.readSample(p)
          p += pcm.bytesPerSample
          k += 1
        }
        Some(WavPcm(pcm.rate, pcm.channels, pcm.bits, out))
    }
  } catch { case _: Throwable => None }

  /** Exact linear resample of interleaved PCM: output frame j sits at
    * source position j·src/dst (a rational); with i = ⌊j·src/dst⌋ and
    * r = (j·src) mod dst, each channel's value is the EXACT integer
    * numerator `s[i]·(dst−r) + s[i+1]·r` over the constant
    * denominator dst — no float ever, so resampled fixtures stay
    * analytically exact cross-engine (the caller divides by `denom`
    * when it wants the value). Output frames: ⌊(frames−1)·dst/src⌋+1
    * (every position that does not read past the last source frame).
    */
  def resampleLinear(
      pcm: WavPcm,
      dstRate: Int): (Array[Long], Long) = {
    require(dstRate > 0, s"dstRate $dstRate <= 0")
    val src = pcm.sampleRate.toLong
    val dst = dstRate.toLong
    val ch = pcm.channels
    val frames = pcm.samples.length / ch
    if (frames == 0) return (Array.emptyLongArray, dst)
    val outFrames = ((frames - 1) * dst / src + 1).toInt
    val out = new Array[Long]((outFrames * ch).toInt)
    var j = 0
    while (j < outFrames) {
      val num = j * src
      val i = (num / dst).toInt
      val r = num % dst
      var c = 0
      while (c < ch) {
        val a = pcm.samples(i * ch + c)
        out(j * ch + c) =
          if (r == 0L) a * dst
          else a * (dst - r) + pcm.samples((i + 1) * ch + c) * r
        c += 1
      }
      j += 1
    }
    (out, dst)
  }

  /** µ-law byte → exact 14-bit linear value, the public ITU G.711 /
    * classic Sun `g711.c` expansion: complement the byte, then
    * ((mantissa·8 + 0x84) << exponent) − 0x84, sign from bit 7.
    * Range ±32124; byte 0xFF (and its negative twin 0x7F) is 0.
    */
  def ulawToLinear(b: Int): Int = {
    val u = ~b & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → exact 13-bit linear value (ITU G.711): XOR 0x55,
    * then segment 0 is mantissa·16 + 8, segments 1-7 are
    * (mantissa·16 + 0x108) << (segment−1); bit 7 SET means positive.
    * Range ±32256; A-law has no zero (minimum magnitude 8).
    */
  def alawToLinear(b: Int): Int = {
    val a = b ^ 0x55
    val seg = (a & 0x70) >> 4
    val t =
      if (seg == 0) ((a & 0x0F) << 4) + 8
      else (((a & 0x0F) << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** Linear → µ-law compander (the inverse of [[ulawToLinear]]):
    * clip to 32635, bias by 0x84, segment = MSB position − 7,
    * mantissa = the next 4 bits, complement the byte. Codec identity
    * holds on every codeword except 0x7F (negative zero re-encodes as
    * positive zero 0xFF — standard).
    */
  def linearToUlaw(sample: Int): Int = {
    val sign = if (sample < 0) 0x80 else 0
    val m = math.min(math.abs(sample), 32635) + 0x84
    var exp = 7
    while (exp > 0 && m < (0x80 << exp)) exp -= 1
    val man = (m >> (exp + 3)) & 0x0F
    (~(sign | (exp << 4) | man)) & 0xFF
  }

  /** Linear → A-law compander (the inverse of [[alawToLinear]]):
    * segment 0 below 256 (step 16), else segment = MSB position − 7,
    * XOR 0x55; bit 7 SET means positive. Codec identity holds on all
    * 256 codewords; linear 0 encodes to +8's codeword (A-law has no
    * zero).
    */
  def linearToAlaw(sample: Int): Int = {
    val signBit = if (sample >= 0) 0x80 else 0
    val m = math.min(math.abs(sample), 32767)
    var seg = 0
    while (seg < 7 && m >= (0x100 << seg)) seg += 1
    val man =
      if (seg == 0) (m >> 4) & 0x0F
      else (m >> (seg + 3)) & 0x0F
    (signBit | (seg << 4) | man) ^ 0x55
  }

  /** Encoder twin for the G.711 companded codecs: raw companded bytes
    * (0..255) -> a WAV file with format tag 6 (A-law) or 7 (µ-law),
    * 8 bits/sample, and the spec-mandated `fact` chunk non-PCM
    * formats carry (the fixture-planting primitive — expected linear
    * statistics are analytic via [[ulawToLinear]]/[[alawToLinear]]).
    */
  def encodeG711(
      sampleRate: Int,
      channels: Int,
      aLaw: Boolean,
      companded: Array[Int]): Array[Byte] = {
    require(channels >= 1 && sampleRate > 0, "bad rate/channels")
    require(companded.length % channels == 0, "partial frame")
    require(companded.forall(v => v >= 0 && v <= 255), "byte range")
    val dataLen = companded.length
    val out = new java.io.ByteArrayOutputStream(58 + dataLen)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    ascii("RIFF"); le32(50L + dataLen + (dataLen & 1)); ascii("WAVE")
    ascii("fmt "); le32(18L) // non-PCM fmt carries cbSize=0
    le16(if (aLaw) 6 else 7); le16(channels); le32(sampleRate.toLong)
    le32(sampleRate.toLong * channels) // byte rate (1 byte/sample)
    le16(channels); le16(8); le16(0) // block align, bits, cbSize
    ascii("fact"); le32(4L); le32(companded.length.toLong / channels)
    ascii("data"); le32(dataLen.toLong)
    companded.foreach(out.write)
    if ((dataLen & 1) == 1) out.write(0) // word alignment pad
    out.toByteArray
  }

  /** Encoder twin: interleaved integer samples -> a WAV file (the
    * fixture-planting primitive). `samples` length must be a multiple
    * of `channels`; values must fit the bit depth.
    */
  def encode(
      sampleRate: Int,
      channels: Int,
      bits: Int,
      samples: Array[Int]): Array[Byte] = {
    require(channels >= 1 && sampleRate > 0, "bad rate/channels")
    require(bits == 8 || bits == 16 || bits == 24, "bits must be 8/16/24")
    require(samples.length % channels == 0, "partial frame")
    val lim = 1 << (bits - 1)
    require(samples.forall(v => v >= -lim && v < lim), "sample overflow")
    val bytesPerSample = bits / 8
    val dataLen = samples.length * bytesPerSample
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    ascii("RIFF"); le32(36L + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16L)
    le16(1); le16(channels); le32(sampleRate.toLong)
    le32(sampleRate.toLong * channels * bytesPerSample) // byte rate
    le16(channels * bytesPerSample); le16(bits)
    ascii("data"); le32(dataLen.toLong)
    samples.foreach { v =>
      val enc = if (bits == 8) v + 128 else v
      var b = 0
      while (b < bytesPerSample) { out.write((enc >> (8 * b)) & 0xFF); b += 1 }
    }
    if ((dataLen & 1) == 1) out.write(0) // word alignment pad
    out.toByteArray
  }

  /** Encoder twin for IEEE 32-bit float PCM (format 3): interleaved
    * float samples -> a WAV file with the spec-mandated `fact` chunk
    * (sample-frame count) non-PCM formats carry. Values are written
    * verbatim — plant multiples of 1/32768 for mantissa-exact
    * [[decodeStats]] fixtures.
    */
  def encodeFloat(
      sampleRate: Int,
      channels: Int,
      samples: Array[Float]): Array[Byte] = {
    require(channels >= 1 && sampleRate > 0, "bad rate/channels")
    require(samples.length % channels == 0, "partial frame")
    val dataLen = samples.length * 4
    val out = new java.io.ByteArrayOutputStream(58 + dataLen)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    ascii("RIFF"); le32(50L + dataLen); ascii("WAVE")
    ascii("fmt "); le32(18L) // format 3 carries cbSize=0
    le16(3); le16(channels); le32(sampleRate.toLong)
    le32(sampleRate.toLong * channels * 4) // byte rate
    le16(channels * 4); le16(32); le16(0) // block align, bits, cbSize
    ascii("fact"); le32(4L); le32(samples.length.toLong / channels)
    ascii("data"); le32(dataLen.toLong)
    samples.foreach { f =>
      le32(java.lang.Float.floatToIntBits(f).toLong & 0xFFFFFFFFL)
    }
    out.toByteArray
  }
}
