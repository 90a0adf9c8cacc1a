package graft.multimodal

import graft.SparkTestBase

class WavSpec extends SparkTestBase {

  test("encode/decode round-trip: exact stats at all depths (fuzz)") {
    val rnd = new scala.util.Random(211)
    for (trial <- 0 until 60) {
      val bits = Seq(8, 16, 24)(rnd.nextInt(3))
      val channels = 1 + rnd.nextInt(3)
      val frames = 1 + rnd.nextInt(200)
      val lim = 1 << (bits - 1)
      val samples = Array.fill(frames * channels)(rnd.nextInt(2 * lim) - lim)
      val wav = Wav.encode(8000 + rnd.nextInt(40000), channels, bits, samples)
      val st = Wav.decodeStats(wav)
      assert(st.isDefined, s"trial $trial declined")
      val s = st.get
      assert(s.frames == frames && s.channels == channels &&
        s.bitsPerSample == bits)
      assert(s.peakAbs == samples.map(v => math.abs(v.toLong)).max)
      assert(s.sumSquares == samples.map(v => v.toLong * v).sum)
      val full = (1L << (bits - 1)) - 1
      assert(s.clipped == samples.count(v => math.abs(v.toLong) >= full))
    }
  }

  test("float PCM: grid-exact stats, clipping, NaN/Inf declines") {
    // multiples of 1/32768 are float32-mantissa-exact -> analytic
    val f = Wav.encodeFloat(22050, 2,
      Array(0.5f, -0.25f, 1.0f, -1.0f, 12f / 32768f, 2.0f))
    val st = Wav.decodeStats(f)
    assert(st.isDefined)
    val s = st.get
    assert(s.sampleRate == 22050 && s.channels == 2 &&
      s.bitsPerSample == 32 && s.frames == 3)
    assert(s.peakAbs == 65536L) // 2.0 is over-range but finite: kept
    assert(s.sumSquares ==
      16384L * 16384 + 8192L * 8192 + 32768L * 32768 + 32768L * 32768 +
        12L * 12 + 65536L * 65536)
    assert(s.clipped == 3) // 1.0, -1.0, 2.0 at/beyond full scale
    // round-half-even on the grid midpoint: 1.5/32768 -> 2 (even)
    val mid = Wav.decodeStats(Wav.encodeFloat(8000, 1,
      Array(1.5f / 32768f, 2.5f / 32768f)))
    assert(mid.get.sumSquares == 2L * 2 + 2L * 2, s"got ${mid.get}")
    // NaN / Inf anywhere declines the whole file
    assert(Wav.decodeStats(
      Wav.encodeFloat(8000, 1, Array(0.5f, Float.NaN))).isEmpty)
    assert(Wav.decodeStats(
      Wav.encodeFloat(8000, 1, Array(Float.PositiveInfinity))).isEmpty)
    // finite-but-absurd magnitudes decline too: 1e30 saturates the
    // Long grid; 1e5 (3.3e9 on the grid) squares past a Long — both
    // must decline rather than emit overflowed statistics
    assert(Wav.decodeStats(
      Wav.encodeFloat(8000, 1, Array(0.5f, 1e30f))).isEmpty)
    assert(Wav.decodeStats(
      Wav.encodeFloat(8000, 1, Array(1e5f))).isEmpty)
    // the largest in-bound magnitude still decodes exactly
    val big = Wav.decodeStats(Wav.encodeFloat(8000, 1, Array(65536f)))
    assert(big.get.peakAbs == (1L << 31) &&
      big.get.sumSquares == (1L << 31) * (1L << 31))
    // truncation / bit flips never throw
    for (cut <- 0 until f.length) Wav.decodeStats(f.take(cut)): Unit
    val rnd = new scala.util.Random(97)
    for (_ <- 0 until 2000) {
      val flip = f.clone()
      flip(rnd.nextInt(flip.length)) =
        (flip(rnd.nextInt(flip.length)) ^ (1 << rnd.nextInt(8))).toByte
      Wav.decodeStats(flip): Unit
    }
  }

  test("declines: 16-bit format-3, non-WAV, bad depth, truncation, bit flips") {
    val wav = Wav.encode(8000, 1, 16, Array(1, 2, 3, 4))
    assert(Wav.decodeStats(wav).isDefined)
    val fl = wav.clone(); fl(20) = 3 // format 3 at 16-bit: not float PCM
    assert(Wav.decodeStats(fl).isEmpty)
    val bd = wav.clone(); bd(34) = 12 // bitsPerSample -> 12
    assert(Wav.decodeStats(bd).isEmpty)
    assert(Wav.decodeStats("nope".getBytes).isEmpty)
    for (cut <- 0 until wav.length)
      Wav.decodeStats(wav.take(cut)): Unit // never throws
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 2000) {
      val flip = wav.clone()
      flip(rnd.nextInt(flip.length)) =
        (flip(rnd.nextInt(flip.length)) ^ (1 << rnd.nextInt(8))).toByte
      Wav.decodeStats(flip): Unit
    }
  }

  test("extra chunks tolerated; trailing partial frame ignored") {
    // hand-assemble: RIFF/WAVE + LIST junk chunk + fmt + data with a
    // dangling odd byte at the end (not a full frame)
    val base = Wav.encode(16000, 2, 16, Array(5, -5, 7, -7))
    // splice a LIST chunk right after the 12-byte preamble
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = base.take(12) ++ junk ++ base.drop(12)
    // fix the RIFF size field (bytes 4-7, LE)
    val riffLen = spliced.length - 8
    for (b <- 0 until 4)
      spliced(4 + b) = ((riffLen >> (8 * b)) & 0xFF).toByte
    val st = Wav.decodeStats(spliced)
    assert(st.isDefined)
    assert(st.get.frames == 2 && st.get.sumSquares == 25 + 25 + 49 + 49)
  }

  test("G.711: expansion formulas match known anchor points") {
    // µ-law: 0xFF is 0 (and 0x7F its negative twin), 0x80/0x00 the
    // extremes, monotone within a segment
    assert(Wav.ulawToLinear(0xFF) == 0)
    assert(Wav.ulawToLinear(0x7F) == 0)
    assert(Wav.ulawToLinear(0x80) == 32124)
    assert(Wav.ulawToLinear(0x00) == -32124)
    assert(Wav.ulawToLinear(0xE0) == 372)
    // µ-law quantization step in the top segment is 8 << 7 = 1024
    assert(Wav.ulawToLinear(0x81) - Wav.ulawToLinear(0x82) == 1024)
    // A-law: no zero, minimum magnitude 8, extremes +-32256
    assert(Wav.alawToLinear(0xD5) == 8)
    assert(Wav.alawToLinear(0x55) == -8)
    assert(Wav.alawToLinear(0xAA) == 32256)
    assert(Wav.alawToLinear(0x2A) == -32256)
    assert(Wav.alawToLinear(0xC5) == 264)
    // sign symmetry over the full byte range: flipping the sign bit
    // of the COMPANDED byte negates the linear value (A-law sign is
    // bit 7 after XOR 0x55; µ-law after complement)
    for (b <- 0 until 256) {
      assert(Wav.ulawToLinear(b) == -Wav.ulawToLinear(b ^ 0x80) ||
        Wav.ulawToLinear(b) == 0)
      assert(Wav.alawToLinear(b) == -Wav.alawToLinear(b ^ 0x80))
    }
  }

  test("G.711 companders: codec identity on all codewords + quant bound") {
    // byte -> linear -> byte is the identity on every codeword (the
    // strongest compander test: it pins encoder and decoder to the
    // SAME segment layout), except mu-law's negative zero 0x7F which
    // re-encodes as positive zero 0xFF (standard)
    for (b <- 0 until 256) {
      val u = Wav.linearToUlaw(Wav.ulawToLinear(b))
      if (b == 0x7F) assert(u == 0xFF) else assert(u == b, s"ulaw $b -> $u")
      val a = Wav.linearToAlaw(Wav.alawToLinear(b))
      assert(a == b, s"alaw $b -> $a")
    }
    // linear -> byte -> linear lands within the segment's step size
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val x = rnd.nextInt(65001) - 32500
      val du = Wav.ulawToLinear(Wav.linearToUlaw(x))
      val xa = math.min(math.abs(x), 32124)
      // mu-law step doubles per segment; bound by max step 1024 at top
      assert(math.abs(du - (if (x < 0) -xa else xa)) <= 1024,
        s"ulaw $x -> $du")
      val da = Wav.alawToLinear(Wav.linearToAlaw(x))
      val xb = math.min(math.abs(x), 32256)
      assert(math.abs(da - (if (x < 0) -xb else xb)) <= 1024,
        s"alaw $x -> $da")
    }
    // linear 0: mu-law has a zero codeword; A-law's closest is +-8
    assert(Wav.ulawToLinear(Wav.linearToUlaw(0)) == 0)
    assert(math.abs(Wav.alawToLinear(Wav.linearToAlaw(0))) == 8)
  }

  test("G.711: encode/decode round-trip, exact stats (fuzz) + declines") {
    val rnd = new scala.util.Random(66)
    for (trial <- 0 until 60) {
      val aLaw = rnd.nextBoolean()
      val channels = 1 + rnd.nextInt(3)
      val frames = 1 + rnd.nextInt(300)
      val bytes = Array.fill(frames * channels)(rnd.nextInt(256))
      val wav = Wav.encodeG711(
        8000 + rnd.nextInt(8000), channels, aLaw, bytes)
      val st = Wav.decodeStats(wav)
      assert(st.isDefined, s"trial $trial declined")
      val s = st.get
      val lin = bytes.map(b =>
        if (aLaw) Wav.alawToLinear(b).toLong else Wav.ulawToLinear(b).toLong)
      assert(s.frames == frames && s.channels == channels &&
        s.bitsPerSample == 8)
      assert(s.peakAbs == lin.map(math.abs).max)
      assert(s.sumSquares == lin.map(v => v * v).sum)
      val full = if (aLaw) 32256L else 32124L
      assert(s.clipped == lin.count(v => math.abs(v) >= full))
    }
    // bits field != 8 on a G.711 format declines
    val bad = Wav.encodeG711(8000, 1, aLaw = false, Array(0xFF, 0x80))
    bad(34) = 16
    assert(Wav.decodeStats(bad).isEmpty)
    // truncation / bit flips never throw
    val g = Wav.encodeG711(8000, 2, aLaw = true, Array(1, 2, 3, 4))
    for (cut <- 0 until g.length) Wav.decodeStats(g.take(cut)): Unit
    for (_ <- 0 until 2000) {
      val flip = g.clone()
      flip(rnd.nextInt(flip.length)) =
        (flip(rnd.nextInt(flip.length)) ^ (1 << rnd.nextInt(8))).toByte
      Wav.decodeStats(flip): Unit
    }
  }

  test("decodeWindowStats: windows partition the file exactly (fuzz)") {
    val rnd = new scala.util.Random(123)
    for (trial <- 0 until 40) {
      val bits = Seq(8, 16, 24)(rnd.nextInt(3))
      val channels = 1 + rnd.nextInt(3)
      val frames = rnd.nextInt(120)
      val lim = 1 << (bits - 1)
      val samples = Array.fill(frames * channels)(rnd.nextInt(2 * lim) - lim)
      val wav = Wav.encode(8000, channels, bits, samples)
      val wfr = 1L + rnd.nextInt(10)
      val ws = Wav.decodeWindowStats(wav, wfr)
      val full = Wav.decodeStats(wav)
      assert(ws.isDefined && full.isDefined, s"trial $trial declined")
      val w = ws.get
      // windows tile the frame range: indices 0..n-1, every window
      // full except a possibly-partial last, frame total exact
      assert(w.windows.map(_.idx) == w.windows.indices.toSeq)
      w.windows.dropRight(1).foreach(win => assert(win.frames == wfr))
      assert(w.windows.map(_.frames).sum == full.get.frames)
      // the whole-file aggregate IS the window fold (shared pass)
      assert(w.windows.map(_.sumSquares).sum == full.get.sumSquares)
      assert((0L +: w.windows.map(_.peakAbs)).max == full.get.peakAbs)
      assert(w.windows.map(_.clipped).sum == full.get.clipped)
      // hand-check one window against a direct slice computation
      if (w.windows.nonEmpty) {
        val k = rnd.nextInt(w.windows.size)
        val lo = (k * wfr).toInt * channels
        val hi = math.min(((k + 1) * wfr).toInt, frames) * channels
        val slice = samples.slice(lo, hi).map(_.toLong)
        assert(w.windows(k).sumSquares == slice.map(v => v * v).sum)
        assert(w.windows(k).peakAbs ==
          (0L +: slice.map(math.abs)).max)
      }
    }
    // windowFrames < 1 declines
    assert(Wav.decodeWindowStats(
      Wav.encode(8000, 1, 16, Array(1)), 0L).isEmpty)
  }

  test("decodeSamples: exact values at every format, folds to " +
    "decodeStats, refuses past maxFrames") {
    val i16 = Wav.decodeSamples(
      Wav.encode(8000, 2, 16, Array(0, 100, -200, 32767))).get
    assert(i16.samples.toSeq == Seq(0L, 100L, -200L, 32767L))
    assert(i16.channels == 2 && i16.sampleRate == 8000)
    val g711 = Wav.decodeSamples(
      Wav.encodeG711(8000, 1, aLaw = false, Array(0xFF, 0x80, 0x00))).get
    assert(g711.samples.toSeq == Seq(0L, 32124L, -32124L))
    // the two kernels agree: stats(samples) == decodeStats
    val wav = Wav.encode(44100, 2, 8, Array(10, -10, 127, -128, 3, 4))
    val pcm = Wav.decodeSamples(wav).get
    val st = Wav.decodeStats(wav).get
    assert(pcm.samples.map(v => v * v).sum == st.sumSquares)
    assert(pcm.samples.map(math.abs).max == st.peakAbs)
    // refusal, not truncation, past the frame bound
    assert(Wav.decodeSamples(wav, maxFrames = 2).isEmpty)
    // corrupt input declines
    assert(Wav.decodeSamples(wav.take(20)).isEmpty)
  }

  test("resampleLinear: exact rational interpolation, identity at " +
    "equal rates, channel independence") {
    val pcm = Wav.decodeSamples(
      Wav.encode(8000, 1, 16, Array(0, 300, -600, 900))).get
    val (nums, denom) = Wav.resampleLinear(pcm, 12000)
    assert(denom == 12000L)
    assert(nums.toSeq ==
      Seq(0L, 2400000L, 0L, -7200000L, 4800000L))
    // identity: same rate reproduces samples x rate
    val (id, d2) = Wav.resampleLinear(pcm, 8000)
    assert(id.toSeq == pcm.samples.map(_ * 8000L).toSeq && d2 == 8000L)
    // stereo: both channels interpolate at the same position
    val st = Wav.decodeSamples(Wav.encode(4000, 2, 16,
      Array(100, -100, 300, -300))).get
    val (sn, _) = Wav.resampleLinear(st, 8000)
    assert(sn.toSeq == Seq(800000L, -800000L, 1600000L, -1600000L,
      2400000L, -2400000L))
    // empty input
    val empty = Wav.decodeSamples(
      Wav.encode(8000, 1, 16, Array.empty[Int])).get
    assert(Wav.resampleLinear(empty, 16000)._1.isEmpty)
  }

  test("decodeAudioStats: dataset pass, nulls for corrupt rows") {
    val ss = spark
    import ss.implicits._
    val good = Wav.encode(8000, 1, 16, Array(0, 100, -100))
    val ds = Seq(
      MediaRecord(1L, good, "audio/wav"),
      MediaRecord(2L, good.take(20), "audio/wav")).toDS()
    val rows = Multimodal.decodeAudioStats(ds).orderBy("doc_id").collect()
    assert(rows(0).getInt(1) == 8000 && rows(0).getLong(4) == 3L)
    assert(rows(0).getLong(6) == 20000L && rows(0).getLong(7) == 0L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(6))
  }
}
