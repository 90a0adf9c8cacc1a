package graft.multimodal

/** Minimal stdlib-only baseline JPEG writer — the encode half of
  * [[JpegDecoder]], used to plant fixtures and round-trip-test the
  * decoder: forward 8×8 DCT, caller-chosen quantization (default
  * all-ones so DC-only content round-trips exactly), the T.81
  * Annex K typical Huffman tables, byte-stuffed entropy stream,
  * optional restart markers, grayscale or YCbCr at 4:4:4 / 4:2:0.
  */
object JpegEncoder {

  /** All-ones quantization: no coefficient loss beyond DCT rounding. */
  val FlatQuant: Array[Int] = Array.fill(64)(1)

  // T.81 Annex K.3 typical Huffman tables: (BITS ++ HUFFVAL)
  private val DcLumBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChrBits =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).toArray
  private val AcLumBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)
  private val AcChrBits =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** symbol -> (code, length) from canonical BITS/HUFFVAL. */
  private def codeTable(
      bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = Map.newBuilder[Int, (Int, Int)]
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out += (vals(k) -> (code, l))
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  private lazy val dcLum = codeTable(DcLumBits, DcLumVals)
  private lazy val acLum = codeTable(AcLumBits, AcLumVals)
  private lazy val dcChr = codeTable(DcChrBits, DcChrVals)
  private lazy val acChr = codeTable(AcChrBits, AcChrVals)

  private val CosTable: Array[Double] = Array.tabulate(64) { i =>
    math.cos((2 * (i / 8) + 1) * (i % 8) * math.Pi / 16.0)
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xFF)
          if ((buf & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          buf = 0
          cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { // pad with 1-bits per T.81
      put(0x7F, 8 - cnt)
    }
  }

  private def magnitude(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Forward DCT + quantize one 8x8 block (plane samples, edge-
    * replicated padding) to zig-zag-ordered coefficients.
    */
  private def fdctQuant(
      plane: Array[Byte], pw: Int, ph: Int, bx: Int, by: Int,
      quant: Array[Int]): Array[Int] = {
    val s = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      val py = math.min(by * 8 + y, ph - 1)
      while (x < 8) {
        val px = math.min(bx * 8 + x, pw - 1)
        s(y * 8 + x) = (plane(py * pw + px) & 0xFF) - 128.0
        x += 1
      }
      y += 1
    }
    val zz = new Array[Int](64)
    var k = 0
    while (k < 64) {
      val raster = JpegDecoder.Zigzag(k)
      val u = raster % 8
      val v = raster / 8
      var sum = 0.0
      var yy = 0
      while (yy < 8) {
        var xx = 0
        val cv = CosTable(yy * 8 + v)
        while (xx < 8) {
          sum += s(yy * 8 + xx) * CosTable(xx * 8 + u) * cv
          xx += 1
        }
        yy += 1
      }
      val cu = if (u == 0) InvSqrt2 else 1.0
      val cvv = if (v == 0) InvSqrt2 else 1.0
      val q = math.round(cu * cvv * sum / 4.0 / quant(k)).toInt
      // Annex K AC Huffman tables encode size categories 1-10 only
      // (|coef| <= 1023); with FlatQuant a sign-matched checkerboard
      // can hit 1024, so clamp AC instead of dying on a Map miss.
      // DC (k == 0) supports size 11 and needs no clamp.
      zz(k) = if (k == 0) q else math.max(-1023, math.min(1023, q))
      k += 1
    }
    zz
  }

  private def encodeBlock(
      bw: BitWriter, zz: Array[Int], dcPred: Int,
      dc: Map[Int, (Int, Int)], ac: Map[Int, (Int, Int)]): Int = {
    val diff = zz(0) - dcPred
    val s = magnitude(diff)
    val (c, l) = dc(s)
    bw.put(c, l)
    if (s > 0)
      bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    var k = 1
    var run = 0
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run > 15) { val (zc, zl) = ac(0xF0); bw.put(zc, zl); run -= 16 }
        val sz = magnitude(zz(k))
        val (c2, l2) = ac((run << 4) | sz)
        bw.put(c2, l2)
        bw.put(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = ac(0x00); bw.put(ec, el) } // EOB
    zz(0)
  }

  /** RGB/gray samples -> (Y, Cb, Cr) planes; chroma box-averaged at
    * `sub` (1 = 4:4:4, 2 = 4:2:0). Cb/Cr are null for gray.
    */
  private def toPlanes(
      w: Int, h: Int, data: Array[Byte], gray: Boolean,
      sub: Int): (Array[Byte], Array[Byte], Array[Byte]) = {
    val cw = (w + sub - 1) / sub
    val ch = (h + sub - 1) / sub
    val yPlane = new Array[Byte](w * h)
    if (gray) { System.arraycopy(data, 0, yPlane, 0, w * h); return (yPlane, null, null) }
    val cbPlane = new Array[Byte](cw * ch)
    val crPlane = new Array[Byte](cw * ch)
    val cbF = new Array[Double](cw * ch)
    val crF = new Array[Double](cw * ch)
    val cnt = new Array[Int](cw * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = 3 * (y * w + x)
        val r = data(o) & 0xFF
        val g = data(o + 1) & 0xFF
        val b = data(o + 2) & 0xFF
        val yy = 0.299 * r + 0.587 * g + 0.114 * b
        yPlane(y * w + x) = math.round(yy).toInt
          .max(0).min(255).toByte
        val ci = (y / sub) * cw + (x / sub)
        cbF(ci) += -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        crF(ci) += 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        cnt(ci) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < cw * ch) {
      cbPlane(i) = math.round(cbF(i) / cnt(i)).toInt.max(0).min(255).toByte
      crPlane(i) = math.round(crF(i) / cnt(i)).toInt.max(0).min(255).toByte
      i += 1
    }
    (yPlane, cbPlane, crPlane)
  }

  /** Encode a grayscale (1-component) or RGB (3-component YCbCr)
    * image. `rgb` is w·h (gray) or 3·w·h (RGB) bytes, row-major.
    * `chromaSub` 1 = 4:4:4, 2 = 4:2:0 (box-averaged chroma).
    *
    * Quantized AC coefficients are CLAMPED to ±1023 (the Annex K
    * typical-table size-10 AC range): adversarial content such as a
    * sign-matched ±128 checkerboard under [[FlatQuant]] can push an
    * AC coefficient to 1024, which the standard AC tables cannot
    * code. Such extremes encode to slightly altered content rather
    * than failing — callers comparing decode(encode(x)) against an
    * analytic expectation must stay inside the ±1023 AC range (all
    * natural images do; DC is unclamped, size 11 covers it).
    */
  def encode(
      w: Int,
      h: Int,
      data: Array[Byte],
      gray: Boolean,
      quant: Array[Int] = FlatQuant,
      chromaSub: Int = 1,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, "dimensions must be positive")
    require(data.length == (if (gray) w * h else 3 * w * h), "bad samples")
    require(chromaSub == 1 || chromaSub == 2, "chromaSub must be 1 or 2")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant must be 64 values in [1,255]")

    // component planes (full-res Y; chroma possibly subsampled)
    val nComp = if (gray) 1 else 3
    val sub = if (gray) 1 else chromaSub
    val cw = (w + sub - 1) / sub
    val ch = (h + sub - 1) / sub
    val (yPlane, cbPlane, crPlane) = toPlanes(w, h, data, gray, sub)

    val out = new java.io.ByteArrayOutputStream()
    def mk(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    mk(0xD8) // SOI
    // DQT (table 0; chroma reuses it)
    mk(0xDB); be16(2 + 65); out.write(0x00)
    quant.foreach(out.write)
    // SOF0
    mk(0xC0); be16(8 + 3 * nComp)
    out.write(8); be16(h); be16(w); out.write(nComp)
    if (gray) { out.write(1); out.write(0x11); out.write(0) }
    else {
      out.write(1); out.write((sub << 4) | sub); out.write(0) // Y
      out.write(2); out.write(0x11); out.write(0) // Cb
      out.write(3); out.write(0x11); out.write(0) // Cr
    }
    // DHT
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      mk(0xC4); be16(2 + 17 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, 0, DcLumBits, DcLumVals)
    dht(1, 0, AcLumBits, AcLumVals)
    if (!gray) {
      dht(0, 1, DcChrBits, DcChrVals)
      dht(1, 1, AcChrBits, AcChrVals)
    }
    if (restartInterval > 0) { mk(0xDD); be16(4); be16(restartInterval) }
    // SOS
    mk(0xDA); be16(6 + 2 * nComp)
    out.write(nComp)
    out.write(1); out.write(0x00)
    if (!gray) { out.write(2); out.write(0x11); out.write(3); out.write(0x11) }
    out.write(0); out.write(63); out.write(0)

    // entropy stream
    val mcusX = (w + 8 * sub - 1) / (8 * sub)
    val mcusY = (h + 8 * sub - 1) / (8 * sub)
    val bw = new BitWriter(out)
    var dcY = 0
    var dcCb = 0
    var dcCr = 0
    var mcu = 0
    var rstN = 0
    val total = mcusX * mcusY
    while (mcu < total) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        mk(0xD0 + (rstN & 7))
        rstN += 1
        dcY = 0; dcCb = 0; dcCr = 0
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var v = 0
      while (v < sub) {
        var u = 0
        while (u < sub) {
          dcY = encodeBlock(bw,
            fdctQuant(yPlane, w, h, mx * sub + u, my * sub + v, quant),
            dcY, dcLum, acLum)
          u += 1
        }
        v += 1
      }
      if (!gray) {
        dcCb = encodeBlock(bw,
          fdctQuant(cbPlane, cw, ch, mx, my, quant), dcCb, dcChr, acChr)
        dcCr = encodeBlock(bw,
          fdctQuant(crPlane, cw, ch, mx, my, quant), dcCr, dcChr, acChr)
      }
      mcu += 1
    }
    bw.flush()
    mk(0xD9) // EOI
    out.toByteArray
  }

  // ---- progressive (SOF2) twin ----

  /** Flat 8-bit canonical AC table for progressive scans: Annex K's AC
    * tables lack the EOBn symbols (0x10..0xE0) progressive EOB-run
    * coding needs, so progressive scans carry their own DHT — every
    * (run, size 1-10) pair, ZRL, and EOB0..EOB14, all at code length 8
    * (176 symbols < 255, so the all-ones code stays unused as T.81
    * requires).
    */
  private val AcProgVals: Array[Int] =
    (for { r <- 0 to 15; s <- 1 to 10 } yield (r << 4) | s).toArray ++
      Array(0xF0) ++ (0 to 14).map(_ << 4).toArray
  private val AcProgBits: Array[Int] = {
    val b = new Array[Int](16); b(7) = AcProgVals.length; b
  }
  private lazy val acProg = codeTable(AcProgBits, AcProgVals)

  /** Progressive (SOF2) encode — same planes/DCT/quantization as
    * [[encode]], the coefficients delivered over multiple scans:
    *
    *  1. DC first (all components, interleaved for color), Al=alShift
    *  2. per component, AC first over two spectral bands
    *     (1..spectralSplit, spectralSplit+1..63), Al=alShift
    *  3. per bit position a = alShift..1: DC refinement (Ah=a,
    *     Al=a-1) then per-component per-band AC refinement
    *
    * so a decoder exercises every progressive scan kind: spectral
    * selection, successive approximation, EOB-run coding, correction
    * bits, interleaved DC and non-interleaved AC, and (with
    * `restartInterval` > 0) per-scan restart markers. Decoding the
    * result must agree EXACTLY with decoding [[encode]]'s output for
    * the same inputs — both deliver the identical quantized
    * coefficients (spec-asserted, including fuzz). AC coefficients
    * are clamped to ±1023 exactly as in [[encode]] — see its
    * Scaladoc for the contract.
    */
  def encodeProgressive(
      w: Int,
      h: Int,
      data: Array[Byte],
      gray: Boolean,
      quant: Array[Int] = FlatQuant,
      chromaSub: Int = 1,
      spectralSplit: Int = 5,
      alShift: Int = 1,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, "dimensions must be positive")
    require(data.length == (if (gray) w * h else 3 * w * h), "bad samples")
    require(chromaSub == 1 || chromaSub == 2, "chromaSub must be 1 or 2")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant must be 64 values in [1,255]")
    require(spectralSplit >= 1 && spectralSplit <= 62,
      "spectralSplit must be in [1, 62]")
    require(alShift >= 0 && alShift <= 2, "alShift must be in [0, 2]")

    val nComp = if (gray) 1 else 3
    val sub = if (gray) 1 else chromaSub
    val cw = (w + sub - 1) / sub
    val ch = (h + sub - 1) / sub
    val (yPlane, cbPlane, crPlane) = toPlanes(w, h, data, gray, sub)

    // per-component MCU-padded block grids of zigzag quantized coefs
    val mcusX = (w + 8 * sub - 1) / (8 * sub)
    val mcusY = (h + 8 * sub - 1) / (8 * sub)
    val compH = Array.tabulate(nComp)(ci => if (ci == 0) sub else 1)
    val compV = compH
    val padBW = Array.tabulate(nComp)(ci => mcusX * compH(ci))
    val padBH = Array.tabulate(nComp)(ci => mcusY * compV(ci))
    val planesArr = Array(yPlane, cbPlane, crPlane)
    val planeDim = Array((w, h), (cw, ch), (cw, ch))
    val coefs = Array.tabulate(nComp) { ci =>
      val (pw, ph) = planeDim(ci)
      val plane = planesArr(ci)
      val co = new Array[Int](padBW(ci) * padBH(ci) * 64)
      var by = 0
      while (by < padBH(ci)) {
        var bx = 0
        while (bx < padBW(ci)) {
          val zz = fdctQuant(plane, pw, ph, bx, by, quant)
          System.arraycopy(zz, 0, co, (by * padBW(ci) + bx) * 64, 64)
          bx += 1
        }
        by += 1
      }
      co
    }
    // non-interleaved (AC) scans cover the component's ceil dims only
    val ceilBW = Array.tabulate(nComp) { ci =>
      (((w * compH(ci) + sub - 1) / sub) + 7) / 8
    }
    val ceilBH = Array.tabulate(nComp) { ci =>
      (((h * compV(ci) + sub - 1) / sub) + 7) / 8
    }

    val out = new java.io.ByteArrayOutputStream()
    def mk(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    mk(0xD8) // SOI
    mk(0xDB); be16(2 + 65); out.write(0x00)
    quant.foreach(out.write)
    mk(0xC2); be16(8 + 3 * nComp) // SOF2
    out.write(8); be16(h); be16(w); out.write(nComp)
    if (gray) { out.write(1); out.write(0x11); out.write(0) }
    else {
      out.write(1); out.write((sub << 4) | sub); out.write(0)
      out.write(2); out.write(0x11); out.write(0)
      out.write(3); out.write(0x11); out.write(0)
    }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      mk(0xC4); be16(2 + 17 + vals.length)
      out.write((tc << 4) | th)
      bits.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0, 0, DcLumBits, DcLumVals)
    dht(1, 0, AcProgBits, AcProgVals)
    if (!gray) dht(0, 1, DcChrBits, DcChrVals)
    if (restartInterval > 0) { mk(0xDD); be16(4); be16(restartInterval) }

    def sos(scan: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      mk(0xDA); be16(6 + 2 * scan.length)
      out.write(scan.length)
      scan.foreach { ci =>
        out.write(ci + 1) // component ids 1..3
        out.write((if (ci == 0) 0x00 else 0x10)) // DC table; AC always 0
      }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    def magnitudeOf(v: Int): Int = {
      var a = math.abs(v); var s = 0
      while (a != 0) { a >>= 1; s += 1 }
      s
    }

    // ---- scan 1: DC first ----
    def dcFirstScan(al: Int): Unit = {
      sos(0 until nComp, 0, 0, 0, al)
      val bw = new BitWriter(out)
      val pred = new Array[Int](nComp)
      var rstN = 0
      def block(ci: Int, blk: Int): Unit = {
        val v = coefs(ci)(blk * 64) >> al // arithmetic: two's-complement
        val diff = v - pred(ci) //            pairs with decoder's <<
        pred(ci) = v
        val s = magnitudeOf(diff)
        val tab = if (ci == 0) dcLum else dcChr
        val (c, l) = tab(s)
        bw.put(c, l)
        if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
      if (nComp == 1) { // ns=1: non-interleaved data-unit order
        val total = ceilBW(0) * ceilBH(0)
        var b = 0
        while (b < total) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            bw.flush(); mk(0xD0 + (rstN & 7)); rstN += 1
            java.util.Arrays.fill(pred, 0)
          }
          block(0, (b / ceilBW(0)) * padBW(0) + (b % ceilBW(0)))
          b += 1
        }
      } else {
        var mcu = 0
        val total = mcusX * mcusY
        while (mcu < total) {
          if (restartInterval > 0 && mcu > 0 &&
            mcu % restartInterval == 0) {
            bw.flush(); mk(0xD0 + (rstN & 7)); rstN += 1
            java.util.Arrays.fill(pred, 0)
          }
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var ci = 0
          while (ci < nComp) {
            var v = 0
            while (v < compV(ci)) {
              var u = 0
              while (u < compH(ci)) {
                block(ci,
                  (my * compV(ci) + v) * padBW(ci) + (mx * compH(ci) + u))
                u += 1
              }
              v += 1
            }
            ci += 1
          }
          mcu += 1
        }
      }
      bw.flush()
    }

    // ---- DC refinement: one raw bit per block ----
    def dcRefineScan(al: Int): Unit = {
      sos(0 until nComp, 0, 0, al + 1, al)
      val bw = new BitWriter(out)
      var rstN = 0
      def block(ci: Int, blk: Int): Unit =
        bw.put((coefs(ci)(blk * 64) >> al) & 1, 1)
      if (nComp == 1) {
        val total = ceilBW(0) * ceilBH(0)
        var b = 0
        while (b < total) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            bw.flush(); mk(0xD0 + (rstN & 7)); rstN += 1
          }
          block(0, (b / ceilBW(0)) * padBW(0) + (b % ceilBW(0)))
          b += 1
        }
      } else {
        var mcu = 0
        val total = mcusX * mcusY
        while (mcu < total) {
          if (restartInterval > 0 && mcu > 0 &&
            mcu % restartInterval == 0) {
            bw.flush(); mk(0xD0 + (rstN & 7)); rstN += 1
          }
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var ci = 0
          while (ci < nComp) {
            var v = 0
            while (v < compV(ci)) {
              var u = 0
              while (u < compH(ci)) {
                block(ci,
                  (my * compV(ci) + v) * padBW(ci) + (mx * compH(ci) + u))
                u += 1
              }
              v += 1
            }
            ci += 1
          }
          mcu += 1
        }
      }
      bw.flush()
    }

    // ---- AC first: run-length + EOB-run coding at precision Al ----
    def acFirstScan(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sos(Seq(ci), ss, se, 0, al)
      val bw = new BitWriter(out)
      var eobrun = 0
      var rstN = 0
      def emitEobrun(): Unit = if (eobrun > 0) {
        val n = 31 - Integer.numberOfLeadingZeros(eobrun)
        val (c, l) = acProg(n << 4)
        bw.put(c, l)
        if (n > 0) bw.put(eobrun - (1 << n), n)
        eobrun = 0
      }
      val co = coefs(ci)
      val total = ceilBW(ci) * ceilBH(ci)
      var b = 0
      while (b < total) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
          emitEobrun(); bw.flush(); mk(0xD0 + (rstN & 7)); rstN += 1
        }
        val base = ((b / ceilBW(ci)) * padBW(ci) + (b % ceilBW(ci))) * 64
        var r = 0
        var k = ss
        while (k <= se) {
          val v = co(base + k)
          val t = math.abs(v) >> al
          if (t == 0) r += 1
          else {
            emitEobrun()
            while (r > 15) { val (zc, zl) = acProg(0xF0); bw.put(zc, zl); r -= 16 }
            val s = magnitudeOf(t)
            val (c, l) = acProg((r << 4) | s)
            bw.put(c, l)
            val tv = if (v < 0) -t else t
            bw.put(if (tv < 0) tv + (1 << s) - 1 else tv, s)
            r = 0
          }
          k += 1
        }
        if (r > 0) {
          eobrun += 1
          if (eobrun == 0x7FFF) emitEobrun()
        }
        b += 1
      }
      emitEobrun()
      bw.flush()
    }

    // ---- AC refinement: correction bits + newly-significant +-1.
    // Correction bits must land exactly where the decoder's traversal
    // consumes them: bits for already-nonzero coefficients interleaved
    // among a ZRL's 16-zero span flush right after THAT ZRL; bits
    // after the last span flush after the significant symbol + sign;
    // bits in blocks wholly inside an EOB run flush after the EOBn
    // symbol. A pending queue of (zero | correction-bit) markers makes
    // the interleaving explicit instead of relying on flush-all order.
    def acRefineScan(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sos(Seq(ci), ss, se, al + 1, al)
      val bw = new BitWriter(out)
      var eobrun = 0
      var rstN = 0
      val eobPending = new java.util.ArrayList[Int]() // bits owed to EOBn
      // current block since last emission: -1 = zero-history position,
      // 0/1 = a history coefficient's correction bit
      val pending = new java.util.ArrayList[Int]()
      var zeros = 0
      def emitEobrun(): Unit = if (eobrun > 0) {
        val n = 31 - Integer.numberOfLeadingZeros(eobrun)
        val (c, l) = acProg(n << 4)
        bw.put(c, l)
        if (n > 0) bw.put(eobrun - (1 << n), n)
        eobrun = 0
        var i = 0
        while (i < eobPending.size()) { bw.put(eobPending.get(i), 1); i += 1 }
        eobPending.clear()
      }
      val co = coefs(ci)
      val total = ceilBW(ci) * ceilBH(ci)
      var b = 0
      while (b < total) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
          emitEobrun(); bw.flush(); mk(0xD0 + (rstN & 7)); rstN += 1
        }
        val base = ((b / ceilBW(ci)) * padBW(ci) + (b % ceilBW(ci))) * 64
        pending.clear()
        zeros = 0
        var k = ss
        while (k <= se) {
          val v = co(base + k)
          val t = math.abs(v) >> al
          if (t == 0) { pending.add(-1); zeros += 1 }
          else if (t > 1) pending.add(t & 1) // history: correction bit
          else { // newly significant (+-1 at this precision)
            emitEobrun()
            var idx = 0
            while (zeros > 15) { // split the run; each ZRL carries the
              val (zc, zl) = acProg(0xF0) // bits inside its 16-zero span
              bw.put(zc, zl)
              var z = 0
              while (z < 16) {
                val e = pending.get(idx); idx += 1
                if (e == -1) z += 1 else bw.put(e, 1)
              }
              zeros -= 16
            }
            val (c, l) = acProg((zeros << 4) | 1)
            bw.put(c, l)
            bw.put(if (v < 0) 0 else 1, 1)
            while (idx < pending.size()) { // bits the symbol's own
              val e = pending.get(idx); idx += 1 // advance consumes
              if (e != -1) bw.put(e, 1)
            }
            pending.clear()
            zeros = 0
          }
          k += 1
        }
        if (!pending.isEmpty) { // block tail folds into the EOB run
          eobrun += 1
          var i = 0
          while (i < pending.size()) {
            val e = pending.get(i)
            if (e != -1) eobPending.add(e)
            i += 1
          }
          pending.clear()
          zeros = 0
          if (eobrun == 0x7FFF || eobPending.size() >= 900) emitEobrun()
        }
        b += 1
      }
      emitEobrun()
      bw.flush()
    }

    dcFirstScan(alShift)
    val bands = Seq((1, spectralSplit), (spectralSplit + 1, 63))
    for (ci <- 0 until nComp; (ss, se) <- bands) acFirstScan(ci, ss, se, alShift)
    var a = alShift - 1
    while (a >= 0) {
      dcRefineScan(a)
      for (ci <- 0 until nComp; (ss, se) <- bands) acRefineScan(ci, ss, se, a)
      a -= 1
    }
    mk(0xD9) // EOI
    out.toByteArray
  }
}
