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

  /** Encode a grayscale (1-component) or RGB (3-component YCbCr)
    * image. `rgb` is w·h (gray) or 3·w·h (RGB) bytes, row-major.
    * `chromaSub` 1 = 4:4:4, 2 = 4:2:0 (box-averaged chroma).
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
    val yPlane = new Array[Byte](w * h)
    val cbPlane = if (gray) null else new Array[Byte](cw * ch)
    val crPlane = if (gray) null else new Array[Byte](cw * ch)
    if (gray) System.arraycopy(data, 0, yPlane, 0, w * h)
    else {
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
    }

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
}
