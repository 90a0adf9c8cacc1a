package graft.multimodal

import graft.SparkTestBase

class JpegSpec extends SparkTestBase {

  /** Flat-tile image: every 8x8 tile a constant value — DC-only blocks
    * decode EXACTLY through any conformant IDCT.
    */
  private def flatTiles(
      w: Int, h: Int, tile: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      tile((i % w) / 8, (i / w) / 8).toByte
    }

  test("grayscale DC-only blocks decode exactly (any conformant IDCT)") {
    // 24x16: 3x2 tiles with distinct values exercising DC prediction
    val vals = Array(Array(32, 96, 200), Array(255, 0, 128))
    val img = flatTiles(24, 16, (tx, ty) => vals(ty)(tx))
    val jpg = JpegEncoder.encode(24, 16, img, gray = true)
    val dec = JpegDecoder.decode(jpg)
    assert(dec.isDefined)
    assert(dec.get.width == 24 && dec.get.height == 16)
    for (y <- 0 until 16; x <- 0 until 24) {
      val expect = vals(y / 8)(x / 8)
      val got = dec.get.rgba(4 * (y * 24 + x)) & 0xFF
      assert(got == expect, s"($x,$y): got $got want $expect")
      assert(dec.get.rgba(4 * (y * 24 + x) + 1) == dec.get.rgba(4 * (y * 24 + x)))
    }
  }

  test("gray AC content round-trips within ±1 under flat quantization") {
    val rnd = new scala.util.Random(83)
    val w = 16; val h = 16
    // smooth gradient + small noise: bounded coefficient magnitudes
    val img = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (64 + 4 * x + 3 * y + rnd.nextInt(5)).toByte
    }
    val jpg = JpegEncoder.encode(w, h, img, gray = true)
    val dec = JpegDecoder.decode(jpg).get
    var maxErr = 0
    for (i <- 0 until w * h) {
      val e = math.abs((dec.rgba(4 * i) & 0xFF) - (img(i) & 0xFF))
      maxErr = math.max(maxErr, e)
    }
    assert(maxErr <= 1, s"flat-quant roundtrip error $maxErr > 1")
  }

  test("neutral-chroma color image: R=G=B=Y exactly, 4:4:4 and 4:2:0") {
    // gray content through the COLOR pipeline: Cb=Cr=128 everywhere,
    // so conversion returns Y exactly in both subsampling layouts
    val w = 32; val h = 24
    val rgb = new Array[Byte](3 * w * h)
    val tile = (tx: Int, ty: Int) => 20 + 30 * ((tx + ty) % 7)
    for (y <- 0 until h; x <- 0 until w) {
      val v = tile(x / 8, y / 8).toByte
      rgb(3 * (y * w + x)) = v
      rgb(3 * (y * w + x) + 1) = v
      rgb(3 * (y * w + x) + 2) = v
    }
    for (sub <- Seq(1, 2)) {
      val jpg = JpegEncoder.encode(w, h, rgb, gray = false, chromaSub = sub)
      val dec = JpegDecoder.decode(jpg)
      assert(dec.isDefined, s"sub=$sub failed")
      for (y <- 0 until h; x <- 0 until w) {
        val expect = tile(x / 8, y / 8)
        val o = 4 * (y * w + x)
        assert((dec.get.rgba(o) & 0xFF) == expect, s"sub=$sub R ($x,$y)")
        assert(dec.get.rgba(o) == dec.get.rgba(o + 1) &&
          dec.get.rgba(o) == dec.get.rgba(o + 2), s"sub=$sub RGB ($x,$y)")
      }
    }
  }

  test("saturated color round-trips within tolerance at 4:4:4") {
    val w = 16; val h = 8
    val rgb = new Array[Byte](3 * w * h)
    // constant-color halves: flat blocks, so only YCbCr<->RGB rounding
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = if (x < 8) (200, 40, 90) else (10, 180, 250)
      rgb(3 * (y * w + x)) = r.toByte
      rgb(3 * (y * w + x) + 1) = g.toByte
      rgb(3 * (y * w + x) + 2) = b.toByte
    }
    val jpg = JpegEncoder.encode(w, h, rgb, gray = false)
    val dec = JpegDecoder.decode(jpg).get
    for (i <- 0 until w * h; c <- 0 until 3) {
      val e = math.abs((dec.rgba(4 * i + c) & 0xFF) - (rgb(3 * i + c) & 0xFF))
      assert(e <= 2, s"px $i ch $c err $e")
    }
  }

  test("restart markers: DRI/RSTn honored, DC predictors reset") {
    val vals = Array.tabulate(6)(tx => 20 + 40 * tx)
    val img = flatTiles(48, 8, (tx, _) => vals(tx))
    val jpg = JpegEncoder.encode(48, 8, img, gray = true,
      restartInterval = 2) // a restart every 2 MCUs: 2 resets in-scan
    // the stream really contains RST markers
    assert((0 until jpg.length - 1).exists(i =>
      (jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) >= 0xD0 &&
        (jpg(i + 1) & 0xFF) <= 0xD7))
    val dec = JpegDecoder.decode(jpg).get
    for (x <- 0 until 48)
      assert((dec.rgba(4 * x) & 0xFF) == vals(x / 8), s"x=$x")
  }

  test("non-multiple-of-8 dimensions crop the MCU padding") {
    val img = flatTiles(13, 11, (tx, ty) => 50 + 20 * tx + 10 * ty)
    val jpg = JpegEncoder.encode(13, 11, img, gray = true)
    val dec = JpegDecoder.decode(jpg).get
    assert(dec.width == 13 && dec.height == 11)
    for (y <- 0 until 11; x <- 0 until 13)
      assert((dec.rgba(4 * (y * 13 + x)) & 0xFF) == 50 + 20 * (x / 8) + 10 * (y / 8))
  }

  test("quantization: non-flat tables divide and re-multiply coefficients") {
    // quant 16 on a DC-only image: DC = round(8*(v-128)/16)*16 -> the
    // decoded value quantizes to the nearest 2 in sample space
    val q = Array.fill(64)(16)
    val img = flatTiles(8, 8, (_, _) => 77)
    val jpg = JpegEncoder.encode(8, 8, img, gray = true, quant = q)
    val dec = JpegDecoder.decode(jpg).get
    val got = dec.rgba(0) & 0xFF
    assert(math.abs(got - 77) <= 1, s"got $got")
    // and all 64 pixels agree (still a constant block)
    assert((0 until 64).forall(i => (dec.rgba(4 * i) & 0xFF) == got))
  }

  test("corrupt-safety: truncation, bit flips, junk never throw") {
    val img = flatTiles(24, 16, (tx, ty) => 30 * (tx + ty + 1))
    val jpg = JpegEncoder.encode(24, 16, img, gray = true)
    assert(JpegDecoder.decode(jpg).isDefined)
    for (cut <- Seq(2, 10, 50, jpg.length / 2, jpg.length - 3)) {
      JpegDecoder.decode(jpg.take(cut)): Unit // must not throw
    }
    val rnd = new scala.util.Random(89)
    for (_ <- 0 until 2000) {
      val junk = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(junk)
      JpegDecoder.decode(junk): Unit
      val flip = jpg.clone()
      flip(rnd.nextInt(flip.length)) =
        (flip(rnd.nextInt(flip.length)) ^ (1 << rnd.nextInt(8))).toByte
      JpegDecoder.decode(flip): Unit // any result, no throw
    }
  }

  test("unsupported profiles decline: mislabeled progressive, 12-bit") {
    val img = flatTiles(8, 8, (_, _) => 100)
    val jpg = JpegEncoder.encode(8, 8, img, gray = true)
    // retagging SOF0 as SOF2 leaves a SEQUENTIAL scan header (Ss=0,
    // Se=63) that is structurally invalid for a progressive frame
    // (DC scans must have Se=0) — still a clean decline, not a crash
    val sof = (0 until jpg.length - 1).find(i =>
      (jpg(i) & 0xFF) == 0xFF && (jpg(i + 1) & 0xFF) == 0xC0).get
    val prog = jpg.clone(); prog(sof + 1) = 0xC2.toByte
    assert(JpegDecoder.decode(prog).isEmpty)
    val deep = jpg.clone(); deep(sof + 4) = 12.toByte // precision byte
    assert(JpegDecoder.decode(deep).isEmpty)
  }

  test("progressive: flat tiles decode exactly (DC-only, analytic)") {
    val vals = Array(Array(32, 96, 200), Array(255, 0, 128))
    val img = flatTiles(24, 16, (tx, ty) => vals(ty)(tx))
    for (alShift <- Seq(0, 1, 2); rst <- Seq(0, 2)) {
      val jpg = JpegEncoder.encodeProgressive(24, 16, img, gray = true,
        alShift = alShift, restartInterval = rst)
      val dec = JpegDecoder.decode(jpg)
      assert(dec.isDefined, s"alShift=$alShift rst=$rst declined")
      for (y <- 0 until 16; x <- 0 until 24) {
        val expect = vals(y / 8)(x / 8)
        val got = dec.get.rgba(4 * (y * 24 + x)) & 0xFF
        assert(got == expect,
          s"alShift=$alShift rst=$rst ($x,$y): got $got want $expect")
      }
    }
  }

  test("progressive decode == sequential decode, all scan shapes") {
    val rnd = new scala.util.Random(131)
    val nonFlat = Array.tabulate(64)(k => 1 + (k % 4))
    val configs = Seq(
      // (gray, w, h, sub, split, alShift, rst, quant)
      (true, 24, 16, 1, 5, 1, 0, JpegEncoder.FlatQuant),
      (true, 17, 9, 1, 5, 0, 0, JpegEncoder.FlatQuant), // no refinement
      (true, 48, 32, 1, 1, 2, 3, JpegEncoder.FlatQuant), // 2-bit approx
      (false, 32, 24, 1, 5, 1, 0, JpegEncoder.FlatQuant),
      (false, 21, 13, 2, 8, 1, 0, nonFlat), // 4:2:0, odd dims
      (false, 24, 16, 2, 62, 1, 2, JpegEncoder.FlatQuant)) // restarts
    for ((gray, w, h, sub, split, al, rst, q) <- configs) {
      val n = if (gray) w * h else 3 * w * h
      val img = new Array[Byte](n)
      rnd.nextBytes(img)
      val seqJpg = JpegEncoder.encode(w, h, img, gray, q, sub)
      val progJpg = JpegEncoder.encodeProgressive(w, h, img, gray, q,
        sub, split, al, rst)
      val a = JpegDecoder.decode(seqJpg)
      val b = JpegDecoder.decode(progJpg)
      assert(a.isDefined && b.isDefined, s"cfg ($gray,$w,$h,$sub) declined")
      assert(java.util.Arrays.equals(a.get.rgba, b.get.rgba),
        s"cfg ($gray,$w,$h,$sub,$split,$al,$rst): pixel mismatch")
    }
  }

  test("progressive fuzz: random content always matches sequential") {
    val rnd = new scala.util.Random(271)
    for (trial <- 0 until 60) {
      val gray = rnd.nextBoolean()
      val w = 8 + rnd.nextInt(34)
      val h = 8 + rnd.nextInt(26)
      val sub = if (gray) 1 else 1 + rnd.nextInt(2)
      val split = 1 + rnd.nextInt(62)
      val al = rnd.nextInt(3)
      val rst = if (rnd.nextBoolean()) 0 else 1 + rnd.nextInt(4)
      val img = new Array[Byte](if (gray) w * h else 3 * w * h)
      rnd.nextBytes(img)
      val a = JpegDecoder.decode(
        JpegEncoder.encode(w, h, img, gray, JpegEncoder.FlatQuant, sub))
      val b = JpegDecoder.decode(JpegEncoder.encodeProgressive(
        w, h, img, gray, JpegEncoder.FlatQuant, sub, split, al, rst))
      assert(a.isDefined && b.isDefined, s"trial $trial declined")
      assert(java.util.Arrays.equals(a.get.rgba, b.get.rgba),
        s"trial $trial ($gray,$w,$h,$sub,$split,$al,$rst)")
    }
  }

  test("progressive corrupt-safety: truncation and bit flips never throw") {
    val img = flatTiles(24, 16, (tx, ty) => 30 * (tx + ty + 1))
    val jpg = JpegEncoder.encodeProgressive(24, 16, img, gray = true,
      alShift = 1, restartInterval = 2)
    assert(JpegDecoder.decode(jpg).isDefined)
    for (cut <- 0 until jpg.length) {
      JpegDecoder.decode(jpg.take(cut)): Unit // must not throw
    }
    val rnd = new scala.util.Random(97)
    for (_ <- 0 until 2000) {
      val flip = jpg.clone()
      flip(rnd.nextInt(flip.length)) =
        (flip(rnd.nextInt(flip.length)) ^ (1 << rnd.nextInt(8))).toByte
      JpegDecoder.decode(flip): Unit // any result, no throw
    }
  }

  test("decodePixelStats routes JPEG bytes through the real decoder") {
    val ss = spark
    import ss.implicits._
    val img = flatTiles(16, 8, (tx, _) => if (tx == 0) 10 else 250)
    val jpg = JpegEncoder.encode(16, 8, img, gray = true)
    val ds = Seq(
      MediaRecord(1L, jpg, "image/jpeg"),
      MediaRecord(2L, jpg.take(20), "image/jpeg")).toDS()
    val rows = Multimodal.decodePixelStats(ds).orderBy("doc_id").collect()
    assert(rows(0).getInt(1) == 16 && rows(0).getInt(2) == 8)
    // 64 px at 10 + 64 px at 250, same on all three channels
    val expect = 64L * 10 + 64L * 250
    assert(rows(0).getLong(4) == expect && rows(0).getLong(5) == expect &&
      rows(0).getLong(6) == expect)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(4))
  }
}
