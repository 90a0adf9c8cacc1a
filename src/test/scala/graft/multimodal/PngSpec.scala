package graft.multimodal

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class PngSpec extends SparkTestBase {

  private def expand(
      w: Int, h: Int, ct: Int, samples: Array[Byte],
      palette: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 * w * h)
    for (px <- 0 until w * h) {
      val o = 4 * px
      ct match {
        case 0 =>
          out(o) = samples(px); out(o + 1) = samples(px)
          out(o + 2) = samples(px); out(o + 3) = -1
        case 2 =>
          out(o) = samples(3 * px); out(o + 1) = samples(3 * px + 1)
          out(o + 2) = samples(3 * px + 2); out(o + 3) = -1
        case 3 =>
          val i = samples(px) & 0xFF
          out(o) = palette(3 * i); out(o + 1) = palette(3 * i + 1)
          out(o + 2) = palette(3 * i + 2); out(o + 3) = -1
        case 4 =>
          out(o) = samples(2 * px); out(o + 1) = samples(2 * px)
          out(o + 2) = samples(2 * px); out(o + 3) = samples(2 * px + 1)
        case 6 =>
          System.arraycopy(samples, 4 * px, out, o, 4)
      }
    }
    out
  }

  test("roundtrip: every color type x every filter, byte-exact RGBA") {
    val rnd = new scala.util.Random(41)
    val palette = Array.tabulate[Byte](3 * 16)(i => (i * 13 % 251).toByte)
    for {
      ct <- Seq(0, 2, 3, 4, 6)
      filter <- 0 to 4
    } {
      val channels = Seq(1, 3, 1, 2, 4)(Seq(0, 2, 3, 4, 6).indexOf(ct))
      val (w, h) = (7, 5)
      val samples = Array.tabulate[Byte](w * h * channels) { i =>
        // palette samples must index within the 16-entry palette
        if (ct == 3) (rnd.nextInt(16)).toByte else rnd.nextInt(256).toByte
      }
      val png = PngEncoder.encode(w, h, ct, samples,
        rowFilters = Seq(filter),
        palette = if (ct == 3) palette else null)
      val dec = PngDecoder.decode(png)
      assert(dec.isDefined, s"ct=$ct filter=$filter failed to decode")
      assert(dec.get.width == w && dec.get.height == h)
      assert(java.util.Arrays.equals(
        dec.get.rgba, expand(w, h, ct, samples, palette)),
        s"ct=$ct filter=$filter RGBA mismatch")
    }
  }

  test("roundtrip: Adam7 interlace, every color type, byte-exact RGBA") {
    val rnd = new scala.util.Random(47)
    val palette = Array.tabulate[Byte](3 * 16)(i => (i * 13 % 251).toByte)
    for {
      ct <- Seq(0, 2, 3, 4, 6)
      // sizes around the 8x8 pass grid: sub-tile, odd, exact, larger
      (w, h) <- Seq((3, 2), (7, 5), (8, 8), (13, 11), (1, 1), (1, 9))
    } {
      val channels = Seq(1, 3, 1, 2, 4)(Seq(0, 2, 3, 4, 6).indexOf(ct))
      val samples = Array.tabulate[Byte](w * h * channels) { _ =>
        if (ct == 3) rnd.nextInt(16).toByte else rnd.nextInt(256).toByte
      }
      val png = PngEncoder.encode(w, h, ct, samples,
        rowFilters = Seq(0, 1, 2, 3, 4), // cycles across pass scanlines
        palette = if (ct == 3) palette else null,
        interlaced = true)
      val dec = PngDecoder.decode(png)
      assert(dec.isDefined, s"ct=$ct ${w}x$h interlaced failed to decode")
      assert(dec.get.width == w && dec.get.height == h)
      assert(java.util.Arrays.equals(
        dec.get.rgba, expand(w, h, ct, samples, palette)),
        s"ct=$ct ${w}x$h interlaced RGBA mismatch")
    }
  }

  test("interlaced corrupt-safety: truncations decline, never throw") {
    val samples = Array.tabulate[Byte](13 * 11 * 3)(i => (i * 7).toByte)
    val png = PngEncoder.encode(13, 11, 2, samples,
      rowFilters = Seq(1, 4), interlaced = true)
    assert(PngDecoder.decode(png).isDefined)
    for (cut <- Seq(1, 8, 20, 40, png.length / 2, png.length - 1)) {
      assert(PngDecoder.decode(png.take(png.length - cut)).isEmpty,
        s"truncated-by-$cut interlaced PNG must decline")
    }
  }

  test("roundtrip: mixed filters per row survive (filter state chains)") {
    val rnd = new scala.util.Random(43)
    val samples = Array.fill[Byte](9 * 8 * 3)(rnd.nextInt(256).toByte)
    val png = PngEncoder.encode(9, 8, 2, samples,
      rowFilters = Seq(4, 1, 3, 2, 0, 4, 2, 1))
    val dec = PngDecoder.decode(png).get
    assert(java.util.Arrays.equals(dec.rgba, expand(9, 8, 2, samples, null)))
  }

  test("corrupt-safety: truncations and random bytes return None, never throw") {
    val samples = Array.tabulate[Byte](4 * 4 * 3)(i => (i * 7).toByte)
    val png = PngEncoder.encode(4, 4, 2, samples, rowFilters = Seq(0, 1, 2, 4))
    // every truncation point of a valid file
    for (n <- 0 until png.length) {
      assert(PngDecoder.decode(png.take(n)).isEmpty, s"truncation at $n")
    }
    // random corruption of single bytes in the IDAT region: must not
    // throw (some flips still inflate; sums may differ, which is fine)
    val rnd = new scala.util.Random(47)
    for (_ <- 1 to 200) {
      val mutated = png.clone()
      val i = rnd.nextInt(png.length - 8) + 8
      mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
      PngDecoder.decode(mutated) // Option either way; no exception
    }
    // pure fuzz
    for (seed <- 1 to 300) {
      val r = new scala.util.Random(seed)
      val junk = Array.fill[Byte](r.nextInt(400))(r.nextInt(256).toByte)
      assert(PngDecoder.decode(junk).isEmpty || true)
    }
  }

  test("declared-size bombs and unsupported profiles decline") {
    val samples = Array.fill[Byte](4)(1)
    val png = PngEncoder.encode(2, 2, 0, samples)
    // forge the IHDR width to 2^30: the 64 MiB raster cap must refuse
    // BEFORE allocating (offsets: sig 8 + len 4 + "IHDR" 4 = byte 16)
    val bomb = png.clone()
    bomb(16) = 0x40.toByte; bomb(17) = 0; bomb(18) = 0; bomb(19) = 0
    assert(PngDecoder.decode(bomb).isEmpty)
    // 16-bit depth declines to None rather than mis-decode
    val deep = png.clone(); deep(24) = 16.toByte
    assert(PngDecoder.decode(deep).isEmpty)
    // a FORGED interlace flag on a sequentially-encoded payload is a
    // corrupt file (the Adam7 pass layout needs more scanline bytes
    // than the sequential stream carries) — decline, don't mis-decode
    val adam7 = png.clone(); adam7(28) = 1.toByte
    assert(PngDecoder.decode(adam7).isEmpty)
  }

  test("decodePixelStats: exact channel sums distributed, non-PNG rows null") {
    val ss = spark
    import ss.implicits._
    val samples = (for (y <- 0 until 4; x <- 0 until 4;
                        v <- Seq(16 * x + y, 8 * y, 4 * (x + y)))
      yield v.toByte).toArray
    val png = PngEncoder.encode(4, 4, 2, samples, rowFilters = Seq(0, 1, 2, 4))
    val ds = Seq(
      MediaRecord(1L, png, "image/png"),
      MediaRecord(2L, "not a png".getBytes("UTF-8"), "text/plain")).toDS()
    val rows = Multimodal.decodePixelStats(ds).orderBy("doc_id").collect()
    assert(rows(0).getLong(3) == 16L) // n_px
    assert(rows(0).getLong(4) == 408L && rows(0).getLong(5) == 192L &&
      rows(0).getLong(6) == 192L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(4))
  }
  test("tileFeatures: tiles partition the image; sums fold to the whole") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(55)
    // fuzz rasters at awkward sizes: tile sums must fold EXACTLY to
    // decodePixelStats' whole-image sums for every grid
    for ((w, h) <- Seq((4, 4), (7, 5), (1, 9), (3, 1))) {
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val png = PngEncoder.encode(w, h, 2, rgb)
      val ds = Seq(MediaRecord(1L, png, "image/png")).toDS()
      for (grid <- Seq(1, 2, 3, 5)) {
        val tiles = Multimodal.tileFeatures(ds, grid).collect()
        val whole = Multimodal.decodePixelStats(ds).head
        assert(tiles.map(_.getLong(3)).sum == whole.getLong(3),
          s"${w}x$h grid $grid n_px")
        assert(tiles.map(_.getLong(4)).sum == whole.getLong(4))
        assert(tiles.map(_.getLong(5)).sum == whole.getLong(5))
        assert(tiles.map(_.getLong(6)).sum == whole.getLong(6))
        // no empty tiles emitted; tile count bounded by min(grid, dim)²
        assert(tiles.forall(_.getLong(3) > 0))
        assert(tiles.length == math.min(grid, w) * math.min(grid, h),
          s"${w}x$h grid $grid count ${tiles.length}")
      }
    }
    // hand-check one tile: 4x4 raster A, grid 2, tile (1,0)
    val samples = (for (y <- 0 until 4; x <- 0 until 4;
                        v <- Seq(16 * x + y, 8 * y, 4 * (x + y)))
      yield v.toByte).toArray
    val pngA = PngEncoder.encode(4, 4, 2, samples)
    val t10 = Multimodal.tileFeatures(
        Seq(MediaRecord(1L, pngA, "image/png")).toDS(), 2)
      .where(col("tile_x") === 1 && col("tile_y") === 0).head
    assert(t10.getLong(3) == 4 && t10.getLong(4) == 162 &&
      t10.getLong(5) == 16 && t10.getLong(6) == 48)
    // corrupt bytes emit one null row
    val bad = Multimodal.tileFeatures(
      Seq(MediaRecord(9L, "nope".getBytes, "image/png")).toDS(), 2)
      .collect()
    assert(bad.length == 1 && bad(0).isNullAt(1) && bad(0).isNullAt(3))
    intercept[IllegalArgumentException] {
      Multimodal.tileFeatures(
        Seq(MediaRecord(1L, pngA, "image/png")).toDS(), 0)
    }
  }

  test("dHash64: gradient-sign hash, brightness-invariant, exact") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(61)
    // 9x8 grayscale at native grid: bit b set iff px(x+1,y) > px(x,y)
    val g = Array.fill(9 * 8)(rnd.nextInt(200))
    def png(shift: Int) = PngEncoder.encode(9, 8, 0,
      g.map(v => (v + shift).toByte))
    var expect = 0L
    for (b <- 0 until 64) {
      val x = b % 8; val y = b / 8
      if (g(y * 9 + x + 1) > g(y * 9 + x)) expect |= 1L << b
    }
    val rows = Multimodal.dHash64(Seq(
        MediaRecord(1L, png(0), "image/png"),
        MediaRecord(2L, png(55), "image/png"), // brightness shift
        MediaRecord(3L, "junk".getBytes, "image/png"),
        MediaRecord(4L, PngEncoder.encode(4, 4, 0,
          Array.fill[Byte](16)(7)), "image/png")) // smaller than grid
      .toDS()).orderBy("doc_id").collect()
    assert(rows(0).getLong(1) == expect)
    // a uniform brightness shift preserves every gradient sign
    assert(rows(1).getLong(1) == expect)
    assert(rows(2).isNullAt(1) && rows(3).isNullAt(1))
    // downscale grid: an 18x16 image whose 2x2 blocks average to g
    // hashes identically (cross-multiplied means, no float division)
    val big = Array.ofDim[Byte](18 * 16)
    for (y <- 0 until 16; x <- 0 until 18) {
      val base = g((y / 2) * 9 + x / 2)
      // block values base-1, base+1, base, base: mean exactly base
      val d = (x % 2, y % 2) match {
        case (0, 0) => -1
        case (1, 0) => 1
        case _ => 0
      }
      big(y * 18 + x) = (base + d).toByte
    }
    val h2 = Multimodal.dHash64(Seq(
      MediaRecord(9L, PngEncoder.encode(18, 16, 0, big), "image/png"))
      .toDS()).head.getLong(1)
    assert(h2 == expect)
  }

  test("GIF roundtrip: palette indices survive LZW encode/decode") {
    val rnd = new scala.util.Random(71)
    val palette = Array.tabulate[Byte](3 * 8)(i => (i * 17 % 251).toByte)
    for ((w, h) <- Seq((7, 5), (64, 3), (1, 1))) {
      val idx = Array.fill[Byte](w * h)(rnd.nextInt(8).toByte)
      val gif = GifDecoder.encode(w, h, palette, idx)
      val dec = GifDecoder.decode(gif)
      assert(dec.isDefined, s"GIF ${w}x$h failed")
      assert(dec.get.width == w && dec.get.height == h)
      for (px <- 0 until w * h) {
        val c = idx(px) & 0xFF
        assert(dec.get.rgba(4 * px) == palette(3 * c), s"px $px")
        assert(dec.get.rgba(4 * px + 3) == -1.toByte)
      }
    }
  }

  test("GIF interlaced roundtrip: four-pass row order de-interleaves") {
    val rnd = new scala.util.Random(73)
    val palette = Array.tabulate[Byte](3 * 8)(i => (i * 17 % 251).toByte)
    // heights around the pass boundaries: <4, exactly 8, odd, tall
    for ((w, h) <- Seq((3, 2), (4, 8), (5, 11), (2, 17), (1, 1))) {
      val idx = Array.fill[Byte](w * h)(rnd.nextInt(8).toByte)
      val gif = GifDecoder.encode(w, h, palette, idx, interlaced = true)
      val dec = GifDecoder.decode(gif)
      assert(dec.isDefined, s"interlaced GIF ${w}x$h failed")
      for (px <- 0 until w * h) {
        val c = idx(px) & 0xFF
        assert(dec.get.rgba(4 * px) == palette(3 * c),
          s"interlaced ${w}x$h px $px")
      }
      // row permutation sanity: interlaced and sequential encodes of
      // the same raster decode identically
      val seqDec = GifDecoder.decode(GifDecoder.encode(w, h, palette, idx))
      assert(java.util.Arrays.equals(dec.get.rgba, seqDec.get.rgba))
    }
  }

  test("GIF interlaceRows is a permutation in four-pass order") {
    for (h <- 1 to 40) {
      val rows = GifDecoder.interlaceRows(h)
      assert(rows.length == h && rows.toSet == (0 until h).toSet,
        s"h=$h not a permutation: ${rows.toSeq}")
    }
    assert(GifDecoder.interlaceRows(10).toSeq ==
      Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
  }

  test("GIF interlaced corrupt-safety: truncation declines") {
    val gif = GifDecoder.encode(5, 11,
      Array.tabulate[Byte](12)(i => i.toByte),
      Array.fill[Byte](55)(2), interlaced = true)
    assert(GifDecoder.decode(gif).isDefined)
    for (cut <- Seq(5, 15, 30)) {
      val t = GifDecoder.decode(gif.take(gif.length - cut))
      assert(t.isEmpty || t.get.rgba.length == 4 * 55)
    }
  }

  test("GIF transparency index maps to alpha 0, colors unchanged") {
    val gif = GifDecoder.encode(2, 1,
      Array[Byte](1, 2, 3, 4, 5, 6), Array[Byte](0, 1),
      transparentIndex = 1)
    val r = GifDecoder.decode(gif).get
    assert(r.rgba.toSeq == Seq[Byte](1, 2, 3, -1, 4, 5, 6, 0))
  }

  test("GIF animation: composition, transparency holes, disposal 2") {
    import GifDecoder.AnimFrame
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 200.toByte, 100, 0, 5, 5, 5)
    val anim = GifDecoder.encodeAnimated(4, 2, pal, Seq(
      AnimFrame(0, 0, 4, 2, Array.fill(8)(0.toByte), delayCs = 10),
      AnimFrame(1, 0, 2, 1, Array[Byte](1, 2), delayCs = 20),
      AnimFrame(0, 1, 2, 1, Array[Byte](3, 1), delayCs = 30,
        transparentIndex = 3, disposal = 2),
      AnimFrame(3, 1, 1, 1, Array[Byte](2), delayCs = 5)))
    val fs = GifDecoder.decodeFrames(anim).get
    assert(fs.map(f => (f.index, f.delayCs)) ==
      Seq((0, 10), (1, 20), (2, 30), (3, 5)))
    def rgbSums(r: PngRaster): (Long, Long, Long, Long) = {
      var sr = 0L; var sg = 0L; var sb = 0L; var nOp = 0L
      for (i <- 0 until r.width * r.height if r.rgba(4 * i + 3) != 0) {
        nOp += 1
        sr += r.rgba(4 * i) & 0xFF
        sg += r.rgba(4 * i + 1) & 0xFF
        sb += r.rgba(4 * i + 2) & 0xFF
      }
      (nOp, sr, sg, sb)
    }
    assert(rgbSums(fs(0).raster) == ((8L, 80L, 160L, 240L)))
    assert(rgbSums(fs(1).raster) == ((8L, 300L, 270L, 240L)))
    // frame 2: transparent index 3 leaves the canvas pixel untouched
    assert(rgbSums(fs(2).raster) == ((8L, 330L, 300L, 270L)))
    // frame 3: disposal 2 cleared frame 2's rect before this draw
    assert(rgbSums(fs(3).raster) == ((6L, 470L, 310L, 150L)))
    // sampling picks 0, 2; maxFrames caps the walk
    assert(GifDecoder.decodeFrames(anim, everyK = 2).get
      .map(_.index) == Seq(0, 2))
    assert(GifDecoder.decodeFrames(anim, everyK = 1, maxFrames = 2).get
      .map(_.index) == Seq(0, 1))
    // decode() == first frame
    assert(java.util.Arrays.equals(
      GifDecoder.decode(anim).get.rgba, fs(0).raster.rgba))
    // disposal 3 declines; truncation declines; never throws
    val d3 = anim.clone()
    val gceAt = d3.indexOfSlice(Seq(0x21.toByte, 0xF9.toByte))
    d3(gceAt + 3) = (d3(gceAt + 3) | (3 << 2)).toByte
    assert(GifDecoder.decodeFrames(d3).isEmpty)
    for (cut <- 0 until anim.length)
      GifDecoder.decodeFrames(anim.take(cut)): Unit
  }

  test("resizeNearest: exact picking down and replication up") {
    // 4x2 raster, distinct per-pixel values
    val rgba = Array.tabulate(4 * 2 * 4) { i =>
      val px = i / 4
      (if (i % 4 == 3) -1 else 10 * px + i % 4).toByte
    }
    val r = PngRaster(4, 2, rgba)
    val down = Multimodal.resizeNearest(r, 2, 1)
    // picks (0,0) and (2,0): values 0.. and 20..
    assert(down.rgba.toSeq == Seq[Byte](0, 1, 2, -1, 20, 21, 22, -1))
    val up = Multimodal.resizeNearest(r, 8, 2)
    // each source pixel replicated twice horizontally
    assert((up.rgba(0) & 0xFF) == 0 && (up.rgba(4) & 0xFF) == 0 &&
      (up.rgba(8) & 0xFF) == 10)
    assert(up.width == 8 && up.height == 2)
  }

  test("resizeBilinear: uniform stays exact; same-size is identity") {
    // any uniform image must come through bit-exact under a correct
    // bilinear kernel (equal taps blend to themselves)
    val flat = PngRaster(7, 5, Array.fill(7 * 5 * 4)(123.toByte))
    for ((w, h) <- Seq((3, 2), (7, 5), (16, 9), (1, 1))) {
      val rz = Multimodal.resizeBilinear(flat, w, h)
      assert(rz.width == w && rz.height == h)
      assert(rz.rgba.forall(_ == 123.toByte), s"non-uniform at ${w}x$h")
    }
    // same size: sx = x exactly (rx = 0), so bilinear is the identity
    val rnd = new scala.util.Random(11)
    val noisy = PngRaster(6, 4,
      Array.fill(6 * 4 * 4)(rnd.nextInt(256).toByte))
    val id = Multimodal.resizeBilinear(noisy, 6, 4)
    assert(id.rgba.toSeq == noisy.rgba.toSeq)
  }

  test("resizeBilinear matches a BigInt-rational reference on fuzz") {
    // independent reference: exact rational half-pixel-center taps,
    // BigInt blend, round half-up — no shared code with the kernel
    def ref(r: PngRaster, ow: Int, oh: Int): Array[Byte] = {
      val out = new Array[Byte](4 * ow * oh)
      def taps(o: Int, outN: Int, srcN: Int): (Int, Int, BigInt, BigInt) = {
        val den = BigInt(2 * outN)
        val num = BigInt((2 * o + 1).toLong * srcN - outN)
        if (num <= 0) (0, 0, BigInt(0), den)
        else {
          var lo = (num / den).toInt
          var rem = num % den
          if (lo >= srcN - 1) { lo = srcN - 1; rem = BigInt(0) }
          (lo, math.min(lo + 1, srcN - 1), rem, den)
        }
      }
      for (y <- 0 until oh; x <- 0 until ow; c <- 0 until 4) {
        val (x0, x1, rx, dx) = taps(x, ow, r.width)
        val (y0, y1, ry, dy) = taps(y, oh, r.height)
        def px(yy: Int, xx: Int) = BigInt(r.rgba(4 * (yy * r.width + xx) + c) & 0xFF)
        val v = (dy - ry) * ((dx - rx) * px(y0, x0) + rx * px(y0, x1)) +
          ry * ((dx - rx) * px(y1, x0) + rx * px(y1, x1))
        out(4 * (y * ow + x) + c) = ((2 * v + dx * dy) / (2 * dx * dy)).toByte
      }
      out
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 40) {
      val sw = 1 + rnd.nextInt(12); val sh = 1 + rnd.nextInt(12)
      val ow = 1 + rnd.nextInt(12); val oh = 1 + rnd.nextInt(12)
      val r = PngRaster(sw, sh, Array.fill(4 * sw * sh)(rnd.nextInt(256).toByte))
      val got = Multimodal.resizeBilinear(r, ow, oh).rgba
      val want = ref(r, ow, oh)
      assert(got.toSeq == want.toSeq,
        s"mismatch at ${sw}x$sh -> ${ow}x$oh")
    }
  }

  test("resizeBilinear anti-aliases a gradient within rounding of float truth") {
    // horizontal ramp 0..255 over 256px, downscaled 4x: each output
    // must be within 1 of the float bilinear truth, and monotone
    val w = 256; val h = 4
    val rgba = Array.tabulate(w * h * 4) { i =>
      val px = i / 4
      (if (i % 4 == 3) -1 else px % w).toByte
    }
    val rz = Multimodal.resizeBilinear(PngRaster(w, h, rgba), 64, 1)
    val vals = (0 until 64).map(x => rz.rgba(4 * x) & 0xFF)
    for (x <- 0 until 64) {
      val sx = (x + 0.5) * w / 64.0 - 0.5
      val x0 = math.floor(sx).toInt.max(0).min(w - 1)
      val x1 = (x0 + 1).min(w - 1)
      val dx = (sx - x0).max(0.0)
      val truth = (1 - dx) * x0 + dx * x1
      assert(math.abs(vals(x) - truth) <= 1.0, s"x=$x got ${vals(x)} want ~$truth")
    }
    assert(vals == vals.sorted, "gradient must stay monotone")
    // nearest on the same ramp picks identical sample columns only at
    // matching phases; bilinear never exceeds the ramp's range
    assert(vals.head >= 0 && vals.last <= 255)
  }

  test("GIF LZW composite codes (KwKwK) decode correctly") {
    // hand-packed stream for indices 0,0,0,0,0,0 with minCode=2:
    // codes [CLEAR=4, 0, 6 (KwKwK), 7 (KwKwK), EOI=5] -> bytes 84 5F
    val header = Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      6, 0, 1, 0, // 6x1 logical screen
      (0x80 | 1).toByte, 0, 0) ++ // GCT: 4 entries
      Array[Byte](9, 9, 9, 8, 8, 8, 7, 7, 7, 6, 6, 6) ++ // palette
      Array[Byte](0x2C, 0, 0, 0, 0, 6, 0, 1, 0, 0) ++ // image descriptor
      Array[Byte](2, 2, 0x84.toByte, 0x5F, 0, 0x3B)
    val r = GifDecoder.decode(header).get
    assert(r.width == 6 && r.height == 1)
    // all six pixels are palette entry 0 = (9,9,9)
    assert((0 until 6).forall(i => r.rgba(4 * i) == 9))
  }

  test("GIF corrupt-safety: truncations and junk return None, never throw") {
    val gif = GifDecoder.encode(5, 4,
      Array.tabulate[Byte](12)(i => i.toByte),
      Array.fill[Byte](20)(2))
    val full = GifDecoder.decode(gif).get
    // a truncation either refuses (None) or — when only post-image
    // trailer bytes were cut — yields the IDENTICAL complete raster;
    // a partial/garbled raster is never returned
    for (n <- 0 until gif.length) {
      GifDecoder.decode(gif.take(n)) match {
        case None => ()
        case Some(r) =>
          assert(r.width == full.width && r.height == full.height &&
            java.util.Arrays.equals(r.rgba, full.rgba),
            s"partial raster at truncation $n")
      }
    }
    val rnd = new scala.util.Random(73)
    for (_ <- 1 to 300) {
      val junk = "GIF89a".getBytes("US-ASCII") ++
        Array.fill[Byte](rnd.nextInt(120))(rnd.nextInt(256).toByte)
      GifDecoder.decode(junk) // Option either way
    }
  }
}
