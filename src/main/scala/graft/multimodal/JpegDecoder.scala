package graft.multimodal

/** Baseline-sequential AND progressive JPEG pixel decode, stdlib-only
  * — the third real compressed-payload decoder next to [[PngDecoder]]
  * and [[GifDecoder]]: marker walk (SOI/DQT/DHT/SOF/DRI/SOS/EOI, APPn
  * and COM skipped), canonical Huffman decode of the entropy stream
  * (byte-stuffing and RSTn restarts honored), DC prediction,
  * dequantize + dezigzag, 8×8 inverse DCT, and YCbCr→RGB with
  * replicated chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0 layouts.
  *
  * Scope: baseline and extended-sequential Huffman frames (SOF0/SOF1)
  * plus progressive Huffman frames (SOF2 — most real web JPEGs):
  * spectral selection, successive approximation (DC and AC first +
  * refinement scans, EOB-run coding), interleaved DC and
  * non-interleaved per-component scans, DHT/DRI redefinition between
  * scans. 8-bit samples, 1 or 3 components. Arithmetic coding,
  * hierarchical, and 12-bit frames decline to None rather than
  * mis-decode; like the sibling decoders every malformed structure
  * (truncated segment, bad Huffman code, overrun bitstream, oversized
  * dims) returns None, never throws. Progressive holds the full
  * coefficient set until EOI by nature (one Int per coefficient,
  * bounded by the same MaxRgbaBytes dimension cap).
  *
  * Exactness note for the planted oracles: JPEG is lossy, but a
  * DC-only block (all AC coefficients zero) decodes to a CONSTANT
  * 8×8 tile whose value is exact under ANY conformant IDCT —
  * idct(F)(x,y) = F(0,0)/8 + 128 — so fixtures built from flat tiles
  * with neutral chroma have analytic channel sums; AC content is
  * covered by tolerance round-trips in the spec instead.
  *
  * Reference behavior anchor: the reference treats object bytes as
  * opaque payloads (amazons3-blueprints download_file.py:60-85); this
  * is engine-side decode per the public JPEG spec (ITU T.81).
  */
object JpegDecoder {

  private val MaxRgbaBytes = 64 << 20

  def isJpeg(media: Array[Byte]): Boolean =
    media != null && media.length >= 3 &&
      (media(0) & 0xFF) == 0xFF && (media(1) & 0xFF) == 0xD8 &&
      (media(2) & 0xFF) == 0xFF

  /** Zig-zag scan order: zigzag(k) = raster index of the k-th
    * transmitted coefficient.
    */
  private[multimodal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](8 * 8)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Canonical Huffman table: per-length first-code bookkeeping (the
    * T.81 DECODE procedure) over the BITS/HUFFVAL segments.
    */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len)) & 0xFF
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * byte-unstuffing; stops (returns -1) at any real marker.
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    var hitMarker = false

    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) return -1
        var b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= data.length) return -1
          val n = data(pos) & 0xFF
          if (n == 0x00) pos += 1 // stuffed 0xFF data byte
          else { hitMarker = true; pos -= 1; return -1 }
          b = 0xFF
        }
        buf = b
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    def bitsVal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }

    /** Align to a byte boundary and consume an expected RSTn marker. */
    def restart(): Boolean = {
      cnt = 0
      hitMarker = false
      if (pos + 2 > data.length) return false
      if ((data(pos) & 0xFF) != 0xFF) return false
      val m = data(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2
      true
    }

    def decodeHuff(h: Huff): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l) &&
          code >= h.minCode(l)) return h.value(l, code)
        val b = bit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1 // code longer than 16 bits: corrupt
    }

    /** T.81 EXTEND: an s-bit magnitude to a signed value. */
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      val v = bitsVal(s)
      if (v == Int.MinValue) return Int.MinValue
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
  }

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var dcTab: Int = 0, var acTab: Int = 0)

  def decode(media: Array[Byte]): Option[PngRaster] = try {
    if (!isJpeg(media)) return None
    def u8(i: Int): Int = media(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)

    val qt = new Array[Array[Int]](4)
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var comps: Array[Component] = null
    var progressive = false
    var w = 0
    var h = 0
    var restartInterval = 0
    var pos = 2
    var sosAt = -1

    // frame geometry (set once at SOF)
    var hMax = 0
    var vMax = 0
    var mcusX = 0
    var mcusY = 0
    var planeW: Array[Int] = null
    var planeH: Array[Int] = null
    var planes: Array[Array[Byte]] = null
    // progressive coefficient store: [ci](blockIndex * 64 + zigzagK),
    // blocks on the MCU-padded grid padBW x padBH
    var padBW: Array[Int] = null
    var padBH: Array[Int] = null
    var pCoefs: Array[Array[Int]] = null
    var sawScan = false

    /** Dequantized raster-order coefficients -> plane pixels. */
    def idctToPlane(coef: Array[Int], ci: Int, bx: Int, by: Int): Unit = {
      // separable would be faster; at fixture scale the direct 2-D
      // sum is clearer and still per-byte map-side work
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var sum = 0.0
          var v = 0
          while (v < 8) {
            var u = 0
            val cy = CosTable(y * 8 + v)
            while (u < 8) {
              val f = coef(v * 8 + u)
              if (f != 0) {
                val cu = if (u == 0) InvSqrt2 else 1.0
                val cv = if (v == 0) InvSqrt2 else 1.0
                sum += cu * cv * f * CosTable(x * 8 + u) * cy
              }
              u += 1
            }
            v += 1
          }
          val s = math.round(sum / 4.0 + 128.0).toInt
          val clamped = if (s < 0) 0 else if (s > 255) 255 else s
          val px = bx * 8 + x
          val py = by * 8 + y
          if (px < planeW(ci) && py < planeH(ci))
            planes(ci)(py * planeW(ci) + px) = clamped.toByte
          x += 1
        }
        y += 1
      }
    }

    /** Non-interleaved (single-component scan) block grid: the
      * component's ceil dimensions, NOT the MCU-padded grid (T.81
      * A.2.2); indexes into the padded coefficient store.
      */
    def ceilBlocksW(ci: Int): Int =
      (((w * comps(ci).h + hMax - 1) / hMax) + 7) / 8
    def ceilBlocksH(ci: Int): Int =
      (((h * comps(ci).v + vMax - 1) / vMax) + 7) / 8

    /** One progressive scan: accumulate coefficients for the scan's
      * band/precision into pCoefs. Returns the position of the next
      * marker, or -1 on corruption.
      */
    def progressiveScan(
        scanComps: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
        startPos: Int): Int = {
      val br = new BitReader(media, startPos)
      val dcPred = new Array[Int](comps.length)
      var eobrun = 0
      val p1 = 1 << al

      def dcFirst(ci: Int, blk: Int): Boolean = {
        val t = br.decodeHuff(dcHuff(comps(ci).dcTab))
        if (t < 0 || t > 15) return false
        val diff = br.receiveExtend(t)
        if (diff == Int.MinValue) return false
        dcPred(ci) += diff
        pCoefs(ci)(blk * 64) = dcPred(ci) << al
        true
      }
      def dcRefine(ci: Int, blk: Int): Boolean = {
        val b = br.bit()
        if (b < 0) return false
        if (b == 1) pCoefs(ci)(blk * 64) |= p1
        true
      }
      def acFirst(ci: Int, blk: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        val co = pCoefs(ci)
        val base = blk * 64
        var k = ss
        while (k <= se) {
          val rs = br.decodeHuff(acHuff(comps(ci).acTab))
          if (rs < 0) return false
          val r = rs >> 4
          val s = rs & 0x0F
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else { // EOBn: run of (1<<r) + ext blocks ends here
              eobrun = (1 << r) - 1
              if (r > 0) {
                val x = br.bitsVal(r)
                if (x == Int.MinValue) return false
                eobrun += x
              }
              return true
            }
          } else {
            k += r
            if (k > se) return false
            val v = br.receiveExtend(s)
            if (v == Int.MinValue) return false
            co(base + k) = v << al
            k += 1
          }
        }
        true
      }
      // T.81 G.2: refinement appends one correction bit per already-
      // nonzero coefficient traversed; newly-significant coefficients
      // arrive as +-1 at this bit position.
      def acRefine(ci: Int, blk: Int): Boolean = {
        val co = pCoefs(ci)
        val base = blk * 64
        var k = ss
        if (eobrun == 0) {
          var ended = false
          while (k <= se && !ended) {
            val rs = br.decodeHuff(acHuff(comps(ci).acTab))
            if (rs < 0) return false
            var r = rs >> 4
            val s = rs & 0x0F
            var newVal = 0
            if (s == 0) {
              if (r < 15) { // EOBn (current block still takes its tail
                eobrun = 1 << r //  of correction bits below)
                if (r > 0) {
                  val x = br.bitsVal(r)
                  if (x == Int.MinValue) return false
                  eobrun += x
                }
                ended = true
              } // r == 15: ZRL — skip 16 zero-history positions
            } else {
              if (s != 1) return false // refinement codes only +-1
              val b = br.bit()
              if (b < 0) return false
              newVal = if (b == 1) p1 else -p1
            }
            if (!ended) {
              var advancing = true
              while (k <= se && advancing) {
                val c = co(base + k)
                if (c != 0) {
                  val b = br.bit()
                  if (b < 0) return false
                  if (b == 1 && (c & p1) == 0)
                    co(base + k) = if (c >= 0) c + p1 else c - p1
                } else {
                  if (r == 0) {
                    if (newVal != 0) co(base + k) = newVal
                    advancing = false
                  } else r -= 1
                }
                k += 1
              }
            }
          }
        }
        if (eobrun > 0) { // correction-bit tail for this block
          while (k <= se) {
            val c = co(base + k)
            if (c != 0) {
              val b = br.bit()
              if (b < 0) return false
              if (b == 1 && (c & p1) == 0)
                co(base + k) = if (c >= 0) c + p1 else c - p1
            }
            k += 1
          }
          eobrun -= 1
        }
        true
      }

      def unit(ci: Int, blk: Int): Boolean =
        if (ss == 0) { if (ah == 0) dcFirst(ci, blk) else dcRefine(ci, blk) }
        else { if (ah == 0) acFirst(ci, blk) else acRefine(ci, blk) }

      // table presence, per what the scan actually uses
      var i = 0
      while (i < scanComps.length) {
        val c = comps(scanComps(i))
        if (ss == 0 && ah == 0 && dcHuff(c.dcTab) == null) return -1
        if (ss > 0 && acHuff(c.acTab) == null) return -1
        i += 1
      }

      if (scanComps.length > 1) { // interleaved (DC scans only): MCU order
        var mcu = 0
        val total = mcusX * mcusY
        while (mcu < total) {
          if (restartInterval > 0 && mcu > 0 &&
            mcu % restartInterval == 0) {
            if (!br.restart()) return -1
            java.util.Arrays.fill(dcPred, 0)
            eobrun = 0
          }
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var si = 0
          while (si < scanComps.length) {
            val ci = scanComps(si)
            val c = comps(ci)
            var v = 0
            while (v < c.v) {
              var u = 0
              while (u < c.h) {
                val blk = (my * c.v + v) * padBW(ci) + (mx * c.h + u)
                if (!unit(ci, blk)) return -1
                u += 1
              }
              v += 1
            }
            si += 1
          }
          mcu += 1
        }
      } else { // non-interleaved: ceil-dims data-unit order
        val ci = scanComps(0)
        val bw = ceilBlocksW(ci)
        val bh = ceilBlocksH(ci)
        var b = 0
        val total = bw * bh
        while (b < total) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            if (!br.restart()) return -1
            java.util.Arrays.fill(dcPred, 0)
            eobrun = 0
          }
          val blk = (b / bw) * padBW(ci) + (b % bw)
          if (!unit(ci, blk)) return -1
          b += 1
        }
      }
      // skip any pad bits / unconsumed RSTn to the next real marker
      var p = br.pos
      while (p + 1 < media.length &&
        !((media(p) & 0xFF) == 0xFF && {
          val n = media(p + 1) & 0xFF
          n != 0x00 && (n < 0xD0 || n > 0xD7)
        })) p += 1
      p
    }

    /** Shared tail: component planes -> RGBA raster. */
    def assemble(): Option[PngRaster] = {
      val rgba = new Array[Byte](4 * w * h)
      var y = 0
      if (comps.length == 1) {
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = planes(0)(y * planeW(0) + x)
            val o = 4 * (y * w + x)
            rgba(o) = g; rgba(o + 1) = g; rgba(o + 2) = g; rgba(o + 3) = -1
            x += 1
          }
          y += 1
        }
      } else {
        val c0 = comps(0); val c1 = comps(1); val c2 = comps(2)
        while (y < h) {
          var x = 0
          while (x < w) {
            val yy = planes(0)(
              (y * c0.v / vMax) * planeW(0) + (x * c0.h / hMax)) & 0xFF
            val cb = (planes(1)(
              (y * c1.v / vMax) * planeW(1) + (x * c1.h / hMax)) & 0xFF) - 128
            val cr = (planes(2)(
              (y * c2.v / vMax) * planeW(2) + (x * c2.h / hMax)) & 0xFF) - 128
            def clamp(d: Double): Byte = {
              val v = math.round(d).toInt
              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
            }
            val o = 4 * (y * w + x)
            rgba(o) = clamp(yy + 1.402 * cr)
            rgba(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
            rgba(o + 2) = clamp(yy + 1.772 * cb)
            rgba(o + 3) = -1
            x += 1
          }
          y += 1
        }
      }
      Some(PngRaster(w, h, rgba))
    }

    // ---- marker segment walk (to SOS for sequential; to EOI for
    // progressive, decoding each scan as its SOS arrives) ----
    while (sosAt < 0) {
      if (pos + 2 > media.length) return None
      if (u8(pos) != 0xFF) return None
      var m = u8(pos + 1)
      while (m == 0xFF) { pos += 1; if (pos + 2 > media.length) return None; m = u8(pos + 1) }
      if (m == 0xD8) { pos += 2 } // stray SOI
      else if (m == 0xD9) { // EOI
        if (!progressive || !sawScan) return None
        // dequantize + IDCT the accumulated coefficient store
        val coef = new Array[Int](64)
        var ci = 0
        while (ci < comps.length) {
          val q = qt(comps(ci).tq)
          if (q == null) return None
          val co = pCoefs(ci)
          var by = 0
          while (by < padBH(ci)) {
            var bx = 0
            while (bx < padBW(ci)) {
              val base = (by * padBW(ci) + bx) * 64
              java.util.Arrays.fill(coef, 0)
              var k = 0
              while (k < 64) {
                val v = co(base + k)
                if (v != 0) coef(Zigzag(k)) = v * q(k)
                k += 1
              }
              idctToPlane(coef, ci, bx, by)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        return assemble()
      } else {
        if (pos + 4 > media.length) return None
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > media.length) return None
        val seg = pos + 4
        val segEnd = pos + 2 + len
        var nextPos = segEnd
        m match {
          case 0xDB => // DQT: one or more tables
            var p = seg
            while (p < segEnd) {
              val pq = u8(p) >> 4
              val tq = u8(p) & 0x0F
              if (tq > 3) return None
              if (pq == 0) {
                if (p + 65 > segEnd) return None
                qt(tq) = Array.tabulate(64)(k => u8(p + 1 + k))
                p += 65
              } else if (pq == 1) {
                if (p + 129 > segEnd) return None
                qt(tq) = Array.tabulate(64)(k => u16(p + 1 + 2 * k))
                p += 129
              } else return None
            }
          case 0xC4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              if (p + 17 > segEnd) return None
              val tc = u8(p) >> 4
              val th = u8(p) & 0x0F
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(i => u8(p + 1 + i))
              val n = bits.sum
              if (n > 256 || p + 17 + n > segEnd) return None
              val vals = java.util.Arrays
                .copyOfRange(media, p + 17, p + 17 + n)
              val t = new Huff(bits, vals)
              if (tc == 0) dcHuff(th) = t else acHuff(th) = t
              p += 17 + n
            }
          case 0xC0 | 0xC1 | 0xC2 => // sequential / progressive frame
            if (comps != null) return None
            progressive = m == 0xC2
            if (u8(seg) != 8) return None // sample precision
            h = u16(seg + 1)
            w = u16(seg + 3)
            val nc = u8(seg + 5)
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            if (4L * w * h > MaxRgbaBytes) return None
            if (seg + 6 + 3 * nc > segEnd) return None
            comps = Array.tabulate(nc) { i =>
              val o = seg + 6 + 3 * i
              val hv = u8(o + 1)
              val c = Component(u8(o), hv >> 4, hv & 0x0F, u8(o + 2))
              if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
                return None
              c
            }
            hMax = comps.map(_.h).max
            vMax = comps.map(_.v).max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            planeW = comps.map(c => mcusX * c.h * 8)
            planeH = comps.map(c => mcusY * c.v * 8)
            planes = comps.indices.map(i =>
              new Array[Byte](planeW(i) * planeH(i))).toArray
            if (progressive) {
              padBW = comps.map(c => mcusX * c.h)
              padBH = comps.map(c => mcusY * c.v)
              pCoefs = comps.indices.map(i =>
                new Array[Int](padBW(i) * padBH(i) * 64)).toArray
            }
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
              0xCD | 0xCE | 0xCF =>
            return None // lossless/arithmetic/hierarchical: declined
          case 0xDD => // DRI
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xDA => // SOS
            if (comps == null) return None
            val ns = u8(seg)
            if (ns < 1 || ns > comps.length ||
              seg + 1 + 2 * ns + 3 > segEnd) return None
            val scanComps = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cs = u8(seg + 1 + 2 * i)
              val tabs = u8(seg + 2 + 2 * i)
              val ci = comps.indexWhere(_.id == cs)
              if (ci < 0) return None
              scanComps(i) = ci
              comps(ci).dcTab = tabs >> 4
              comps(ci).acTab = tabs & 0x0F
              if (comps(ci).dcTab > 3 || comps(ci).acTab > 3) return None
              i += 1
            }
            if (progressive) {
              val ss = u8(seg + 1 + 2 * ns)
              val se = u8(seg + 2 + 2 * ns)
              val ahAl = u8(seg + 3 + 2 * ns)
              val ah = ahAl >> 4
              val al = ahAl & 0x0F
              if (ss > 63 || se > 63 || se < ss) return None
              if (ss == 0 && se != 0) return None // DC scans: Ss=Se=0
              if (ss > 0 && ns != 1) return None // AC scans: one comp
              if (ah > 13 || al > 13) return None
              val next = progressiveScan(scanComps, ss, se, ah, al, segEnd)
              if (next < 0) return None
              sawScan = true
              nextPos = next
            } else {
              if (ns != comps.length) return None
              sosAt = segEnd
            }
          case _ => () // APPn, COM, others: skip
        }
        if (sosAt < 0) pos = nextPos
      }
    }

    // ---- sequential entropy-coded scan ----
    for (c <- comps) {
      if (qt(c.tq) == null) return None
      if (dcHuff(c.dcTab) == null || acHuff(c.acTab) == null) return None
    }

    val br = new BitReader(media, sosAt)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Int](64)

    def decodeBlock(ci: Int, bx: Int, by: Int): Boolean = {
      val c = comps(ci)
      val q = qt(c.tq)
      java.util.Arrays.fill(coef, 0)
      val t = br.decodeHuff(dcHuff(c.dcTab))
      if (t < 0 || t > 15) return false
      val diff = br.receiveExtend(t)
      if (diff == Int.MinValue) return false
      dcPred(ci) += diff
      coef(0) = dcPred(ci) * q(0)
      var k = 1
      while (k < 64) {
        val rs = br.decodeHuff(acHuff(c.acTab))
        if (rs < 0) return false
        val r = rs >> 4
        val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += r
          if (k > 63) return false
          val v = br.receiveExtend(s)
          if (v == Int.MinValue) return false
          coef(Zigzag(k)) = v * q(k)
          k += 1
        }
      }
      idctToPlane(coef, ci, bx, by)
      true
    }

    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        var v = 0
        while (v < c.v) {
          var u = 0
          while (u < c.h) {
            if (!decodeBlock(ci, mx * c.h + u, my * c.v + v)) return None
            u += 1
          }
          v += 1
        }
        ci += 1
      }
      mcu += 1
    }

    assemble()
  } catch { case _: Throwable => None }
}
