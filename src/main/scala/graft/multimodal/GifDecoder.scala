package graft.multimodal

/** GIF pixel decode, stdlib-only — the second real compressed-payload
  * decoder next to [[PngDecoder]]: header + logical-screen descriptor,
  * global/local color tables, image descriptors, and the LZW
  * variable-code-width decompression of their index streams
  * (GIF87a/89a layout per the public GIF specification).
  *
  * Animation is decoded for real (round 13, the mandate's
  * "frame-sample" verb): frames composite onto the logical-screen
  * canvas at their (left, top) rects, per-frame graphic-control
  * extensions carry delay/transparency/disposal, disposal 0/1 keeps
  * the composite and disposal 2 restores the rect to transparent;
  * disposal 3 (restore-previous) declines rather than mis-composite.
  * [[decode]] is the first frame; [[decodeFrames]] samples every k-th
  * composited frame. Sequential or interlaced (the four-pass row
  * order de-interleaves after LZW expansion). Corrupt-safe:
  * truncation, bad code widths, out-of-table codes, out-of-canvas
  * rects, oversized dimensions all return None, never throw.
  */
object GifDecoder {

  private val MaxRgbaBytes = 64 << 20

  /** One sampled animation frame: its index in the stream, the GCE
    * delay (centiseconds, 0 if none), and the COMPOSITED canvas.
    */
  final case class GifFrame(index: Int, delayCs: Int, raster: PngRaster)

  def isGif(media: Array[Byte]): Boolean =
    media != null && media.length >= 13 &&
      media(0) == 'G'.toByte && media(1) == 'I'.toByte &&
      media(2) == 'F'.toByte && media(3) == '8'.toByte &&
      (media(4) == '7'.toByte || media(4) == '9'.toByte) &&
      media(5) == 'a'.toByte

  /** First frame (at logical-screen size). Single-frame feature
    * extraction keeps a transparent pixel's palette RGB with alpha 0
    * (the q180 oracle contract — color information is a feature even
    * where the pixel doesn't render); animation compositing
    * ([[decodeFrames]]) leaves transparent pixels untouched instead.
    */
  def decode(media: Array[Byte]): Option[PngRaster] =
    walk(media, everyK = 1, maxFrames = 1, keepTransparentColor = true)
      .flatMap(_.headOption.map(_.raster))

  /** Frame sampling: decode the animation, keeping every `everyK`-th
    * composited frame (0, k, 2k, …) up to `maxFrames` kept frames —
    * the standard video-style subsampling shape. Decoding stops as
    * soon as the sample is full, so cost is bounded by the SAMPLED
    * prefix, not the file's frame count.
    */
  def decodeFrames(
      media: Array[Byte],
      everyK: Int = 1,
      maxFrames: Int = 64): Option[Seq[GifFrame]] =
    walk(media, everyK, maxFrames, keepTransparentColor = false)

  private def walk(
      media: Array[Byte],
      everyK: Int,
      maxFrames: Int,
      keepTransparentColor: Boolean): Option[Seq[GifFrame]] = try {
    if (!isGif(media)) return None
    if (everyK < 1 || maxFrames < 1) return None
    def u8(i: Int): Int = media(i) & 0xFF
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8) // little-endian
    var pos = 6
    // logical screen descriptor: the CANVAS frames composite onto
    if (pos + 7 > media.length) return None
    val sw = u16(pos)
    val sh = u16(pos + 2)
    val packed = u8(pos + 4)
    if (sw <= 0 || sh <= 0) return None
    if (4L * sw * sh > MaxRgbaBytes) return None
    pos += 7
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7) // entries
      if (pos + 3 * n > media.length) return None
      gct = java.util.Arrays.copyOfRange(media, pos, pos + 3 * n)
      pos += 3 * n
    }
    val canvas = new Array[Byte](4 * sw * sh) // starts fully transparent
    val kept = Seq.newBuilder[GifFrame]
    var nKept = 0
    var frameIdx = 0
    // per-frame GCE state (applies to the next image only)
    var transparent = -1
    var disposal = 0
    var delayCs = 0
    while (pos < media.length) {
      u8(pos) match {
        case 0x21 => // extension: label + sub-blocks
          if (pos + 2 > media.length) return None
          val label = u8(pos + 1)
          pos += 2
          if (label == 0xF9 && pos + 6 <= media.length && u8(pos) == 4) {
            // graphic control: disposal + transparency + delay
            val p = u8(pos + 1)
            disposal = (p >> 2) & 7
            delayCs = u16(pos + 2)
            transparent = if ((p & 1) != 0) u8(pos + 4) else -1
          }
          var bs = if (pos < media.length) u8(pos) else return None
          while (bs != 0) {
            pos += 1 + bs
            if (pos >= media.length) return None
            bs = u8(pos)
          }
          pos += 1 // block terminator
        case 0x2C => // image descriptor
          if (pos + 10 > media.length) return None
          val left = u16(pos + 1)
          val top = u16(pos + 3)
          val w = u16(pos + 5)
          val h = u16(pos + 7)
          val ip = u8(pos + 9)
          pos += 10
          val interlaced = (ip & 0x40) != 0
          var table = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (pos + 3 * n > media.length) return None
            table = java.util.Arrays.copyOfRange(media, pos, pos + 3 * n)
            pos += 3 * n
          }
          if (table == null || w <= 0 || h <= 0) return None
          if (left + w > sw || top + h > sh) return None // off-canvas
          if (disposal >= 3) return None // restore-previous: declined
          if (pos >= media.length) return None
          val minCode = u8(pos)
          pos += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate the LZW sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var bs = if (pos < media.length) u8(pos) else return None
          while (bs != 0) {
            if (pos + 1 + bs > media.length) return None
            data.write(media, pos + 1, bs)
            pos += 1 + bs
            if (pos >= media.length) return None
            bs = u8(pos)
          }
          pos += 1 // past the 0 terminator
          val idx0 = lzwDecode(data.toByteArray, minCode, w * h)
            .getOrElse(return None)
          // interlaced frames store rows in four passes; storage row r
          // is display row interlaceRows(h)(r)
          val idx = if (!interlaced) idx0 else {
            val rows = interlaceRows(h)
            val re = new Array[Byte](w * h)
            var r = 0
            while (r < h) {
              System.arraycopy(idx0, r * w, re, rows(r) * w, w)
              r += 1
            }
            re
          }
          // composite the rect onto the canvas (transparent pixels
          // leave the underlying canvas untouched)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val c = idx(y * w + x) & 0xFF
              if (c != transparent || keepTransparentColor) {
                if (3 * c + 2 >= table.length) return None
                val o = 4 * ((top + y) * sw + (left + x))
                canvas(o) = table(3 * c)
                canvas(o + 1) = table(3 * c + 1)
                canvas(o + 2) = table(3 * c + 2)
                canvas(o + 3) = if (c == transparent) 0 else -1
              }
              x += 1
            }
            y += 1
          }
          if (frameIdx % everyK == 0 && nKept < maxFrames) {
            kept += GifFrame(frameIdx, delayCs,
              PngRaster(sw, sh, canvas.clone()))
            nKept += 1
          }
          if (nKept >= maxFrames) return Some(kept.result())
          // post-display disposal: 2 = restore the rect to transparent
          if (disposal == 2) {
            var yy = 0
            while (yy < h) {
              var xx = 0
              while (xx < w) {
                val o = 4 * ((top + yy) * sw + (left + xx))
                canvas(o) = 0; canvas(o + 1) = 0
                canvas(o + 2) = 0; canvas(o + 3) = 0
                xx += 1
              }
              yy += 1
            }
          }
          transparent = -1
          disposal = 0
          delayCs = 0
          frameIdx += 1
        case 0x3B => // trailer
          val fs = kept.result()
          return if (fs.nonEmpty) Some(fs) else None
        case _ => return None // desynced
      }
    }
    val fs = kept.result()
    if (fs.nonEmpty) Some(fs) else None
  } catch { case _: Throwable => None }

  /** Display-row order of the GIF four-pass interlace: storage row r
    * (the order rows appear in the LZW stream) renders at display row
    * `interlaceRows(h)(r)` — passes cover every 8th row from 0, every
    * 8th from 4, every 4th from 2, every 2nd from 1.
    */
  private[multimodal] def interlaceRows(h: Int): Array[Int] =
    ((0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++
      (1 until h by 2)).toArray

  /** GIF-variant LZW: variable code width from minCode+1 to 12 bits,
    * CLEAR resets the table, EOI ends the stream; codes are packed
    * little-endian. Returns exactly `need` indices or None.
    */
  private def lzwDecode(
      data: Array[Byte],
      minCode: Int,
      need: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](need)
    var outLen = 0
    var tableSize = eoi + 1
    var width = minCode + 1
    var bitPos = 0
    val totalBits = data.length * 8
    var prev = -1
    def read(): Int = {
      if (bitPos + width > totalBits) return -1
      var v = 0
      var i = 0
      while (i < width) {
        val b = bitPos + i
        if ((data(b >> 3) & (1 << (b & 7))) != 0) v |= 1 << i
        i += 1
      }
      bitPos += width
      v
    }
    // expand a code to the output buffer (iterative, root-first)
    val stack = new Array[Byte](4096)
    def emit(code: Int): Boolean = {
      var c = code
      var sp = 0
      while (c >= clear) { // composite entry: walk prefixes
        if (sp >= 4096 || c >= tableSize) return false
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      if (outLen + sp + 1 > need) return false
      out(outLen) = c.toByte; outLen += 1
      while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
      true
    }
    def firstChar(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return None // truncated bit stream
      if (code == clear) {
        tableSize = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else {
        if (prev < 0) {
          if (code >= clear) return None // first code must be a root
          if (!emit(code)) return None
        } else {
          if (code > tableSize) return None
          if (code == tableSize) {
            // the KwKwK case: emit prev + firstChar(prev)
            if (tableSize < 4096) {
              prefix(tableSize) = prev
              suffix(tableSize) = firstChar(prev).toByte
              tableSize += 1
            } else return None
            if (!emit(code)) return None // the just-added entry
          } else {
            if (tableSize < 4096) {
              prefix(tableSize) = prev
              suffix(tableSize) = firstChar(code).toByte
              tableSize += 1
            }
            if (!emit(code)) return None
          }
          if (tableSize == (1 << width) && width < 12) width += 1
        }
        prev = code
        if (outLen >= need) done = true
      }
    }
    if (outLen == need) Some(out) else None
  }

  /** Fixture-grade "uncompressed" GIF writer: literal root codes with a
    * CLEAR every 2^minCode − 2 literals so the code width never grows —
    * the standard uncompressed-GIF technique; decodes through any
    * conformant LZW decoder. First frame, global color table, no
    * extensions (or one GCE when `transparentIndex` ≥ 0).
    */
  def encode(
      w: Int,
      h: Int,
      palette: Array[Byte],
      indices0: Array[Byte],
      transparentIndex: Int = -1,
      interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && indices0.length == w * h, "bad dimensions")
    // interlaced storage: emit display rows in four-pass order
    val indices = if (!interlaced) indices0 else {
      val rows = interlaceRows(h)
      val re = new Array[Byte](w * h)
      var r = 0
      while (r < h) {
        System.arraycopy(indices0, rows(r) * w, re, r * w, w)
        r += 1
      }
      re
    }
    require(palette.length % 3 == 0 && palette.length >= 6, "bad palette")
    val entries = palette.length / 3
    var gctBits = 1
    while ((2 << (gctBits - 1)) < entries) gctBits += 1
    val gctN = 2 << (gctBits - 1)
    val minCode = math.max(2, gctBits)
    val lzw = lzwLiteral(indices, minCode)
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0x80 | (gctBits - 1)) // GCT present
    out.write(0); out.write(0)
    out.write(palette)
    for (_ <- entries until gctN) { out.write(0); out.write(0); out.write(0) }
    if (transparentIndex >= 0) {
      out.write(Array[Byte](0x21.toByte, 0xF9.toByte, 4, 1, 0, 0,
        transparentIndex.toByte, 0))
    }
    out.write(0x2C) // image descriptor at (0,0), no LCT
    le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0)
    out.write(minCode)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // sub-block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Uncompressed-technique LZW stream: literal root codes with a
    * CLEAR every 2^minCode − 2 literals so the code width never grows.
    */
  private def lzwLiteral(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val width = minCode + 1
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0
    var curBits = 0
    def put(code: Int): Unit = {
      cur |= code << curBits
      curBits += width
      while (curBits >= 8) {
        bits.write(cur & 0xFF); cur >>= 8; curBits -= 8
      }
    }
    put(clear)
    var sinceClear = 0
    indices.foreach { ix =>
      put(ix & 0xFF)
      sinceClear += 1
      if (sinceClear == clear - 2) { put(clear); sinceClear = 0 }
    }
    put(eoi)
    if (curBits > 0) bits.write(cur & 0xFF)
    bits.toByteArray
  }

  /** One frame of [[encodeAnimated]]: a rect of palette indices drawn
    * at (left, top), with its own delay/transparency/disposal.
    */
  final case class AnimFrame(
      left: Int,
      top: Int,
      w: Int,
      h: Int,
      indices: Array[Byte],
      delayCs: Int = 0,
      transparentIndex: Int = -1,
      disposal: Int = 1)

  /** Animated-GIF fixture writer: logical screen (sw, sh), one global
    * color table, one image descriptor per frame, each preceded by a
    * graphic-control extension carrying delay/transparency/disposal.
    */
  def encodeAnimated(
      sw: Int,
      sh: Int,
      palette: Array[Byte],
      frames: Seq[AnimFrame]): Array[Byte] = {
    require(sw > 0 && sh > 0 && frames.nonEmpty, "bad dimensions/frames")
    require(palette.length % 3 == 0 && palette.length >= 6, "bad palette")
    frames.foreach { f =>
      require(f.w > 0 && f.h > 0 && f.indices.length == f.w * f.h &&
        f.left + f.w <= sw && f.top + f.h <= sh, "frame rect off-canvas")
      require(f.disposal >= 0 && f.disposal <= 2, "disposal 0..2")
    }
    val entries = palette.length / 3
    var gctBits = 1
    while ((2 << (gctBits - 1)) < entries) gctBits += 1
    val gctN = 2 << (gctBits - 1)
    val minCode = math.max(2, gctBits)
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(sw); le16(sh)
    out.write(0x80 | (gctBits - 1)) // GCT present
    out.write(0); out.write(0)
    out.write(palette)
    for (_ <- entries until gctN) { out.write(0); out.write(0); out.write(0) }
    frames.foreach { f =>
      // graphic control: disposal bits 4-2, transparency bit 0
      val pk = (f.disposal << 2) | (if (f.transparentIndex >= 0) 1 else 0)
      out.write(Array[Byte](0x21.toByte, 0xF9.toByte, 4, pk.toByte,
        (f.delayCs & 0xFF).toByte, ((f.delayCs >> 8) & 0xFF).toByte,
        math.max(0, f.transparentIndex).toByte, 0))
      out.write(0x2C)
      le16(f.left); le16(f.top); le16(f.w); le16(f.h)
      out.write(0) // no LCT, not interlaced
      out.write(minCode)
      val lzw = lzwLiteral(f.indices, minCode)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n)
        out.write(lzw, off, n)
        off += n
      }
      out.write(0) // sub-block terminator
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }
}
