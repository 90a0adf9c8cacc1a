package graft.multimodal

/** GIF pixel decode, stdlib-only — the second real compressed-payload
  * decoder next to [[PngDecoder]]: header + logical-screen descriptor,
  * global/local color tables, the FIRST image descriptor, and the LZW
  * variable-code-width decompression of its index stream (GIF87a/89a
  * layout per the public GIF specification). Extension blocks
  * (graphic control, comments, application) are skipped structurally;
  * a GCE transparency index maps to alpha 0.
  *
  * Scope: the first frame, sequential or interlaced (the four-pass
  * row order de-interleaves after LZW expansion — rows 0,8,16… then
  * 4,12,… then 2,6,… then 1,3,…). Corrupt-safe: truncation, bad code
  * widths, out-of-table codes, oversized dimensions all return None,
  * never throw.
  */
object GifDecoder {

  private val MaxRgbaBytes = 64 << 20

  def isGif(media: Array[Byte]): Boolean =
    media != null && media.length >= 13 &&
      media(0) == 'G'.toByte && media(1) == 'I'.toByte &&
      media(2) == 'F'.toByte && media(3) == '8'.toByte &&
      (media(4) == '7'.toByte || media(4) == '9'.toByte) &&
      media(5) == 'a'.toByte

  def decode(media: Array[Byte]): Option[PngRaster] = try {
    if (!isGif(media)) return None
    def u8(i: Int): Int = media(i) & 0xFF
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8) // little-endian
    var pos = 6
    // logical screen descriptor
    if (pos + 7 > media.length) return None
    val packed = u8(pos + 4)
    var transparent = -1
    pos += 7
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7) // entries
      if (pos + 3 * n > media.length) return None
      gct = java.util.Arrays.copyOfRange(media, pos, pos + 3 * n)
      pos += 3 * n
    }
    // block walk to the first image descriptor
    while (pos < media.length) {
      u8(pos) match {
        case 0x21 => // extension: label + sub-blocks
          if (pos + 2 > media.length) return None
          val label = u8(pos + 1)
          pos += 2
          if (label == 0xF9 && pos + 6 <= media.length && u8(pos) == 4) {
            // graphic control: transparency flag + index
            if ((u8(pos + 1) & 1) != 0) transparent = u8(pos + 4)
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
          if (4L * w * h > MaxRgbaBytes) return None
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
          val rgba = new Array[Byte](4 * w * h)
          var i = 0
          while (i < w * h) {
            val c = idx(i) & 0xFF
            if (3 * c + 2 >= table.length) return None
            rgba(4 * i) = table(3 * c)
            rgba(4 * i + 1) = table(3 * c + 1)
            rgba(4 * i + 2) = table(3 * c + 2)
            rgba(4 * i + 3) = if (c == transparent) 0 else -1
            i += 1
          }
          return Some(PngRaster(w, h, rgba))
        case 0x3B => return None // trailer before any image
        case _ => return None // desynced
      }
    }
    None
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
    val lzw = bits.toByteArray
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
}
