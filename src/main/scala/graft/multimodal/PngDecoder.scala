package graft.multimodal

import java.util.zip.Inflater

/** A decoded raster: dimensions plus tightly-packed RGBA bytes
  * (4·width·height — row-major, no padding). Grayscale and palette
  * sources are expanded to RGBA so downstream feature math is
  * format-independent.
  */
final case class PngRaster(width: Int, height: Int, rgba: Array[Byte])

/** Real compressed-payload PNG decode, stdlib-only: chunk walk →
  * concatenated-IDAT zlib inflate (`java.util.zip.Inflater`) → per-
  * scanline defilter (None/Sub/Up/Average/Paeth) → RGBA expansion
  * (gray / RGB / palette / gray+alpha / RGBA).
  *
  * Like every decoder in this package the reader is corrupt-safe: any
  * malformed structure — bad signature, truncated chunk, oversized
  * dimensions, short inflate, unknown filter, palette index past PLTE
  * — returns None, never throws (the fuzz spec drives random bytes
  * through it). Scope is the common web-PNG profile: 8-bit depth,
  * color types 0/2/3/4/6, non-interlaced AND Adam7-interlaced (each
  * of the 7 passes defiltered independently, then scattered by the
  * pass geometry). 1/2/4/16-bit depths decline to None rather than
  * mis-decode.
  *
  * Reference behavior anchor: the reference engine treats object bytes
  * as opaque payloads end-to-end (amazons3-blueprints
  * download_file.py:60-85); this is the engine-side decode a training
  * pipeline adds on top. Format layout per the public PNG spec
  * (RFC 2083).
  */
object PngDecoder {

  /** Refuse rasters past this many RGBA bytes (64 MiB ≈ a 4096×4096
    * image) — a 20-byte forged IHDR must not allocate gigabytes.
    */
  private val MaxRgbaBytes = 64 << 20

  def isPng(media: Array[Byte]): Boolean =
    media != null && media.length >= 8 &&
      (media(0) & 0xFF) == 0x89 && media(1) == 'P'.toByte &&
      media(2) == 'N'.toByte && media(3) == 'G'.toByte &&
      (media(4) & 0xFF) == 0x0D && (media(5) & 0xFF) == 0x0A &&
      (media(6) & 0xFF) == 0x1A && (media(7) & 0xFF) == 0x0A

  def decode(media: Array[Byte]): Option[PngRaster] = try {
    if (!isPng(media)) return None
    def u32(o: Int): Long =
      ((media(o) & 0xFFL) << 24) | ((media(o + 1) & 0xFFL) << 16) |
        ((media(o + 2) & 0xFFL) << 8) | (media(o + 3) & 0xFFL)
    var w = 0
    var h = 0
    var bitDepth = -1
    var colorType = -1
    var interlace = -1
    var plte: Array[Byte] = null
    var seenIhdr = false
    var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    while (pos + 12 <= media.length && !seenIend) {
      val len = u32(pos)
      if (len > media.length.toLong || pos + 12 + len > media.length)
        return None // declared chunk overruns EOF: desynced file
      val dataOff = pos + 8
      val typ = new String(media, pos + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          w = u32(dataOff).toInt
          h = u32(dataOff + 4).toInt
          bitDepth = media(dataOff + 8) & 0xFF
          colorType = media(dataOff + 9) & 0xFF
          if ((media(dataOff + 10) & 0xFF) != 0 ||
            (media(dataOff + 11) & 0xFF) != 0) return None
          interlace = media(dataOff + 12) & 0xFF
          seenIhdr = true
        case "PLTE" =>
          if (len % 3 != 0 || len == 0) return None
          plte = java.util.Arrays
            .copyOfRange(media, dataOff, dataOff + len.toInt)
        case "IDAT" => idat.write(media, dataOff, len.toInt)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks (tEXt, gAMA, ...) skip over
      }
      pos += 12 + len.toInt
    }
    if (!seenIhdr || !seenIend || w <= 0 || h <= 0) return None
    if (bitDepth != 8 || (interlace != 0 && interlace != 1)) return None
    val channels = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // RGB
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // RGBA
      case _ => return None
    }
    if (colorType == 3 && plte == null) return None
    if (4L * w * h > MaxRgbaBytes) return None
    val stride = w * channels
    // Adam7 pass geometry (x0, y0, dx, dy); non-interlaced = one
    // full-coverage pass. Each pass is an independently-filtered
    // reduced image; empty passes (a dimension rounds to 0) emit no
    // scanlines at all per the spec.
    val passes: Seq[(Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val passDims = passes.map { case (x0, y0, dx, dy) =>
      ((w - x0 + dx - 1) / dx, (h - y0 + dy - 1) / dy)
    }
    val rawLen = passDims.map { case (pw, ph) =>
      if (pw > 0 && ph > 0) ph * (1 + pw * channels) else 0
    }.sum

    // zlib-inflate the concatenated IDAT payload; a short stream (or
    // trailing-garbage-only stream) is a corrupt payload, not an image
    val compressed = idat.toByteArray
    if (compressed.isEmpty) return None
    val raw = new Array[Byte](rawLen)
    val inf = new Inflater()
    try {
      inf.setInput(compressed)
      var got = 0
      while (got < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, got, rawLen - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got < rawLen) return None
    } finally inf.end()

    // Defilter one pass's scanlines (filter bytes stripped) into a
    // packed array; prev row is all-zero for row 0 per the spec.
    // Returns null on an unknown filter type (corrupt).
    val bpp = channels // bytes per pixel at depth 8
    def defilterPass(off: Int, pw: Int, ph: Int): Array[Byte] = {
      val strideP = pw * channels
      val out = new Array[Byte](ph * strideP)
      var y = 0
      while (y < ph) {
        val f = raw(off + y * (1 + strideP)) & 0xFF
        val src = off + y * (1 + strideP) + 1
        val dst = y * strideP
        val prv = dst - strideP
        var x = 0
        f match {
          case 0 => // None
            System.arraycopy(raw, src, out, dst, strideP)
          case 1 => // Sub: left neighbor
            while (x < strideP) {
              val a = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
              out(dst + x) = ((raw(src + x) & 0xFF) + a).toByte
              x += 1
            }
          case 2 => // Up: row above
            while (x < strideP) {
              val b = if (y > 0) out(prv + x) & 0xFF else 0
              out(dst + x) = ((raw(src + x) & 0xFF) + b).toByte
              x += 1
            }
          case 3 => // Average: floor((left + up) / 2)
            while (x < strideP) {
              val a = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
              val b = if (y > 0) out(prv + x) & 0xFF else 0
              out(dst + x) = ((raw(src + x) & 0xFF) + ((a + b) >> 1)).toByte
              x += 1
            }
          case 4 => // Paeth predictor
            while (x < strideP) {
              val a = if (x >= bpp) out(dst + x - bpp) & 0xFF else 0
              val b = if (y > 0) out(prv + x) & 0xFF else 0
              val c = if (y > 0 && x >= bpp) out(prv + x - bpp) & 0xFF else 0
              val p = a + b - c
              val pa = math.abs(p - a)
              val pb = math.abs(p - b)
              val pc = math.abs(p - c)
              val pred =
                if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              out(dst + x) = ((raw(src + x) & 0xFF) + pred).toByte
              x += 1
            }
          case _ => return null // unknown filter type: corrupt
        }
        y += 1
      }
      out
    }

    val img: Array[Byte] =
      if (interlace == 0) {
        // the single pass IS the image — no scatter copy on the hot path
        val p = defilterPass(0, w, h)
        if (p == null) return None
        p
      } else {
        // Adam7 de-interlace: defilter each pass, then scatter pixel
        // (i, j) of the pass to image (x0 + i·dx, y0 + j·dy) — pure
        // index arithmetic over the already-working core
        val full = new Array[Byte](h * stride)
        var off = 0
        var pi = 0
        while (pi < passes.size) {
          val (x0, y0, dx, dy) = passes(pi)
          val (pw, ph) = passDims(pi)
          if (pw > 0 && ph > 0) {
            val p = defilterPass(off, pw, ph)
            if (p == null) return None
            var j = 0
            while (j < ph) {
              var i = 0
              while (i < pw) {
                System.arraycopy(p, (j * pw + i) * channels,
                  full, (y0 + j * dy) * stride + (x0 + i * dx) * channels,
                  channels)
                i += 1
              }
              j += 1
            }
            off += ph * (1 + pw * channels)
          }
          pi += 1
        }
        full
      }

    // expand to packed RGBA
    val rgba = new Array[Byte](4 * w * h)
    var i = 0
    val nPx = w * h
    var px = 0
    while (px < nPx) {
      val o = 4 * px
      colorType match {
        case 0 =>
          val g = img(px)
          rgba(o) = g; rgba(o + 1) = g; rgba(o + 2) = g
          rgba(o + 3) = -1
        case 2 =>
          i = 3 * px
          rgba(o) = img(i); rgba(o + 1) = img(i + 1)
          rgba(o + 2) = img(i + 2); rgba(o + 3) = -1
        case 3 =>
          val idx = img(px) & 0xFF
          if (3 * idx + 2 >= plte.length) return None
          rgba(o) = plte(3 * idx); rgba(o + 1) = plte(3 * idx + 1)
          rgba(o + 2) = plte(3 * idx + 2); rgba(o + 3) = -1
        case 4 =>
          i = 2 * px
          val g = img(i)
          rgba(o) = g; rgba(o + 1) = g; rgba(o + 2) = g
          rgba(o + 3) = img(i + 1)
        case 6 =>
          i = 4 * px
          rgba(o) = img(i); rgba(o + 1) = img(i + 1)
          rgba(o + 2) = img(i + 2); rgba(o + 3) = img(i + 3)
      }
      px += 1
    }
    Some(PngRaster(w, h, rgba))
  } catch { case _: Throwable => None }
}
