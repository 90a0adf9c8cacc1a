package graft.multimodal

import java.util.zip.{CRC32, Deflater}

/** Minimal stdlib-only PNG writer — the encode half of
  * [[PngDecoder]]: 8-bit depth, color types 0/2/3/4/6, plain or
  * Adam7-interlaced, caller-chosen per-row filter (0-4; for
  * interlaced output the filter list cycles over the EMITTED scanline
  * sequence across passes). Used to plant pixel-exact fixtures (every
  * filter type exercised) and to round-trip-test the decoder; also a
  * real write path for raster artifacts (masks, heatmaps) without any
  * codec dependency.
  */
object PngEncoder {

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1
    case 2 => 3
    case 3 => 1
    case 4 => 2
    case 6 => 4
    case _ => throw new IllegalArgumentException(
      s"unsupported color type $colorType")
  }

  /** `samples` is the unfiltered image data: w·h·channels bytes,
    * row-major. `rowFilters(y)` picks the filter for row y (cycled if
    * shorter; empty = all None). `palette` (RGB triples) is required
    * for color type 3.
    */
  def encode(
      w: Int,
      h: Int,
      colorType: Int,
      samples: Array[Byte],
      rowFilters: Seq[Int] = Nil,
      palette: Array[Byte] = null,
      interlaced: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0, "dimensions must be positive")
    val channels = channelsOf(colorType)
    require(samples.length == w * h * channels,
      s"need ${w * h * channels} sample bytes, got ${samples.length}")
    if (colorType == 3) require(palette != null && palette.length % 3 == 0,
      "palette (RGB triples) required for color type 3")
    val bpp = channels
    val stride = w * channels

    // Filter one pass's packed samples (the encode-side transform:
    // filtered = raw - pred), appending filter-byte-prefixed scanlines
    // to `out`; `rowIdx` advances over the emitted-scanline sequence.
    val out = new java.io.ByteArrayOutputStream()
    var rowIdx = 0
    def filterPass(pass: Array[Byte], pw: Int, ph: Int): Unit = {
      val strideP = pw * channels
      val row = new Array[Byte](1 + strideP)
      var y = 0
      while (y < ph) {
        val f =
          if (rowFilters.isEmpty) 0 else rowFilters(rowIdx % rowFilters.size)
        require(f >= 0 && f <= 4, s"filter must be 0-4, got $f")
        row(0) = f.toByte
        val src = y * strideP
        val prv = src - strideP
        var x = 0
        while (x < strideP) {
          val v = pass(src + x) & 0xFF
          val a = if (x >= bpp) pass(src + x - bpp) & 0xFF else 0
          val b = if (y > 0) pass(prv + x) & 0xFF else 0
          val c = if (y > 0 && x >= bpp) pass(prv + x - bpp) & 0xFF else 0
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) >> 1
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a)
              val pb = math.abs(p - b)
              val pc = math.abs(p - c)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          }
          row(1 + x) = (v - pred).toByte
          x += 1
        }
        out.write(row)
        rowIdx += 1
        y += 1
      }
    }
    if (!interlaced) filterPass(samples, w, h)
    else {
      // Adam7: gather each pass's subsampled pixels, filter the pass
      // as its own reduced image (same geometry the decoder scatters)
      val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
        (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      passes.foreach { case (x0, y0, dx, dy) =>
        val pw = (w - x0 + dx - 1) / dx
        val ph = (h - y0 + dy - 1) / dy
        if (pw > 0 && ph > 0) {
          val pass = new Array[Byte](ph * pw * channels)
          var j = 0
          while (j < ph) {
            var i = 0
            while (i < pw) {
              System.arraycopy(samples,
                ((y0 + j * dy) * w + (x0 + i * dx)) * channels,
                pass, (j * pw + i) * channels, channels)
              i += 1
            }
            j += 1
          }
          filterPass(pass, pw, ph)
        }
      }
    }
    val raw = out.toByteArray

    // zlib-deflate
    val defl = new Deflater()
    val idat = try {
      defl.setInput(raw)
      defl.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!defl.finished()) buf.write(tmp, 0, defl.deflate(tmp))
      buf.toByteArray
    } finally defl.end()

    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new CRC32()
      crc.update(t)
      crc.update(data)
      be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
    }
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0,
        if (interlaced) 1 else 0)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++
      (if (colorType == 3) chunk("PLTE", palette) else Array.emptyByteArray) ++
      chunk("IDAT", idat) ++ chunk("IEND", Array.emptyByteArray)
  }
}
