package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path

/** Delta Lake deletion-vector (reader v3) support — everything here
  * implements the PUBLIC delta-io PROTOCOL.md "Deletion Vectors"
  * section: Z85 descriptor encoding, the on-disk DV file layout
  * (version byte, per-DV [size][data][crc32] frames), and the
  * RoaringBitmapArray "portable" serialization (magic 1681511377,
  * then a count of NON-EMPTY bitmaps, then per bitmap a 4-byte
  * little-endian key — the high 32 bits of the row indexes it holds —
  * followed by a standard 32-bit roaring bitmap in the official
  * RoaringFormatSpec portable format; keys ascend and may have gaps).
  *
  * Scope: enough to READ any DV a conformant writer produces (array,
  * bitmap, and run containers all decode) and to AUTHOR spec-exact DV
  * fixtures for tests (the [[DeltaFixture]] pattern — plant real
  * bytes, gate against an independent oracle). Row indexes are the
  * 64-bit values `bitmapIndex * 2^32 + containerValue`.
  */
object DeletionVectors {

  /** One add action's `deletionVector` descriptor (PROTOCOL.md
    * field-for-field). `offset` is absent for inline DVs.
    */
  final case class DvDescriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  // ---------------------------------------------------------------
  // Z85 (ZeroMQ base85) — the descriptor encoding for UUIDs and
  // inline DV bytes; input length must be a multiple of 4.
  // ---------------------------------------------------------------

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"

  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85 input must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xFFL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"z85 input must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      require(v <= 0xFFFFFFFFL, "z85 group overflows 32 bits")
      out(o) = ((v >>> 24) & 0xFF).toByte
      out(o + 1) = ((v >>> 16) & 0xFF).toByte
      out(o + 2) = ((v >>> 8) & 0xFF).toByte
      out(o + 3) = (v & 0xFF).toByte
      i += 5
      o += 4
    }
    out
  }

  // ---------------------------------------------------------------
  // RoaringBitmapArray "portable" format
  // ---------------------------------------------------------------

  private val MagicNumber = 1681511377

  /** Deserialize portable-format bytes to SORTED 64-bit row indexes. */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == MagicNumber,
      s"bad RoaringBitmapArray magic $magic (want $MagicNumber)")
    val nBitmaps = buf.getLong()
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue,
      s"bitmap count $nBitmaps out of range")
    val out = Array.newBuilder[Long]
    var b = 0L
    var lastKey = -1
    while (b < nBitmaps) {
      // per-bitmap key (4-byte LE): high 32 bits; sparse, ascending
      val key = buf.getInt()
      require(key > lastKey,
        s"RoaringBitmapArray keys must ascend: $key after $lastKey")
      lastKey = key
      val high = key.toLong << 32
      readRoaring32(buf, v => out += (high | (v & 0xFFFFFFFFL)))
      b += 1
    }
    out.result()
  }

  /** One standard 32-bit roaring bitmap (RoaringFormatSpec portable):
    * values emitted ascending through `emit`.
    */
  private def readRoaring32(buf: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = buf.getInt()
    val (nContainers, runFlags) =
      if ((cookie & 0xFFFF) == 12347) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        buf.get(flags)
        (n, flags)
      } else {
        require(cookie == 12346, s"bad roaring cookie $cookie")
        (buf.getInt(), null)
      }
    def isRun(i: Int): Boolean =
      runFlags != null && (runFlags(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = buf.getShort() & 0xFFFF
      cards(i) = (buf.getShort() & 0xFFFF) + 1
      i += 1
    }
    // offset header: always with cookie 12346; with run containers
    // only when nContainers >= 4 (NO_OFFSET_THRESHOLD)
    if (runFlags == null || nContainers >= 4) {
      var j = 0
      while (j < nContainers) { buf.getInt(); j += 1 }
    }
    i = 0
    while (i < nContainers) {
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = buf.getShort() & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort() & 0xFFFF
          val len = buf.getShort() & 0xFFFF
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var c = 0
        while (c < cards(i)) {
          emit(base | (buf.getShort() & 0xFFFF))
          c += 1
        }
      } else {
        // bitmap container: 1024 little-endian longs
        var w = 0
        while (w < 1024) {
          var word = buf.getLong()
          val wordBase = base | (w << 6)
          while (word != 0L) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            emit(wordBase | t)
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
  }

  /** Serialize SORTED DISTINCT 64-bit row indexes to portable-format
    * bytes — the authoring twin (array or bitmap containers by
    * cardinality; runs are a writer optimization this twin skips,
    * which conformant readers — including [[deserialize]] — accept).
    */
  def serialize(values: Array[Long]): Array[Byte] = {
    require(values.sameElements(values.distinct.sorted),
      "serialize needs sorted distinct values")
    values.foreach(v => require(v >= 0, s"negative row index $v"))
    // only NON-EMPTY bitmaps are written, each prefixed by its 4-byte
    // key (ascending, gaps allowed) — the RoaringBitmapArray portable
    // layout real Delta writers emit
    val byBitmap = values.groupBy(v => (v >>> 32).toInt).toSeq.sortBy(_._1)
    val bitmaps = byBitmap.map { case (key, vs) =>
      (key, serializeRoaring32(vs.map(v => (v & 0xFFFFFFFFL).toInt)))
    }
    val raw = 12 + bitmaps.map { case (_, b) => 4 + b.length }.sum
    // pad to 4-byte alignment: inline DVs are z85-encoded (4-byte
    // groups); [[deserialize]] reads structurally and ignores slack
    val total = (raw + 3) / 4 * 4
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(MagicNumber)
    buf.putLong(bitmaps.size.toLong)
    bitmaps.foreach { case (key, b) => buf.putInt(key); buf.put(b) }
    buf.array()
  }

  private def serializeRoaring32(values: Array[Int]): Array[Byte] = {
    val byKey = values.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
    val n = byKey.size
    val containers = byKey.map { case (_, vs) =>
      val sorted = vs.map(_ & 0xFFFF).sorted
      if (sorted.length <= 4096) {
        val cb = ByteBuffer.allocate(sorted.length * 2)
          .order(ByteOrder.LITTLE_ENDIAN)
        sorted.foreach(v => cb.putShort(v.toShort))
        cb.array()
      } else {
        val words = new Array[Long](1024)
        sorted.foreach(v => words(v >>> 6) |= 1L << (v & 63))
        val cb = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(cb.putLong)
        cb.array()
      }
    }
    val size = 8 + n * 4 + n * 4 + containers.map(_.length).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(12346) // no run containers
    buf.putInt(n)
    byKey.foreach { case (k, vs) =>
      buf.putShort(k.toShort)
      buf.putShort((vs.length - 1).toShort)
    }
    // offset header (mandatory with cookie 12346)
    var off = 8 + n * 4 + n * 4
    containers.foreach { c => buf.putInt(off); off += c.length }
    containers.foreach(buf.put)
    buf.array()
  }

  // ---------------------------------------------------------------
  // DV file layout + descriptor resolution
  // ---------------------------------------------------------------

  /** The ON-DISK sidecar path a descriptor references, None for
    * inline DVs. storageType 'u' derives
    * `[prefix/]deletion_vector_<uuid>.bin` under the table root from
    * the z85 `[prefix]<20-char uuid>` payload; 'p' is an absolute
    * path. [[load]] reads through this, and table maintenance
    * ([[DeltaWrite.vacuum]]) must treat these paths as LIVE — a DV
    * sidecar is as load-bearing as the data file it masks.
    */
  def sidecarPath(tableRoot: Path, dv: DvDescriptor): Option[Path] =
    dv.storageType match {
      case "i" => None
      case "p" => Some(new Path(dv.pathOrInlineDv))
      case "u" =>
        val enc = dv.pathOrInlineDv
        require(enc.length >= 20,
          s"DV uuid payload too short: '$enc'")
        val prefix = enc.dropRight(20)
        val uuidBytes = z85Decode(enc.takeRight(20))
        val bb = ByteBuffer.wrap(uuidBytes)
        val uuid = new java.util.UUID(bb.getLong(), bb.getLong())
        val name = s"deletion_vector_$uuid.bin"
        Some(if (prefix.isEmpty) new Path(tableRoot, name)
        else new Path(new Path(tableRoot, prefix), name))
      case other =>
        throw new IllegalArgumentException(
          s"unknown DV storageType '$other'")
    }

  /** Resolve a descriptor to its bitmap's 64-bit row indexes.
    * storageType 'i' decodes inline; 'u'/'p' read the sidecar file
    * ([[sidecarPath]]). File frames are
    * `[4-byte BE size][data][4-byte BE crc32]` at `offset`, after a
    * 1-byte format version (01) at file start; the CRC is verified.
    */
  def load(
      fs: org.apache.hadoop.fs.FileSystem,
      tableRoot: Path,
      dv: DvDescriptor): Array[Long] = dv.storageType match {
    case "i" =>
      val data = z85Decode(dv.pathOrInlineDv)
      require(data.length == dv.sizeInBytes,
        s"inline DV is ${data.length} bytes, descriptor says " +
          s"${dv.sizeInBytes}")
      deserialize(data)
    case "u" | "p" =>
      val path = sidecarPath(tableRoot, dv).get
      val in = fs.open(path)
      try {
        val offset = dv.offset.getOrElse(
          throw new IllegalArgumentException(
            s"on-disk DV without offset: $path"))
        // size field precedes the data at offset
        in.seek(offset.toLong)
        val sizeBytes = new Array[Byte](4)
        in.readFully(sizeBytes)
        val size = ByteBuffer.wrap(sizeBytes).getInt() // big-endian
        require(size == dv.sizeInBytes,
          s"DV frame size $size != descriptor sizeInBytes " +
            s"${dv.sizeInBytes} at $path:$offset")
        val data = new Array[Byte](size)
        in.readFully(data)
        val crcBytes = new Array[Byte](4)
        in.readFully(crcBytes)
        val want = ByteBuffer.wrap(crcBytes).getInt() & 0xFFFFFFFFL
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        require(crc.getValue == want,
          s"DV checksum mismatch at $path:$offset")
        deserialize(data)
      } finally in.close()
    case other =>
      throw new IllegalArgumentException(
        s"unknown DV storageType '$other'")
  }

  /** Authoring twin: write one DV file holding `frames` (each a sorted
    * row-index array), returning per-frame (offset, sizeInBytes) for
    * descriptor construction. Layout per PROTOCOL.md: version byte,
    * then [BE size][data][BE crc32] per frame.
    */
  def writeDvFile(
      fs: org.apache.hadoop.fs.FileSystem,
      path: Path,
      frames: Seq[Array[Long]]): Seq[(Int, Int)] = {
    val out = fs.create(path, false)
    val spans = Seq.newBuilder[(Int, Int)]
    try {
      out.write(1) // format version
      var pos = 1
      frames.foreach { rows =>
        val data = serialize(rows)
        val head = ByteBuffer.allocate(4).putInt(data.length).array()
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        val tail = ByteBuffer.allocate(4)
          .putInt((crc.getValue & 0xFFFFFFFFL).toInt).array()
        out.write(head); out.write(data); out.write(tail)
        spans += ((pos, data.length))
        pos += 4 + data.length + 4
      }
    } finally out.close()
    spans.result()
  }
}
