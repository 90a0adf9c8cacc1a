package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeletionVectors => DV}

class DeletionVectorsSpec extends AnyFunSuite {

  // ---------------- Z85 ----------------

  test("z85: the ZeroMQ reference vector") {
    // the canonical RFC 32/Z85 test case: 0x86 4F D2 6F B5 59 F7 5B
    // encodes to "HelloWorld"
    val bytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B)
      .map(_.toByte)
    assert(DV.z85Encode(bytes) == "HelloWorld")
    assert(DV.z85Decode("HelloWorld").sameElements(bytes))
  }

  test("z85: roundtrip fuzz + misalignment and bad chars refuse") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = (rnd.nextInt(16) + 1) * 4
      val bytes = new Array[Byte](n)
      rnd.nextBytes(bytes)
      assert(DV.z85Decode(DV.z85Encode(bytes)).sameElements(bytes))
    }
    intercept[IllegalArgumentException](DV.z85Encode(new Array[Byte](3)))
    intercept[IllegalArgumentException](DV.z85Decode("abcd"))
    intercept[IllegalArgumentException](DV.z85Decode("abcd"))
  }

  // ---------------- roaring portable ----------------

  test("roaring roundtrip: array containers, multiple keys and bitmaps") {
    val values = Array[Long](0L, 1L, 5L, 65536L, 65600L,
      (1L << 32) + 7L, (1L << 32) + 65537L, (2L << 32))
    assert(DV.deserialize(DV.serialize(values)).sameElements(values))
  }

  test("roaring roundtrip: bitmap container (cardinality > 4096)") {
    val values = (0L until 5000L).map(_ * 2).toArray // 5000 > 4096
    assert(DV.deserialize(DV.serialize(values)).sameElements(values))
  }

  test("roaring roundtrip fuzz: random 64-bit sets") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val n = rnd.nextInt(2000)
      val values = Array.fill(n)(
        (rnd.nextInt(3).toLong << 32) | (rnd.nextInt(200000).toLong))
        .distinct.sorted
      assert(DV.deserialize(DV.serialize(values)).sameElements(values))
    }
  }

  test("roaring: empty set and empty intermediate bitmaps") {
    assert(DV.deserialize(DV.serialize(Array.empty[Long])).isEmpty)
    val sparse = Array[Long](5L, (3L << 32) + 9L) // bitmaps 1,2 empty
    assert(DV.deserialize(DV.serialize(sparse)).sameElements(sparse))
  }

  test("roaring: RUN containers decode (hand-authored 12347 cookie)") {
    // one run container: values 10..14 and 100..101 — two runs.
    // layout: bitmap key, cookie (12347 | (n-1)<<16), runFlags, desc
    // pairs, NO offset header (n=1 < 4), then nRuns + (start,len) pairs
    val buf = ByteBuffer.allocate(12 + 4 + 4 + 1 + 4 + 2 + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(DVTestAccess.magic)
    buf.putLong(1L)
    buf.putInt(0) // bitmap key (high 32 bits)
    buf.putInt(12347) // n-1 = 0 in high bits
    buf.put(1.toByte) // container 0 is a run
    buf.putShort(0) // key
    buf.putShort(6) // cardinality-1 = 7 values - 1
    buf.putShort(2) // nRuns
    buf.putShort(10); buf.putShort(4) // 10..14
    buf.putShort(100); buf.putShort(1) // 100..101
    val got = DV.deserialize(buf.array())
    assert(got.sameElements(Array[Long](10, 11, 12, 13, 14, 100, 101)))
  }

  test("portable format is byte-exact against a hand-authored external " +
    "fixture (keyed sparse bitmaps, gap keys)") {
    // Bytes authored field-by-field from the published layout (magic,
    // non-empty-bitmap count, per-bitmap 4-byte LE key + standard
    // 32-bit portable roaring), INDEPENDENT of the serializer — rows
    // {1, 3, 70} in bitmap 0 and {7} in bitmap 5 (keys have a gap, as
    // a real engine's DV over a >4-billion-row file produces).
    val buf = ByteBuffer.allocate(60).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(DVTestAccess.magic)
    buf.putLong(2L) // two NON-EMPTY bitmaps (keys 1..4 absent)
    buf.putInt(0) // key 0
    buf.putInt(12346); buf.putInt(1) // no-run cookie, 1 container
    buf.putShort(0); buf.putShort(2) // container key, cardinality-1
    buf.putInt(16) // offset header (8 + 4n + 4n)
    buf.putShort(1); buf.putShort(3); buf.putShort(70)
    buf.putInt(5) // key 5 — gap after 0
    buf.putInt(12346); buf.putInt(1)
    buf.putShort(0); buf.putShort(0)
    buf.putInt(16)
    buf.putShort(7)
    val external = buf.array()
    val rows = Array[Long](1L, 3L, 70L, (5L << 32) + 7L)
    assert(DV.deserialize(external).sameElements(rows))
    // and the authoring twin reproduces the external bytes EXACTLY
    assert(DV.serialize(rows).sameElements(external))
    // descending / duplicate keys refuse loudly
    val bad = external.clone()
    // overwrite the second bitmap's key (offset 12 + 4 + 22 = 38) to 0
    val bb = ByteBuffer.wrap(bad).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(38, 0)
    val e = intercept[IllegalArgumentException](DV.deserialize(bad))
    assert(e.getMessage.contains("ascend"))
  }

  test("bad magic and garbage refuse loudly") {
    intercept[IllegalArgumentException](
      DV.deserialize(Array.fill[Byte](16)(1)))
  }

  // ---------------- file frames + descriptor resolution ----------------

  private def localFs() = {
    val conf = new org.apache.hadoop.conf.Configuration()
    new Path("/tmp").getFileSystem(conf)
  }

  test("DV file write/load roundtrip with CRC; corrupt byte refuses") {
    val fs = localFs()
    val dir = new Path(
      java.nio.file.Files.createTempDirectory("dvspec_").toString)
    val uuid = java.util.UUID.randomUUID()
    val f = new Path(dir, s"deletion_vector_$uuid.bin")
    val frames = Seq(Array[Long](1, 3), Array[Long](0, 2, 4, 1L << 32))
    val spans = DV.writeDvFile(fs, f, frames)
    assert(spans.head._1 == 1) // first frame starts after version byte
    // 'u' descriptor: z85 of the 16-byte big-endian UUID
    val ub = ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits)
    ub.putLong(uuid.getLeastSignificantBits)
    val enc = DV.z85Encode(ub.array())
    val d0 = DV.DvDescriptor("u", enc, Some(spans(0)._1), spans(0)._2, 2L)
    val d1 = DV.DvDescriptor("u", enc, Some(spans(1)._1), spans(1)._2, 4L)
    assert(DV.load(fs, dir, d0).sameElements(frames(0)))
    assert(DV.load(fs, dir, d1).sameElements(frames(1)))
    // 'p' absolute path descriptor reads the same frame
    val dp = DV.DvDescriptor("p", f.toString, Some(spans(0)._1),
      spans(0)._2, 2L)
    assert(DV.load(fs, dir, dp).sameElements(frames(0)))
    // corrupt one data byte -> CRC refusal
    val len = fs.getFileStatus(f).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(f)
    try in.readFully(0L, bytes) finally in.close()
    bytes(spans(0)._1 + 5) = (bytes(spans(0)._1 + 5) ^ 0x40).toByte
    val out = fs.create(f, true)
    try out.write(bytes) finally out.close()
    val e = intercept[IllegalArgumentException](DV.load(fs, dir, d0))
    assert(e.getMessage.contains("checksum"))
  }

  test("inline descriptor decodes; size mismatch refuses") {
    val data = DV.serialize(Array[Long](2, 9))
    val d = DV.DvDescriptor("i", DV.z85Encode(data), None, data.length, 2L)
    assert(DV.load(localFs(), new Path("/tmp"), d)
      .sameElements(Array[Long](2, 9)))
    val bad = d.copy(sizeInBytes = data.length - 1)
    val e = intercept[IllegalArgumentException](
      DV.load(localFs(), new Path("/tmp"), bad))
    assert(e.getMessage.contains("descriptor says"))
  }

  test("unknown storage type refuses") {
    val e = intercept[IllegalArgumentException](
      DV.load(localFs(), new Path("/tmp"),
        DV.DvDescriptor("x", "y", None, 1, 1L)))
    assert(e.getMessage.contains("storageType"))
  }
}

/** Exposes the magic constant to the hand-authored run-container test
  * without widening [[DeletionVectors]]'s API.
  */
private object DVTestAccess {
  val magic = 1681511377
}
