package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZipSpec extends SparkTestBase {

  private def parse(bytes: Array[Byte]): Seq[Option[ZipMember]] =
    Zip.parseBytes(bytes).toSeq

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("member roundtrip: names, sizes, payloads, order") {
    val out = parse(ZipFixture.archive(Seq(
      "a.txt" -> b("alpha"),
      "dir/b.json" -> b("{\"k\":1}"),
      ZipFixture.dirEntry("dir/"),
      "empty.bin" -> Array.emptyByteArray))).map(_.get)
    assert(out.map(_.name) == Seq("a.txt", "dir/b.json", "dir/", "empty.bin"))
    assert(out.map(_.entry_idx) == Seq(0, 1, 2, 3))
    assert(new String(out(0).payload, UTF_8) == "alpha")
    assert(out(1).size == 7L)
    assert(out(2).is_dir && out(2).payload.isEmpty)
    assert(out(3).size == 0L && !out(3).is_dir)
  }

  test("truncation mid-data: salvage prefix + decline row") {
    // incompressible (LCG) payload so the cut lands INSIDE the
    // member's deflate data, not merely in the central directory —
    // which the streaming reader rightly never needs
    var seed = 12345L
    val big = Array.fill[Byte](100000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 33).toByte
    }
    val z = ZipFixture.archive(Seq("ok.txt" -> b("fine"), "big.bin" -> big))
    val out = parse(z.dropRight(50000))
    assert(out.head.exists(_.name == "ok.txt"))
    assert(out.last.isEmpty)
    // clipping ONLY the central directory loses nothing (streaming
    // local-header walk)
    val intact = parse(z.dropRight(40)).map(_.get)
    assert(intact.map(_.name) == Seq("ok.txt", "big.bin"))
    assert(intact(1).size == 100000L)
  }

  test("garbage bytes decline; empty archive yields nothing") {
    assert(parse(b("PK garbage but not a zip")).isEmpty ||
      parse(b("PK garbage but not a zip")) == Seq(None))
    assert(parse(ZipFixture.archive(Seq.empty)).isEmpty)
  }

  test("readDir: member grain over a directory + glob") {
    val t = graft.ScratchSpace.dir(spark, "zipspec_")
    graft.ScratchSpace.writeBytes(spark, t, "z1.zip",
      ZipFixture.archive(Seq("a.txt" -> b("one"), "b.txt" -> b("two"))))
    graft.ScratchSpace.writeBytes(spark, t, "z2.zip",
      ZipFixture.archive(Seq("c.txt" -> b("three"))))
    graft.ScratchSpace.writeBytes(spark, t, "decoy.txt", b("nope"))
    val out = Zip.readDir(spark, t, glob = "*.zip",
        idFromPath = p => regexp_extract(p, "z(\\d+)\\.zip", 1))
      .orderBy("file_id", "entry_idx")
      .collect()
    assert(out.length == 3)
    assert(out(0).getLong(0) == 1L && out(0).getString(2) == "a.txt")
    assert(new String(out(2).getAs[Array[Byte]]("payload"), UTF_8)
      == "three")
  }
}
