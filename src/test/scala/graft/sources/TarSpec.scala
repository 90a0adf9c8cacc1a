package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TarSpec extends SparkTestBase {

  private def parse(bytes: Array[Byte]): Seq[Option[TarEntry]] =
    Tar.parseBytes(bytes).toSeq

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("single member roundtrip: name, size, payload, padding") {
    val out = parse(TarFixture.archive(Seq(
      TarFixture.member("a/b.txt", b("hello world")))))
    assert(out.length == 1)
    val e = out.head.get
    assert(e.name == "a/b.txt" && e.size == 11L && e.type_flag == "0")
    assert(new String(e.payload, UTF_8) == "hello world")
  }

  test("multi-member order and entry_idx; 512-boundary sizes") {
    val sizes = Seq(0, 1, 511, 512, 513, 1024)
    val members = sizes.zipWithIndex.map { case (n, i) =>
      TarFixture.member(s"f$i.bin", Array.fill[Byte](n)((i + 1).toByte))
    }
    val out = parse(TarFixture.archive(members)).map(_.get)
    assert(out.map(_.entry_idx) == sizes.indices)
    assert(out.map(_.size) == sizes.map(_.toLong))
    out.zipWithIndex.foreach { case (e, i) =>
      assert(e.payload.length == sizes(i))
      assert(e.payload.forall(_ == (i + 1).toByte))
    }
  }

  test("gzipped archive parses transparently") {
    val out = parse(TarFixture.archiveGz(Seq(
      TarFixture.member("x.txt", b("gz")))))
    assert(out.length == 1)
    assert(new String(out.head.get.payload, UTF_8) == "gz")
  }

  test("directory members emit with empty payload; PAX/longname " +
    "metadata members are skipped") {
    val out = parse(TarFixture.archive(Seq(
      TarFixture.dirMember("d/"),
      TarFixture.member("pax", b("comment=hi"), 'x'),
      TarFixture.member("gnu", b("longname...."), 'L'),
      TarFixture.member("d/real.txt", b("data")))))
    assert(out.map(_.get.name) == Seq("d/", "d/real.txt"))
    assert(out.head.get.type_flag == "5")
    assert(out.head.get.payload.isEmpty)
    // entry_idx counts EMITTED rows contiguously
    assert(out.map(_.get.entry_idx) == Seq(0, 1))
  }

  test("ustar prefix field joins into the name") {
    val h = TarFixture.header("leaf.txt", 4)
    // plant a prefix manually (fixture helper writes none)
    val pfx = "some/deep/dir".getBytes(UTF_8)
    System.arraycopy(pfx, 0, h, 345, pfx.length)
    val bytes = h ++ b("data") ++
      new Array[Byte](512 - 4) ++ new Array[Byte](1024)
    val out = parse(bytes)
    assert(out.head.get.name == "some/deep/dir/leaf.txt")
  }

  test("truncated member content: salvage prefix + ONE decline row") {
    val good = TarFixture.member("ok.txt", b("fine"))
    val cut = TarFixture.member("bad.bin", new Array[Byte](600))
      .dropRight(700)
    val out = parse(good ++ cut)
    assert(out.length == 2)
    assert(out.head.exists(_.name == "ok.txt"))
    assert(out(1).isEmpty)
  }

  test("bad magic and malformed octal decline after the prefix") {
    val good = TarFixture.member("ok.txt", b("fine"))
    val badMagic = TarFixture.header("x", 0)
    badMagic(257) = 'v'.toByte
    assert(parse(good ++ badMagic ++ new Array[Byte](1024)).last.isEmpty)
    val badOctal = TarFixture.header("y", 0)
    badOctal(124) = '9'.toByte
    assert(parse(good ++ badOctal ++ new Array[Byte](1024)).last.isEmpty)
  }

  test("clean EOF without the zero terminator still ends the stream") {
    val m = TarFixture.member("a.txt", b("abc"))
    val out = parse(m) // no terminator blocks at all
    assert(out.length == 1)
    assert(out.head.exists(_.name == "a.txt"))
  }

  test("empty archive (terminator only) yields zero entries") {
    assert(parse(new Array[Byte](1024)).isEmpty)
    assert(parse(Array.emptyByteArray).isEmpty)
  }

  test("corrupt gzip declines") {
    val junk = Array[Byte](0x1F, 0x8B.toByte, 9, 9, 9, 9, 9, 9)
    assert(parse(junk) == Seq(None))
  }

  test("readDir + groupSamples: WebDataset sample grain") {
    val t = graft.ScratchSpace.dir(spark, "tarspec_")
    val s1 = TarFixture.archive(Seq(
      TarFixture.member("000001.txt", b("alpha")),
      TarFixture.member("000001.json", b("{\"k\":1}")),
      TarFixture.member("000002.txt", b("beta")),
      TarFixture.dirMember("junk/")))
    val s2 = TarFixture.archiveGz(Seq(
      TarFixture.member("000009.txt", b("gamma")),
      TarFixture.member("000009.cls", b("en"))))
    graft.ScratchSpace.writeBytes(spark, t, "t1.tar", s1)
    graft.ScratchSpace.writeBytes(spark, t, "t2.tar.gz", s2)
    val members = Tar.readDir(spark, t,
      idFromPath = p => regexp_extract(p, "t(\\d+)\\.tar", 1))
    val samples = Tar.groupSamples(members)
      .orderBy("file_id", "sample_key")
      .collect()
    assert(samples.length == 3)
    val r1 = samples(0)
    assert(r1.getLong(0) == 1L && r1.getString(1) == "000001")
    assert(r1.getLong(3) == 2L) // n_parts
    val parts1 = r1.getMap[String, Array[Byte]](2)
    assert(new String(parts1("txt"), UTF_8) == "alpha")
    assert(new String(parts1("json"), UTF_8) == "{\"k\":1}")
    val r2 = samples(1)
    assert(r2.getString(1) == "000002" && r2.getLong(3) == 1L)
    val r3 = samples(2)
    assert(r3.getLong(0) == 2L && r3.getString(1) == "000009")
    assert(r3.getLong(4) == 7L) // sample_bytes = 5 + 2
  }

  test("duplicate member names (legal in tar, extract overwrites): " +
    "last entry wins, map build never throws") {
    val t = graft.ScratchSpace.dir(spark, "tardup_")
    val s = TarFixture.archive(Seq(
      TarFixture.member("000001.txt", b("first")),
      TarFixture.member("000001.json", b("{}")),
      TarFixture.member("000001.txt", b("second-wins"))))
    graft.ScratchSpace.writeBytes(spark, t, "d1.tar", s)
    val members = Tar.readDir(spark, t,
      idFromPath = p => regexp_extract(p, "d(\\d+)\\.tar", 1))
    val samples = Tar.groupSamples(members).collect()
    assert(samples.length == 1)
    val r = samples(0)
    val parts = r.getMap[String, Array[Byte]](2)
    assert(new String(parts("txt"), UTF_8) == "second-wins")
    assert(r.getLong(3) == 2L) // n_parts: txt + json, deduped
  }

  test("a shard BEYOND the old binaryFile 2 GB bound reads: the " +
    "lister prunes content and the task streams the file") {
    // a 2.5 GB SPARSE file: one valid member, then the zero-block
    // terminator — the streaming parser stops at the terminator, so
    // only KBs are actually read; the old whole-file-buffer path
    // would have refused the size outright
    val t = graft.ScratchSpace.dir(spark, "tarbig_")
    val local = java.nio.file.Paths.get(
      new java.net.URI(new org.apache.hadoop.fs.Path(t, "big.tar")
        .getFileSystem(spark.sessionState.newHadoopConf())
        .makeQualified(new org.apache.hadoop.fs.Path(t, "big.tar"))
        .toUri.toString))
    val head = TarFixture.archive(Seq(
      TarFixture.member("huge/sample.txt", b("still-parses"))))
    val raf = new java.io.RandomAccessFile(local.toFile, "rw")
    try {
      raf.write(head)
      raf.setLength(2684354560L) // 2.5 GB, sparse tail of zeros
    } finally raf.close()
    assert(local.toFile.length() > Int.MaxValue.toLong)
    val members = Tar.readDir(spark, t).collect()
    assert(members.length == 1)
    assert(members(0).getString(2) == "huge/sample.txt")
    assert(new String(members(0).getAs[Array[Byte]](5), UTF_8) ==
      "still-parses")
  }

  test("zstd-compressed shards read transparently (.tar.zst — the " +
    "WebDataset-on-zstd layout)") {
    val t = graft.ScratchSpace.dir(spark, "tarzst_")
    val shard = TarFixture.archive(Seq(
      TarFixture.member("000001.txt", b("zstd-sample")),
      TarFixture.member("000001.cls", b("en"))))
    graft.ScratchSpace.writeBytes(spark, t, "s1.tar.zst",
      com.github.luben.zstd.Zstd.compress(shard))
    val samples = Tar.groupSamples(Tar.readDir(spark, t)).collect()
    assert(samples.length == 1)
    val parts = samples(0).getMap[String, Array[Byte]](2)
    assert(new String(parts("txt"), UTF_8) == "zstd-sample")
  }

  test("fixture checksum is valid (external-reader compatibility)") {
    val h = TarFixture.header("f.txt", 7)
    val stored = new String(h, 148, 6, UTF_8)
    val spaced = h.clone()
    java.util.Arrays.fill(spaced, 148, 156, ' '.toByte)
    val expect = "%06o".format(spaced.map(_ & 0xFF).sum)
    assert(stored == expect)
  }
}
