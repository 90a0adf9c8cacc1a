package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class WarcSpec extends SparkTestBase {

  private def parse(bytes: Array[Byte]): Seq[Option[WarcParsed]] =
    Warc.parseBytes(bytes).toSeq

  private def body(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("plain single record roundtrip: headers, payload, offset") {
    val rec = WarcFixture.response("http://a/x", 200, body("hello"))
    val out = parse(WarcFixture.plain(Seq(rec)))
    assert(out.length == 1)
    val r = out.head.get
    assert(r.rec_idx == 0 && r.offset == 0L)
    assert(r.warc_type.contains("response"))
    assert(r.target_uri.contains("http://a/x"))
    assert(r.http_status.contains(200))
    assert(new String(r.payload, UTF_8) == "hello")
  }

  test("multi-record plain stream: offsets are record starts") {
    val r1 = WarcFixture.response("http://a/1", 200, body("one"))
    val r2 = WarcFixture.response("http://a/2", 404, body("two2"))
    val out = parse(WarcFixture.plain(Seq(r1, r2))).map(_.get)
    assert(out.map(_.rec_idx) == Seq(0, 1))
    assert(out(1).offset == r1.length.toLong)
    assert(out(1).http_status.contains(404))
    assert(new String(out(1).payload, UTF_8) == "two2")
  }

  test("multi-member gzip (Common Crawl layout) decompresses " +
    "transparently") {
    val recs = (0 until 5).map(i =>
      WarcFixture.response(s"http://a/$i", 200, body(s"payload-$i")))
    val out = parse(WarcFixture.gzMembers(recs)).map(_.get)
    assert(out.map(_.target_uri.get) == (0 until 5).map(i => s"http://a/$i"))
    assert(out.map(r => new String(r.payload, UTF_8)) ==
      (0 until 5).map(i => s"payload-$i"))
  }

  test("single-member gzip over the whole archive also parses") {
    val recs = Seq(
      WarcFixture.response("http://a/1", 200, body("x")),
      WarcFixture.warcinfo(body("k: v\n")))
    val whole = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(WarcFixture.plain(recs)); gz.close()
      bos.toByteArray
    }
    val out = parse(whole).map(_.get)
    assert(out.length == 2)
    assert(out(1).warc_type.contains("warcinfo"))
    assert(out(1).http_status.isEmpty)
    assert(new String(out(1).payload, UTF_8) == "k: v\n")
  }

  test("non-http record keeps the whole content block as payload") {
    val rec = WarcFixture.record(
      Seq("WARC-Type" -> "resource", "Content-Type" -> "text/plain"),
      body("raw bytes"))
    val r = parse(WarcFixture.plain(Seq(rec))).head.get
    assert(r.http_status.isEmpty)
    assert(new String(r.payload, UTF_8) == "raw bytes")
    assert(r.content_length == 9L)
  }

  test("http block without a parseable status keeps whole block") {
    val block = body("NOTHTTP junk\r\nX: y\r\n\r\nbody")
    val rec = WarcFixture.record(
      Seq("WARC-Type" -> "response",
        "Content-Type" -> "application/http; msgtype=response"), block)
    val r = parse(WarcFixture.plain(Seq(rec))).head.get
    assert(r.http_status.isEmpty)
    assert(r.payload.sameElements(block))
  }

  test("http body may contain CRLFCRLF — boundary is the FIRST one") {
    val b = body("a\r\n\r\nb")
    val rec = WarcFixture.response("http://a/x", 200, b)
    val r = parse(WarcFixture.plain(Seq(rec))).head.get
    assert(r.payload.sameElements(b))
  }

  test("truncated content block: salvage prefix + ONE decline row") {
    val good = WarcFixture.response("http://a/1", 200, body("ok"))
    val cut = WarcFixture.record(
      Seq("WARC-Type" -> "resource"), new Array[Byte](64)).dropRight(40)
    val out = parse(WarcFixture.plain(Seq(good, cut)))
    assert(out.length == 2)
    assert(out.head.exists(_.target_uri.contains("http://a/1")))
    assert(out(1).isEmpty)
  }

  test("framing violations decline after the valid prefix") {
    val good = WarcFixture.response("http://a/1", 200, body("ok"))
    def afterGood(tail: Array[Byte]): Seq[Option[WarcParsed]] =
      parse(WarcFixture.plain(Seq(good)) ++ tail)
    // bad version line
    val bv = afterGood(body("HARC/1.0\r\n\r\n"))
    assert(bv.length == 2)
    assert(bv.head.exists(_.target_uri.contains("http://a/1")))
    assert(bv.last.isEmpty)
    // missing Content-Length
    assert(afterGood(body("WARC/1.0\r\nWARC-Type: x\r\n\r\n"))
      .last.isEmpty)
    // negative Content-Length
    assert(afterGood(
      body("WARC/1.0\r\nContent-Length: -5\r\n\r\n")).last.isEmpty)
    // bare LF in header
    assert(afterGood(
      body("WARC/1.0\nContent-Length: 0\r\n\r\n")).last.isEmpty)
    // missing record terminator (content followed by garbage)
    assert(afterGood(
      body("WARC/1.0\r\nContent-Length: 2\r\n\r\nxyQQQQ")).last.isEmpty)
  }

  test("corrupt gzip member declines instead of killing the task") {
    val good = WarcFixture.response("http://a/1", 200, body("ok"))
    val gz = WarcFixture.gzMembers(Seq(good, good))
    // flip bytes in the SECOND member's deflate stream
    val corrupt = gz.clone()
    val mid = gz.length - 12
    corrupt(mid) = (corrupt(mid) ^ 0x5A).toByte
    corrupt(mid - 1) = (corrupt(mid - 1) ^ 0x5A).toByte
    val out = parse(corrupt)
    assert(out.head.exists(_.target_uri.contains("http://a/1")))
    assert(out.last.isEmpty)
    // entirely-garbage "gzip" (magic bytes then junk) declines whole
    val junk = Array[Byte](0x1F, 0x8B.toByte, 9, 9, 9, 9, 9, 9)
    assert(parse(junk) == Seq(None))
  }

  test("empty stream yields zero records (clean EOF, no decline)") {
    assert(parse(Array.emptyByteArray).isEmpty)
  }

  test("hostile header line beyond MaxLine declines") {
    val huge = "WARC/1.0\r\nX: " + ("a" * (70 * 1024)) + "\r\n"
    assert(parse(body(huge)) == Seq(None))
  }

  test("readDir: record grain over a directory, decline carries only " +
    "file_id") {
    val t = graft.ScratchSpace.dir(spark, "warcspec_")
    val f1 = WarcFixture.gzMembers(Seq(
      WarcFixture.warcinfo(body("v: 1\n")),
      WarcFixture.response("http://a/1", 200, body("alpha")),
      WarcFixture.response("http://a/2", 301, body("beta"))))
    val f2 = WarcFixture.plain(Seq(
      WarcFixture.response("http://b/9", 200, body("gamma")))) ++
      body("WARC/1.0\r\nbroken")
    graft.ScratchSpace.writeBytes(spark, t, "w1.warc.gz", f1)
    graft.ScratchSpace.writeBytes(spark, t, "w2.warc", f2)
    val out = Warc.readDir(spark, t,
        idFromPath = p => regexp_extract(p, "w(\\d+)\\.warc", 1))
      .orderBy("file_id", "rec_idx")
      .collect()
    assert(out.length == 5)
    // file 1: warcinfo + two responses
    assert(out(0).getLong(0) == 1L && out(0).getString(3) == "warcinfo")
    assert(out(1).getString(4) == "http://a/1" && out(1).getInt(6) == 200)
    assert(out(2).getString(4) == "http://a/2" && out(2).getInt(6) == 301)
    assert(new String(out(1).getAs[Array[Byte]]("payload"), UTF_8)
      == "alpha")
    // file 2: one good record, then the decline row (nulls sort first
    // under Spark asc, so rec_idx null is row index 3)
    val rows2 = out.filter(_.getLong(0) == 2L)
    assert(rows2.length == 2)
    val decline = rows2.find(_.isNullAt(1)).get
    (1 until decline.length).foreach(i => assert(decline.isNullAt(i)))
    val goodRow = rows2.find(!_.isNullAt(1)).get
    assert(goodRow.getString(4) == "http://b/9")
  }

  test("glob filters the directory") {
    val t = graft.ScratchSpace.dir(spark, "warcspec_glob_")
    graft.ScratchSpace.writeBytes(spark, t, "a.warc",
      WarcFixture.plain(Seq(
        WarcFixture.response("http://a/1", 200, body("x")))))
    graft.ScratchSpace.writeBytes(spark, t, "b.txt", body("not warc"))
    assert(Warc.readDir(spark, t, glob = "*.warc").count() == 1L)
  }

  test("zstd-compressed archives read transparently (magic-sniffed " +
    "by FileStreams, same parser)") {
    val t = graft.ScratchSpace.dir(spark, "warcspec_zst_")
    val plain = WarcFixture.plain(Seq(
      WarcFixture.response("http://z/1", 200, body("zeta")),
      WarcFixture.response("http://z/2", 404, body("eta"))))
    graft.ScratchSpace.writeBytes(spark, t, "w1.warc.zst",
      com.github.luben.zstd.Zstd.compress(plain))
    val out = Warc.readDir(spark, t).orderBy("rec_idx").collect()
    assert(out.length == 2)
    assert(out(0).getString(4) == "http://z/1" && out(0).getInt(6) == 200)
    assert(new String(out(1).getAs[Array[Byte]]("payload"), UTF_8) == "eta")
  }
}
