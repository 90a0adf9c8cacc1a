package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CdcChunkingSpec extends SparkTestBase {

  private def chunksOf(text: String, gram: Int = 8, mask: Int = 64) = {
    val ss = spark
    import ss.implicits._
    TextAnalysis.contentDefinedChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        gram = gram, mask = mask)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getInt(2), r.getInt(3), r.getString(4)))
  }

  test("chunks tile the document exactly, in order") {
    val rnd = new scala.util.Random(61)
    val text = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val ch = chunksOf(text)
    assert(ch.nonEmpty)
    // contiguity: starts chain, lengths sum to the doc length
    var expectStart = 1
    ch.foreach { case (start, len, _) =>
      assert(start == expectStart)
      assert(len >= 1)
      expectStart += len
    }
    assert(expectStart - 1 == text.length)
    // digests really are the chunk substrings' md5
    val md = java.security.MessageDigest.getInstance("MD5")
    ch.foreach { case (start, len, dg) =>
      val expect = md.digest(
        text.substring(start - 1, start - 1 + len).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(dg == expect)
      md.reset()
    }
  }

  test("shift-robustness: a prefix edit leaves later chunk digests intact") {
    val rnd = new scala.util.Random(67)
    val body = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val orig = chunksOf(body).map(_._3)
    val edited = chunksOf("EDITED PREFIX " + body).map(_._3)
    // all but the first few chunks of the original survive verbatim in
    // the edited doc's chunk set — THE content-defined property; a
    // fixed-width chunker at the same grain shares (almost) nothing
    val survivors = orig.toSet.intersect(edited.toSet)
    assert(survivors.size >= orig.length - 2,
      s"only ${survivors.size}/${orig.length} chunks survived a prefix edit")
    val fixedOrig = body.grouped(64).map(_.hashCode).toSet
    val fixedEdited = ("EDITED PREFIX " + body).grouped(64)
      .map(_.hashCode).toSet
    assert(fixedOrig.intersect(fixedEdited).size <= 1,
      "fixed-width control unexpectedly survived the shift")
  }

  test("short and empty docs: one whole-doc chunk / absent") {
    val ss = spark
    import ss.implicits._
    val out = TextAnalysis.contentDefinedChunks(
        Seq((1L, "tiny"), (2L, "")).toDF("doc_id", "text"),
        "doc_id", "text", gram = 8, mask = 64)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getInt(3) == 4)
  }

  test("exactKPerStratum: exact count, deterministic, nested in k") {
    val ss = spark
    import ss.implicits._
    val df = (1L to 200L).map(i => (i, s"s${i % 4}")).toDF("id", "g")
    val k3 = Sampling.exactKPerStratum(df, "g", "id", k = 3)
      .select("g", "rk", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted
    assert(k3.groupBy(_._1).forall(_._2.length == 3))
    // repartitioning does not change membership
    val k3b = Sampling.exactKPerStratum(df.repartition(13), "g", "id", k = 3)
      .select("g", "rk", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted
    assert(k3.toSeq == k3b.toSeq)
    // nested: k=5 contains the k=3 sample
    val k5 = Sampling.exactKPerStratum(df, "g", "id", k = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(k3.map(_._3).forall(k5.contains))
  }
}
