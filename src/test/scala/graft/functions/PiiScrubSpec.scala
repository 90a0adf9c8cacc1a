package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TextAnalysis

class PiiScrubSpec extends SparkTestBase {

  test("single-pass scrub equals the sequential two-regex form (fuzz)") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(53)
    // fragments chosen to hit every boundary: digit runs at/over the
    // 9-digit floor, digits adjacent to emails, emails with numeric
    // local parts / numeric domains, bare @s, placeholder-ish text
    val frags = Seq(
      "a@b.com", "12345678901@x.org", "123456789", "12345678",
      "1234567890123", "a.b+c@d-e.f.gh", "@nope", "x@y", "[NUM]",
      "[EMAIL]", "no pii here", "9" * 30, "mail: u%v@w.co,", " ", ".",
      "123456789a@x.com", "123456789 a@x.com", "a@b.com123456789")
    val docs = (1 to 300).map { i =>
      val n = rnd.nextInt(8)
      (i.toLong, (0 until n).map(_ => frags(rnd.nextInt(frags.size)))
        .mkString(rnd.nextInt(3) match {
          case 0 => "" case 1 => " " case _ => "x"
        }))
    }.toDF("doc_id", "text")
    val fast = TextAnalysis.scrubPii(docs, "doc_id", "text")
    // the reference semantics: replace emails first, then digit runs,
    // counts from independent global matches on the ORIGINAL text
    val slow = docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(TextAnalysis.EmailPattern))
        .cast("long").as("n_emails"),
      regexp_count(col("text"), lit(TextAnalysis.LongNumberPattern))
        .cast("long").as("n_long_numbers"),
      regexp_replace(
        regexp_replace(col("text"), TextAnalysis.EmailPattern, "[EMAIL]"),
        TextAnalysis.LongNumberPattern, "[NUM]").as("text_scrubbed"))
    val f = fast.orderBy("doc_id").collect()
    val sl = slow.orderBy("doc_id").collect()
    assert(f.length == sl.length)
    f.zip(sl).foreach { case (a, b) =>
      assert(a == b, s"diverged on doc ${a.getLong(0)}:\n fast=$a\n slow=$b")
    }
  }

  test("scrub counts and placeholders on a crafted document") {
    val ss = spark
    import ss.implicits._
    val docs = Seq(
      (1L, "write to alice@example.com or call 5551234567890 now"),
      (2L, "short 12345678 stays; bob+x@sub.domain.io goes"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 1L)
    assert(out(0).getString(3) == "write to [EMAIL] or call [NUM] now")
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 0L)
    assert(out(1).getString(3) == "short 12345678 stays; [EMAIL] goes")
    assert(out(2).getLong(1) == 0L && out(2).getString(3) == "")
  }
}
