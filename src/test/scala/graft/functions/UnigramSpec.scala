package graft.functions

import graft.SparkTestBase
import graft.operators.TextAnalysis

class UnigramSpec extends SparkTestBase {

  private def run(
      texts: Seq[String],
      vocab: Map[String, Long],
      unk: Long): Seq[(Long, Long, Long, Long)] = {
    val ss = spark
    import ss.implicits._
    TextAnalysis.unigramEncode(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text"),
        "id", "text", vocab, unk)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("Viterbi picks the global optimum, not the greedy path") {
    // greedy longest-match would take 'ing' (cost 50) and pay unk for
    // the rest; Viterbi takes in+gest = cost 2, 2 tokens
    val out = run(Seq("ingest"),
      Map("in" -> 1L, "ing" -> 50L, "gest" -> 1L), unk = 100L)
    assert(out == Seq((0L, 6L, 2L, 2L)))
  }

  test("hand-checked dp, fallback, and empty/normalized input") {
    val v = Map("a" -> 3L, "b" -> 4L, "ab" -> 5L, "aa" -> 9L)
    val out = run(Seq("abab", "aaa", "zz", "", "  AbAb  "), v, unk = 35L)
    // abab: ab+ab = 10/2; aaa: a+a+a = 9/3; zz: 2 fallbacks = 70/2;
    // empty: 0/0; normText lowercases+trims so AbAb == abab
    assert(out == Seq(
      (0L, 4L, 10L, 2L), (1L, 3L, 9L, 3L), (2L, 2L, 70L, 2L),
      (3L, 0L, 0L, 0L), (4L, 4L, 10L, 2L)))
  }

  test("vocab single char cheaper than fallback wins; guards refuse") {
    val out = run(Seq("q"), Map("q" -> 2L), unk = 35L)
    assert(out == Seq((0L, 1L, 2L, 1L)))
    intercept[IllegalArgumentException] {
      run(Seq("x"), Map.empty, 35L)
    }
    intercept[IllegalArgumentException] {
      run(Seq("x"), Map("a" -> 0L), 35L)
    }
    intercept[IllegalArgumentException] {
      run(Seq("x"), Map("" -> 5L), 35L)
    }
  }

  test("a document at the packed-dp radix bound refuses loudly " +
    "instead of overflowing token count into cost digits") {
    // 1M chars => up to 1M tokens >= UnigramK slots — must refuse
    val huge = "a" * 1000000
    val e = intercept[Exception] {
      run(Seq(huge), Map("a" -> 2L), 35L)
    }
    def msgs(t: Throwable): String =
      if (t == null) ""
      else Option(t.getMessage).getOrElse("") + "|" + msgs(t.getCause)
    assert(msgs(e).contains("packed-dp token-count radix"))
    // just under the bound still encodes correctly
    val ok = run(Seq("a" * 999999), Map("a" -> 2L), 35L)
    assert(ok == Seq((0L, 999999L, 2L * 999999L, 999999L)))
  }
}
