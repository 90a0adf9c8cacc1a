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

  test("unigramTrain: hand-checked Viterbi-EM on a tiny corpus") {
    val ss = spark
    import ss.implicits._
    // words: abab (freq 2), cd (freq 1)
    val df = Seq("abab abab cd").toDF("text")
    val vocab = TextAnalysis.unigramTrain(df, "text",
      seedSize = 20, maxTokenLen = 4, emRounds = 2).toMap
    // seed counts: a4 b4 c1 d1 ab4 ba2 aba2 bab2 abab2 cd1 (total 23)
    // E1: 'abab' segments as [abab] (24423 < ab+ab 34984);
    //     'cd' as [cd] (31355 < c+d 62710)
    // M1: chars floor to 1 each, abab=2, cd=1, total 7
    //     cost(abab) = floor(ln(7/2)*1e4+0.5) = 12528
    //     cost(others) = floor(ln(7)*1e4+0.5) = 19459
    // round 2: same segmentation, fixed point
    assert(vocab == Map(
      "a" -> 19459L, "b" -> 19459L, "c" -> 19459L, "d" -> 19459L,
      "abab" -> 12528L, "cd" -> 19459L))
    // the trained artifact feeds the encoder directly
    val enc = TextAnalysis.unigramEncode(
      Seq((0L, "ababcd")).toDF("id", "text"), "id", "text", vocab,
      unkCost = 100000L).collect().head
    // abab + cd: cost 12528 + 19459 = 31987, 2 tokens
    assert(enc.getLong(2) == 31987L && enc.getLong(3) == 2L)
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
