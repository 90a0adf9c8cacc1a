package graft.operators

import graft.SparkTestBase

class TextAnalysisSpec extends SparkTestBase {

  private def docsDF(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  test("langId picks the profile with most stopword hits") {
    val df = docsDF(
      (1L, "the cat of the house and the dog"), // en
      (2L, "der hund und die katze ist ein tier"), // de
      (3L, "le chat et la maison est un lieu"), // fr
      (4L, "xyzzy plugh")) // nothing -> en by tie precedence
    val out = TextAnalysis.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "fr")
    assert(out(4L) == "en")
  }

  test("qualityScore components are exact ratios") {
    val df = docsDF((1L, "the aa bbb cccc")) // 4 tokens, lens 3,2,3,4
    val r = TextAnalysis.qualityScore(df, "doc_id", "text").head
    assert(r.getLong(1) == 4) // n_tokens
    assert(r.getDouble(2) == 3.0) // avg len (3+2+3+4)/4
    assert(r.getDouble(3) == 0.25) // 'the' is 1 of 4
    val expected = 0.4 * (4.0 / 100) + 0.3 * 0.75 + 0.3 * (3.0 / 10)
    assert(math.abs(r.getDouble(4) - expected) < 1e-4)
  }

  test("tokenCounts: whitespace vs BPE-ish regex") {
    val df = docsDF((1L, "hello, world! it's 42"))
    val r = TextAnalysis.tokenCounts(df, "doc_id", "text").head
    assert(r.getLong(1) == 4) // ws tokens
    // bpe-ish: hello , world ! it ' s 42 -> 8
    assert(r.getLong(2) == 8)
  }

  test("fingerprint is edit-sensitive in md5 but stable in min-hash for shared grams") {
    val df = docsDF(
      (1L, "abcdefghijklmnop"),
      (2L, "abcdefghijklmnoq")) // tail edit
    val rows = TextAnalysis.fingerprint(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getString(1) != rows(1).getString(1)) // md5 differs
    // the min over shared 5-gram hashes usually survives a 1-char tail edit
    assert(rows(0).getString(2).length == 15)
  }

  test("topNgrams counts duplicate occurrences and breaks ties alphabetically") {
    val df = docsDF(
      (1L, "a b c a b c"), // "a b c" x2ish
      (2L, "a b c d"))
    val out = TextAnalysis.topNgrams(df, "text", n = 3, topK = 3).collect()
    assert(out.head.getString(0) == "a b c")
    assert(out.head.getLong(1) == 3) // twice in doc1? "a b c","b c a","c a b","a b c" + doc2 "a b c"
  }
}
