package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

class TextsSpec extends SparkTestBase {

  private def one(text: String) =
    spark.createDataFrame(Seq(Tuple1(text))).toDF("t")

  test("wordShingles: sliding, space-joined, distinct; empty under width") {
    val row = one("a b c d a b c d")
      .select(Texts.wordShingles(Texts.words(col("t")), 3).as("sh"))
      .head.getSeq[String](0)
    assert(row.toSet == Set("a b c", "b c d", "c d a", "d a b"))
    assert(row.size == 4) // distinct, not 6

    val empty = one("a b")
      .select(Texts.wordShingles(Texts.words(col("t")), 3)).head.getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("charGrams: 1-char step, distinct, empty for short strings") {
    val g = one("abcde")
      .select(Texts.charGrams(col("t"), 4)).head.getSeq[String](0)
    assert(g == Seq("abcd", "bcde"))
    assert(one("abc").select(Texts.charGrams(col("t"), 4))
      .head.getSeq[String](0).isEmpty)
  }

  test("jaccard on distinct arrays") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      Texts.jaccard(
        array(lit("a"), lit("b"), lit("c")),
        array(lit("b"), lit("c"), lit("d"))).as("j"))
    assert(df.head.getDouble(0) == 0.5)
  }

  test("words normalizes case and surrounding whitespace") {
    val w = one("  Hello   WORLD  ")
      .select(Texts.words(col("t"))).head.getSeq[String](0)
    assert(w == Seq("hello", "world"))
  }

  test("hex hashes are fixed-width (numeric-order-safe) and seed-sensitive") {
    import org.apache.spark.sql.functions._
    val r = spark.range(1).select(
      Hashes.hexHash(lit("shingle"), 0).as("h0"),
      Hashes.hexHash(lit("shingle"), 1).as("h1")).head
    assert(r.getString(0).length == 15 && r.getString(1).length == 15)
    assert(r.getString(0) != r.getString(1))
  }
}
