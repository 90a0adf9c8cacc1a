package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The native [[graft.functions.expressions.WordShingles]] kernel must
  * be BIT-IDENTICAL to the expression-tree form it replaces
  * ([[Texts.wordShingles]]/[[Texts.wordShingleBag]] over
  * [[Texts.words]]) — element values AND order, distinct and bag
  * variants, across the real corpus and adversarial edge fixtures.
  */
class WordShinglesSpec extends SparkTestBase {

  private val edge = Seq(
    null.asInstanceOf[String],
    "",
    " ",
    "   ",
    "one",
    "one two",
    "one two three",
    "a b c d a b c d",
    "  leading and trailing  ",
    "\tTAB leading keeps an empty token after trim",
    "line\nbreaks\nare separators",
    "UPPER Case MiXeD case",
    "multiple   internal    spaces",
    "unicode é É ﬁ ﬂ ß ΣΙΣΥΦΟΣ İstanbul",
    "emoji 😀 pair 𝔘𝔫𝔦 astral",
    "dup dup dup dup dup",
    "a nbsp is not \\s whitespace a nbsp",
    "punct, stays. attached! to? tokens;")

  private def differential(n: Int): Unit = {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id").cast("string").as("k"), col("text"))
      .unionByName(
        spark.createDataFrame(
          edge.zipWithIndex.map { case (t, i) => (s"edge_$i", t) })
          .toDF("k", "text"))
    val rows = docs.select(
      col("k"),
      Texts.wordShingles(Texts.words(col("text")), n).as("tree_set"),
      Texts.shinglesOf(col("text"), n).as("native_set"),
      Texts.wordShingleBag(Texts.words(col("text")), n).as("tree_bag"),
      Texts.shingleBagOf(col("text"), n).as("native_bag"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"distinct mismatch at k=${r.getString(0)} n=$n")
      assert(r.getSeq[String](3) == r.getSeq[String](4),
        s"bag mismatch at k=${r.getString(0)} n=$n")
    }
  }

  test("native == tree over corpus + edges, n=1") { differential(1) }
  test("native == tree over corpus + edges, n=2") { differential(2) }
  test("native == tree over corpus + edges, n=3") { differential(3) }
  test("native == tree over corpus + edges, n=5") { differential(5) }

  test("never null, empty array for null/short input") {
    val df = spark.createDataFrame(
      Seq(("a", null.asInstanceOf[String]), ("b", "one two")))
      .toDF("k", "text")
      .select(Texts.shinglesOf(col("text"), 3).as("sh"))
    val rows = df.collect()
    assert(rows.forall(r => !r.isNullAt(0)))
    assert(rows.forall(r => r.getSeq[String](0).isEmpty))
  }

  test("survives repartition + explode (executor-side eval)") {
    val out = spark.read.parquet(s"$sf001/documents.parquet")
      .repartition(3)
      .select(col("doc_id"), explode(Texts.shinglesOf(col("text"), 3)).as("sh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val tree = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        explode(Texts.wordShingles(Texts.words(col("text")), 3)).as("sh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(out.unionAll(tree).distinct().count() == tree.count())
  }
}
