package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text building blocks built ONLY from codegen'd built-ins — no UDFs.
  * Every function here has a line-for-line DuckDB equivalent so the
  * operators composed from them stay oracle-checkable (SURVEY.md §5).
  */
object Texts {

  /** Canonical text normalization: lowercase + trim.
    * DuckDB: `lower(trim(x))`.
    */
  def normText(c: Column): Column = lower(trim(c))

  /** Whitespace tokenization of normalized text.
    * DuckDB: `string_split_regex(lower(trim(x)), '\s+')`.
    */
  def words(c: Column): Column = split(normText(c), "\\s+")

  /** Distinct n-word shingles joined by one space; empty array when the
    * doc has fewer than n words.
    * DuckDB: `list_distinct([ws[i]||' '||...||ws[i+n-1]
    *   for i in generate_series(1, len(ws)-(n-1))])`.
    */
  def wordShingles(ws: Column, n: Int): Column = {
    val sh = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*))
    array_distinct(when(size(ws) >= n, sh).otherwise(array()))
  }

  /** [[wordShingles]] as ONE native kernel over the raw text column
    * ([[graft.functions.expressions.WordShingles]]): bit-identical
    * output (WordShinglesSpec fuzz-differentials the two forms over
    * the real corpus), but the per-shingle interpreted lambda
    * machinery of transform/element_at/array_distinct collapses into
    * a single per-doc call — measured ~4× per corpus pass, and the
    * near-dup operators make three such passes per run.
    */
  def shinglesOf(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.functions.expressions.WordShingles(
        org.apache.spark.sql.graft.ColumnShim.expression(text),
        n, distinct = true))

  /** [[wordShingleBag]]'s native form (multiplicity kept). */
  def shingleBagOf(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.functions.expressions.WordShingles(
        org.apache.spark.sql.graft.ColumnShim.expression(text),
        n, distinct = false))

  /** n-word shingles WITH multiplicity (the term-frequency bag the
    * sparse-cosine postings need; [[wordShingles]] is the distinct-set
    * form Jaccard uses).
    * DuckDB: `[ws[i]||' '||...||ws[i+n-1]
    *   for i in generate_series(1, len(ws)-(n-1))]`.
    */
  def wordShingleBag(ws: Column, n: Int): Column = {
    val sh = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*))
    when(size(ws) >= n, sh).otherwise(array())
  }

  /** Distinct character n-grams of the normalized text.
    * DuckDB: `list_distinct([t[i:i+n-1] for i in
    *   generate_series(1, len(t)-(n-1))])` (1-based inclusive slices).
    */
  def charGrams(c: Column, n: Int): Column = {
    val t = normText(c)
    val grams = transform(
      sequence(lit(1), length(t) - (n - 1)),
      i => t.substr(i, lit(n)))
    array_distinct(when(length(t) >= n, grams).otherwise(array()))
  }

  /** Exact Jaccard similarity of two (already-distinct) string arrays.
    * Integer set sizes → the double ratio is bit-identical across
    * engines. DuckDB: `len(list_intersect(a,b)) /
    * len(list_distinct(list_concat(a,b)))`.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Count of tokens contained in a fixed vocabulary (duplicates
    * counted — this is a token ratio numerator, not a set overlap).
    * DuckDB: `len(list_filter(ws, w -> w IN (...)))`.
    */
  def vocabHits(ws: Column, vocab: Seq[String]): Column = {
    val vocabArr = array(vocab.map(lit): _*)
    size(filter(ws, w => array_contains(vocabArr, w)))
  }
}
