package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, computed in
  * double precision with sequential left-to-right folds (matching
  * DuckDB's list_dot_product accumulation so cosine values agree to
  * well under output rounding).
  */
object Vectors {

  /** Cast an embedding to array<double> once, up front. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product. DuckDB: `list_dot_product(a, b)`.
    * Higher-order functions evaluate INTERPRETED in Spark — prefer
    * [[dotUnrolled]] whenever the dimension is statically known.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Fixed-dim dot product unrolled to a whole-stage-codegen'd sum of
    * `element_at` products. The reduce is left-associative, so the
    * addition order is identical to [[dot]] and to DuckDB's
    * list_dot_product — values are bit-identical, just ~2 orders of
    * magnitude faster than the interpreted HOF fold.
    */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i)).reduce(_ + _)

  /** Dot against a constant vector (e.g. an LSH hyperplane): the
    * coefficients become literals in the codegen'd expression.
    */
  def dotConst(a: Column, coef: Seq[Double]): Column =
    coef.zipWithIndex
      .map { case (c, i) => element_at(a, i + 1) * lit(c) }
      .reduce(_ + _)

  /** L2 norm. DuckDB: `sqrt(list_dot_product(a, a))`. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Unrolled fixed-dim L2 norm — see [[dotUnrolled]]. */
  def normUnrolled(a: Column, dim: Int): Column = sqrt(dotUnrolled(a, a, dim))

  /** Cosine similarity. DuckDB: `list_cosine_similarity(a, b)` or the
    * explicit dot/(|a||b|) form.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
