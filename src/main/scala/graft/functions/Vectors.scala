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
    * Higher-order functions evaluate INTERPRETED in Spark — hot paths
    * use the native codegen'd expression
    * [[graft.functions.expressions.VecDot]] instead (identical
    * accumulation order, so values are bit-for-bit equal; asserted in
    * VecDotSpec). This fold remains as the dependency-free reference
    * form.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. DuckDB: `sqrt(list_dot_product(a, a))`. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. DuckDB: `list_cosine_similarity(a, b)` or the
    * explicit dot/(|a||b|) form.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
