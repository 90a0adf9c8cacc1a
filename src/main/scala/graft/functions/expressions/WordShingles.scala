package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass n-word shingling of a text column — the hot kernel
  * of every MinHash/SimHash/decontamination operator, replacing the
  * `array_distinct(transform(sequence(...), concat_ws(element_at ×
  * n)))` tree, whose higher-order lambdas evaluate INTERPRETED per
  * shingle (measured ~0.8 s per corpus pass at sf0.1; minhashNearDup
  * makes three such passes).
  *
  * Output is BIT-IDENTICAL to the expression-tree form (asserted
  * exhaustively by WordShinglesSpec over the real corpus plus edge
  * fixtures) because the kernel reuses the exact engine primitives
  * the tree composed:
  *   - `UTF8String.trim()`        == `trim(x)` (strips 0x20 only)
  *   - `UTF8String.toLowerCase()` == `lower(x)` (UTF8_BINARY path)
  *   - `UTF8String.split(p, -1)`  == `split(x, p)` (same Pattern)
  *   - `UTF8String.concatWs`      == `concat_ws(" ", ...)`
  *   - LinkedHashSet dedup        == `array_distinct` (first
  *     occurrence order preserved)
  * Null and sub-width inputs yield the EMPTY array (never null),
  * matching the `when(size(ws) >= n, ...).otherwise(array())` guard
  * of the tree form (size(NULL) is NULL under ANSI, so null text took
  * the otherwise branch there too).
  *
  * CodegenFallback is deliberate (the PiiScrub precedent): the
  * expression sits at DOC grain — one call per document, with the
  * regex split dominating the call — so interpreted dispatch is noise
  * while the per-SHINGLE interpreted lambda machinery it replaces was
  * the cost.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def prettyName: String = "graft_word_shingles"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType) {
      TypeCheckFailure(s"$prettyName: argument must be STRING, " +
        s"got ${child.dataType.catalogString}")
    } else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  /** Never null: null/short text yields the empty array. */
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    WordShingles.shingles(
      child.eval(input).asInstanceOf[UTF8String], n, distinct)

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

object WordShingles {

  private val WsPattern = UTF8String.fromString("\\s+")
  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(new Array[Any](0))

  /** Static kernel: lower(trim(s)) split on \s+, n-token windows
    * joined by one space, optionally first-occurrence-deduped.
    */
  def shingles(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (s == null) return Empty
    val toks = s.trim().toLowerCase().split(WsPattern, -1)
    val m = toks.length - n + 1
    if (m <= 0) return Empty
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
      var i = 0
      while (i < m) {
        seen.add(window(toks, i, n)): Unit
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    } else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        out(i) = window(toks, i, n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  private def window(toks: Array[UTF8String], i: Int, n: Int): UTF8String =
    if (n == 1) toks(i)
    else {
      val parts = new Array[UTF8String](n)
      System.arraycopy(toks, i, parts, 0, n)
      UTF8String.concatWs(Space, parts: _*)
    }
}
