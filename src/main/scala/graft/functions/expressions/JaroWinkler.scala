package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Jaro-Winkler similarity over two string columns —
  * the fuzzy-match kernel for entity resolution (name/address/title
  * matching) where edit distance over-penalizes transpositions.
  *
  * Definition (the standard one, matching DuckDB's
  * `jaro_winkler_similarity`, which the oracle uses as the
  * cross-engine differential): Jaro similarity from match count m
  * (characters equal within a window of floor(max(|a|,|b|)/2) − 1)
  * and transposition count t (half the out-of-order matched pairs),
  *   jaro = (m/|a| + m/|b| + (m − t)/m) / 3,
  * then the Winkler prefix boost ONLY above the 0.7 threshold:
  *   jw = jaro + ℓ · 0.1 · (1 − jaro), ℓ = common prefix ≤ 4.
  * Both-empty strings score 1.0; one-empty scores 0.0.
  *
  * Like Spark's own `levenshtein`, the per-row work is an algorithm,
  * not an expression tree — codegen emits ONE static call into
  * [[JaroWinkler.similarity]], keeping whole-stage codegen intact
  * with zero method growth. Operates on code points (surrogate pairs
  * count as one character), matching DuckDB's unicode handling.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, StringType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel shared by interpreted eval and codegen. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString.codePoints().toArray
    val b = ub.toString.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a(i) == b(j)) {
          aMatched(i) = true
          bMatched(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
