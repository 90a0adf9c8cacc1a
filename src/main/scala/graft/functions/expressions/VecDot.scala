package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * Why an Expression and not composition: the HOF fold
  * (`aggregate(zip_with(...))`) evaluates interpreted, and unrolling
  * `element_at` products needs the dimension statically and blows past
  * Janino's 64 KB method limit once several dots land in one generated
  * method (see Similarity.planeBit). This emits ONE tight loop in
  * whole-stage codegen — dimension-agnostic, no method growth, and the
  * same left-to-right accumulation order as the interpreted fold and
  * DuckDB's `list_dot_product`, so oracle values stay bit-identical.
  *
  * Null semantics: null if either array is null (BinaryExpression
  * default); elements are assumed non-null (cast embeddings), matching
  * the unrolled form which would return null on any null element.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // type annotation omitted: AbstractDataType is private[sql]; the
  // inferred Seq[ArrayType] conforms to the override
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)
}
