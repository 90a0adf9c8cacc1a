package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

import graft.functions.expressions.VecDot

/** Registration of graft's native Catalyst expressions.
  *
  * Two entry points, per the standard extension pattern:
  *  - cluster-wide: `spark.sql.extensions=graft.GraftExtensions`
  *    (injectFunction at session build);
  *  - programmatic: `GraftFunctions.register(spark)` — idempotent, used
  *    internally by operators so library callers need no config.
  */
object GraftFunctions {

  val VecDotName = "graft_vec_dot"

  private val vecDotInfo = new ExpressionInfo(
    classOf[VecDot].getCanonicalName, null, VecDotName,
    "_FUNC_(a, b) - dot product of two array<double> vectors " +
      "(codegen'd loop; sequential accumulation order).",
    "")

  private val vecDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => VecDot(a, b)
    case exprs => throw new IllegalArgumentException(
      s"$VecDotName expects 2 arguments, got ${exprs.size}")
  }

  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (FunctionIdentifier(VecDotName), vecDotInfo, vecDotBuilder))

  /** Idempotent session-level registration. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(VecDotName))) {
      registry.registerFunction(
        FunctionIdentifier(VecDotName), vecDotInfo, vecDotBuilder)
    }
  }

  /** Column form; the owning session must have [[register]]ed (the
    * graft operators do this on entry).
    */
  def vecDot(a: Column, b: Column): Column = call_function(VecDotName, a, b)
}

/** `spark.sql.extensions` hook. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
