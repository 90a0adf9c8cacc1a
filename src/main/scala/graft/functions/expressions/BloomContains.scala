package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst Bloom-filter membership probe over a string column.
  *
  * `bloom_contains(serialized_bloom, s)` — the first child must be a
  * FOLDABLE binary (the driver-serialized
  * `org.apache.spark.util.sketch.BloomFilter`), mirroring Spark's own
  * runtime-filter `BloomFilterMightContain` design (which is not
  * reachable from the public API for a pre-built filter: its value side
  * is hard-wired to `xxhash64` longs, while `DataFrameStatFunctions
  * .bloomFilter` over strings inserts raw UTF-8 bytes). This expression
  * probes with the same bytes `BloomFilterImpl.putString` inserted, so
  * it is drop-in compatible with `stat.bloomFilter` sketches.
  *
  * Why an Expression and not a UDF: the probe sits on the full-corpus
  * scan of the decontamination path (TextAnalysis.bloomDecontaminate) —
  * a Scala UDF there breaks whole-stage codegen for the entire scan
  * stage. Here the filter is deserialized once per task via
  * `addReferenceObj` and the generated code is a single virtual call,
  * keeping the scan inside one WholeStageCodegen span.
  *
  * Null semantics: null if the probed string is null (BinaryExpression
  * default) — callers that want UDF-style `false` wrap in `coalesce`.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes: AbstractDataType is private[sql]; the strict
  // check below covers both types and foldability
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (left.dataType != BinaryType) {
      TypeCheckFailure(s"$prettyName: first argument must be BINARY " +
        s"(a serialized BloomFilter), got ${left.dataType.catalogString}")
    } else if (right.dataType != StringType) {
      TypeCheckFailure(s"$prettyName: second argument must be STRING, " +
        s"got ${right.dataType.catalogString}")
    } else if (!left.foldable) {
      TypeCheckFailure(
        s"$prettyName: the serialized BloomFilter must be foldable")
    } else TypeCheckSuccess
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  // Deserialized once per executor/codegen reference, from the foldable
  // binary child. Transient: the plan ships the bytes, not the object.
  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: serialized BloomFilter is null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(bloomBytes: Any, s: Any): Any =
    filter.mightContainBinary(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bloomRef =
      ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, s) => {
      s"${ev.value} = $bloomRef.mightContainBinary($s.getBytes());"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
