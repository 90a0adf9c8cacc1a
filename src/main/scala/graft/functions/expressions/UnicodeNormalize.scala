package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization: `graft_nfc(text)` / `graft_nfkc(text)` —
  * the curation step that collapses visually-identical byte variants
  * (decomposed accents, compatibility ligatures/width forms) BEFORE
  * any hash-grain dedup or token counting: 'e'+U+0301 and U+00E9 are
  * the same document to a reader but different digests, different
  * shingles and different tokens to every downstream operator, so a
  * crawl that mixes normalization forms silently under-dedups. NFC is
  * the lossless canonical form (the web default per WHATWG); NFKC
  * additionally folds compatibility characters (ﬁ→fi, fullwidth→
  * ASCII) — lossy, right before tokenization.
  *
  * Cross-engine contract: the Unicode normalization algorithm is
  * fully specified by UAX #15, so `java.text.Normalizer` (ICU data in
  * the JDK) and DuckDB's utf8proc `nfc_normalize` agree on every
  * assigned codepoint — the oracle hash-gates this. Codegen'd: the
  * fast path `Normalizer.isNormalized` skips allocation for the
  * (overwhelmingly common) already-normalized ASCII row, so the per-
  * row cost on clean corpora is one table-driven scan.
  */
case class UnicodeNormalize(child: Expression, compat: Boolean)
    extends UnaryExpression {

  override def prettyName: String =
    if (compat) "graft_nfkc" else "graft_nfc"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName needs a string column, got ${child.dataType.sql}")
  }

  override def dataType: DataType = StringType

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    UTF8String.fromString(
      UnicodeNormalize.normalize(s.toString, compat))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = UnicodeNormalize.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = UTF8String.fromString(
         |  $cls.normalize($c.toString(), $compat));""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {
  /** JVM kernel (also the spec's reference point): isNormalized fast
    * path, then one Normalizer pass.
    */
  def normalize(s: String, compat: Boolean): String = {
    val form = if (compat) Normalizer.Form.NFKC else Normalizer.Form.NFC
    if (Normalizer.isNormalized(s, form)) s
    else Normalizer.normalize(s, form)
  }
}
