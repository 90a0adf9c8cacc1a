package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

import graft.functions.expressions.{BloomContains, JaroWinkler, PiiScrub, UnicodeNormalize, VecDot, WordPieceEncode}

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

  val BloomContainsName = "graft_bloom_contains"

  private val bloomContainsInfo = new ExpressionInfo(
    classOf[BloomContains].getCanonicalName, null, BloomContainsName,
    "_FUNC_(bloom, s) - membership probe of string s against a foldable " +
      "binary serialized org.apache.spark.util.sketch.BloomFilter " +
      "(codegen'd; compatible with DataFrameStatFunctions.bloomFilter).",
    "")

  private val bloomContainsBuilder: Seq[Expression] => Expression = {
    case Seq(b, v) => BloomContains(b, v)
    case exprs => throw new IllegalArgumentException(
      s"$BloomContainsName expects 2 arguments, got ${exprs.size}")
  }

  val JaroWinklerName = "graft_jaro_winkler"

  private val jaroWinklerInfo = new ExpressionInfo(
    classOf[JaroWinkler].getCanonicalName, null, JaroWinklerName,
    "_FUNC_(a, b) - Jaro-Winkler similarity of two strings " +
      "(standard 0.7-threshold / 0.1-scale prefix boost; codegen'd " +
      "static kernel).",
    "")

  private val jaroWinklerBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => JaroWinkler(a, b)
    case exprs => throw new IllegalArgumentException(
      s"$JaroWinklerName expects 2 arguments, got ${exprs.size}")
  }

  val PiiScrubName = "graft_pii_scrub"

  private val piiScrubInfo = new ExpressionInfo(
    classOf[PiiScrub].getCanonicalName, null, PiiScrubName,
    "_FUNC_(text) - struct(scrubbed, n_emails, n_long_numbers): " +
      "single-pass email/long-digit-run redaction with match counts.",
    "")

  private val piiScrubBuilder: Seq[Expression] => Expression = {
    case Seq(t) => PiiScrub(t)
    case exprs => throw new IllegalArgumentException(
      s"$PiiScrubName expects 1 argument, got ${exprs.size}")
  }

  val NfcName = "graft_nfc"
  val NfkcName = "graft_nfkc"

  private val nfcInfo = new ExpressionInfo(
    classOf[UnicodeNormalize].getCanonicalName, null, NfcName,
    "_FUNC_(text) - Unicode NFC canonical normalization (UAX #15; " +
      "codegen'd, isNormalized fast path).", "")

  private val nfkcInfo = new ExpressionInfo(
    classOf[UnicodeNormalize].getCanonicalName, null, NfkcName,
    "_FUNC_(text) - Unicode NFKC compatibility normalization " +
      "(UAX #15; codegen'd, isNormalized fast path).", "")

  private val nfcBuilder: Seq[Expression] => Expression = {
    case Seq(t) => UnicodeNormalize(t, compat = false)
    case exprs => throw new IllegalArgumentException(
      s"$NfcName expects 1 argument, got ${exprs.size}")
  }

  private val nfkcBuilder: Seq[Expression] => Expression = {
    case Seq(t) => UnicodeNormalize(t, compat = true)
    case exprs => throw new IllegalArgumentException(
      s"$NfkcName expects 1 argument, got ${exprs.size}")
  }

  val WordPieceName = "graft_wordpiece"

  private val wordPieceInfo = new ExpressionInfo(
    classOf[WordPieceEncode].getCanonicalName, null, WordPieceName,
    "_FUNC_(word, vocab) - WordPiece greedy longest-match encode of " +
      "one word against a foldable array<string> vocabulary " +
      "('##'-prefixed pieces are continuations); [UNK] when any " +
      "position has no match (codegen'd matcher reference).",
    "")

  private val wordPieceBuilder: Seq[Expression] => Expression = {
    case Seq(w, v) => WordPieceEncode(w, v)
    case exprs => throw new IllegalArgumentException(
      s"$WordPieceName expects 2 arguments, got ${exprs.size}")
  }

  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier(WordPieceName), wordPieceInfo, wordPieceBuilder))
    ext.injectFunction(
      (FunctionIdentifier(NfcName), nfcInfo, nfcBuilder))
    ext.injectFunction(
      (FunctionIdentifier(NfkcName), nfkcInfo, nfkcBuilder))
    ext.injectFunction(
      (FunctionIdentifier(VecDotName), vecDotInfo, vecDotBuilder))
    ext.injectFunction(
      (FunctionIdentifier(BloomContainsName), bloomContainsInfo,
        bloomContainsBuilder))
    ext.injectFunction(
      (FunctionIdentifier(PiiScrubName), piiScrubInfo, piiScrubBuilder))
    ext.injectFunction(
      (FunctionIdentifier(JaroWinklerName), jaroWinklerInfo,
        jaroWinklerBuilder))
  }

  /** Idempotent session-level registration. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(VecDotName))) {
      registry.registerFunction(
        FunctionIdentifier(VecDotName), vecDotInfo, vecDotBuilder)
    }
    if (!registry.functionExists(FunctionIdentifier(BloomContainsName))) {
      registry.registerFunction(
        FunctionIdentifier(BloomContainsName), bloomContainsInfo,
        bloomContainsBuilder)
    }
    if (!registry.functionExists(FunctionIdentifier(PiiScrubName))) {
      registry.registerFunction(
        FunctionIdentifier(PiiScrubName), piiScrubInfo, piiScrubBuilder)
    }
    if (!registry.functionExists(FunctionIdentifier(JaroWinklerName))) {
      registry.registerFunction(
        FunctionIdentifier(JaroWinklerName), jaroWinklerInfo,
        jaroWinklerBuilder)
    }
    if (!registry.functionExists(FunctionIdentifier(NfcName))) {
      registry.registerFunction(
        FunctionIdentifier(NfcName), nfcInfo, nfcBuilder)
    }
    if (!registry.functionExists(FunctionIdentifier(NfkcName))) {
      registry.registerFunction(
        FunctionIdentifier(NfkcName), nfkcInfo, nfkcBuilder)
    }
    if (!registry.functionExists(FunctionIdentifier(WordPieceName))) {
      registry.registerFunction(
        FunctionIdentifier(WordPieceName), wordPieceInfo, wordPieceBuilder)
    }
  }

  /** Column form; the owning session must have [[register]]ed (the
    * graft operators do this on entry).
    */
  def vecDot(a: Column, b: Column): Column = call_function(VecDotName, a, b)

  /** Column form of the Bloom probe; `bloom` must be a foldable binary
    * (`lit(filter-serialized-bytes)`). Null string probes yield null.
    */
  def bloomContains(bloom: Column, s: Column): Column =
    call_function(BloomContainsName, bloom, s)

  /** Column form of the Jaro-Winkler similarity. */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function(JaroWinklerName, a, b)

  /** Column form of the single-pass PII scrub (struct result). */
  def piiScrub(text: Column): Column = call_function(PiiScrubName, text)

  /** Column form of Unicode NFC canonical normalization. */
  def nfc(text: Column): Column = call_function(NfcName, text)

  /** Column form of Unicode NFKC compatibility normalization. */
  def nfkc(text: Column): Column = call_function(NfkcName, text)

  /** Column form of the WordPiece greedy longest-match encode; the
    * vocabulary rides the plan as a foldable array literal (tokenizer
    * artifacts are KBs — the literal IS the broadcast).
    */
  def wordPiece(word: Column, vocab: Seq[String]): Column =
    call_function(WordPieceName, word,
      org.apache.spark.sql.functions.lit(vocab.toArray))
}

/** `spark.sql.extensions` hook. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
