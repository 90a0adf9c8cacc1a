package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst WordPiece tokenization of ONE word — the greedy
  * longest-match encode rule (the BERT-family tokenizer), the second
  * tokenizer family next to BPE ([[graft.operators.TextAnalysis
  * .bpeEncode]]) so fertility audits can price a tokenizer SWAP
  * instead of BPE against itself.
  *
  * `graft_wordpiece(word, vocab)` — the second child must be a
  * FOLDABLE array<string> (the planted vocabulary; tokenizer
  * artifacts are KBs, so a plan literal IS the broadcast, same shape
  * as [[BloomContains]]' serialized sketch). Pieces starting `##`
  * (with non-empty remainder) are CONTINUATION pieces: they match
  * only at word position > 0, against the text after the `##`.
  * All other pieces match only at position 0.
  *
  * Encode rule (the public WordPiece algorithm): from position 0,
  * repeatedly take the LONGEST vocab piece matching at the current
  * position (initial pieces at 0, continuation pieces after) and
  * advance by its length; if no piece matches at some position, the
  * WHOLE word encodes to the single `[UNK]` token. Matching is by
  * code point (BMP and astral alike), so the rule replays exactly in
  * engines whose substr/len are code-point based (the DuckDB oracle
  * replays it as per-position longest-match + a recursive-CTE walk —
  * a genuinely different evaluation strategy over the same rule).
  *
  * Why an Expression and not a UDF: the encode sits on the
  * full-corpus token-counting scan; the matcher (vocab indexed by
  * (continuation?, first code point), longest first) is built once
  * per codegen reference via `addReferenceObj` and the generated
  * code is a single call, keeping the scan inside one
  * WholeStageCodegen span. Null word yields null (BinaryExpression
  * default); empty word yields an empty array.
  */
case class WordPieceEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (left.dataType != StringType) {
      TypeCheckFailure(s"$prettyName: first argument must be STRING, " +
        s"got ${left.dataType.catalogString}")
    } else if (!right.dataType.isInstanceOf[ArrayType] ||
      right.dataType.asInstanceOf[ArrayType].elementType != StringType) {
      TypeCheckFailure(s"$prettyName: second argument must be " +
        s"ARRAY<STRING>, got ${right.dataType.catalogString}")
    } else if (!right.foldable) {
      TypeCheckFailure(s"$prettyName: the vocabulary must be foldable")
    } else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_wordpiece"

  // Built once per executor/codegen reference from the foldable vocab
  // child. Transient: the plan ships the piece strings, not the index.
  @transient private lazy val matcher: WordPieceEncode.Matcher = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    require(arr != null, s"$prettyName: vocabulary is null")
    val pieces = Array.tabulate(arr.numElements()) { i =>
      val p = arr.getUTF8String(i)
      require(p != null, s"$prettyName: vocabulary contains null")
      p.toString
    }
    new WordPieceEncode.Matcher(pieces)
  }

  override protected def nullSafeEval(w: Any, vocab: Any): Any =
    matcher.encode(w.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceMatcher", matcher,
      classOf[WordPieceEncode.Matcher].getName)
    nullSafeCodeGen(ctx, ev, (w, _) => {
      s"${ev.value} = $ref.encode($w);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): WordPieceEncode =
    copy(left = newLeft, right = newRight)
}

object WordPieceEncode {

  /** The unknown-word token the greedy rule falls back to. */
  val Unk = "[UNK]"

  /** Vocabulary index + the greedy longest-match kernel, shared by
    * interpreted eval and codegen. Pieces are validated eagerly:
    * empty pieces and a bare `##` (empty continuation) are rejected —
    * a zero-length match would never advance.
    */
  final class Matcher(vocab: Array[String]) extends Serializable {
    require(vocab.nonEmpty, "graft_wordpiece: vocabulary is empty")

    // (continuation?, first code point) -> candidates longest-first.
    // Duplicate-content pieces keep the first occurrence (dedup by
    // (cont, content)); candidate arrays carry (code points, piece).
    private val index: java.util.HashMap[Long, Array[(Array[Int], UTF8String)]] = {
      val seen = scala.collection.mutable.HashSet.empty[(Boolean, String)]
      val grouped = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[(Array[Int], UTF8String)]]
      vocab.foreach { p =>
        require(p.nonEmpty, "graft_wordpiece: vocabulary contains an empty piece")
        val cont = p.length > 2 && p.startsWith("##")
        require(p != "##",
          "graft_wordpiece: bare '##' (empty continuation) is not a piece")
        val content = if (cont) p.substring(2) else p
        if (seen.add((cont, content))) {
          val cps = content.codePoints().toArray
          val key = (if (cont) 1L << 32 else 0L) | (cps(0).toLong & 0xFFFFFFFFL)
          grouped.getOrElseUpdate(key,
            scala.collection.mutable.ArrayBuffer.empty) +=
            ((cps, UTF8String.fromString(p)))
        }
      }
      val m = new java.util.HashMap[Long, Array[(Array[Int], UTF8String)]]()
      grouped.foreach { case (k, cands) =>
        m.put(k, cands.sortBy(-_._1.length).toArray)
      }
      m
    }

    private val unkResult =
      new GenericArrayData(Array[Any](UTF8String.fromString(Unk)))
    private val emptyResult = new GenericArrayData(Array.empty[Any])

    /** Greedy longest-match encode of one word; `[UNK]` when any
      * position has no matching piece.
      */
    def encode(word: UTF8String): ArrayData = {
      val cps = word.toString.codePoints().toArray
      val n = cps.length
      if (n == 0) return emptyResult
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var pos = 0
      while (pos < n) {
        val key = (if (pos > 0) 1L << 32 else 0L) |
          (cps(pos).toLong & 0xFFFFFFFFL)
        val cands = index.get(key)
        var matched: UTF8String = null
        var step = 0
        if (cands != null) {
          var i = 0
          while (i < cands.length && (matched eq null)) {
            val pcs = cands(i)._1
            if (pcs.length <= n - pos) {
              var j = 0
              var ok = true
              while (j < pcs.length && ok) {
                if (pcs(j) != cps(pos + j)) ok = false
                j += 1
              }
              if (ok) { matched = cands(i)._2; step = pcs.length }
            }
            i += 1
          }
        }
        if (matched eq null) return unkResult
        out += matched
        pos += step
      }
      new GenericArrayData(out.toArray)
    }
  }
}
