package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.{GraftFunctions, SparkTestBase}
import graft.functions.expressions.WordPieceEncode

class WordPieceSpec extends SparkTestBase {

  private def enc(vocab: Seq[String])(word: String): Seq[String] = {
    val m = new WordPieceEncode.Matcher(vocab.toArray)
    val out = m.encode(UTF8String.fromString(word))
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  /** Independent brute-force reference: greedy longest-match written
    * the naive way (try every vocab piece at every position).
    */
  private def reference(vocab: Seq[String], word: String): Seq[String] = {
    val initial = vocab.filterNot(p => p.length > 2 && p.startsWith("##"))
    val conts = vocab.filter(p => p.length > 2 && p.startsWith("##"))
    val out = Seq.newBuilder[String]
    var rest = word
    var first = true
    while (rest.nonEmpty) {
      val cands = if (first) initial.map(p => (p, p))
        else conts.map(p => (p, p.substring(2)))
      val best = cands.filter(c => rest.startsWith(c._2))
        .sortBy(-_._2.length).headOption
      best match {
        case None => return Seq(WordPieceEncode.Unk)
        case Some((piece, content)) =>
          out += piece
          rest = rest.substring(content.length)
          first = false
      }
    }
    out.result()
  }

  private val vocab = Seq("a", "b", "c", "##a", "##b", "##c",
    "ab", "##bc", "##abc", "abc")

  test("greedy longest-match with continuation constraint") {
    val e = enc(vocab) _
    // longest initial piece wins outright
    assert(e("abc") == Seq("abc"))
    // after the initial piece, only ## pieces match
    assert(e("abcabc") == Seq("abc", "##abc"))
    // "ab" + "##bc" beats char-by-char: at pos 0 longest is "ab"? no —
    // "abb" has initial candidates a/ab (abc doesn't match) -> "ab",
    // then "##b"
    assert(e("abb") == Seq("ab", "##b"))
    // greedy is not optimal and that IS the rule: "abbc" -> "ab",
    // then "##bc" matches (longest at pos 2)
    assert(e("abbc") == Seq("ab", "##bc"))
    // single chars chain
    assert(e("cba") == Seq("c", "##b", "##a"))
    // empty word -> empty array
    assert(e("") == Seq.empty)
  }

  test("unmatched position collapses the whole word to [UNK]") {
    val e = enc(vocab) _
    assert(e("abcz") == Seq("[UNK]"))
    assert(e("zabc") == Seq("[UNK]"))
    // an initial-only piece can never match mid-word: "abcab" ->
    // abc, then ##a, ##b (no ##ab piece)
    assert(e("abcab") == Seq("abc", "##a", "##b"))
  }

  test("code points: astral-plane chars match as one character") {
    val rocket = "🚀" // U+1F680
    val v = Seq("x", "##x", rocket, "##" + rocket)
    assert(enc(v)(s"$rocket") == Seq(rocket))
    assert(enc(v)(s"x$rocket") == Seq("x", "##" + rocket))
    // no continuation piece for the astral char alone at pos 0 of
    // a different vocab -> UNK, never a half-surrogate match
    assert(enc(Seq("x", "##x"))(s"$rocket") == Seq("[UNK]"))
  }

  test("vocabulary validation") {
    intercept[IllegalArgumentException] {
      new WordPieceEncode.Matcher(Array.empty[String])
    }
    intercept[IllegalArgumentException] {
      new WordPieceEncode.Matcher(Array("a", ""))
    }
    intercept[IllegalArgumentException] {
      new WordPieceEncode.Matcher(Array("a", "##"))
    }
    // duplicate-content pieces are tolerated (first wins)
    assert(enc(Seq("a", "a", "##a"))("aa") == Seq("a", "##a"))
  }

  test("fuzz: matcher equals the brute-force reference") {
    val rnd = new Random(42)
    val alphabet = "abcd"
    (0 until 300).foreach { i =>
      // random vocab: singles always present half the time
      val nPieces = 2 + rnd.nextInt(8)
      val vocab = (0 until nPieces).map { _ =>
        val len = 1 + rnd.nextInt(3)
        val s = (0 until len)
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        if (rnd.nextBoolean()) "##" + s else s
      }.distinct
      val word = (0 until rnd.nextInt(10))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(enc(vocab)(word) == reference(vocab, word),
        s"iter $i vocab=$vocab word=$word")
    }
  }

  test("codegen parity + null semantics + SQL registration") {
    val ss = spark
    import ss.implicits._
    GraftFunctions.register(ss)
    val words = Seq("abc", "abcabc", "abb", "zq", "", "cba")
    val df = words.toDF("w").repartition(2)
      .select(col("w"), GraftFunctions.wordPiece(col("w"), vocab).as("p"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](1) == enc(vocab)(r.getString(0)),
        r.getString(0))
    }
    // stays inside whole-stage codegen
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    // null word -> null result
    val n = Seq(Option.empty[String]).toDF("w")
      .select(GraftFunctions.wordPiece(col("w"), vocab))
      .head
    assert(n.isNullAt(0))
    // SQL-text access
    val viaSql = ss.sql(
      "SELECT graft_wordpiece('abcabc', array('abc', '##abc'))")
      .head.getSeq[String](0)
    assert(viaSql == Seq("abc", "##abc"))
    // non-foldable vocab is rejected at analysis
    val err = intercept[Exception] {
      Seq(("ab", Seq("a"))).toDF("w", "v")
        .select(call_function("graft_wordpiece", col("w"), col("v")))
        .collect()
    }
    assert(err.getMessage.contains("foldable"), err.getMessage)
  }

  test("piece concatenation round-trips non-UNK words (corpus sweep)") {
    val ss = spark
    GraftFunctions.register(ss)
    val d = graft.Tables(ss, sf001, "documents")
    val toks = graft.operators.TextAnalysis
      .wordPieceEncode(d, "doc_id", "text", graft.queries.PipelineQueries.wpVocab)
    // rebuild each word from its pieces and compare against the split
    // collect_list order is not guaranteed after a shuffle: gather
    // (piece_idx, piece) structs and sort before concatenating
    val rebuilt = toks
      .groupBy("doc_id", "word_idx")
      .agg(array_sort(collect_list(struct(col("piece_idx"),
        regexp_replace(col("token"), "^##", "").as("p")))).as("ps"))
      .select(col("doc_id"), col("word_idx"),
        concat_ws("", expr("transform(ps, x -> x.p)")).as("re"))
    val orig = d.select(col("doc_id"),
        posexplode(graft.functions.Texts.words(col("text"))))
      .withColumnRenamed("pos", "word_idx")
      .where(col("col") =!= "")
    val mismatches = orig.join(rebuilt, Seq("doc_id", "word_idx"))
      .where(col("re") =!= col("col") && col("re") =!= "[UNK]")
      .count()
    assert(mismatches == 0)
  }
}
