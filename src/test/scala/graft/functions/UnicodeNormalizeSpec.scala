package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftFunctions, SparkTestBase}
import graft.functions.expressions.UnicodeNormalize

class UnicodeNormalizeSpec extends SparkTestBase {

  test("NFC composes decomposed accents; NFKC folds compatibility") {
    // e + combining acute -> precomposed U+00E9
    assert(UnicodeNormalize.normalize("café", compat = false)
      == "café")
    // already-NFC text passes through unchanged
    assert(UnicodeNormalize.normalize("plain ascii", compat = false)
      == "plain ascii")
    assert(UnicodeNormalize.normalize("café", compat = false)
      == "café")
    // NFKC: fi ligature U+FB01 -> "fi", fullwidth A U+FF21 -> "A",
    // and it also composes canonical sequences
    assert(UnicodeNormalize.normalize("ﬁle Ａ é",
      compat = true) == "file A é")
    // NFC leaves compatibility characters alone (canonical only)
    assert(UnicodeNormalize.normalize("ﬁle", compat = false)
      == "ﬁle")
  }

  test("normalization is idempotent over fuzzed BMP strings") {
    val rnd = new scala.util.Random(77)
    val pool = "abcé́̈ﬁＡ ñññガｶﾞ"
    for (_ <- 0 until 500) {
      val s = Seq.fill(rnd.nextInt(30))(
        pool(rnd.nextInt(pool.length))).mkString
      for (compat <- Seq(false, true)) {
        val once = UnicodeNormalize.normalize(s, compat)
        assert(UnicodeNormalize.normalize(once, compat) == once,
          s"not idempotent on ${s.map(_.toInt.toHexString)}")
      }
    }
  }

  test("Column forms run codegen'd over a real frame; nulls pass through") {
    val ss = spark
    import ss.implicits._
    GraftFunctions.register(ss)
    val df = Seq(
      (1L, "café ﬁn"),
      (2L, null.asInstanceOf[String]),
      (3L, "ascii only")).toDF("id", "t").repartition(2)
    val out = df.select(col("id"),
        GraftFunctions.nfc(col("t")).as("nfc"),
        GraftFunctions.nfkc(col("t")).as("nfkc"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "café ﬁn")
    assert(out(0).getString(2) == "café fin")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(out(2).getString(1) == "ascii only")
    // SQL surface too
    val viaSql = ss.sql("SELECT graft_nfc('é') AS x").head.getString(0)
    assert(viaSql == "é")
  }
}
