package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.{GraftFunctions, SparkTestBase}
import graft.functions.expressions.JaroWinkler

class JaroWinklerSpec extends SparkTestBase {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111) < 1e-9)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-9)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333) < 1e-9)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0 && jw("", "abc") == 0.0)
    assert(jw("abc", "xyz") == 0.0) // no matches at all
    // symmetric
    assert(jw("DWAYNE", "DUANE") == jw("DUANE", "DWAYNE"))
  }

  test("prefix boost applies only above the 0.7 jaro threshold") {
    // jaro("abcdef", "abdcfe"): m=6, raw mismatches 4 -> t=2,
    // jaro = (1 + 1 + 4/6)/3 = 0.8889 > 0.7 -> boost with l=2
    val v = jw("abcdef", "abdcfe")
    val jaro = (1.0 + 1.0 + 4.0 / 6) / 3
    assert(math.abs(v - (jaro + 2 * 0.1 * (1 - jaro))) < 1e-9)
  }

  test("codegen parity: expression equals the static kernel in a plan") {
    val ss = spark
    import ss.implicits._
    GraftFunctions.register(ss)
    val pairs = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("kitten", "sitting"), ("", ""), ("a", "b"))
    // repartition blocks ConvertToLocalRelation so a REAL plan runs
    val df = pairs.toDF("a", "b").repartition(2)
      .select(col("a"), col("b"),
        GraftFunctions.jaroWinkler(col("a"), col("b")).as("s"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getDouble(2)))
    rows.foreach { case (a, b, s) => assert(s == jw(a, b), s"($a,$b)") }
    // stays inside whole-stage codegen: the Project carries the "*"
    // codegen marker (AQE's toString never spells out the exec name)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    // null propagation
    val n = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(col("a"), col("b")))
      .head
    assert(n.isNullAt(0))
    // SQL registration
    assert(ss.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA')").head.getDouble(0)
      == jw("MARTHA", "MARHTA"))
  }

  test("code points: surrogate pairs count as single characters") {
    // U+1F600 is a surrogate pair in UTF-16; as one code point these
    // two 3-codepoint strings share 2 of 3
    val a = "a😀b"
    val b = "a😀c"
    val v = jw(a, b)
    val jaro = (2.0 / 3 + 2.0 / 3 + 1.0) / 3
    assert(math.abs(v - (jaro + 2 * 0.1 * (1 - jaro))) < 1e-9)
  }
}
