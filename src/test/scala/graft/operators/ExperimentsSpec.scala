package graft.operators

import graft.SparkTestBase

class ExperimentsSpec extends SparkTestBase {

  test("welchTTest: hand-checked t statistic from exact moments") {
    val ss = spark
    import ss.implicits._
    // A: 1,2,3 -> mean 2, var 1; B: 4,6 -> mean 5, var 2
    // t = (2-5)/sqrt(1/3 + 2/2) = -3/sqrt(4/3) = -2.598076.. -> -2.5981
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 6L))
      .toDF("variant", "x")
    val r = Experiments.welchTTest(df, "variant", "x").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == -2.5981)
  }

  test("welchTTest: three variants FAIL instead of silently dropping one") {
    val ss = spark
    import ss.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("variant", "x")
    val e = intercept[Exception] {
      Experiments.welchTTest(df, "variant", "x").collect()
    }
    // the raise_error message survives Spark's exception wrapping
    assert(e.getMessage.contains("exactly 2 variants") ||
      Option(e.getCause).exists(_.getMessage.contains("exactly 2 variants")))
  }

  test("welchTTest: sum of squares survives Long-overflow-scale metrics") {
    val ss = spark
    import ss.implicits._
    // Σx² reaches 1.9e20 >> Long.MAX (9.2e18): a long accumulator
    // overflows (ANSI: job failure), the decimal accumulator must not.
    // Values are chosen so every double step is exact: both variances
    // are 2·(3.1e9)², so t = (3.1e9 − 9.3e9)/(3.1e9·√2) = −√2 -> −1.4142
    val df = Seq(
      ("a", 0L), ("a", 6200000000L),
      ("b", 6200000000L), ("b", 12400000000L)).toDF("variant", "x")
    val r = Experiments.welchTTest(df, "variant", "x").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 3.1e9 && r.getDouble(3) == 9.3e9)
    assert(r.getDouble(4) == -1.4142)
  }

  test("mannWhitneyU: hand-checked U and tie-corrected z") {
    val ss = spark
    import ss.implicits._
    // A: 1,2,3  B: 2,4.  Sorted ranks: 1->1, {2,2}->2.5, 3->4, 4->5
    // R_a = 1 + 2.5 + 4 = 7.5, U_a = 7.5 - 3*4/2 = 1.5
    // ties: one group of 2 -> sum(t^3 - t) = 6
    // var = (3*2/12) * ((5+1) - 6/(5*4)) = 0.5 * 5.7 = 2.85
    // z = (1.5 - 3) / sqrt(2.85) = -0.888523... -> -0.8885
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 4L))
      .toDF("variant", "x")
    val r = Experiments.mannWhitneyU(df, "variant", "x").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.5)
    assert(r.getDouble(3) == -0.8885)
  }

  test("mannWhitneyU: three variants FAIL instead of silently merging") {
    val ss = spark
    import ss.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("variant", "x")
    val e = intercept[Exception] {
      Experiments.mannWhitneyU(df, "variant", "x").collect()
    }
    assert(e.getMessage.contains("exactly 2 variants") ||
      Option(e.getCause).exists(_.getMessage.contains("exactly 2 variants")))
  }
}
