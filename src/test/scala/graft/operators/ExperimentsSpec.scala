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

  test("mannWhitneyU: a fully-continuous metric (every value distinct) " +
    "runs the DISTRIBUTED cumulative pass, no single-task window") {
    val ss = spark
    import ss.implicits._
    // 50k distinct values, no ties: U_a has a closed form when A's
    // values all exceed B's: U_a = n_a * n_b (A wins every pair)
    val nA = 25000
    val df = ((0 until nA).map(i => ("a", (100000 + i).toLong)) ++
      (0 until nA).map(i => ("b", i.toLong))).toDF("variant", "x")
      .repartition(8)
    val out = Experiments.mannWhitneyU(df, "variant", "x")
    val r = out.collect().head
    assert(r.getLong(0) == nA.toLong && r.getLong(1) == nA.toLong)
    assert(r.getDouble(2) == nA.toDouble * nA) // U_a = n_a * n_b
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

  test("cuped: hand-checked theta, adjusted means, t, variance reduction") {
    val ss = spark
    import ss.implicits._
    // a: (x,y) = (1,2),(2,4); b: (3,7),(4,9)
    // pooled: n=4 sx=10 sy=22 sxx=30 syy=150 sxy=67
    // θ = (67−55)/(30−25) = 2.4; ρ² = 12²/(5·29) = 144/145 -> 0.9931
    // x̄ = 2.5; m_a = 3 − 2.4·(1.5−2.5) = 5.4; m_b = 8 − 2.4·1 = 5.6
    // v_a = v_b = 2 − 4.8 + 2.88 = 0.08
    // t = −0.2/√(0.04+0.04) = −0.70710.. -> −0.7071
    val df = Seq(("a", 1L, 2L), ("a", 2L, 4L), ("b", 3L, 7L),
      ("b", 4L, 9L)).toDF("variant", "x", "y")
    val r = Experiments.cuped(df, "variant", "x", "y").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.4)
    assert(r.getDouble(3) == 5.4 && r.getDouble(4) == 5.6)
    assert(r.getDouble(5) == -0.7071)
    assert(r.getDouble(6) == 0.9931)
  }

  test("cuped: three variants FAIL instead of silently dropping one") {
    val ss = spark
    import ss.implicits._
    val df = Seq(("a", 1L, 1L), ("b", 2L, 2L), ("c", 3L, 3L))
      .toDF("variant", "x", "y")
    val e = intercept[Exception] {
      Experiments.cuped(df, "variant", "x", "y").collect()
    }
    assert(e.getMessage.contains("exactly 2 variants") ||
      Option(e.getCause).exists(_.getMessage.contains("exactly 2 variants")))
  }

  test("chiSquareIndependence: hand-checked 2x2 and independent table") {
    val ss = spark
    import ss.implicits._
    // 2×2: a:(x 10, y 20), b:(x 20, y 10); all E = 15
    // χ² = 4·25/15 = 6.6667, dof = 1
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = Experiments
      .chiSquareIndependence(rows.toDF("v", "c"), "v", "c")
      .collect().head
    assert(r.getLong(0) == 60L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 6.6667)
    // perfectly proportional table -> χ² = 0 exactly
    val ind = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r2 = Experiments
      .chiSquareIndependence(ind.toDF("v", "c"), "v", "c")
      .collect().head
    assert(r2.getLong(0) == 45L && r2.getDouble(2) == 0.0)
  }

  test("rankAuc: hand-checked AUC with average-rank ties") {
    val ss = spark
    import ss.implicits._
    // scores: neg {1, 3}, pos {3, 5}; ranks 1, 2.5, 2.5, 4
    // R_pos = 2.5 + 4 = 6.5; U = 6.5 - 3 = 3.5; AUC = 3.5/4 = 0.875
    val df = Seq((false, 1.0), (false, 3.0), (true, 3.0), (true, 5.0))
      .toDF("label", "score")
    val r = Experiments.rankAuc(df, "label", "score").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 2L, 0.875)))
    // perfect separation scores 1.0; reversed scores 0.0
    val perfect = Seq((false, 1.0), (false, 2.0), (true, 3.0), (true, 4.0))
      .toDF("label", "score")
    assert(Experiments.rankAuc(perfect, "label", "score")
      .collect().head.getDouble(2) == 1.0)
    val reversed = Seq((true, 1.0), (false, 2.0)).toDF("label", "score")
    assert(Experiments.rankAuc(reversed, "label", "score")
      .collect().head.getDouble(2) == 0.0)
    // one-class input refuses loudly
    val ex = intercept[Exception] {
      Experiments.rankAuc(Seq((true, 1.0), (true, 2.0))
        .toDF("label", "score"), "label", "score").collect()
    }
    assert(ex.getMessage.contains("both classes"), ex.getMessage)
  }
}
