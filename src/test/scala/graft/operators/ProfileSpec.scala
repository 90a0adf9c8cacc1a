package graft.operators

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {

  test("profile reports nulls, exact distincts, and native-order min/max") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (Some(10L), Some("b")),
      (Some(2L), None),
      (Some(10L), Some("a")),
      (None, Some("a"))
    ).toDF("num", "str")
    val out = Profile.table(df, Seq("num", "str"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    // numeric min/max must use numeric order: min 2, max 10 (a
    // lexicographic profile would report min "10", max "2")
    assert(out.toSeq == Seq(
      ("num", 4L, 1L, 2L, "2", "10"),
      ("str", 4L, 1L, 2L, "a", "b")))
  }

  test("winsorizedStats clips into the exact percentile bounds") {
    val ss = spark
    import ss.implicits._
    // group g: values 0..10 plus a 1000 outlier; lo=0, hi=0.5 makes the
    // expected clip window [0, median] easy to hand-check
    val df = ((0 to 10).map(v => ("g", v.toDouble)) :+ ("g", 1000.0))
      .toDF("grp", "v")
    val out = Profile.winsorizedStats(df, "grp", "v", lo = 0.0, hi = 0.5)
      .collect().head
    // p0 = 0; p50 of 12 sorted values interpolates 5.5; clipped mean =
    // (0+1+2+3+4+5+5.5+5.5+5.5+5.5+5.5+5.5) / 12 = 48/12 = 4
    assert(out.getAs[Double]("lo_v") == 0.0)
    assert(out.getAs[Double]("hi_v") == 5.5)
    assert(out.getAs[Double]("winsorized_mean") == 4.0)
    assert(out.getAs[Long]("n") == 12L)
  }
}
