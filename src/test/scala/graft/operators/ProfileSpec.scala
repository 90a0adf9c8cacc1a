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
}
