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
}
