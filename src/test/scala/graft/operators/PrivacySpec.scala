package graft.operators

import graft.SparkTestBase

class PrivacySpec extends SparkTestBase {

  test("kAnonymityAudit: exact group sizes, below-k mass, l-diversity") {
    val ss = spark
    import ss.implicits._
    // QI groups: (a,x) size 3 with 2 sensitive values; (a,y) size 1
    // (below k) with 1 value; (b,x) size 2 with 2 values
    val df = Seq(
      ("a", "x", 10.0), ("a", "x", 10.0), ("a", "x", 20.0),
      ("a", "y", 30.0),
      ("b", "x", 40.0), ("b", "x", 50.0)
    ).toDF("q1", "q2", "s")
    val r = Privacy.kAnonymityAudit(df, Seq("q1", "q2"), "s", k = 2)
      .collect().head
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("rows_below_k") == 1L) // the (a,y) singleton
    assert(r.getAs[Long]("min_group_size") == 1L)
    assert(r.getAs[Long]("min_l_diversity") == 1L)
    assert(r.getAs[Double]("pct_anonymous") == 0.8333)
  }

  test("kAnonymityAudit: fully anonymous table reports zero below-k rows") {
    val ss = spark
    import ss.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("q1", "s")
    val r = Privacy.kAnonymityAudit(df, Seq("q1"), "s", k = 2)
      .collect().head
    assert(r.getAs[Long]("rows_below_k") == 0L)
    assert(r.getAs[Double]("pct_anonymous") == 1.0)
  }
}
