package graft.operators

import graft.SparkTestBase

class ChangeCaptureSpec extends SparkTestBase {

  test("mergeApply: latest change wins, deletes drop, untouched survive") {
    val ss = spark
    import ss.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("k", "v")
    // key 1: untouched; key 2: updated twice (seq 2 wins); key 3:
    // deleted after an update; key 4: deleted then RE-INSERTED (the
    // resurrect case); key 5: pure insert of a new key
    val changes = Seq(
      (2L, 21L, "U", 1L), (2L, 22L, "U", 2L),
      (3L, 31L, "U", 1L), (3L, 0L, "D", 2L),
      (4L, 0L, "D", 1L), (4L, 44L, "U", 2L),
      (5L, 50L, "U", 1L)
    ).toDF("k", "v", "op", "seq")
    val out = ChangeCapture
      .mergeApply(base, changes, "k", Seq("seq"), "op", deleteOp = "D")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L), (2L, 22L), (4L, 44L), (5L, 50L)))
  }

  test("mergeApply: delete of an absent key is a no-op") {
    val ss = spark
    import ss.implicits._
    val base = Seq((1L, 10L)).toDF("k", "v")
    val changes = Seq((9L, 0L, "D", 1L)).toDF("k", "v", "op", "seq")
    val out = ChangeCapture
      .mergeApply(base, changes, "k", Seq("seq"), "op", deleteOp = "D")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L)))
  }
}
