package graft.operators

import org.apache.spark.sql.functions.col

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

  test("mergeApplyVersioned: stale changes are no-ops, order-free") {
    val ss = spark
    import ss.implicits._
    // base rows carry seq (ms, cid); changes arrive out of order
    val base = Seq(
      (1L, 100L, 10L, 0L), // will get a NEWER upsert
      (2L, 200L, 10L, 0L), // will get a STALE upsert (no-op)
      (3L, 300L, 10L, 0L), // will get a NEWER delete (drops)
      (4L, 400L, 10L, 0L), // will get a STALE delete (no-op)
      (5L, 500L, 10L, 0L)  // untouched
    ).toDF("k", "v", "ms", "cid")
    val changes = Seq(
      (1L, 111L, 20L, 1L, "U"),
      (2L, 222L, 5L, 2L, "U"),
      (3L, 0L, 20L, 3L, "D"),
      (4L, 0L, 5L, 4L, "D"),
      (6L, 666L, 20L, 6L, "U"), // insert (no base row)
      (7L, 0L, 20L, 7L, "D"),   // delete of absent key: no row
      // same key twice: only the latest change competes
      (1L, 999L, 15L, 8L, "U")
    ).toDF("k", "v", "ms", "cid", "op")
    val out = ChangeCapture
      .mergeApplyVersioned(base, changes, "k", Seq("ms", "cid"), "op", "D")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out === Set(
      (1L, 111L, 20L), // newest change (ms 20) won, not the ms-15 one
      (2L, 200L, 10L), // stale upsert ignored
      (4L, 400L, 10L), // stale delete ignored
      (5L, 500L, 10L), // untouched
      (6L, 666L, 20L)  // inserted
    )) // 3 deleted, 7 never existed
  }

  test("mergeApplyVersioned with tombstones is split-invariant in any batch order") {
    val ss = spark
    import ss.implicits._
    val base = Seq((1L, 100L, 10L, 0L, false), (2L, 200L, 10L, 0L, false))
      .toDF("k", "v", "ms", "cid", "dead")
    val b1 = Seq((1L, 111L, 30L, 1L, "U"), (2L, 0L, 25L, 2L, "D"))
      .toDF("k", "v", "ms", "cid", "op")
    val b2 = Seq((1L, 999L, 20L, 3L, "U"), (2L, 222L, 15L, 4L, "U"))
      .toDF("k", "v", "ms", "cid", "op")
    def m(b: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      ChangeCapture.mergeApplyVersioned(b, c, "k", Seq("ms", "cid"), "op", "D",
        tombstoneCol = Some("dead"))
    def live(df: org.apache.spark.sql.DataFrame) = df.where(!col("dead"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val together = m(base, b1.unionByName(b2))
    val reversed = m(m(base, b2), b1)
    val ordered = m(m(base, b1), b2)
    // k2's ms-25 delete tombstones it; the ms-15 upsert is stale in
    // EVERY replay order (without the tombstone, applying the delete
    // batch first would forget k2's version and the stale upsert
    // would wrongly re-insert it — the documented caveat)
    assert(live(together) === Set((1L, 111L)))
    assert(live(reversed) === Set((1L, 111L)))
    assert(live(ordered) === Set((1L, 111L)))
    // the tombstone row itself survives, carrying the delete's seq
    val k2 = ordered.where(col("k") === 2).collect().head
    assert(k2.getBoolean(4) && k2.getLong(2) == 25L)
    // and a strictly newer upsert resurrects
    val b3 = Seq((2L, 333L, 40L, 5L, "U")).toDF("k", "v", "ms", "cid", "op")
    assert(live(m(ordered, b3)) === Set((1L, 111L), (2L, 333L)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; null != empty") {
    val ss = spark
    import ss.implicits._
    val base = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (5L, None)).toDF("k", "v")
    val next = Seq((2L, Some("b")), (3L, Some("c")), (4L, Some("d")),
      (5L, Some(""))).toDF("k", "v")
    val out = ChangeCapture.snapshotDiff(base, next, "k", Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // key 1 removed, 2 unchanged, 3 null->c changed, 4 added,
    // 5 null->"" must be CHANGED (the sentinel keeps them distinct)
    assert(out == Map("added" -> 1L, "removed" -> 1L, "changed" -> 2L,
      "unchanged" -> 1L))
  }

  test("scd2 collapses no-change runs and chains validity intervals") {
    val ss = spark
    import ss.implicits._
    val log = Seq(
      // key 1: A A B A -> three versions (the second A is a no-change)
      (1L, 1L, 1L, Some("A")), (1L, 2L, 2L, Some("A")),
      (1L, 3L, 3L, Some("B")), (1L, 4L, 4L, Some("A")),
      // key 2: single change -> one open version
      (2L, 5L, 5L, Some("X")),
      // key 3: same-timestamp changes order by the tie column
      (3L, 7L, 6L, Some("P")), (3L, 7L, 7L, Some("Q")),
      // key 4: null -> "" is a GENUINE change (sentinel keeps them apart)
      (4L, 1L, 8L, None), (4L, 2L, 9L, Some(""))
    ).toDF("k", "ts", "id", "status")
    val out = ChangeCapture.scd2(log, "k", "ts", "id", Seq("status"))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getInt(4)))
      .toSet
    assert(out == Set(
      (1L, Some("A"), 1L, 3L, 0), (1L, Some("B"), 3L, 4L, 0),
      (1L, Some("A"), 4L, -1L, 1),
      (2L, Some("X"), 5L, -1L, 1),
      (3L, Some("P"), 7L, 7L, 0), (3L, Some("Q"), 7L, -1L, 1),
      (4L, None, 1L, 2L, 0), (4L, Some(""), 2L, -1L, 1)))
  }
}
