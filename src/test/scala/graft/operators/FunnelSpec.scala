package graft.operators

import graft.SparkTestBase

class FunnelSpec extends SparkTestBase {

  test("5-stage funnel with out-of-order and repeated events") {
    val ss = spark
    import ss.implicits._
    // rows deliberately NOT in time order — funnel semantics are
    // min-aggregates, so input order must not matter
    val events = Seq(
      // u1: clean full path, lag 10 between every stage
      ("u1", "a", 10L), ("u1", "b", 20L), ("u1", "c", 30L),
      ("u1", "d", 40L), ("u1", "e", 50L),
      // u2: repeats (first-touch wins) and a c@2 that ties its stage-2
      // time — strictly-after must reject it and take c@4
      ("u2", "a", 5L), ("u2", "a", 1L), ("u2", "b", 3L), ("u2", "b", 2L),
      ("u2", "c", 4L), ("u2", "c", 2L),
      // u3: b before a — only b events AFTER the first a count
      ("u3", "b", 1L), ("u3", "a", 2L), ("u3", "b", 5L),
      // u4: never does a — appears in no stage
      ("u4", "b", 1L), ("u4", "c", 2L), ("u4", "d", 3L),
      // u5: b strictly before a — reaches stage 1 only
      ("u5", "a", 100L), ("u5", "b", 90L)
    ).toDF("user_id", "event_type", "ms")

    val out = Funnel
      .funnel(events, "user_id", "event_type", "ms", Seq("a", "b", "c", "d", "e"))
      .orderBy("stage")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(out === Array(
      ("1_a", 4L, 0L),   // u1, u2(t=1), u3(t=2), u5(t=100)
      ("2_b", 3L, 14L),  // u1 lag 10, u2 min(3,2)=2 lag 1, u3 b@5 lag 3
      ("3_c", 2L, 12L),  // u1 lag 10; u2 c@2 not > 2, so c@4 lag 2
      ("4_d", 1L, 10L),  // u1 only
      ("5_e", 1L, 10L))) // u1 only
  }

  test("stage frames are persisted: no O(k^2) recompute of the event scan") {
    val ss = spark
    import ss.implicits._
    val events = Seq(("u1", "a", 1L), ("u1", "b", 2L), ("u1", "c", 3L))
      .toDF("user_id", "event_type", "ms")
    val out = Funnel.funnel(events, "user_id", "event_type", "ms",
      Seq("a", "b", "c"))
    out.count() // materialize: fills the stage caches
    // every non-head stage branch now reads the previous stage from the
    // cache, not by re-running its whole lineage
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"expected cached stage frames in plan:\n$plan")
  }

  test("funnelRun.release drops every stage-frame cache") {
    val ss = spark
    import ss.implicits._
    // data distinct from the other tests': the cache manager dedups
    // identical plans, which would reuse THEIR entries and mask ours
    val events = Seq(("x1", "p", 1L), ("x1", "q", 2L), ("x1", "r", 3L))
      .toDF("user_id", "event_type", "ms")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val run = Funnel.funnelRun(events, "user_id", "event_type", "ms",
      Seq("p", "q", "r"))
    assert(run.result.count() == 3)
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.size == 3, s"expected one cached frame per stage, got $during")
    run.release()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"lingering cached frames after release: $after")
  }
}
