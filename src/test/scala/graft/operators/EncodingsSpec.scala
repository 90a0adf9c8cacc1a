package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EncodingsSpec extends SparkTestBase {

  test("targetEncodeLoo: excludes own row; singleton categories null") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 100L),
      (5L, "c", 7L), (6L, "c", 9L)).toDF("id", "cat", "y")
    val out = Encodings.targetEncodeLoo(df, "cat", col("y"))
      .select("id", "loo_mean").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getDouble(1)))).toMap
    assert(out(1L).contains(25.0)) // (20+30)/2
    assert(out(2L).contains(20.0)) // (10+30)/2
    assert(out(3L).contains(15.0)) // (10+20)/2
    assert(out(4L).isEmpty) // singleton: nothing to borrow
    assert(out(5L).contains(9.0) && out(6L).contains(7.0))
  }

  test("targetEncodeLoo stats join: no hint, AQE still broadcasts when small") {
    // VERDICT r11 item 2: the category-grain stats table is unbounded,
    // so the operator must not force broadcast(); at small SF AQE
    // should still pick a broadcast join at runtime on its own.
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val out = Encodings.targetEncodeLoo(orders, "o_orderpriority",
      floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
    // no static hint in the optimized plan
    assert(!out.queryExecution.optimizedPlan.toString
      .contains("ResolvedHint"), "broadcast hint should be gone")
    out.collect(): Unit
    val executed = out.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin"),
      s"AQE did not broadcast the tiny stats side:\n${executed.take(1500)}")
  }

  test("equiDepthHistogram matches ntile semantics incl. remainder buckets") {
    val ss = spark
    import ss.implicits._
    // 10 rows into 3 buckets: sizes 4, 3, 3 (SQL-standard ntile)
    val df = (1L to 10L).map(i => (i, i * 11L)).toDF("id", "v")
    val out = Encodings.equiDepthHistogram(df, "v", "id", k = 3)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1, 4L, 11L, 44L), (2, 3L, 55L, 77L), (3, 3L, 88L, 110L)))
    // partition-count independence: same buckets under heavy repartition
    val out2 = Encodings.equiDepthHistogram(
        df.repartition(7), "v", "id", k = 3)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == out2.toSeq)
    // n < k: one row per bucket
    val tiny = Encodings.equiDepthHistogram(
        (1L to 2L).map(i => (i, i)).toDF("id", "v"), "v", "id", k = 5)
      .orderBy("bucket").collect().map(_.getInt(0))
    assert(tiny.toSeq == Seq(1, 2))
  }

  test("linearAttribution: equal split, window edges, exact counts") {
    val ss = spark
    import ss.implicits._
    // user 1: purchase at t=100 with touches at 95 (click), 90 (view),
    // 85 (click) inside W=20; touch at 79 is outside; touch at 100
    // (same instant) counts; user 2: purchase with no touches -> absent
    val ev = Seq(
      (10L, 1L, 100L, "purchase"),
      (1L, 1L, 95L, "click"),
      (2L, 1L, 90L, "view"),
      (3L, 1L, 85L, "click"),
      (4L, 1L, 79L, "view"),
      (5L, 1L, 100L, "signup"),
      (20L, 2L, 500L, "purchase")).toDF("event_id", "user_id", "ms", "event_type")
    val out = Temporal.linearAttribution(ev, "user_id", "ms", "event_id",
        "event_type", convType = "purchase", windowSpan = 20L)
      .orderBy("conv_id", "channel").collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4), r.getLong(5),
        r.getDouble(6)))
    assert(out.toSeq == Seq(
      (10L, "click", 2L, 4L, 0.5),
      (10L, "signup", 1L, 4L, 0.25),
      (10L, "view", 1L, 4L, 0.25)))
  }
}
