package graft.operators

import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {

  test("splits on gaps > gapMs, per user") {
    val events = spark.createDataFrame(Seq(
      // user 1: two sessions (gap of 3600s between event 3 and 4)
      (1L, 0L, 101L),
      (1L, 60000L, 102L),
      (1L, 120000L, 103L),
      (1L, 120000L + 3600000L + 1L, 104L),
      // user 2: one session, events exactly at the gap boundary stay together
      (2L, 0L, 201L),
      (2L, 1800000L, 202L)
    )).toDF("user_id", "ms", "event_id")

    val out = Sessionize(events, "user_id", "ms", "event_id", 1800000L)
      .orderBy("user_id", "session_seq").collect()

    assert(out.length == 3)
    val (s1, s2, s3) = (out(0), out(1), out(2))
    assert(s1.getLong(0) == 1L && s1.getLong(2) == 3) // 3 events
    assert(s1.getLong(5) == 120000L) // duration
    assert(s2.getLong(0) == 1L && s2.getLong(2) == 1)
    assert(s3.getLong(0) == 2L && s3.getLong(2) == 2) // boundary gap == gapMs stays
  }

  test("simultaneous timestamps are one session regardless of tie order") {
    val events = spark.createDataFrame(Seq(
      (1L, 1000L, 5L), (1L, 1000L, 3L), (1L, 1000L, 4L)
    )).toDF("user_id", "ms", "event_id")
    val out = Sessionize(events, "user_id", "ms", "event_id", 10L).collect()
    assert(out.length == 1 && out.head.getLong(2) == 3)
  }

  test("topPaths: first-k path per user, deterministic ties, top-N order") {
    val ss = spark
    import ss.implicits._
    // rows NOT in time order; u2 has two events at t=2 tie-broken by id
    val events = Seq(
      (1L, "u1", 3L, "c"), (2L, "u1", 1L, "a"), (3L, "u1", 2L, "b"),
      (4L, "u1", 9L, "d"), // 4th event: beyond k=3, must not appear
      (6L, "u2", 2L, "b"), (5L, "u2", 2L, "a"), (7L, "u2", 1L, "a"),
      (8L, "u3", 1L, "a"), (9L, "u3", 2L, "b"), (10L, "u3", 3L, "c"),
      (11L, "u4", 5L, "x") // short history: 1-event path
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.Sessionize
      .topPaths(events, "user_id", "ts", "event_id", "event_type",
        k = 3, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // u1: a>b>c (d is 4th); u2: a@1 then a@2(id5) before b@2(id6) = a>a>b;
    // u3: a>b>c; u4: x
    assert(out === Array(("a>b>c", 2L), ("a>a>b", 1L), ("x", 1L)))
  }

  test("topPaths honors topN with the n_users-then-path tiebreak") {
    val ss = spark
    import ss.implicits._
    val events = Seq(
      (1L, "u1", 1L, "p"), (2L, "u2", 1L, "q"), (3L, "u3", 1L, "r")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.Sessionize
      .topPaths(events, "user_id", "ts", "event_id", "event_type",
        k = 2, topN = 2)
      .collect().map(_.getString(0))
    assert(out === Array("p", "q")) // equal counts: path ascending wins
  }
}
