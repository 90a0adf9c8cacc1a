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
}
