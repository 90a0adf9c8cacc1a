package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkTestBase

class StreamingSpec extends SparkTestBase {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  private def ev(user: Long, minutes: Long, tpe: String = "click",
      value: Double = 1.0): StreamEvent =
    StreamEvent(user, ts(minutes), tpe, value)

  private def runToCompletion(q: StreamingQuery): Unit = {
    q.processAllAvailable()
  }

  test("windowed aggregation with watermark over a memory stream") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[StreamEvent]
    val agg = StreamingOps.windowedCounts(
      input.toDF(), watermarkDelay = "10 minutes", windowLen = "1 hour")
    val q = agg.writeStream.format("memory")
      .queryName("win_counts").outputMode("complete").start()
    try {
      input.addData(
        ev(1, 5), ev(1, 10), ev(2, 20, "view"),
        ev(1, 65), ev(2, 70, "view", 2.5))
      runToCompletion(q)
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1),
          r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows == Set(
        (0L, "click", 2L, 2.0),
        (0L, "view", 1L, 1.0),
        (60L, "click", 1L, 1.0),
        (60L, "view", 1L, 2.5)))
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions after the watermark passes") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[StreamEvent]
    val sessions = StreamingOps.sessionize(
      input.toDS(), gapMs = 30 * 60000L, watermarkDelay = "1 minute")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions").outputMode("append").start()
    try {
      // user 1: burst at minutes 0-10; user 2: single event
      input.addData(ev(1, 1000), ev(1, 1010), ev(2, 1005))
      runToCompletion(q)
      // advance event time far past gap+watermark so sessions time out
      input.addData(ev(9, 1600))
      runToCompletion(q)
      // one more batch so the timeout fires after the watermark update
      input.addData(ev(9, 1601))
      runToCompletion(q)

      val rows = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val byUser = rows.groupBy(_._1)
      assert(byUser.contains(1L), s"got: ${rows.mkString(", ")}")
      val s1 = byUser(1L).head
      assert(s1._2 == 2 && s1._3 == 1000 * 60000L && s1._4 == 1010 * 60000L)
      val s2 = byUser(2L).head
      assert(s2._2 == 1)
    } finally q.stop()
  }

  test("transformWithState sessionizer: v2 equals v1 on the same stream") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = ss.conf.getOption(key)
    ss.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val gapMs = 30 * 60000L
      // b2's 1035 arrives out of order and must bridge the held
      // 1000-1010 island; b4 emits u1@1200 through the TIMER path
      // (no u1 input that batch); the long watermark delay keeps
      // islands open while the bridge is still admissible
      val batches = Seq(
        Seq(ev(1, 1000), ev(1, 1010), ev(2, 1005), ev(1, 1200)),
        Seq(ev(1, 1035)),
        Seq(ev(9, 1700)),
        Seq(ev(9, 2200)),
        Seq(ev(9, 2900)))
      def run(
          mk: org.apache.spark.sql.Dataset[StreamEvent] =>
            org.apache.spark.sql.Dataset[SessionOut],
          name: String): Set[(Long, Long, Long, Long)] = {
        ss.catalog.dropTempView(name): Unit
        val input = MemoryStream[StreamEvent]
        val q = mk(input.toDS()).writeStream.format("memory")
          .queryName(name).outputMode("append").start()
        try batches.foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        } finally q.stop()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
      }
      val v1 = run(
        StreamingOps.sessionize(_, gapMs, "600 minutes"), "tws_par_v1")
      val v2 = run(
        StreamingOps.sessionizeTws(_, gapMs, "600 minutes"), "tws_par_v2")
      val m = 60000L
      val expected = Set(
        (1L, 3L, 1000 * m, 1035 * m), // bridged backwards by b2
        (2L, 1L, 1005 * m, 1005 * m),
        (1L, 1L, 1200 * m, 1200 * m), // timer-path emission (b4)
        (9L, 1L, 1700 * m, 1700 * m),
        (9L, 1L, 2200 * m, 2200 * m))
      assert(v1 == expected, s"v1: $v1")
      assert(v2 == expected, s"v2: $v2")
    } finally prev match {
      case Some(p) => ss.conf.set(key, p)
      case None => ss.conf.unset(key)
    }
  }

  test("stream-stream interval join pairs events within the window") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val errors = MemoryStream[StreamEvent]
    val clicks = MemoryStream[StreamEvent]
    val joined = StreamingOps.intervalJoin(
      errors.toDF(), clicks.toDF(), keyCol = "user_id", tsCol = "ts",
      windowMs = 30 * 60000L, watermarkDelay = "1 minute")
    val q = joined.writeStream.format("memory")
      .queryName("ij").outputMode("append").start()
    try {
      errors.addData(ev(1, 1000, "error"), ev(2, 1000, "error"))
      clicks.addData(
        ev(1, 1010, "click"), // inside user 1's window
        ev(1, 1040, "click"), // outside (>= +30min)
        ev(2, 999, "click")) // before the window
      runToCompletion(q)
      val rows = spark.table("ij").collect()
        .map(r => (r.getLong(0), r.getTimestamp(4).getTime / 60000))
      assert(rows.toSeq == Seq((1L, 1010L)))
    } finally q.stop()
  }

  test("interval join left_outer emits unmatched rows once the watermark seals them") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val errors = MemoryStream[StreamEvent]
    val clicks = MemoryStream[StreamEvent]
    val joined = StreamingOps.intervalJoin(
      errors.toDF(), clicks.toDF(), keyCol = "user_id", tsCol = "ts",
      windowMs = 30 * 60000L, watermarkDelay = "1 minute",
      joinType = "left_outer")
    val q = joined.writeStream.format("memory")
      .queryName("loj").outputMode("append").start()
    try {
      errors.addData(ev(1, 1000, "error"), ev(2, 1000, "error"))
      clicks.addData(ev(1, 1010, "click"))
      runToCompletion(q)
      // user 2's null row may only emit after the watermark (min over
      // BOTH streams) proves no click can still land in its window
      errors.addData(ev(9, 5000, "error"))
      clicks.addData(ev(9, 5000, "click"))
      runToCompletion(q)
      errors.addData(ev(9, 5001, "error"))
      clicks.addData(ev(9, 5001, "click"))
      runToCompletion(q)
      val rows = spark.table("loj").collect()
        .filter(r => r.getLong(0) <= 2L)
        .map(r => (r.getLong(0),
          if (r.isNullAt(4)) None else Some(r.getTimestamp(4).getTime / 60000)))
        .toSet
      assert(rows == Set((1L, Some(1010L)), (2L, None)), s"got $rows")
    } finally q.stop()
  }

  test("per-key cap emits the first N by event time, sealed by watermark") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[CapEvent]
    val q = StreamingOps.perKeyCapByEventTime(
        input.toDS(), cap = 2, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("cap").outputMode("append")
      .start()
    def ce(key: Long, minutes: Long, tie: Long) =
      CapEvent(key, ts(minutes), tie)
    try {
      // one batch, out of order: the cap must pick by EVENT time (the
      // later-arriving minute-100 event outranks minute-110), emitting
      // only what the advancing watermark has sealed — the trailing
      // no-data micro-batch seals minutes 100/105 once wm reaches 109
      input.addData(ce(1, 110, 1), ce(1, 100, 2), ce(1, 105, 3), ce(2, 100, 4))
      runToCompletion(q)
      // watermark advance seals everything -> first 2 per key emit
      input.addData(ce(9, 5000, 5))
      runToCompletion(q)
      // a LATE third event for a capped-out key must not emit (state
      // tombstone), and u9's own event emits once sealed
      input.addData(ce(1, 120, 6), ce(9, 5002, 7))
      runToCompletion(q)
      input.addData(ce(9, 5003, 8))
      runToCompletion(q)
      val rows = spark.table("cap").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 <= 2L).toSet
      assert(rows == Set(
        (1L, 1L, 100 * 60000L, 2L),
        (1L, 2L, 105 * 60000L, 3L),
        (2L, 1L, 100 * 60000L, 4L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence per digest within watermark") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[StreamEvent]
    // event_type doubles as the "text" being deduped
    val dedup = StreamingOps.dedupByDigest(
      input.toDF(), textCol = "event_type", tsCol = "ts",
      watermarkDelay = "5 minutes")
    val q = dedup.writeStream.format("memory")
      .queryName("dedup").outputMode("append").start()
    try {
      input.addData(
        ev(1, 1000, "Alpha Doc"), ev(2, 1001, "  alpha doc  "), // dup after norm
        ev(3, 1002, "beta doc"))
      runToCompletion(q)
      val texts = spark.table("dedup").collect().map(_.getString(2))
      assert(texts.length == 2, s"got: ${texts.mkString("|")}")
      assert(texts.map(_.trim.toLowerCase).toSet
        == Set("alpha doc", "beta doc"))
    } finally q.stop()
  }

  test("streaming sessionize agrees with the batch operator on the same events") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    // deterministic multi-user event set: bursts split by >30min gaps
    val events = Seq(
      ev(1, 100), ev(1, 110), ev(1, 125), // session A (3 events)
      ev(1, 200), ev(1, 205), // session B (2)
      ev(2, 100), // session C (1)
      ev(2, 180), ev(2, 199)) // session D (2)
    val gapMs = 30 * 60000L

    // batch reference
    val batchDf = events.toDF()
      .select(col("user_id"), (col("ts").cast("long") * 1000).as("ms"),
        monotonically_increasing_id().as("tie"))
    val batch = graft.operators.Sessionize(
      batchDf, "user_id", "ms", "tie", gapMs)
      .select("user_id", "n_events", "start_ms", "end_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // streaming: same events + a far-future sentinel to advance the
    // watermark past every session's timeout
    val input = MemoryStream[StreamEvent]
    val q = StreamingOps.sessionize(
      input.toDS(), gapMs, watermarkDelay = "1 minute")
      .writeStream.format("memory")
      .queryName("parity").outputMode("append").start()
    try {
      input.addData(events: _*)
      runToCompletion(q)
      input.addData(ev(9999, 100000))
      runToCompletion(q)
      input.addData(ev(9999, 100001))
      runToCompletion(q)
      val streamed = spark.table("parity").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 != 9999L).toSet
      assert(streamed == batch,
        s"streaming $streamed != batch $batch")
    } finally q.stop()
  }

  test("out-of-order event within the gap extends the session backwards") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[StreamEvent]
    val sessions = StreamingOps.sessionize(
      input.toDS(), gapMs = 30 * 60000L, watermarkDelay = "2 hours")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_ooo").outputMode("append").start()
    try {
      input.addData(ev(1, 1000))
      runToCompletion(q)
      // late but within the generous watermark: 10 min BEFORE the
      // session start — batch Sessionize would take min(ts)
      input.addData(ev(1, 990))
      runToCompletion(q)
      // advance watermark far past the timeout so the session closes
      input.addData(ev(9, 3000))
      runToCompletion(q)
      input.addData(ev(9, 3001))
      runToCompletion(q)
      val rows = spark.table("sessions_ooo").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 == 1L)
      assert(rows.length == 1, s"got: ${rows.mkString(", ")}")
      assert(rows.head == ((1L, 2L, 990 * 60000L, 1000 * 60000L)),
        s"start_ms must move back to the out-of-order event: ${rows.head}")
    } finally q.stop()
  }

  test("out-of-order event beyond the gap before start closes separately") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[StreamEvent]
    val sessions = StreamingOps.sessionize(
      input.toDS(), gapMs = 30 * 60000L, watermarkDelay = "4 hours")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_ooo2").outputMode("append").start()
    try {
      input.addData(ev(1, 1000))
      runToCompletion(q)
      // 100 min BEFORE the session start, > gap: batch semantics say
      // this is its own earlier session — it must NOT merge
      input.addData(ev(1, 900))
      runToCompletion(q)
      input.addData(ev(9, 4000))
      runToCompletion(q)
      input.addData(ev(9, 4001))
      runToCompletion(q)
      val rows = spark.table("sessions_ooo2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 == 1L).toSet
      assert(rows == Set(
        (1L, 1L, 900 * 60000L, 900 * 60000L),
        (1L, 1L, 1000 * 60000L, 1000 * 60000L)), s"got: $rows")
    } finally q.stop()
  }

  test("mid-batch gap splits into two sessions (batch path within state fn)") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[StreamEvent]
    val sessions = StreamingOps.sessionize(
      input.toDS(), gapMs = 10 * 60000L, watermarkDelay = "1 minute")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions2").outputMode("append").start()
    try {
      // both events in ONE batch, 60 min apart -> two islands; neither
      // emits until the watermark seals it (an in-watermark event could
      // still extend the first)
      input.addData(ev(1, 1000), ev(1, 1060))
      runToCompletion(q)
      // watermark (1060 - 1min) seals island(1000) on the next batch
      input.addData(ev(9, 1061))
      runToCompletion(q)
      val rows = spark.table("sessions2").collect()
        .filter(_.getLong(0) == 1L)
      assert(rows.length == 1, s"got ${rows.length} rows")
      assert(rows.head.getLong(2) == 1000 * 60000L &&
        rows.head.getLong(3) == 1000 * 60000L)
    } finally q.stop()
  }

  test("in-watermark event bridges two held islands into one session") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[StreamEvent]
    val sessions = StreamingOps.sessionize(
      input.toDS(), gapMs = 10 * 60000L, watermarkDelay = "4 hours")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_bridge").outputMode("append").start()
    try {
      // 18 min apart: > gap, two separate islands — both HELD (the
      // generous watermark means a bridging event is still admissible)
      input.addData(ev(1, 1000), ev(1, 1018))
      runToCompletion(q)
      // the bridge: within gap of both islands -> one merged session
      input.addData(ev(1, 1009))
      runToCompletion(q)
      // drain: advance watermark far past the merged session's deadline
      input.addData(ev(9, 2000))
      runToCompletion(q)
      input.addData(ev(9, 2001))
      runToCompletion(q)
      val rows = spark.table("sessions_bridge").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 == 1L)
      assert(rows.toSeq == Seq((1L, 3L, 1000 * 60000L, 1018 * 60000L)),
        s"expected ONE bridged session, got: ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("stream-static enrich joins each micro-batch against the dim") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("uid", "tier")
    val input = MemoryStream[StreamEvent]
    val out = StreamingOps.enrich(input.toDF(), dim, "user_id", "uid")
      .select(col("user_id"), col("tier"), col("value"))
    val q = out.writeStream.format("memory")
      .queryName("enriched").outputMode("append").start()
    try {
      input.addData(ev(1, 10, value = 1.5), ev(3, 11, value = 9.0))
      runToCompletion(q)
      input.addData(ev(2, 12, value = 2.5))
      runToCompletion(q)
      val rows = spark.table("enriched").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted
      // user 3 has no dim row -> dropped by the inner join
      assert(rows.toSeq == Seq((1L, "gold", 1.5), (2L, "silver", 2.5)))
    } finally q.stop()
  }

  test("streaming MERGE: foreachBatch + versioned merge absorbs out-of-order batches") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    // the production CDC-ingestion pattern: each micro-batch folds into
    // the snapshot via the versioned merge; tombstones make the result
    // independent of how the changelog was split into batches
    val input = MemoryStream[(Long, Long, Long, Long, String)]
    var state = Seq((1L, 100L, 10L, 0L, false), (2L, 200L, 10L, 0L, false))
      .toDF("k", "v", "ms", "cid", "dead")
    val q = input.toDF()
      .toDF("k", "v", "ms", "cid", "op")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val next = graft.operators.ChangeCapture.mergeApplyVersioned(
            state, batch, "k", Seq("ms", "cid"), "op", "D",
            tombstoneCol = Some("dead"))
          // a real pipeline writes the snapshot table here; the test
          // materializes it so the next batch merges against data, not
          // an ever-growing lazy plan
          state = next.collect().toSeq
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getBoolean(4)))
            .toDF("k", "v", "ms", "cid", "dead")
        }
      }
      .start()
    try {
      // batch 1: the NEWER changes arrive first
      input.addData((1L, 111L, 30L, 1L, "U"), (2L, 0L, 25L, 2L, "D"))
      q.processAllAvailable()
      // batch 2: stale stragglers — must all be no-ops
      input.addData((1L, 999L, 20L, 3L, "U"), (2L, 222L, 15L, 4L, "U"))
      q.processAllAvailable()
      // batch 3: a genuinely newer upsert resurrects the deleted key
      input.addData((2L, 333L, 40L, 5L, "U"))
      q.processAllAvailable()
      val live = state.where(!col("dead"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(live === Set((1L, 111L), (2L, 333L)))
    } finally q.stop()
  }

  test("windowed distinct users dedups within the window, append mode") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = StreamingOps.windowedDistinctUsers(
        input.toDF(), watermarkDelay = "10 minutes", windowLen = "1 hour")
      .writeStream.format("memory").queryName("wdu").outputMode("append")
      .start()
    try {
      // u1 twice in hour 0 (counts once); u2 once; hour 1: u1 only
      input.addData(ev(1, 5), ev(1, 40), ev(2, 20), ev(1, 70))
      q.processAllAvailable()
      // watermark advance drains the sealed windows
      input.addData(ev(99, 100000))
      q.processAllAvailable()
      input.addData(ev(98, 100100))
      q.processAllAvailable()
      val rows = spark.table("wdu").collect()
        .map(r => r.getTimestamp(0).getTime / 60000 -> r.getLong(1))
        .filter(_._1 < 50000).toMap
      assert(rows == Map(0L -> 2L, 60L -> 1L))
    } finally q.stop()
  }

  test("streaming attribution credits the latest in-window click at seal time") {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val input = MemoryStream[AttrEvent]
    def ae(user: Long, minutes: Long, id: Long, tpe: String, cents: Long) =
      AttrEvent(user, ts(minutes), id, tpe, cents)
    val q = StreamingOps.lastTouchAttribution(
        input.toDS(), touchType = "click", convType = "purchase",
        windowMs = 1800000L, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("attr").outputMode("append")
      .start()
    try {
      // batch 1: click@10 then purchases @20 and @60; wm reaches 50
      input.addData(
        ae(1, 10, 1, "click", 0),
        ae(1, 20, 2, "purchase", 999),
        ae(1, 60, 3, "purchase", 500))
      runToCompletion(q)
      // batch 2: a LATER click@55 (in window for both open purchases)
      // plus an in-window purchase@56 and an untouched user
      input.addData(
        ae(1, 55, 4, "click", 0),
        ae(1, 56, 5, "purchase", 100),
        ae(2, 100, 6, "purchase", 300))
      runToCompletion(q)
      // far-future click advances the watermark and seals everything
      input.addData(ae(9, 5000, 99, "click", 0))
      runToCompletion(q)
      input.addData(ae(9, 5100, 100, "click", 0))
      runToCompletion(q)
      val rows = spark.table("attr").collect()
        .filter(_.getLong(1) <= 2L)
        .map { r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) -1L else r.getLong(4),
            if (r.isNullAt(5)) -1L else r.getLong(5),
            r.getInt(6))
        }.toSet
      assert(rows == Set(
        // purchase@20: click@10, 10 min earlier
        (2L, 1L, 20 * 60000L, 999L, 1L, 600000L, 1),
        // purchase@60: click@55 wins over click@10 (older AND out of window)
        (3L, 1L, 60 * 60000L, 500L, 4L, 300000L, 1),
        // purchase@56: click@55, one minute earlier (cross-batch state)
        (5L, 1L, 56 * 60000L, 100L, 4L, 60000L, 1),
        // untouched user expires unattributed
        (6L, 2L, 100 * 60000L, 300L, -1L, -1L, 0)), s"got $rows")
    } finally q.stop()
  }

  // ---- steady-state incremental near-dedup as a streaming sink ----
  // The production shape incrementalNearDupFromSignatures exists for
  // (VERDICT r11 item 7): a foreachBatch sink that, per micro-batch,
  // (a) probes the batch against the STORED base signatures, (b)
  // emits verified pairs touching the batch, and (c) appends the
  // batch's signatures + docs to the store so the next batch never
  // re-signatures anything. Work per batch is O(fresh); results must
  // be independent of how the fresh docs were split into batches.

  private val incBase = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "completely different words about spark shuffles and partitions here"))

  private val incFreshA = Seq(
    (3L, "the quick brown fox jumps over the lazy dog near the river bend"))
  private val incFreshB = Seq(
    (4L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (5L, "another unrelated document mentioning joins aggregates and windows today"))

  /** Drive the SHIPPED sink over the given batches; returns
    * (emitted pairs, final signature-store id set).
    */
  private def runIncrementalStream(
      batches: Seq[Seq[(Long, String)]]): (Set[(Long, Long)], Set[Long]) = {
    val ss = spark
    import ss.implicits._
    implicit val sqlCtx = ss.sqlContext
    val state = graft.ScratchSpace.dir(ss, "inc_dedup_state_")
    StreamingOps.seedNearDupState(
      incBase.toDF("doc_id", "text"), state, "doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val sink = StreamingOps.nearDupSink(state, "doc_id", "text",
      threshold = 0.5)
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(sink).start()
    try batches.foreach { b =>
      input.addData(b: _*)
      q.processAllAvailable() // one micro-batch per addData drain
    } finally q.stop()
    val emitted = StreamingOps.nearDupPairs(spark, state)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val storedIds = spark.read.parquet(s"$state/sigs")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    (emitted, storedIds)
  }

  test("foreachBatch incremental near-dedup: batch-count-independent pairs, growing state") {
    // doc 3 near-dups base doc 1; doc 4 (batch 2) exactly dups doc 3
    // (batch 1) — the (3,4) pair exists ONLY if batch 2 probes state
    // that batch 1 appended; doc 5 matches nothing
    val (twoBatch, storedIds) =
      runIncrementalStream(Seq(incFreshA, incFreshB))
    val expected = Set((1L, 3L), (1L, 4L), (3L, 4L))
    assert(twoBatch == expected, s"two-batch run: $twoBatch")
    // every batch's signatures were appended to the store
    assert(storedIds == Set(1L, 2L, 3L, 4L, 5L))
    // splitting the same fresh docs differently must not change pairs
    val (oneBatch, _) = runIncrementalStream(Seq(incFreshA ++ incFreshB))
    assert(oneBatch == expected, s"one-batch run: $oneBatch")
    val (threeBatch, _) = runIncrementalStream(
      Seq(incFreshA, incFreshB.take(1), incFreshB.drop(1)))
    assert(threeBatch == expected, s"three-batch run: $threeBatch")
  }

  test("nearDupSink: checkpointed restart mid-feed loses and dups nothing") {
    val ss = spark
    val inDir = graft.ScratchSpace.dir(ss, "ndsink_in_")
    val state = graft.ScratchSpace.dir(ss, "ndsink_state_")
    val ckpt = graft.ScratchSpace.dir(ss, "ndsink_ckpt_")
    import ss.implicits._
    StreamingOps.seedNearDupState(
      incBase.toDF("doc_id", "text"), state, "doc_id", "text")
    val sink = StreamingOps.nearDupSink(state, "doc_id", "text",
      threshold = 0.5)
    def jsonLine(d: (Long, String)): String =
      s"""{"doc_id":${d._1},"text":"${d._2}"}\n"""
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def startQ(): StreamingQuery = ss.readStream
      .schema(schema).option("maxFilesPerTrigger", "1").json(inDir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(sink).start()
    graft.ScratchSpace.writeBytes(ss, inDir, "f1.json",
      incFreshA.map(jsonLine).mkString.getBytes("UTF-8"))
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()
    // STOPPED mid-feed; more arrives while down, then restart
    graft.ScratchSpace.writeBytes(ss, inDir, "f2.json",
      incFreshB.take(1).map(jsonLine).mkString.getBytes("UTF-8"))
    graft.ScratchSpace.writeBytes(ss, inDir, "f3.json",
      incFreshB.drop(1).map(jsonLine).mkString.getBytes("UTF-8"))
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    val pairs = StreamingOps.nearDupPairs(ss, state)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // complete (nothing lost across the restart) AND no duplicates
    assert(pairs.length == pairs.distinct.length, s"dup pairs: ${pairs.toSeq}")
    assert(pairs.toSet == Set((1L, 3L), (1L, 4L), (3L, 4L)),
      s"got ${pairs.toSeq}")
    val storedIds = ss.read.parquet(s"$state/sigs")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(storedIds == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("nearDupPairs is readable right after seeding (empty, typed)") {
    val ss = spark
    import ss.implicits._
    val state = graft.ScratchSpace.dir(ss, "ndsink_fresh_")
    StreamingOps.seedNearDupState(
      incBase.toDF("doc_id", "text"), state, "doc_id", "text")
    // BEFORE any batch: must return an empty frame, not PATH_NOT_FOUND
    val early = StreamingOps.nearDupPairs(ss, state)
    assert(early.columns.toSeq == Seq("id_a", "id_b", "jaccard_sim"))
    assert(early.count() == 0L)
    assert(early.schema("id_a").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("countSumSink: readable after seed, replay-idempotent, split-invariant") {
    val ss = spark
    import ss.implicits._
    val rows = Seq((1L, 10L), (1L, 5L), (2L, 7L), (3L, 1L), (2L, 2L))
    val df = rows.toDF("k", "v")
    val state = graft.ScratchSpace.dir(ss, "aggsink_")
    StreamingOps.seedCountSumState(df, state, "k", "v")
    // BEFORE any batch: empty, typed
    val early = StreamingOps.countSumState(ss, state, "k")
    assert(early.columns.toSeq == Seq("k", "n_rows", "val_sum"))
    assert(early.count() == 0L)
    val sink = StreamingOps.countSumSink(state, "k", "v")
    sink(df.where(col("k") <= 1), 0L)
    sink(df.where(col("k") > 1), 1L)
    def read() = StreamingOps.countSumState(ss, state, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    val expected = Seq((1L, 2L, 15L), (2L, 2L, 9L), (3L, 1L, 1L))
    assert(read() == expected, read())
    // crash-recovery re-delivery of the SAME batch must not double-count
    sink(df.where(col("k") <= 1), 0L)
    assert(read() == expected, s"replay double-counted: ${read()}")
    // split-invariance: one-batch delivery produces the same merge
    val state2 = graft.ScratchSpace.dir(ss, "aggsink_one_")
    StreamingOps.seedCountSumState(df, state2, "k", "v")
    StreamingOps.countSumSink(state2, "k", "v")(df, 0L)
    val one = StreamingOps.countSumState(ss, state2, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(one == expected, one)
  }

  test("nearDupSink: a re-delivered batchId is idempotent") {
    val ss = spark
    import ss.implicits._
    val state = graft.ScratchSpace.dir(ss, "ndsink_replay_")
    StreamingOps.seedNearDupState(
      incBase.toDF("doc_id", "text"), state, "doc_id", "text")
    val sink = StreamingOps.nearDupSink(state, "doc_id", "text",
      threshold = 0.5)
    val b0 = incFreshA.toDF("doc_id", "text")
    sink(b0, 0L)
    val after1 = StreamingOps.nearDupPairs(ss, state)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val sigs1 = ss.read.parquet(s"$state/sigs").count()
    sink(b0, 0L) // crash-recovery re-delivery of the SAME batch
    val after2 = StreamingOps.nearDupPairs(ss, state)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(after2 == after1, s"replay changed pairs: $after1 -> $after2")
    assert(ss.read.parquet(s"$state/sigs").count() == sigs1)
    sink(incFreshB.toDF("doc_id", "text"), 1L)
    val fin = StreamingOps.nearDupPairs(ss, state)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fin == Set((1L, 3L), (1L, 4L), (3L, 4L)), s"got $fin")
  }
}
