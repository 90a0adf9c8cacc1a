package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TemporalSpec extends SparkTestBase {

  private def df(rows: (Long, Long, Long)*) = // (id, key, ts)
    spark.createDataFrame(rows).toDF("event_id", "user_id", "ms")

  test("asof join picks the last right row at or before each left ts") {
    val left = df((10L, 1L, 100L), (11L, 1L, 200L), (12L, 2L, 50L))
    val right = df((90L, 1L, 100L), (91L, 1L, 150L), (92L, 3L, 10L))
    val out = Temporal
      .asofLastBefore(left, right, "user_id", "ms", "event_id")
      .orderBy("event_id").collect()
    // left 10 @100: right @100 matches inclusively
    assert(out(0).getLong(3) == 100L)
    // left 11 @200: latest right is @150
    assert(out(1).getLong(3) == 150L)
    // left 12: no right rows for user 2 -> null
    assert(out(2).isNullAt(3))
  }

  test("range join: inclusive start, exclusive end, key-scoped") {
    val points = df((1L, 1L, 100L), (2L, 1L, 199L), (3L, 1L, 200L),
      (4L, 2L, 150L))
    val intervals = spark.createDataFrame(Seq(
      (50L, 1L, 100L, 200L), // [100, 200) for user 1
      (51L, 2L, 0L, 100L) // misses point 4 (ts 150)
    )).toDF("error_id", "user_id", "start_ms", "end_ms")
    val out = Temporal.rangeJoinBucketed(
      points, intervals, "user_id", "ms", "start_ms", "end_ms",
      "event_id", "error_id", bucketWidth = 100L)
    assert(out.select("event_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L)) // 3 excluded (end-exclusive), 4 wrong interval
  }

  test("range join finds matches across a bucket boundary") {
    // interval [150, 250) spans buckets 1 and 2 at width 100
    val points = df((1L, 1L, 249L), (2L, 1L, 250L))
    val intervals = spark.createDataFrame(Seq((50L, 1L, 150L, 250L)))
      .toDF("error_id", "user_id", "start_ms", "end_ms")
    val out = Temporal.rangeJoinBucketed(
      points, intervals, "user_id", "ms", "start_ms", "end_ms",
      "event_id", "error_id", bucketWidth = 100L)
    assert(out.select("event_id").collect().map(_.getLong(0)).toSeq
      == Seq(1L))
  }

  test("range join plan is an equi-join — no nested-loop expansion") {
    val points = df((1L, 1L, 100L))
    val intervals = spark.createDataFrame(Seq((50L, 1L, 100L, 200L)))
      .toDF("error_id", "user_id", "start_ms", "end_ms")
    val plan = Temporal.rangeJoinBucketed(
      points, intervals, "user_id", "ms", "start_ms", "end_ms",
      "event_id", "error_id", bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("stratified hash sample is deterministic and rate-ordered") {
    val rows = (1L to 2000L).map(i =>
      (i, if (i % 2 == 0) "keep_half" else "keep_few"))
    val df = spark.createDataFrame(rows).toDF("event_id", "event_type")
    def run() = Sampling
      .stratifiedByHash(df, "event_id", "event_type",
        Map("keep_half" -> 500, "keep_few" -> 20), defaultPermille = 0)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run()
    assert(a == run()) // deterministic
    assert(a("keep_half") > 400 && a("keep_half") < 600)
    assert(a.getOrElse("keep_few", 0L) < 60)
  }

  test("slidingDistinctCount equals the brute-force window count") {
    val ss = spark
    import ss.implicits._
    val rows = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (4L, "c"), (4L, "a"), (7L, "d"),
      (1L, "a") // duplicate (unit, key) must not double-count
    ).toDF("day", "user")
    val out = Temporal
      .slidingDistinctCount(rows, "day", "user", window = 3,
        outCol = "active")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force over the distinct (day,user) set, window [d-2, d]
    val du = Set((1L, "a"), (1L, "b"), (2L, "a"), (4L, "c"), (4L, "a"),
      (7L, "d"))
    val expected = du.map(_._1).map { d =>
      d -> du.filter(p => p._1 >= d - 2 && p._1 <= d).map(_._2).size.toLong
    }.toMap
    assert(out === expected)
    assert(out(1L) == 2L && out(2L) == 2L && out(4L) == 2L && out(7L) == 1L)
  }

  test("intervalUnion merges overlapping and touching intervals per key") {
    val iv = spark.createDataFrame(Seq(
      // key 1: [0,10] [5,20] overlap; [20,30] touches (closed-closed);
      // [50,60] is its own island
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L), (1L, 50L, 60L),
      // key 2: nested interval swallowed entirely
      (2L, 0L, 100L), (2L, 10L, 20L),
      // key 3: single point interval
      (3L, 7L, 7L)
    )).toDF("user_id", "iv_start", "iv_end")
    val out = Temporal.intervalUnion(iv, "user_id", "iv_start", "iv_end")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 40L, 30L))) // islands [0,30] + [50,60]
    assert(out(2L) == ((1L, 100L, 100L)))
    assert(out(3L) == ((1L, 0L, 0L)))
  }

  test("intervalUnion: an island reopens only past the running max end") {
    // [0,100] then [10,20], [30,40]: naive lag-based gap detection
    // (prev END, not running max) would wrongly open at [30,40]
    val iv = spark.createDataFrame(Seq(
      (1L, 0L, 100L), (1L, 10L, 20L), (1L, 30L, 40L), (1L, 150L, 160L)
    )).toDF("k", "s", "e")
    val out = Temporal.intervalUnion(iv, "k", "s", "e").collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L) // [0,100] and [150,160]
    assert(out(0).getLong(2) == 110L)
  }

  test("decayAverage halves weight per step and caps at depth") {
    // user 1: values 2.00 (newest), 1.00, with depth 2:
    // num = 200*2^2 + 100*2^1 = 1000, den = 4+2 = 6 →
    // 1000/6/100 = 1.6666... → fix4 = 1.6667
    val e = spark.createDataFrame(Seq(
      (1L, 1L, 10L, 1.0), (2L, 1L, 20L, 2.0),
      // user 2: three events but depth 2 keeps the newest two
      (3L, 2L, 10L, 9.0), (4L, 2L, 20L, 1.0), (5L, 2L, 30L, 2.0)
    )).toDF("event_id", "user_id", "ms", "value")
    val out = Temporal
      .decayAverage(e, "user_id", "ms", "event_id", "value", depth = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out(1L) == ((2L, 1.6667)))
    // user 2: 200*4 + 100*2 = 1000 / 6 / 100 → same 1.6667; the 9.0
    // event is older than depth and must NOT contribute
    assert(out(2L) == ((2L, 1.6667)))
  }

  test("decayAverage ties break by event id, newest first") {
    val e = spark.createDataFrame(Seq(
      (1L, 1L, 10L, 1.0), (2L, 1L, 10L, 3.0) // same ts: id 2 is newer
    )).toDF("event_id", "user_id", "ms", "value")
    val out = Temporal
      .decayAverage(e, "user_id", "ms", "event_id", "value", depth = 1)
      .collect()
    assert(out(0).getLong(1) == 1L) // only the newest survives depth 1
    assert(out(0).getDouble(2) == 3.0)
  }

  test("lastTouchAttribution credits the latest in-window touch only") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, 1L, 10L, "click", 0.0),
      (2L, 1L, 15L, "purchase", 9.99),
      (3L, 1L, 100L, "purchase", 5.0),
      (4L, 2L, 20L, "click", 0.0),
      (5L, 2L, 30L, "click", 0.0),
      (6L, 2L, 35L, "purchase", 1.0),
      (7L, 3L, 35L, "click", 0.0), // same-ms touch, smaller id: counts
      (8L, 3L, 35L, "purchase", 2.0),
      (9L, 4L, 5L, "purchase", 3.0) // never touched
    ).toDF("event_id", "user_id", "ms", "event_type", "value")
    val out = Temporal.lastTouchAttribution(
        df, "user_id", "ms", "event_id", "event_type", "value",
        touchType = "click", convType = "purchase", windowSpan = 50L)
      .orderBy("event_id").collect()
      .map { r =>
        (r.getLong(0),
          if (r.isNullAt(r.fieldIndex("touch_id"))) -1L
          else r.getAs[Long]("touch_id"),
          if (r.isNullAt(r.fieldIndex("touch_age"))) -1L
          else r.getAs[Long]("touch_age"),
          r.getAs[Int]("attributed"))
      }
    assert(out.toSeq == Seq(
      (2L, 1L, 5L, 1), // click id1, 5ms earlier
      (3L, -1L, -1L, 0), // click too old (90 > 50)
      (6L, 5L, 5L, 1), // LATEST click wins, not the first
      (8L, 7L, 0L, 1), // same-ms click counts (id order)
      (9L, -1L, -1L, 0))) // no touch at all
    // cents are exact
    val cents = Temporal.lastTouchAttribution(
        df, "user_id", "ms", "event_id", "event_type", "value",
        "click", "purchase", 50L)
      .orderBy("event_id").collect().head.getAs[Long]("value_cents")
    assert(cents == 999L)
  }

  test("forwardFill carries the last non-null per key; leading nulls stay null") {
    val ss = spark
    import ss.implicits._
    val df = Seq(
      (1L, 1L, 10L, Some(5L)),
      (2L, 1L, 20L, None), // gap -> takes 5
      (3L, 1L, 30L, Some(7L)),
      (4L, 1L, 40L, None), // takes 7, not 5
      (5L, 2L, 10L, None), // leading null: nothing to carry
      (6L, 2L, 20L, Some(9L))
    ).toDF("event_id", "user_id", "ms", "v")
    val out = Temporal.forwardFill(df, "user_id", "ms", "event_id",
        org.apache.spark.sql.functions.col("v"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
    assert(out.toSeq == Seq(
      (1L, 5L, 0), (2L, 5L, 1), (3L, 7L, 0), (4L, 7L, 1),
      (5L, -1L, 0), (6L, 9L, 0)))
  }

  test("pitEnrich gives each fact the state valid AT its time") {
    val ss = spark
    import ss.implicits._
    val dims = Seq(
      (1L, 10L, 100L, "bronze"),
      (1L, 30L, 101L, "gold"),
      (2L, 50L, 102L, "silver")
    ).toDF("user_id", "ms", "event_id", "tier")
    val facts = Seq(
      (1L, 5L, 1L), // before any state: null
      (1L, 10L, 2L), // AT the change instant: change wins ([from, to))
      (1L, 29L, 3L), // still bronze
      (1L, 30L, 4L), // gold from exactly 30
      (1L, 99L, 5L), // open segment
      (2L, 60L, 6L), // other key
      (3L, 10L, 7L) // key with no dims at all
    ).toDF("user_id", "ms", "event_id")
    val out = Temporal.pitEnrich(facts, dims,
        "user_id", "ms", "event_id", "tier")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) "-" else r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "-"), (2L, "bronze"), (3L, "bronze"), (4L, "gold"),
      (5L, "gold"), (6L, "silver"), (7L, "-")))
  }

  test("disorderHistogram buckets lateness against the arrival frontier") {
    val ss = spark
    import ss.implicits._
    // arrival order = arr column; user 1 sees ts 100, 40, 250, 240:
    // disorder 0, 60, 0, 10 -> buckets (width 50): 0,1,0,0
    val df = Seq(
      (1L, 100L, "a"),
      (1L, 40L, "b"), // 60 late vs frontier 100
      (1L, 250L, "c"),
      (1L, 240L, "d"), // 10 late vs frontier 250
      (2L, 10L, "e") // first arrival of its key: in order
    ).toDF("user_id", "ms", "arr")
    val out = Temporal.disorderHistogram(df, "user_id", "ms",
        org.apache.spark.sql.functions.col("arr"), bucketWidth = 50L)
      .orderBy("bucket_lo_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (0L, 4L, 0.8), // four in-order-ish events (disorder < 50)
      (50L, 1L, 1.0))) // the 60-late event
  }
  test("resampleOhlc: deterministic bars under out-of-order arrival") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions.col
    // one key, one day-bucket of span 100: events arrive SHUFFLED;
    // open = value at min (ts, tie), close at max, exact volume
    val rows = Seq(
      (1L, 130L, 3L, 70L), // mid
      (1L, 199L, 9L, 20L), // close
      (1L, 101L, 1L, 50L), // open
      (1L, 130L, 2L, 90L), // same ts as "mid", smaller tie
      (1L, 250L, 4L, 33L)) // next bucket
    val df = rows.toDF("k", "ts", "id", "v")
    val out = Temporal.resampleOhlc(df, "k", "ts", "id", col("v"),
        bucketSpan = 100L)
      .orderBy("bucket_start").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq == Seq(
      (100L, 50L, 90L, 20L, 20L, 230L, 4L),
      (200L, 33L, 33L, 33L, 33L, 33L, 1L)))
    // repartitioned input produces the identical bars
    val out2 = Temporal.resampleOhlc(df.repartition(5), "k", "ts", "id",
        col("v"), bucketSpan = 100L)
      .orderBy("bucket_start").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.toSeq == out2.toSeq)
  }
}
