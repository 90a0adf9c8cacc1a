package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A typed streaming event (mirrors the `events` table columns that
  * matter for streaming).
  */
final case class StreamEvent(
    user_id: Long,
    ts: Timestamp,
    event_type: String,
    value: Double)

/** One closed session emitted by the stateful sessionizer. */
final case class SessionOut(
    user_id: Long,
    n_events: Long,
    start_ms: Long,
    end_ms: Long)

/** Mutable-in-state session accumulator. */
final case class SessionState(n_events: Long, start_ms: Long, end_ms: Long)

/** Structured Streaming variants of the batch operators: the same
  * transforms declared over an unbounded source. Watermarks bound
  * state; `flatMapGroupsWithState` holds one small state record per
  * user, so state size is O(active users), not O(events).
  */
object StreamingOps {

  /** Windowed aggregation with a watermark: event counts + value sums
    * per (tumbling window, event_type).
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      watermarkDelay: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("value_sum"))

  /** Watermarked stream-stream interval join: each left event pairs
    * with right events of the same key whose timestamp falls in
    * [left.ts, left.ts + windowMs). Both sides carry watermarks so the
    * join state is bounded — Spark drops buffered rows once the
    * watermark passes the interval bound, the required shape for an
    * unbounded 100 TB/day stream.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      windowMs: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.select(
      col(keyCol).as("l_key"), col(tsCol).as("l_ts"),
      col("event_type").as("l_type"))
      .withWatermark("l_ts", watermarkDelay)
    val r = right.select(
      col(keyCol).as("r_key"), col(tsCol).as("r_ts"),
      col("event_type").as("r_type"))
      .withWatermark("r_ts", watermarkDelay)
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") < col("l_ts") + expr(s"INTERVAL $windowMs MILLISECONDS"))
  }

  /** Streaming exact dedup: keep the first occurrence of each digest.
    * `dropDuplicates` over (digest) with a watermark bounds state the
    * way production streaming dedup must — old digests age out once
    * the watermark passes, so state is O(recent window), not O(stream).
    */
  def dedupByDigest(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("digest", md5(lower(trim(col(textCol)))))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("digest")

  /** Stateful sessionization: a session closes when no event arrives
    * for `gapMs` past the watermark. Emits one row per closed session.
    */
  def sessionize(
      events: Dataset[StreamEvent],
      gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateSession(gapMs))
  }

  /** Merge the batch's events with the held session by INTERVAL
    * gaps-and-islands: sort (state interval + event points) by start,
    * merge any item within gapMs of the running island, close every
    * island but the last (a later island's existence proves a > gap
    * separation, exactly the batch operator's closing rule). This
    * keeps batch parity for out-of-order events wherever parity is
    * achievable: a late event within gap of the session extends it
    * (possibly backwards); a late event more than gap BEFORE the
    * session start becomes its own earlier island and closes
    * immediately, instead of being wrongly merged.
    */
  private def updateSession(gapMs: Long)(
      userId: Long,
      events: Iterator[StreamEvent],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator(SessionOut(userId, s.n_events, s.start_ms, s.end_ms))
    } else {
      val items = (state.getOption.toList.map(s =>
          SessionState(s.n_events, s.start_ms, s.end_ms)) ++
        events.map(e => SessionState(1L, e.ts.getTime, e.ts.getTime)))
        .sortBy(s => (s.start_ms, s.end_ms))
      var islands = List.empty[SessionState]
      items.foreach { it =>
        islands match {
          case head :: rest if it.start_ms - head.end_ms <= gapMs =>
            islands = SessionState(
              head.n_events + it.n_events,
              head.start_ms,
              math.max(head.end_ms, it.end_ms)) :: rest
          case _ => islands = it :: islands
        }
      }
      val ordered = islands.reverse
      // An already-expired last island (its timeout would precede the
      // watermark — setTimeoutTimestamp would reject it) closes now.
      val lastExpired = ordered.lastOption.exists(
        _.end_ms + gapMs <= state.getCurrentWatermarkMs())
      val (closed, open) =
        if (lastExpired) (ordered, None) else (ordered.dropRight(1), ordered.lastOption)
      open match {
        case Some(last) =>
          state.update(last)
          state.setTimeoutTimestamp(last.end_ms + gapMs)
        case None => if (state.exists) state.remove()
      }
      closed.iterator
        .map(s => SessionOut(userId, s.n_events, s.start_ms, s.end_ms))
    }
  }
}
