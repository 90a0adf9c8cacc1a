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

/** State-API-v2 wrapper: a ValueState cell holding a key's unsealed
  * islands (the [[SessionState]] list the gaps-and-islands merge
  * maintains).
  */
final case class IslandsState(islands: Seq[SessionState])

/** Input to the per-key cap: event time + a tiebreaker id. */
final case class CapEvent(key: Long, ts: java.sql.Timestamp, tie: Long)

/** One capped emission: the seq-th event of its key by (ms, tie). */
final case class CapOut(key: Long, seq: Long, ms: Long, tie: Long)

/** Per-key cap state: emitted count + the ≤(cap−emitted) smallest
  * still-unsealed events — O(cap) per key, never O(stream).
  */
final case class CapState(emitted: Long, pending: Seq[(Long, Long)])

/** Mutable-in-state session accumulator. */
final case class SessionState(n_events: Long, start_ms: Long, end_ms: Long)

/** Input to streaming attribution: typed event with integer cents. */
final case class AttrEvent(
    user_id: Long,
    ts: java.sql.Timestamp,
    event_id: Long,
    event_type: String,
    cents: Long)

/** One attributed (or expired-unattributed) conversion. */
final case class AttrOut(
    event_id: Long,
    user_id: Long,
    ms: Long,
    value_cents: Long,
    touch_id: Option[Long],
    touch_age: Option[Long],
    attributed: Int)

/** Attribution state per key: in-window touches (ms, id) + pending
  * conversions (ms, id, cents) the watermark has not yet sealed —
  * O(touches within the window span + open conversions), never
  * O(stream).
  */
final case class AttrState(
    clicks: Seq[(Long, Long)],
    purchases: Seq[(Long, Long, Long)])

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
      windowLen: String = "1 hour",
      slide: Option[String] = None): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        slide.fold(window(col(tsCol), windowLen))(sl =>
          window(col(tsCol), windowLen, sl)),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("value_sum"))

  /** Native session-window aggregation — Spark's built-in
    * `session_window` stateful operator, the engine-provided
    * alternative to [[sessionize]]'s flatMapGroupsWithState form.
    * Emits (user, session start, last-event ms, n_events) per sealed
    * session in append mode; `session_window.end` is last event + gap,
    * so the gap is subtracted back out to report the final EVENT time
    * (the batch gaps-and-islands convention).
    */
  def sessionWindowCounts(
      events: DataFrame,
      gapMs: Long,
      tsCol: String = "ts",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(
        session_window(col(tsCol), s"$gapMs milliseconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        (unix_millis(col("session_window.end")) - gapMs).as("end_ms"),
        col("n_events"))

  /** Windowed distinct-user count — streaming "hourly unique users":
    * dedup (window, user) with watermark-bounded state, then the
    * windowed count. TWO chained stateful operators (dedup → agg),
    * both watermark-bounded, append mode — each window emits exactly
    * once when the watermark seals it, and dedup state for sealed
    * windows is dropped, so state is O(users per open window), never
    * O(stream). The streaming form of the batch contribution-explode
    * distinct (q95's 1-window special case).
    */
  def windowedDistinctUsers(
      events: DataFrame,
      tsCol: String = "ts",
      watermarkDelay: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      // the window struct inherits the event-time marker; the raw ts
      // must NOT ride along (two event-time columns fail the query)
      .select(window(col(tsCol), windowLen).as("win"), col("user_id"))
      .dropDuplicatesWithinWatermark("win", "user_id")
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("win.start").as("window_start"), col("n_users"))

  /** Stream-static enrichment join: each micro-batch of the stream
    * hash-joins a STATIC dimension DataFrame — the standard "enrich
    * events with reference data" shape. Stateless (no watermark
    * required; the static side is re-plannable per batch, so a dim
    * refresh is picked up on the next micro-batch) and broadcast by
    * design: the stream side is never shuffled, which is the only
    * sane plan when the stream is 100 TB/day and the dim is MBs.
    */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey), "inner")

  /** Watermarked stream-stream interval join: each left event pairs
    * with right events of the same key whose timestamp falls in
    * [left.ts, left.ts + windowMs). Both sides carry watermarks so the
    * join state is bounded — Spark drops buffered rows once the
    * watermark passes the interval bound, the required shape for an
    * unbounded 100 TB/day stream.
    */
  /** `joinType` "inner" (default) or "left_outer": the outer form
    * additionally emits each unmatched left event with null right
    * columns once the watermark passes its interval bound — the
    * streaming shape of "errors with no follow-up click", and it is
    * precisely why both watermarks are REQUIRED here (an unmatched row
    * is only provably unmatched when no in-watermark right event can
    * still land in its window).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      windowMs: Long,
      watermarkDelay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
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
        col("r_ts") < col("l_ts") + expr(s"INTERVAL $windowMs MILLISECONDS"),
      joinType)
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

  /** Stateful sessionization: a session closes when the WATERMARK
    * passes its end + gap. Emits one row per closed session, in exact
    * agreement with the batch gaps-and-islands operator over every
    * admissible (non-late) event ordering.
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

  /** Stateful sessionization on the STATE API v2 (`transformWithState`
    * + [[SessionizeProcessor]]) — the third independent sessionizer
    * next to [[sessionize]] (flatMapGroupsWithState) and
    * [[sessionWindowCounts]] (native session_window), on the API Spark
    * is migrating stateful processing to. Identical semantics to
    * [[sessionize]]: a session emits exactly when the watermark passes
    * its end + gap; unsealed islands (including earlier ones a future
    * in-watermark event might bridge) stay in one ValueState cell;
    * per-key event-time TIMERS re-arm at the earliest unsealed
    * island's deadline (v2 timers replace v1's single timeout
    * timestamp — the processor keeps at most one registered).
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — the only provider
    * implementing the v2 store; the default HDFS-backed store refuses
    * the operator.
    */
  def sessionizeTws(
      events: Dataset[StreamEvent],
      gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionizeProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Streaming per-key cap BY EVENT TIME: emit each key's first `cap`
    * events in (event-time, tie) order — the streaming form of the
    * batch per-key cap (q56's row_number ≤ N), not an arrival-order
    * rate limiter. An event may only be emitted once the watermark
    * passes its timestamp (any earlier event still admissible would
    * outrank it), so emissions are deterministic under every
    * admissible arrival order.
    *
    * State is O(cap) per key, NOT O(buffered stream): of the unsealed
    * events only the (cap − emitted) smallest can ever be emitted —
    * every future emission picks minima from pending ∪ future, and a
    * kept event outranks everything truncated — so the buffer prunes
    * to that bound each batch. A capped-out key keeps a 1-record
    * tombstone (emitted = cap, empty buffer): dropping it would let a
    * late burst restart the count. The timeout re-arms at the earliest
    * pending event's seal time.
    */
  def perKeyCapByEventTime(
      events: Dataset[CapEvent],
      cap: Int,
      watermarkDelay: String = "10 minutes"): Dataset[CapOut] = {
    require(cap >= 1, "cap must be >= 1")
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateCap(cap))
  }

  private def updateCap(cap: Int)(
      key: Long,
      events: Iterator[CapEvent],
      state: GroupState[CapState]): Iterator[CapOut] = {
    val wm = state.getCurrentWatermarkMs()
    val st = state.getOption.getOrElse(CapState(0L, Nil))
    if (st.emitted >= cap) { state.update(st); return Iterator.empty }
    val all = st.pending ++ events.map(e => (e.ts.getTime, e.tie))
    val (sealed0, open) = all.partition(_._1 <= wm)
    val emit = sealed0.sorted.take(cap - st.emitted.toInt)
    val emitted = st.emitted + emit.size
    val keep =
      if (emitted >= cap) Nil
      else open.sorted.take(cap - emitted.toInt)
    state.update(CapState(emitted, keep))
    if (keep.nonEmpty) state.setTimeoutTimestamp(keep.map(_._1).min)
    emit.iterator.zipWithIndex.map { case ((ms, tie), i) =>
      CapOut(key, st.emitted + i + 1, ms, tie)
    }
  }

  /** Streaming last-touch attribution — the event-time form of
    * [[graft.operators.Temporal.lastTouchAttribution]]: each
    * conversion is credited to its key's most recent touch at or
    * before it (order (ms, id)) within `windowMs`, emitted only once
    * the watermark passes the conversion's event time — any
    * still-possible touch that could change the credit would itself
    * be late by then, so the emission is deterministic under every
    * admissible arrival order, exactly the batch semantics.
    *
    * State per key is bounded: touches older than `watermark −
    * windowMs` can no longer attribute any unsealed conversion and
    * are dropped each batch; pending conversions drain as the
    * watermark advances. The timeout re-arms at the earliest pending
    * conversion (or the earliest touch's expiry) so quiescent keys
    * still seal and release state.
    */
  def lastTouchAttribution(
      events: Dataset[AttrEvent],
      touchType: String,
      convType: String,
      windowMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        updateAttr(touchType, convType, windowMs))
  }

  private def updateAttr(
      touchType: String, convType: String, windowMs: Long)(
      userId: Long,
      events: Iterator[AttrEvent],
      state: GroupState[AttrState]): Iterator[AttrOut] = {
    val wm = state.getCurrentWatermarkMs()
    val st = state.getOption.getOrElse(AttrState(Nil, Nil))
    var clicks = st.clicks
    var purchases = st.purchases
    events.foreach { e =>
      val ms = e.ts.getTime
      if (e.event_type == touchType) clicks :+= ((ms, e.event_id))
      else if (e.event_type == convType)
        purchases :+= ((ms, e.event_id, e.cents))
    }
    val (sealedP, openP) = purchases.partition(_._1 <= wm)
    val out = sealedP.sortBy(p => (p._1, p._2)).map {
      case (pms, pid, cents) =>
        // batch order is (ms, id): a touch at the conversion's own ms
        // counts only if its id sorts before the conversion's
        val cand = clicks.filter { case (cms, cid) =>
          (cms < pms || (cms == pms && cid < pid)) && pms - cms <= windowMs
        }
        if (cand.isEmpty) AttrOut(pid, userId, pms, cents, None, None, 0)
        else {
          val (cms, cid) = cand.max // lexicographic (ms, id) = latest
          AttrOut(pid, userId, pms, cents, Some(cid), Some(pms - cms), 1)
        }
    }
    // a touch at ms <= wm - windowMs could only attribute conversions
    // at ms <= wm, all of which just sealed above
    val keepC = clicks.filter(_._1 > wm - windowMs)
    if (openP.isEmpty && keepC.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(AttrState(keepC, openP))
      val deadline =
        if (openP.nonEmpty) openP.map(_._1).min
        else keepC.map(_._1).min + windowMs
      state.setTimeoutTimestamp(math.max(deadline, wm + 1))
    }
    out.iterator
  }

  /** Merge the batch's events with ALL held session islands by
    * interval gaps-and-islands, then emit ONLY islands the watermark
    * has sealed (end + gap <= watermark): any event that could still
    * extend or bridge such an island would have ts <= watermark, i.e.
    * be late and dropped, so sealed islands are exactly the sessions
    * batch semantics would produce. Unsealed islands — including
    * earlier ones that a future in-watermark event might yet bridge —
    * stay in state (a Seq, not a single interval; holding one interval
    * would force early emission that a bridging event later falsifies).
    * The timeout re-arms at the earliest unsealed island's deadline.
    */
  private def updateSession(gapMs: Long)(
      userId: Long,
      events: Iterator[StreamEvent],
      state: GroupState[Seq[SessionState]]): Iterator[SessionOut] = {
    val wm = state.getCurrentWatermarkMs()
    val held = state.getOption.getOrElse(Seq.empty)
    val items = (held ++ events.map(e =>
        SessionState(1L, e.ts.getTime, e.ts.getTime)))
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
    val (closed, open) = islands.reverse.partition(_.end_ms + gapMs <= wm)
    if (open.isEmpty) { if (state.exists) state.remove() }
    else {
      state.update(open)
      // earliest deadline; > wm by construction of `open`
      state.setTimeoutTimestamp(open.map(_.end_ms).min + gapMs)
    }
    closed.iterator
      .map(s => SessionOut(userId, s.n_events, s.start_ms, s.end_ms))
  }

  // ---- steady-state streaming near-dedup sink ----

  /** Seed the near-dedup state store at `stateDir` with a base corpus
    * (an EMPTY frame with (idCol, textCol) columns is fine — the
    * store's schema still gets written). Layout: `sigs/`, `docs/` and
    * `pairs/` roots, each holding one `batch=<tag>` partition per
    * micro-batch (plus `batch=seed`), so every write is an idempotent
    * per-batch overwrite. All paths resolve through the Hadoop FS API
    * — an s3a/HDFS `stateDir` works unchanged.
    */
  def seedNearDupState(
      base: DataFrame,
      stateDir: String,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 3): Unit = {
    val b = base.select(col(idCol), col(textCol))
    graft.operators.Dedup
      .bandSignaturesFor(b, idCol, textCol, shingleWidth, bands, rowsPerBand)
      .write.mode("overwrite").parquet(s"$stateDir/sigs/batch=seed")
    b.write.mode("overwrite").parquet(s"$stateDir/docs/batch=seed")
    // Seed the pairs/ root too (empty, schema-only) so nearDupPairs is
    // readable BEFORE any non-empty batch has emitted — without this,
    // reading results early throws PATH_NOT_FOUND instead of returning
    // an empty frame. Id columns inherit idCol's type from `base`.
    b.select(col(idCol).as("id_a"), col(idCol).as("id_b"),
        org.apache.spark.sql.functions.lit(0.0).as("jaccard_sim"))
      .limit(0)
      .write.mode("overwrite").parquet(s"$stateDir/pairs/batch=seed")
  }

  /** The steady-state near-dedup `foreachBatch` sink (the production
    * promotion of the round-11 spec pipeline): per micro-batch of
    * (idCol, textCol) rows it (a) probes the batch against the STORED
    * base band signatures — fresh×base and fresh×fresh, never
    * base×base, O(fresh) signature work per batch —, (b) writes the
    * verified pairs touching the batch to `pairs/batch=<id>`, and (c)
    * appends the batch's signatures + docs to the store so the next
    * batch never re-signatures anything.
    *
    * Restart semantics: every write is a per-batchId partition
    * OVERWRITE and the probe reads exclude the current batchId, so a
    * batch re-delivered after a checkpoint restart reproduces exactly
    * the same pairs and state — no lost and no duplicated pairs
    * (spec-asserted by killing and restarting a checkpointed file
    * stream mid-feed, and by double-invoking a batchId). Results are
    * independent of how the fresh docs split into batches. Ids must be
    * unique across seed ∪ stream.
    *
    * Usage: `stream.writeStream.option("checkpointLocation", ...)
    * .foreachBatch(StreamingOps.nearDupSink(stateDir, "doc_id",
    * "text")).start()`; read results with [[nearDupPairs]]. Call
    * [[seedNearDupState]] once first.
    */
  def nearDupSink(
      stateDir: String,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 3,
      threshold: Double = 0.6): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val fresh = batch.select(col(idCol), col(textCol))
      if (!fresh.isEmpty) {
        val bTag = batchId.toString
        // exclude the current batch: a re-delivered batch must probe
        // the same base its first delivery saw (its own partial state
        // from a crashed attempt gets overwritten below)
        val baseSigs = spark.read.parquet(s"$stateDir/sigs")
          .where(col("batch").cast("string") =!= bTag)
          .select("id", "band", "key")
        val baseDocs = spark.read.parquet(s"$stateDir/docs")
          .where(col("batch").cast("string") =!= bTag)
          .select(col(idCol), col(textCol))
        val inc = graft.operators.Dedup.incrementalNearDupFromSignatures(
          baseSigs, baseDocs, fresh, idCol, textCol,
          shingleWidth, bands, rowsPerBand, threshold)
        inc.pairs.write.mode("overwrite")
          .parquet(s"$stateDir/pairs/batch=$bTag")
        inc.freshSignatures.write.mode("overwrite")
          .parquet(s"$stateDir/sigs/batch=$bTag")
        fresh.write.mode("overwrite")
          .parquet(s"$stateDir/docs/batch=$bTag")
        inc.release()
      }
  }

  /** All near-dup pairs the sink has emitted so far (id_a, id_b,
    * jaccard_sim). Pairs never repeat across batches — a pair is
    * emitted exactly by the batch that contributed its newest member —
    * so no dedup pass is needed.
    */
  def nearDupPairs(
      spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/pairs")
      .select("id_a", "id_b", "jaccard_sim")

  // ---- exactly-once streaming count/sum aggregation sink ----

  /** Seed the aggregate state store (schema-only empty seed
    * partition, so [[countSumState]] is readable before the first
    * batch — the nearDupPairs lesson). `template` supplies the key
    * and value COLUMN TYPES (an empty projection of the stream's
    * source is fine).
    */
  def seedCountSumState(
      template: DataFrame,
      stateDir: String,
      keyCol: String,
      valCol: String): Unit =
    template
      .select(col(keyCol), col(valCol).cast("long").as("__v"))
      .limit(0)
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("val_sum"))
      .write.mode("overwrite").parquet(s"$stateDir/agg/batch=seed")

  /** Exactly-once streaming count/sum per key, the `foreachBatch`
    * way (the aggregation twin of [[nearDupSink]]'s protocol): each
    * micro-batch writes its PARTIAL (count, sum) per key to an
    * idempotent per-batchId partition OVERWRITE — a re-delivered
    * batch after a checkpoint restart replaces its own partial with
    * identical content, never double-counts — and [[countSumState]]
    * merges partials on read (counts and sums are reassociable, so
    * read-side merge IS the exactly-once guarantee; no read-modify-
    * write races, no transactional store needed). `valCol` must be
    * exact integers (cents/counts — caller fixes the unit); sums
    * stay Long.
    *
    * At 100 TB this is the canonical cheap streaming aggregate: state
    * grows by |distinct keys per batch| rows per batch, compacted by
    * any later [[graft.sources.DatasetIO.compactCommitted]] pass, and
    * the read-side merge is one hash aggregate.
    */
  def countSumSink(
      stateDir: String,
      keyCol: String,
      valCol: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        batch
          .select(col(keyCol), col(valCol).cast("long").as("__v"))
          .groupBy(keyCol)
          .agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("val_sum"))
          .write.mode("overwrite")
          .parquet(s"$stateDir/agg/batch=$batchId")
      }
  }

  /** The merged aggregate so far: (keyCol, n_rows, val_sum), one
    * hash aggregate over the partial store.
    */
  def countSumState(
      spark: org.apache.spark.sql.SparkSession,
      stateDir: String,
      keyCol: String): DataFrame =
    spark.read.parquet(s"$stateDir/agg")
      .groupBy(keyCol)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("val_sum")).as("val_sum"))

  /** Exactly-once streaming append sink into a Delta table — the
    * "stream the crawl into the lake" primitive. Each micro-batch
    * commits through [[graft.sources.DeltaWrite.idempotentAppend]]
    * with (appId, batchId) as the protocol `txn` marker: a replayed
    * batch (crash between commit and checkpoint ack, or an operator
    * re-offer) finds its txn already committed and no-ops, so the
    * table holds every batch exactly once regardless of restarts.
    * Pair with `.option("checkpointLocation", ...)` so batchIds are
    * stable across restarts — that is what makes the replay hit the
    * SAME txn version.
    */
  def deltaAppendSink(
      tablePath: String,
      appId: String,
      partitionBy: Seq[String] = Seq.empty): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        graft.sources.DeltaWrite.idempotentAppend(
          batch, tablePath, appId, batchId, partitionBy): Unit
      }
}

/** State-API-v2 sessionizer (the [[StreamingOps.sessionizeTws]]
  * kernel): the exact gaps-and-islands merge of
  * `StreamingOps.updateSession`, rehosted on `StatefulProcessor` —
  * one ValueState cell holds the key's unsealed islands, one
  * event-time timer re-arms at the earliest unsealed deadline, and a
  * session emits exactly when the watermark passes its end + gap.
  * Input events and fired timers both route through the same
  * merge-and-emit step, so arrival order and timer interleaving
  * cannot change the output (the parity gate's drain protocol
  * exercises both paths).
  */
final class SessionizeProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, StreamEvent, SessionOut] {

  @transient private var islands
      : org.apache.spark.sql.streaming.ValueState[IslandsState] = _

  override def init(
      outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    islands = getHandle.getValueState[IslandsState](
      "islands",
      org.apache.spark.sql.Encoders.product[IslandsState],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      userId: Long,
      rows: Iterator[StreamEvent],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[SessionOut] =
    mergeAndEmit(
      userId,
      rows.map(e => SessionState(1L, e.ts.getTime, e.ts.getTime)).toSeq,
      timerValues.getCurrentWatermarkInMs(),
      firedTimer = Long.MinValue)

  override def handleExpiredTimer(
      userId: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[SessionOut] =
    mergeAndEmit(
      userId,
      Seq.empty,
      math.max(
        timerValues.getCurrentWatermarkInMs(),
        expiredTimerInfo.getExpiryTimeInMs()),
      // the fired timer is auto-removed — deleting it again WARNs
      firedTimer = expiredTimerInfo.getExpiryTimeInMs())

  /** The updateSession merge: fold held + incoming single-event
    * islands in (start, end) order, bridge gaps ≤ gapMs, seal islands
    * whose end + gap ≤ watermark. Timer discipline: drop every
    * registered timer, re-arm at the earliest open deadline (> wm by
    * construction of `open`, as the v1 timeout required).
    */
  private def mergeAndEmit(
      userId: Long,
      incoming: Seq[SessionState],
      wm: Long,
      firedTimer: Long): Iterator[SessionOut] = {
    val held =
      if (islands.exists()) islands.get().islands else Seq.empty
    val items = (held ++ incoming).sortBy(s => (s.start_ms, s.end_ms))
    var merged = List.empty[SessionState]
    items.foreach { it =>
      merged match {
        case head :: rest if it.start_ms - head.end_ms <= gapMs =>
          merged = SessionState(
            head.n_events + it.n_events,
            head.start_ms,
            math.max(head.end_ms, it.end_ms)) :: rest
        case _ => merged = it :: merged
      }
    }
    val (closed, open) = merged.reverse.partition(_.end_ms + gapMs <= wm)
    getHandle.listTimers().toList
      .foreach(t => if (t != firedTimer) getHandle.deleteTimer(t))
    if (open.isEmpty) islands.clear()
    else {
      islands.update(IslandsState(open))
      getHandle.registerTimer(open.map(_.end_ms).min + gapMs)
    }
    closed.iterator
      .map(s => SessionOut(userId, s.n_events, s.start_ms, s.end_ms))
  }
}
