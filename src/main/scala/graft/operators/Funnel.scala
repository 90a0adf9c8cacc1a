package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Ordered-funnel analysis over an event log: how many users reach each
  * stage of a conversion path, where stage i+1 counts only events
  * STRICTLY AFTER the user's stage-i time (first-touch attribution).
  *
  * Distributed shape: one filtered aggregate per stage plus an
  * equi-join on the user key against the previous stage's (user, time)
  * rows — each stage scans only its own event type's rows, every
  * shuffle is keyed by the user column, and per-stage state is
  * O(users reaching the stage), never O(events). Later stages shrink
  * monotonically; AQE coalesces their partitions at runtime.
  */
object Funnel {

  /** A funnel run's result plus the handle that releases the per-stage
    * cached frames once the result has been materialized — without it,
    * a long-lived session accumulates k cached frames per funnel call.
    */
  final class FunnelRun private[operators] (
      val result: DataFrame,
      frames: Seq[DataFrame]) {
    /** Unpersist the k per-stage cached frames. Call AFTER the result
      * has been materialized (written/collected): the result's plan
      * references the frames, so releasing early just forfeits the
      * caching (recomputes through lineage — slower, still correct).
      */
    def release(): Unit = frames.foreach(_.unpersist())
  }

  /** Per-stage reach: (stage, users_reached, sum_lag), one row per
    * stage. `stage` is `"<i>_<name>"` (ordinal prefix keeps the output
    * sortable), `users_reached` counts users with a valid ordered path
    * to the stage, and `sum_lag` totals (stage time − previous stage
    * time) over those users — exact integers in the input's time unit,
    * so cross-engine compares need no float tolerance.
    *
    * NOTE: leaves k small stage frames cached for the session (they
    * back both each summary row and the next stage's join). Sessions
    * that run many funnels should use [[funnelRun]] and `release()`
    * the frames after materializing the result.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame =
    funnelRun(events, userCol, typeCol, tsCol, stages).result

  /** [[funnel]] with the cache-release handle. */
  def funnelRun(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): FunnelRun = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    // Each stage's (user, t) frame feeds BOTH its summary row and the
    // next stage's join — and the union's branch i embeds the full
    // lineage of stages 1..i-1, so without a persist the events scan
    // and early-stage aggregates recompute O(k²/2) times for a k-stage
    // funnel. The frames are tiny (O(users reaching the stage), two
    // columns), so MEMORY_AND_DISK caching costs nothing next to the
    // events scans it saves.
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val firstRow = first.agg(
      lit(s"1_${stages.head}").as("stage"),
      count(lit(1)).as("users_reached"),
      lit(0L).as("sum_lag"))
    val (rows, frames, _) = stages.zipWithIndex.tail
      .foldLeft((Seq(firstRow), Seq(first), first)) {
        case ((acc, cached, prev), (stage, i)) =>
          val cur = events.where(col(typeCol) === stage)
            .join(prev.select(col(userCol), col("t").as("t_prev")), Seq(userCol))
            .where(col(tsCol) > col("t_prev"))
            .groupBy(col(userCol), col("t_prev")) // t_prev is unique per user
            .agg(min(col(tsCol)).as("t"))
            .persist(StorageLevel.MEMORY_AND_DISK)
          val row = cur.agg(
            lit(s"${i + 1}_$stage").as("stage"),
            count(lit(1)).as("users_reached"),
            coalesce(sum(col("t") - col("t_prev")), lit(0L)).as("sum_lag"))
          (acc :+ row, cached :+ cur, cur.select(col(userCol), col("t")))
      }
    new FunnelRun(rows.reduce(_.union(_)), frames)
  }
}
