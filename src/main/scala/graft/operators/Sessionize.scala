package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): a new session starts when
  * the gap to the previous event of the same user exceeds `gapMs`.
  * One shuffle by user, two window passes over it — the standard
  * large-scale shape (each user's events sort within their partition;
  * no global sort).
  */
object Sessionize {

  /** Input needs (userCol, tsMsCol: epoch millis, tieCol for
    * deterministic intra-ms ordering). Output: one row per session —
    * (user, session_seq, n_events, start_ms, end_ms, duration_ms).
    */
  def apply(
      events: DataFrame,
      userCol: String,
      tsMsCol: String,
      tieCol: String,
      gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsMsCol), col(tieCol))
    val isNew = when(
      lag(col(tsMsCol), 1).over(byUser).isNull ||
        col(tsMsCol) - lag(col(tsMsCol), 1).over(byUser) > gapMs,
      1).otherwise(0)
    events
      .withColumn("is_new", isNew)
      .withColumn("session_seq",
        sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsMsCol)).as("start_ms"),
        max(col(tsMsCol)).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
  }

  /** Top-N ordered k-prefix event paths — sequence mining lite: each
    * user's first `k` events (by time, tie-broken deterministically)
    * join into a `>`-separated path string; paths rank by user count.
    *
    * Scale shape: one shuffle by user for the window rank (Spark's
    * WindowGroupLimit pushes the rank<=k filter below the sort, so
    * per-user state is O(k), not O(events)); the path aggregate reuses
    * the same user partitioning (no second exchange under AQE); the
    * final path count aggregates ≤ one row per user with map-side
    * partials. No collect, no global sort before the bounded top-N.
    */
  def topPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String,
      k: Int,
      topN: Int): DataFrame = {
    require(k > 0 && topN > 0, "need k > 0 and topN > 0")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val ranked = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
    // collect_list order is partition-dependent; sorting the (rn, type)
    // structs makes the path deterministic on any cluster layout
    val paths = ranked
      .groupBy(col(userCol))
      .agg(
        array_join(
          transform(
            array_sort(
              collect_list(struct(col("rn"), col(typeCol).as("t")))),
            s => s.getField("t")),
          ">").as("path"))
    paths
      .groupBy("path")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topN)
  }
}
