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
}
