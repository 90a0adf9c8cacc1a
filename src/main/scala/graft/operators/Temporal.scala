package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators Spark has no native relational form for:
  * as-of join and interval (range) join. Both are built to scale: the
  * as-of join is ONE shuffle by key (a tagged union + running window —
  * never a per-key inequality join), and the range join buckets time so
  * candidates come from an equi-join on (key, bucket) — never a
  * BroadcastNestedLoopJoin / cartesian expansion.
  */
object Temporal {

  /** As-of join, "last right value at or before each left row".
    *
    * Implementation: tag right rows 0 and left rows 1, union, then one
    * window per key ordered by (ts, tag, tie) taking the last non-null
    * right timestamp up to the current row. Right rows sort BEFORE left
    * rows at equal ts, giving inclusive (right.ts <= left.ts) as-of
    * semantics. One shuffle by key; no join at all — the canonical
    * 100 TB shape for "most recent state per event".
    *
    * Output: left's (idCol, keyCol, tsCol) + `asof_ts` (nullable epoch
    * of the matched right row).
    */
  def asofLastBefore(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String): DataFrame = {
    val l = left.select(
      col(keyCol), col(tsCol), lit(1).as("side"), col(idCol))
    val r = right.select(
      col(keyCol), col(tsCol), lit(0).as("side"),
      lit(null).cast("long").as(idCol))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightTs = when(col("side") === 0, col(tsCol))
    r.unionAll(l)
      .withColumn("asof_ts", last(rightTs, ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col(idCol), col(keyCol), col(tsCol), col("asof_ts"))
  }

  /** Interval join: left point rows against right [start, end) windows
    * of bounded length, both sides keyed.
    *
    * Implementation: time is bucketed at `bucketWidth` (>= the longest
    * interval); each interval lands in the buckets it overlaps (at most
    * 2 when bucketWidth >= interval length), each point in exactly one;
    * candidates come from an equi-join on (key, bucket) and the exact
    * containment predicate filters them. Work is proportional to true
    * matches per bucket — no nested-loop join appears in the plan.
    *
    * Output: one row per (point, interval) match: point id/key/ts +
    * interval id/start.
    */
  def rangeJoinBucketed(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      pointTs: String,
      intervalStart: String,
      intervalEnd: String,
      pointId: String,
      intervalId: String,
      bucketWidth: Long): DataFrame = {
    val p = points.select(
      col(keyCol), col(pointId), col(pointTs),
      (col(pointTs).cast("long") / bucketWidth).cast("long").as("bucket"))
    val i = intervals
      .select(col(keyCol).as("ikey"), col(intervalId),
        col(intervalStart), col(intervalEnd))
      .withColumn("b0",
        (col(intervalStart).cast("long") / bucketWidth).cast("long"))
      .withColumn("b1",
        ((col(intervalEnd).cast("long") - 1) / bucketWidth).cast("long"))
      // touched buckets; at most 2 for intervals <= bucketWidth
      .withColumn("bucket", explode(sequence(col("b0"), col("b1"))))
      .drop("b0", "b1")
    p.join(i, p(keyCol) === i("ikey") && p("bucket") === i("bucket"))
      .where(
        col(pointTs) >= col(intervalStart) && col(pointTs) < col(intervalEnd))
      .select(col(pointId), p(keyCol), col(pointTs),
        col(intervalId), col(intervalStart))
  }

  /** Sliding-window distinct-key count per time unit — "7-day active
    * users" and its relatives. Each distinct (unit, key) row
    * CONTRIBUTES to the `window` units [unit, unit + window): an
    * explode to the contributed units plus one count-distinct
    * aggregate. That is the scale-safe plan: shuffle volume is a flat
    * window× the deduped (unit, key) stream, hash-partitioned by unit
    * — never a unit-range join (BroadcastNestedLoopJoin at scale) and
    * never a per-unit rescan. Output covers only units present in the
    * input: (unitCol, outCol).
    */
  def slidingDistinctCount(
      df: DataFrame,
      unitCol: String,
      keyCol: String,
      window: Int,
      outCol: String): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val du = df
      .select(col(unitCol).cast("long").as("u"), col(keyCol).as("k"))
      .distinct()
    val units = du.select(col("u").as(unitCol)).distinct()
    val contrib = du.select(
      explode(sequence(col("u"), col("u") + (window - 1))).as("w"),
      col("k"))
    contrib
      .groupBy(col("w"))
      .agg(countDistinct(col("k")).as(outCol))
      .join(units, col("w") === col(unitCol))
      .select(col(unitCol), col(outCol))
  }
}
