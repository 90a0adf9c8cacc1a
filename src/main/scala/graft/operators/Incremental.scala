package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the algebraic-state pattern that
  * keeps a 100 TB rollup fresh without ever rescanning history.
  *
  * The state table holds one row per (fine-grain period, key) carrying
  * ALGEBRAIC aggregate state: count, integer-cents sum, min, max. Each
  * ingestion batch appends/overwrites only the periods it touched;
  * coarser rollups (month, quarter, lifetime) are then computed by
  * MERGING state rows — sum of counts, sum of sums, min of mins, max of
  * maxes — at state-table cost (|periods|·|keys| rows), not raw-table
  * cost. Derived aggregates (avg) are computed from the merged sums, so
  * they remain exactly equal to a from-scratch aggregation.
  *
  * Scale shape: the state build is one partial-agg shuffle over the
  * day's drop; the merge touches only state rows (thousands, not
  * billions) and broadcasts trivially. This is the maintenance story
  * behind every "daily metrics" table: O(day) per day, never O(history).
  */
object Incremental {

  /** Build the fine-grain state: one row per (period, key...) with
    * mergeable state fields. `cents` must be an integral-cents column
    * (int64) so sums stay exact across arbitrary re-merges.
    */
  def buildState(
      df: DataFrame,
      period: Column,
      keys: Seq[String],
      cents: Column): DataFrame =
    graft.SparkUtil.ensureParallelism(df)
      .withColumn("__cents", cents)
      .groupBy((period.as("period") +: keys.map(col)): _*)
      .agg(
        count(lit(1)).as("s_n"),
        sum(col("__cents")).as("s_sum_cents"),
        min(col("__cents")).as("s_min_cents"),
        max(col("__cents")).as("s_max_cents"))

  /** Merge state rows to a coarser period. `coarse` maps the state's
    * `period` column to the rollup grain (e.g. day -> month). The
    * output carries the same four state fields, still mergeable — a
    * month state can be merged again into quarters.
    */
  def mergeState(
      state: DataFrame,
      coarse: Column,
      keys: Seq[String]): DataFrame =
    state
      .groupBy((coarse.as("period") +: keys.map(col)): _*)
      .agg(
        sum(col("s_n")).as("s_n"),
        sum(col("s_sum_cents")).as("s_sum_cents"),
        min(col("s_min_cents")).as("s_min_cents"),
        max(col("s_max_cents")).as("s_max_cents"))
}
