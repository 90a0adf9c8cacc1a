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

  /** Changed-partition selective recompute — the rsync of aggregation
    * pipelines: a cheap per-partition content DIGEST pass (order-
    * independent SUM of 60-bit row hashes + row count) decides
    * which partitions actually changed between the previous snapshot
    * and the new one; only those partitions pay the full re-aggregate,
    * unchanged partitions reuse the previous state's values verbatim,
    * and partitions that vanished are dropped.
    *
    * The combine is a decimal(38,0) sum, NOT bit_xor: xor is blind to
    * even-multiplicity changes on generic multisets (a⊕a = 0, so
    * swapping a duplicated pair {a,a} for {b,b} preserves both xor
    * digest and row count), while a sum changes by 2(b−a) ≠ 0. The
    * 38-digit accumulator never wraps below ~10^19 rows per partition
    * of 60-bit values, so no overflow under ANSI semantics. Digest
    * equality ⇒ content equality up to a random ~2^-60 sum collision
    * between distinct equal-count multisets (adversarial only for a
    * well-mixed row hash; row count is checked alongside).
    *
    * Scale shape: the digest pass over the new snapshot is a NARROW
    * column-pruned scan (partition + digest inputs only) feeding a
    * partial-agg shuffle at partition grain; the expensive measure
    * aggregation then runs only over partitions in the changed set
    * (broadcast semi-join). When the real pipeline stores digests in
    * its state table — as this operator's output enables — day-N cost
    * is O(changed data), never O(history).
    *
    * Output: (period, n_rows, sum_cents, recomputed 0/1) — exactly
    * equal to a from-scratch aggregate over the new snapshot.
    */
  def deltaRecompute(
      oldDf: DataFrame,
      newDf: DataFrame,
      part: Column,
      rowDigest: Column,
      cents: Column): DataFrame = {
    def keyed(df: DataFrame): DataFrame =
      graft.SparkUtil.ensureParallelism(df)
        .select(part.as("period"), rowDigest.as("h"), cents.as("c"))
    val dg = sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
    val oldState = keyed(oldDf).groupBy("period")
      .agg(dg.as("dg_o"), count(lit(1)).as("n_o"),
        sum(col("c")).as("sc_o"))
    val newDigest = keyed(newDf).groupBy("period")
      .agg(dg.as("dg_n"), count(lit(1)).as("n_n"))
    val joined = newDigest.join(oldState, Seq("period"), "left")
    val unchanged = joined
      .where(col("n_o").isNotNull && col("dg_n") === col("dg_o") &&
        col("n_n") === col("n_o"))
      .select(col("period"), col("n_o").as("n_rows"),
        col("sc_o").as("sum_cents"), lit(0).as("recomputed"))
    val changedPeriods = joined
      .where(col("n_o").isNull || col("dg_n") =!= col("dg_o") ||
        col("n_n") =!= col("n_o"))
      .select("period")
    val recomputed = keyed(newDf)
      .join(broadcast(changedPeriods), "period")
      .groupBy("period")
      .agg(count(lit(1)).as("n_rows"), sum(col("c")).as("sum_cents"))
      .withColumn("recomputed", lit(1))
    unchanged.unionByName(recomputed)
  }
}
