package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering keys for
  * write-once / filter-many tables.
  *
  * A 100 TB fact table is usually filtered on MORE than one column
  * (date AND customer, part AND supplier); sorting by one column
  * leaves the other scattered across every file. A Z-order (Morton)
  * key interleaves the bits of two normalized columns so that a range
  * of z-values bounds BOTH dimensions at once — `repartitionByRange`
  * + `sortWithinPartitions` on the z-value writes files whose per-file
  * min/max zone maps prune on either predicate. The math is pure
  * codegen'd bit arithmetic; nothing here shuffles except the final
  * per-bucket rollup.
  */
object Layout {

  /** Morton interleave of the low `bits` bits: x's bit i lands at
    * position 2i+1, y's at 2i. Pure bitwise Column expression —
    * whole-stage-codegen'd, no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))
  }

  /** Normalize an integer column onto the [0, 2^bits) grid with
    * exact-data-value min/max equi-width buckets (never interpolated
    * quantiles — those are not cross-engine reproducible). The double
    * floor-division equals integer division while
    * span · 2^bits ≪ 2^53 — any realistic key range.
    */
  private def grid(c: Column, mn: Column, mx: Column, bits: Int): Column =
    floor(((c - mn) * (1L << bits)).cast("double") / (mx - mn + 1))
      .cast("long")

  /** Zone-map data-skipping audit — the layout instrument that turns
    * "z-order helps" into a number BEFORE rewriting 100 TB: order the
    * rows by `layoutKeys` (a TOTAL order — include a tiebreak), tile
    * that order into fixed-size blocks of `blockRows` (the file /
    * row-group boundaries a range-partitioned write would produce),
    * compute each block's (min, max) of `probe`, and for every
    * `(lo, hi)` predicate report how many blocks a zone-map reader
    * skips and the read amplification (scanned vs matched rows).
    *
    * Scale shape: the global rank is DISTRIBUTED (range partition +
    * local rank + broadcast per-partition prefix counts — the
    * equiDepthHistogram machinery, never a single-partition window);
    * blocks collapse to block grain before the predicate sweep, which
    * is an EXPLODE of the literal predicate set (no join, no BNLJ);
    * matched-row counts ride ONE conditional aggregate over the same
    * scan. Output: (pred_id, lo, hi, n_blocks, n_skipped, skip_frac,
    * scanned_rows, matched_rows) — all exact integers + one fix4.
    */
  /** [[skippingAudit]]'s result plus the handle releasing the cached
    * ranked rows (see the persistence note there).
    */
  final class SkippingAuditRun private[operators] (
      val result: DataFrame,
      ranked: DataFrame) {
    def release(): Unit = { ranked.unpersist(): Unit }
  }

  /** Convenience form: materializes the (predicate-grain) audit via
    * a scratch-parquet round-trip (executor-loss-safe, unlike
    * localCheckpoint) and releases the cached ranked rows
    * immediately — repeated audits cannot accumulate executor cache.
    * Use [[skippingAuditRun]] + `release()` to keep the lineage.
    */
  def skippingAudit(
      df: DataFrame,
      layoutKeys: Seq[Column],
      probe: Column,
      blockRows: Int,
      predicates: Seq[(Int, Long, Long)]): DataFrame = {
    val run = skippingAuditRun(df, layoutKeys, probe, blockRows, predicates)
    val out = graft.ScratchSpace.materialize(run.result, "skip_audit_")
    run.release()
    out
  }

  def skippingAuditRun(
      df: DataFrame,
      layoutKeys: Seq[Column],
      probe: Column,
      blockRows: Int,
      predicates: Seq[(Int, Long, Long)]): SkippingAuditRun = {
    require(blockRows >= 1, "blockRows must be >= 1")
    require(predicates.nonEmpty, "need at least one predicate")
    import org.apache.spark.sql.expressions.Window
    val ks = layoutKeys.zipWithIndex.map { case (c, i) => c.as(s"__k$i") }
    val kcols = layoutKeys.indices.map(i => col(s"__k$i"))
    val base = graft.SparkUtil.ensureParallelism(df)
      .select(ks :+ probe.cast("long").as("__p"): _*)
    // The ranked rows are PERSISTED — correctness, not speed (found
    // at sf0.1, round 12): repartitionByRange samples its boundaries
    // per physical execution, and spark_partition_id() is
    // nondeterministic-tagged, which BLOCKS exchange reuse — so the
    // prefix branch and the block branch would otherwise re-execute
    // the range shuffle with DIFFERENT boundaries, and the __pid
    // equi-join silently drops whole partitions (91-vs-147-block
    // nondeterminism, rows lost). One InMemoryRelation over one child
    // RDD pins one set of boundaries for both branches; recomputed
    // partitions re-derive from the same RDD id, hence the same
    // sampled boundaries.
    val local = base.repartitionByRange(kcols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn",
        row_number().over(Window.partitionBy("__pid").orderBy(kcols: _*)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefix = local.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .select(col("__pid"),
        coalesce(sum(col("__c")).over(
          Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("__pre"))
    val blocks = local.join(broadcast(prefix), "__pid")
      .withColumn("__blk",
        floor((col("__pre") + col("__rn") - 1).cast("double") / blockRows)
          .cast("long"))
      .groupBy("__blk")
      .agg(min(col("__p")).as("__mn"), max(col("__p")).as("__mx"),
        count(lit(1)).as("__n"))
    val predArr = array(predicates.map { case (id, lo, hi) =>
      struct(lit(id).as("pred_id"), lit(lo).as("lo"), lit(hi).as("hi"))
    }: _*)
    val swept = blocks
      .select(explode(predArr).as("pr"), col("__mn"), col("__mx"),
        col("__n"))
      .withColumn("__skip",
        (col("pr.hi") < col("__mn")) || (col("pr.lo") > col("__mx")))
      .groupBy(col("pr.pred_id").as("pred_id"), col("pr.lo").as("lo"),
        col("pr.hi").as("hi"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("__skip"), 1L).otherwise(0L)).as("n_skipped"),
        sum(when(!col("__skip"), col("__n")).otherwise(0L))
          .as("scanned_rows"))
    // matched rows per predicate: one conditional aggregate over the
    // cached ranked rows, unpivoted from its single row — no row
    // multiplication, no extra scan of the source
    val matchedRow = local.agg(
      count(lit(1)).as("__dummy"),
      predicates.map { case (id, lo, hi) =>
        sum(when(col("__p").between(lo, hi), 1L).otherwise(0L))
          .as(s"__m$id")
      }: _*)
    val matched = matchedRow.select(explode(array(predicates.map {
      case (id, _, _) =>
        struct(lit(id).as("pred_id"), col(s"__m$id").as("matched_rows"))
    }: _*)).as("m")).select(col("m.pred_id"), col("m.matched_rows"))
    val result = swept.join(broadcast(matched), "pred_id")
      .select(col("pred_id"), col("lo"), col("hi"), col("n_blocks"),
        col("n_skipped"),
        graft.functions.Numerics.fix4(
          col("n_skipped").cast("double") / col("n_blocks"))
          .as("skip_frac"),
        col("scanned_rows"), col("matched_rows"))
    new SkippingAuditRun(result, local)
  }

  /** Z-order locality readout: normalize (xCol, yCol) onto a
    * 2^bits × 2^bits grid, compute the Morton key, split its range
    * into `buckets` equal slices (the file boundaries a
    * range-partitioned write would produce), and report each slice's
    * bounding rectangle. Bounded per-bucket spans on BOTH dimensions —
    * vs one full-range dimension under a single-column sort — are the
    * zone-map pruning guarantee, made visible as data.
    * Output: (bucket, n_rows, min_gx, max_gx, min_gy, max_gy).
    */
  def zorderStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      buckets: Int): DataFrame = {
    val bounds = graft.SparkUtil.ensureParallelism(df).agg(
      min(col(xCol)).as("mnx"), max(col(xCol)).as("mxx"),
      min(col(yCol)).as("mny"), max(col(yCol)).as("mxy"))
    val perBucket = lit((1L << (2 * bits)) / buckets)
    graft.SparkUtil.ensureParallelism(df)
      .join(broadcast(bounds))
      .select(
        grid(col(xCol), col("mnx"), col("mxx"), bits).as("gx"),
        grid(col(yCol), col("mny"), col("mxy"), bits).as("gy"))
      .withColumn("bucket",
        floor(zValue(col("gx"), col("gy"), bits).cast("double") /
          perBucket).cast("long"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("gx")).as("min_gx"), max(col("gx")).as("max_gx"),
        min(col("gy")).as("min_gy"), max(col("gy")).as("max_gy"))
  }
}
