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
