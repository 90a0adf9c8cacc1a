package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the ANALYZE-style data-quality pass an
  * ingestion pipeline runs on every new drop: per-column null count,
  * exact distinct count, and min/max, in ONE aggregation job.
  *
  * Scale shape: the multi-column exact count-distincts plan through
  * one Expand (k replicas of the scan, one per distinct column) into a
  * single aggregate — k× shuffle volume but one job and one scan pass;
  * for wide tables at 100 TB swap countDistinct for
  * approx_count_distinct and the Expand collapses away. min/max cast
  * to string AFTER aggregating on the native type, so ordering is the
  * column's, not lexicographic.
  */
object Profile {

  def table(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = graft.SparkUtil.ensureParallelism(df)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("n_rows"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select("p.*")
      .orderBy("col_name")
  }

  /** Winsorized (clipped) robust stats per group — outlier-tolerant
    * aggregate profiling: per-group exact `lo`/`hi` percentile bounds,
    * then the mean of values clipped into [lo_v, hi_v]. Two passes by
    * construction (a percentile needs the full distribution before any
    * value can clip): pass 1 reduces to one tiny row per group, which
    * BROADCASTS back onto the scan for pass 2 — the big table streams
    * twice, shuffles only aggregate partials, and nothing ever sorts
    * globally. Output: (groupCol, lo_v, hi_v, winsorized_mean, n).
    */
  def winsorizedStats(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, "need 0 <= lo < hi <= 1")
    val bounds = graft.SparkUtil.ensureParallelism(df)
      .groupBy(groupCol)
      .agg(
        expr(s"percentile($valCol, $lo)").as("lo_v"),
        expr(s"percentile($valCol, $hi)").as("hi_v"))
    df.join(broadcast(bounds), groupCol)
      .groupBy(groupCol)
      .agg(
        graft.functions.Numerics.fix4(first(col("lo_v"))).as("lo_v"),
        graft.functions.Numerics.fix4(first(col("hi_v"))).as("hi_v"),
        graft.functions.Numerics.fix4(
          avg(least(greatest(col(valCol), col("lo_v")), col("hi_v"))))
          .as("winsorized_mean"),
        count(lit(1)).as("n"))
  }
}
