package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Numerics

/** Experiment (A/B) analysis — the readout an online-experimentation
  * pipeline computes per metric: per-variant means and a Welch t
  * statistic, from EXACT integer sufficient statistics so any engine
  * reproduces the decision bit-for-bit.
  */
object Experiments {

  /** Welch two-sample t statistic over a per-unit integer metric.
    *
    * Input: one row per (unit, variant, metric) where `metricCol` is
    * an exact integer (cents, counts — never a raw double; the caller
    * fixes the unit). `variantCol` must take exactly two values; rows
    * ORDER as (min variant = A, max variant = B).
    *
    * Scale shape: ONE hash aggregate by variant reduces everything to
    * 2 rows of (n, Σx, Σx²) exact longs; the t statistic is closed-form
    * double arithmetic on those 6 integers — identical in any engine —
    * so only the final rounding needs fix4. Never a sort, never a
    * second pass. Output: 1 row (n_a, n_b, mean_a, mean_b, t_stat).
    */
  def welchTTest(
      df: DataFrame,
      variantCol: String,
      metricCol: String): DataFrame = {
    // Σx² accumulates in DECIMAL, not LONG: per-unit cent totals near
    // 1e6 squared over ~1e6 units approach Long.MAX — decimal(37,0)
    // products summed into decimal(38,0) never overflow at that scale.
    val xd = col("x").cast("decimal(18,0)")
    val m = graft.SparkUtil.ensureParallelism(df)
      .select(col(variantCol).cast("string").as("v"),
        col(metricCol).cast("long").as("x"))
      .groupBy("v")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(xd * xd).as("sxx"))
    // pivot the two variant rows into one via a min/max-keyed aggregate
    // (deterministic: A = lexicographically smaller variant label); the
    // variant count rides along so >2 variants FAIL instead of silently
    // dropping the middle labels
    val one = m.agg(
      min(struct(col("v"), col("n"), col("sx"), col("sxx"))).as("a"),
      max(struct(col("v"), col("n"), col("sx"), col("sxx"))).as("b"),
      count(lit(1)).as("n_variants"))
    def mean(s: String) = col(s + ".sx").cast("double") / col(s + ".n")
    def variance(s: String) =
      (col(s + ".sxx").cast("double") -
        col(s + ".n") * (mean(s) * mean(s))) / (col(s + ".n") - 1)
    val t = (mean("a") - mean("b")) /
      sqrt(variance("a") / col("a.n") + variance("b") / col("b.n"))
    // hard-fail on != 2 variants: a 3-variant frame would otherwise
    // produce a plausible A-vs-C readout with B silently dropped
    val guard = when(col("n_variants") === 2, lit(1)).otherwise(
      raise_error(concat(
        lit("welchTTest requires exactly 2 variants, got "),
        col("n_variants").cast("string"))))
    one.select(
      (col("a.n") * guard).as("n_a"),
      col("b.n").as("n_b"),
      Numerics.fix4(mean("a")).as("mean_a"),
      Numerics.fix4(mean("b")).as("mean_b"),
      Numerics.fix4(t).as("t_stat"))
  }
}
