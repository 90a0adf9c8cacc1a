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

  /** Mann-Whitney U (Wilcoxon rank-sum) — the nonparametric companion
    * to [[welchTTest]] for skewed metrics (revenue, latency) where a
    * mean-based test misleads. Average ranks with exact tie handling,
    * computed via the HISTOGRAM trick: rows reduce to one row per
    * distinct metric value first, so no row-level global sort ever
    * happens — the only ordered pass runs over the distinct-value
    * table (|V| rows; for integer metrics |V| ≪ N at any scale).
    *
    * All rank sums stay in doubled-integer space (`2·R` is an exact
    * long even with .5 average ranks), so U and the tie-corrected
    * normal approximation
    * z = (U_a − n_a·n_b/2) / sqrt(n_a·n_b/12 · ((n+1) − ΣT/(n(n−1))))
    * with ΣT = Σ(t³−t) over tie groups derive bit-identically in any
    * engine from six integers. Variant A = lexicographically smaller
    * label; exactly two variants enforced like [[welchTTest]].
    *
    * Scale shape: one hash aggregate by (value) with map-side combine,
    * then a DISTRIBUTED cumulative pass over the distinct-value table
    * (range shuffle + per-partition cumsum + partition-count-grain
    * prefix offsets — no unpartitioned data-grain window anywhere),
    * one 2-row rollup. A continuous metric therefore degrades to an
    * honest shuffle over |V| ≈ N rows, never to a single task; cast
    * to LONG keeps |V| value-range-bounded for integer metrics.
    * Output: 1 row (n_a, n_b, u_a, z_stat).
    */
  def mannWhitneyU(
      df: DataFrame,
      variantCol: String,
      metricCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = graft.SparkUtil.ensureParallelism(df)
      .select(col(variantCol).cast("string").as("v"),
        col(metricCol).cast("long").as("x"))
    // variant-A label = lexicographic min: a 1-row broadcast attach,
    // same determinism contract as welchTTest's min/max struct pivot
    val lab = rows.agg(min(col("v")).as("va"),
      countDistinct(col("v")).as("n_variants"))
    // histogram: one row per distinct metric value, with the tie size
    // and how many of the ties belong to variant A
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,0)")
    val g = rows.join(broadcast(lab))
      .groupBy("x")
      .agg(
        count(lit(1)).as("t"),
        count(when(col("v") === col("va"), 1)).as("ta"),
        first(col("va")).as("va"),
        first(col("n_variants")).as("n_variants"))
    // DISTRIBUTED cumulative pass (the Encodings.equiDepth shape —
    // no unpartitioned data-grain window, so an unexpectedly
    // continuous metric degrades to a real shuffle, never to one
    // task): group average rank doubled is 2·cum − t + 1 (an exact
    // long); decimal(38,0) accumulators keep rank sums and Σ(t³−t)
    // exact far past Long range
    val (withCum, pinned) = distributedCumsum(g, "x", "t")
    val m = withCum
      .agg(
        sum(col("ta")).as("n_a"),
        sum(col("t")).as("n"),
        sum(dec(col("ta")) *
          (dec(col("cum")) * 2 - dec(col("t")) + 1)).as("r2a"),
        sum((dec(col("t")) * dec(col("t")) - 1) * dec(col("t")))
          .as("ties"),
        first(col("va")).as("va"),
        first(col("n_variants")).as("n_variants"))
    val nA = col("n_a").cast("double")
    val nB = (col("n") - col("n_a")).cast("double")
    val n = col("n").cast("double")
    // U doubled stays exact: U2 = 2R_a − n_a(n_a+1)
    val u2 = col("r2a").cast("double") - nA * (nA + 1)
    val variance = nA * nB / 12.0 *
      ((n + 1) - col("ties").cast("double") / (n * (n - 1)))
    val guard = when(col("n_variants") === 2, lit(1)).otherwise(
      raise_error(concat(
        lit("mannWhitneyU requires exactly 2 variants, got "),
        col("n_variants").cast("string"))))
    val out = m.select(
      (col("n_a") * guard).as("n_a"),
      (col("n") - col("n_a")).as("n_b"),
      Numerics.fix4(u2 / 2.0).as("u_a"),
      Numerics.fix4((u2 - nA * nB) / (sqrt(variance) * 2.0))
        .as("z_stat"))
    val staged = graft.ScratchSpace.materialize(out, "mannwhitney_")
    pinned.unpersist()
    staged
  }

  /** Cumulative sum of `tCol` over `orderCol` ascending WITHOUT an
    * unpartitioned data-grain window: range-shuffle by the order
    * column, per-partition local cumsum, per-partition totals roll to
    * prefix offsets (a partition-COUNT-grain window — ~32 rows of
    * metadata, never data), broadcast back. The ranged rows are
    * persisted so every branch sees ONE boundary sample
    * (repartitionByRange re-samples per execution and
    * spark_partition_id is nondeterministic-tagged — the round-12
    * equiDepth lesson). Returns (rows + "cum", the pinned DF to
    * unpersist after the consuming action).
    */
  private def distributedCumsum(
      g: DataFrame,
      orderCol: String,
      tCol: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val wLoc = Window.partitionBy("__pid").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = g
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lc", sum(col(tCol)).over(wLoc))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wPre = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = local.groupBy("__pid")
      .agg(sum(col(tCol)).as("__c"))
      .select(col("__pid"),
        coalesce(sum(col("__c")).over(wPre), lit(0L)).as("__pre"))
    val withCum = local.join(broadcast(prefix), "__pid")
      .withColumn("cum", col("__pre") + col("__lc"))
      .drop("__pid", "__lc", "__pre")
    (withCum, local)
  }

  /** Rank AUC — the evaluation a learned quality classifier (q191's
    * hashed-linear scorer, or any score column) gets before its
    * threshold gates a corpus: the probability a random positive
    * outranks a random negative, computed EXACTLY from the
    * Mann-Whitney U statistic with average ranks for ties
    * (AUC = U/(n₁·n₀) — the standard ROC-AUC identity). Same
    * value-histogram reduction as [[mannWhitneyU]]: one aggregate to
    * |distinct scores| rows, then the DISTRIBUTED cumulative pass
    * (range shuffle + per-partition cumsum + partition-count-grain
    * prefix offsets) with decimal(38,0) accumulators, closed-form on
    * exact integers — AUC's single float division is of two exact
    * integer-valued doubles. A raw continuous score degrades to an
    * honest shuffle over |V| ≈ N rows, never to a single task
    * (quantizing through fix4 first still shrinks |V| to the grid
    * and is the cheaper call).
    *
    * `labelCol` must be boolean-like (cast to boolean; true =
    * positive); requires both classes present. `scoreCol` may be any
    * orderable numeric — ties get average rank, so fix4'd float
    * scores group identically cross-engine.
    *
    * Output: 1 row (n_pos, n_neg, auc fix4).
    */
  def rankAuc(
      df: DataFrame,
      labelCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,0)")
    val rows = graft.SparkUtil.ensureParallelism(df)
      .select(col(labelCol).cast("boolean").as("y"),
        col(scoreCol).cast("double").as("x"))
    val g = rows.groupBy("x")
      .agg(count(lit(1)).as("t"),
        count(when(col("y"), 1)).as("tp"))
    // doubled average rank of a tie group = 2·cum − t + 1 (exact
    // long); cum via the distributed shape — no unpartitioned
    // data-grain window even on an unquantized score column
    val (withCum, pinned) = distributedCumsum(g, "x", "t")
    val m = withCum
      .agg(
        sum(col("tp")).as("n_pos"),
        sum(col("t")).as("n"),
        sum(dec(col("tp")) *
          (dec(col("cum")) * 2 - dec(col("t")) + 1)).as("r2p"))
    val nPos = col("n_pos").cast("double")
    val nNeg = (col("n") - col("n_pos")).cast("double")
    val u2 = col("r2p").cast("double") - nPos * (nPos + 1)
    val guard = when(col("n_pos") > 0 && col("n") > col("n_pos"), lit(1))
      .otherwise(raise_error(lit(
        "rankAuc requires both classes present")))
    val out = m.select(
      (col("n_pos") * guard).as("n_pos"),
      (col("n") - col("n_pos")).as("n_neg"),
      Numerics.fix4(u2 / (nPos * nNeg * 2.0)).as("auc"))
    val staged = graft.ScratchSpace.materialize(out, "rankauc_")
    pinned.unpersist()
    staged
  }

  /** CUPED (Controlled-experiment Using Pre-Experiment Data) — the
    * industry-standard variance-reduction adjustment: regress the
    * experiment metric y on a pre-period covariate x (pooled
    * θ = Cov(x,y)/Var(x)), analyze ŷ = y − θ·(x − x̄) instead of y.
    * Same treatment-effect estimate, Var shrunk by the squared
    * correlation — detectable effects shrink by √(1−ρ²) with zero
    * extra traffic.
    *
    * Input: one row per unit with exact-integer `preCol` x and
    * `metricCol` y (cents/counts; caller fixes the unit).
    * `variantCol` exactly two values, A = lexicographic min.
    *
    * Scale shape: ONE hash aggregate by variant reduces everything to
    * 2 rows of (n, Σx, Σy, Σx², Σy², Σxy) — products in
    * decimal(38,0) so ~1e6-cent units over ~1e9 rows never overflow —
    * then a 1-row min/max-struct pivot; θ, the adjusted means, the
    * adjusted-variance Welch t and the realized variance-reduction
    * ratio are closed-form doubles on those 12 integers, identical in
    * any engine. Output: 1 row (n_a, n_b, theta, mean_adj_a,
    * mean_adj_b, t_cuped, var_reduction).
    */
  def cuped(
      df: DataFrame,
      variantCol: String,
      preCol: String,
      metricCol: String): DataFrame = {
    val xd = col("x").cast("decimal(18,0)")
    val yd = col("y").cast("decimal(18,0)")
    val m = graft.SparkUtil.ensureParallelism(df)
      .select(col(variantCol).cast("string").as("v"),
        col(preCol).cast("long").as("x"),
        col(metricCol).cast("long").as("y"))
      .groupBy("v")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(xd * xd).as("sxx"), sum(yd * yd).as("syy"),
        sum(xd * yd).as("sxy"))
    val one = m.agg(
      min(struct(col("v"), col("n"), col("sx"), col("sy"),
        col("sxx"), col("syy"), col("sxy"))).as("a"),
      max(struct(col("v"), col("n"), col("sx"), col("sy"),
        col("sxx"), col("syy"), col("sxy"))).as("b"),
      count(lit(1)).as("n_variants"))
    def d(s: String, f: String) = col(s + "." + f).cast("double")
    // pooled sums (exact in double far below 2^53 after the decimal
    // accumulation; the casts happen once, the arithmetic is ordered
    // identically in the oracle transcription)
    val n = d("a", "n") + d("b", "n")
    val sx = d("a", "sx") + d("b", "sx")
    val sy = d("a", "sy") + d("b", "sy")
    val sxx = d("a", "sxx") + d("b", "sxx")
    val syy = d("a", "syy") + d("b", "syy")
    val sxy = d("a", "sxy") + d("b", "sxy")
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val rho2 = ((sxy - sx * sy / n) * (sxy - sx * sy / n)) /
      ((sxx - sx * sx / n) * (syy - sy * sy / n))
    val xbar = sx / n
    def meanAdj(s: String) =
      d(s, "sy") / d(s, "n") - theta * (d(s, "sx") / d(s, "n") - xbar)
    // per-variant adjusted variance:
    // (Syy − n·ȳ² − 2θ(Sxy − n·x̄ȳ) + θ²(Sxx − n·x̄²)) / (n − 1)
    def varAdj(s: String) = {
      val nn = d(s, "n")
      val mx = d(s, "sx") / nn
      val my = d(s, "sy") / nn
      ((d(s, "syy") - nn * (my * my)) -
        theta * 2 * (d(s, "sxy") - nn * (mx * my)) +
        theta * theta * (d(s, "sxx") - nn * (mx * mx))) / (nn - 1)
    }
    val t = (meanAdj("a") - meanAdj("b")) /
      sqrt(varAdj("a") / d("a", "n") + varAdj("b") / d("b", "n"))
    val guard = when(col("n_variants") === 2, lit(1)).otherwise(
      raise_error(concat(
        lit("cuped requires exactly 2 variants, got "),
        col("n_variants").cast("string"))))
    one.select(
      (col("a.n") * guard).as("n_a"),
      col("b.n").as("n_b"),
      Numerics.fix4(theta).as("theta"),
      Numerics.fix4(meanAdj("a")).as("mean_adj_a"),
      Numerics.fix4(meanAdj("b")).as("mean_adj_b"),
      Numerics.fix4(t).as("t_cuped"),
      Numerics.fix4(rho2).as("var_reduction"))
  }

  /** Pearson chi-square test of independence over two categorical
    * columns (variant × outcome — the guardrail test for conversion
    * tables and sample-ratio-mismatch checks).
    *
    * Scale shape: ONE hash aggregate collapses the input to the
    * contingency cells (r·c rows — dozens); row/column totals are
    * windows over that tiny cell table, never a second scan; the
    * statistic is one more cell-table aggregate. χ² = Σ (O−E)²/E with
    * E = rowTot·colTot/N in doubles over exact long counts.
    * Output: 1 row (n, dof, chi2).
    */
  def chiSquareIndependence(
      df: DataFrame,
      rowCol: String,
      colCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = graft.SparkUtil.ensureParallelism(df)
      .select(col(rowCol).cast("string").as("r"),
        col(colCol).cast("string").as("c"))
      .groupBy("r", "c")
      .agg(count(lit(1)).as("o"))
    val withTot = cells
      .withColumn("rt", sum(col("o")).over(Window.partitionBy("r")))
      .withColumn("ct", sum(col("o")).over(Window.partitionBy("c")))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val e = col("rt").cast("double") * col("ct") / col("n")
    val od = col("o").cast("double")
    withTot.agg(
      sum(col("o")).as("n_rows"),
      ((countDistinct(col("r")) - 1) * (countDistinct(col("c")) - 1))
        .as("dof"),
      sum((od - e) * (od - e) / e).as("chi2_raw"))
      .select(col("n_rows").as("n"), col("dof"),
        Numerics.fix4(col("chi2_raw")).as("chi2"))
  }
}
