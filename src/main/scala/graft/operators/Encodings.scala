package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML feature-encoding operators — the feature-prep passes a training
  * pipeline runs over labeled tabular data before model fitting.
  */
object Encodings {

  /** Leave-one-out target encoding — the leakage-safe categorical
    * encoder: each row's category is replaced by the mean of the
    * TARGET over all OTHER rows of that category,
    * (Σ_cat − y) / (n_cat − 1). Including the row's own target (plain
    * target encoding) leaks the label into the feature and inflates
    * validation scores; the leave-one-out form is the standard fix.
    * Categories with a single row encode null (no other rows to
    * borrow from — callers impute with the global mean if desired).
    *
    * Exactness: pass the target as an exact integer (cents, counts) —
    * the per-category (Σ, n) are then exact longs and the one
    * division per row is engine-identical. Scale shape: one
    * category-grain aggregate (map-side partials) joined back onto
    * the stream. The stats table is CATEGORY-grain and category
    * cardinality is unbounded (user-id target encoding is standard),
    * so no broadcast hint: AQE broadcasts when the aggregate turns
    * out small and shuffles both sides when it doesn't.
    */
  def targetEncodeLoo(
      df: DataFrame,
      catCol: String,
      target: Column): DataFrame = {
    val base = graft.SparkUtil.ensureParallelism(df)
      .withColumn("__y", target.cast("long"))
    val stats = base.groupBy(catCol)
      .agg(sum(col("__y")).as("__s"), count(lit(1)).as("__n"))
    base.join(stats, catCol)
      .withColumn("loo_mean",
        when(col("__n") > 1,
          graft.functions.Numerics.fix4(
            (col("__s") - col("__y")).cast("double") /
              (col("__n") - 1).cast("double"))))
      .drop("__y", "__s", "__n")
  }

  /** Equi-depth (quantile-bucket) histogram by EXACT rank: rows sort
    * by (value, tie) and split into k ntile buckets (SQL-standard
    * sizing: the first total mod k buckets take one extra row), then
    * each bucket reports count/min/max/sum. Unlike interpolated-
    * quantile bucket bounds (cross-engine float hazard) or equi-width
    * buckets (skew-blind), ntile is a pure integer rank rule —
    * deterministic given the tie-break, so both engines produce
    * identical buckets.
    *
    * Scale shape: a DISTRIBUTED global rank, never a single-partition
    * window (a bare `ntile(k).over(orderBy(...))` collapses all rows
    * onto one task — the WindowExec warning): rows range-partition by
    * (value, tie), each partition ranks locally, and the per-partition
    * counts — one row per partition — prefix-sum and broadcast back
    * (the packingMap discipline). The ntile bucket is then closed-form
    * integer arithmetic on the global rank.
    */
  /** [[equiDepthHistogram]]'s result plus the handle releasing the
    * cached ranked rows (see the persistence note there).
    */
  final class EquiDepthRun private[operators] (
      val result: DataFrame,
      ranked: DataFrame) {
    def release(): Unit = { ranked.unpersist(): Unit }
  }

  /** Convenience form: materializes the (k-bucket) histogram via a
    * scratch-parquet round-trip (executor-loss-safe, unlike
    * localCheckpoint) and releases the cached ranked rows
    * immediately — repeated calls cannot accumulate executor cache.
    * Use [[equiDepthHistogramRun]] + `release()` to keep the lineage.
    */
  def equiDepthHistogram(
      df: DataFrame,
      valCol: String,
      tieCol: String,
      k: Int): DataFrame = {
    val run = equiDepthHistogramRun(df, valCol, tieCol, k)
    val out = graft.ScratchSpace.materialize(run.result, "equidepth_")
    run.release()
    out
  }

  def equiDepthHistogramRun(
      df: DataFrame,
      valCol: String,
      tieCol: String,
      k: Int): EquiDepthRun = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    // PERSISTED for the same reason as Layout.skippingAuditRun (where
    // the failure was CAUGHT at sf0.1, round 12): repartitionByRange
    // re-samples its boundaries per physical execution and
    // spark_partition_id() is nondeterministic-tagged, which blocks
    // exchange reuse — an un-persisted prefix branch can see DIFFERENT
    // partitions than the rank branch and the __pid equi-join silently
    // drops rows. One cached RDD = one set of boundaries everywhere.
    val wLoc = Window.partitionBy("__pid").orderBy(col(valCol), col(tieCol))
    val local = graft.SparkUtil.ensureParallelism(df)
      .select(col(valCol), col(tieCol))
      .repartitionByRange(col(valCol), col(tieCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(wLoc))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wPre = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = local.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .select(col("__pid"),
        coalesce(sum(col("__c")).over(wPre), lit(0L)).as("__pre"),
        sum(col("__c")).over(
          Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
          .as("__total"))
    // SQL-standard ntile from the 1-based global rank r over n rows:
    // base = n DIV k, rem = n % k; the first rem buckets hold base+1.
    // Integer division via floor(double) — exact below 2^52 rows, and
    // Column./ on longs would silently be double division anyway.
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val ranked = local.join(broadcast(prefix), "__pid")
      .withColumn("__r", col("__pre") + col("__rn"))
    val base = idiv(col("__total"), lit(k.toLong))
    val rem = col("__total") % lit(k.toLong)
    val cut = rem * (base + 1) // rows in the first rem (bigger) buckets
    val bucket = when(col("__r") <= cut,
        idiv(col("__r") - 1, base + 1) + 1)
      .otherwise(when(base > 0,
        rem + idiv(col("__r") - cut - 1, base) + 1)
        .otherwise(col("__r"))) // n < k: one row per bucket
    val result = ranked
      .withColumn("bucket", bucket.cast("int"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        min(col(valCol)).as("lo"),
        max(col(valCol)).as("hi"),
        sum(col(valCol).cast("long")).as("value_sum"))
    new EquiDepthRun(result, local)
  }
}
