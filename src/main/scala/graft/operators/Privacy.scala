package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-governance audits a curation pipeline runs before a dataset
  * leaves the boundary.
  */
object Privacy {

  /** k-anonymity + l-diversity audit: group the table by its declared
    * quasi-identifier columns and report how re-identifiable it is —
    * rows living in groups smaller than k (the linkage-attack
    * surface), the smallest group, and the minimum number of distinct
    * sensitive values any group carries (l-diversity; a group with one
    * sensitive value leaks it even at size ≥ k).
    *
    * Scale shape: one partial-agg shuffle to quasi-identifier grain,
    * then a scalar rollup — billions of rows collapse map-side to the
    * QI cardinality. Output: one row
    * (n_groups, n_rows, rows_below_k, min_group_size,
    * min_l_diversity, pct_anonymous).
    */
  def kAnonymityAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k must be >= 2")
    val groups = graft.SparkUtil.ensureParallelism(df)
      .groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("gsz"),
        countDistinct(col(sensitiveCol)).as("ldiv"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      sum(col("gsz")).as("n_rows"),
      coalesce(sum(when(col("gsz") < k, col("gsz"))), lit(0L))
        .as("rows_below_k"),
      min(col("gsz")).as("min_group_size"),
      min(col("ldiv")).as("min_l_diversity"))
      .select(
        col("n_groups"), col("n_rows"), col("rows_below_k"),
        col("min_group_size"), col("min_l_diversity"),
        graft.functions.Numerics.fix4(
          lit(1.0) - col("rows_below_k").cast("double") /
            col("n_rows").cast("double")).as("pct_anonymous"))
  }

  /** k-anonymity GENERALIZATION ladder — the fix the audit above
    * motivates: coarsen a numeric quasi-identifier by powers of ten
    * (bucket = floor(cents / 10^level)) and report, per level, how
    * re-identifiable the (bucket, otherQuasiCols) grouping still is.
    * The first level whose smallest group reaches k is the minimal
    * generalization that anonymizes (`satisfies_k` marks it; the
    * caller publishes at that level). Floor division on exact cents in
    * BOTH engines (negative balances floor identically — integer DIV
    * truncates toward zero and would disagree across engines).
    *
    * Scale shape: one explode to (row × levels) then two hash
    * aggregates — level count is a constant (≤ 10), so the explode is
    * a constant-factor scan, never a join. Output: (level, n_groups,
    * min_group_size, rows_below_k, satisfies_k) ordered by level.
    */
  def generalizationLadder(
      df: DataFrame,
      moneyCol: String,
      otherQuasiCols: Seq[String],
      k: Int,
      maxLevel: Int = 6): DataFrame = {
    require(k >= 1 && maxLevel >= 0 && maxLevel <= 9,
      "k >= 1, maxLevel in [0, 9]")
    val cents = floor(col(moneyCol) * 100.0 + 0.5)
    val leveled = graft.SparkUtil.ensureParallelism(df)
      .select((col(moneyCol) +: otherQuasiCols.map(col)): _*)
      .withColumn("__cents", cents)
      .withColumn("level", explode(array((0 to maxLevel).map(lit): _*)))
      .withColumn("__bucket",
        floor(col("__cents") / pow(lit(10.0), col("level"))))
    val groups = leveled
      .groupBy((col("level") +: col("__bucket") +:
        otherQuasiCols.map(col)): _*)
      .agg(count(lit(1)).as("gsz"))
    groups.groupBy("level")
      .agg(
        count(lit(1)).as("n_groups"),
        min(col("gsz")).as("min_group_size"),
        coalesce(sum(when(col("gsz") < k, col("gsz"))), lit(0L))
          .as("rows_below_k"))
      .withColumn("satisfies_k",
        (col("min_group_size") >= k).cast("int"))
      .orderBy("level")
  }
}
