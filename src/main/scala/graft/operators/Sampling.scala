package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Deterministic stratified sampling for training-data curation:
  * per-stratum rates applied via a content hash, so the sample is
  * reproducible across runs, engines and cluster sizes (unlike
  * `df.sample`, whose output depends on partitioning). Pure map-side —
  * no shuffle; the filter is a codegen'd hash comparison pushed to the
  * scan.
  */
object Sampling {

  /** Keep a row when md5-derived `hash60(seed|id) mod 1000` falls under
    * the stratum's permille rate. Unmatched strata default to
    * `defaultPermille`.
    */
  def stratifiedByHash(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      permilleByStratum: Map[String, Int],
      defaultPermille: Int,
      seed: Int = 0): DataFrame = {
    val rate = permilleByStratum.foldLeft(lit(defaultPermille)) {
      case (acc, (s, p)) => when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    df.where(
      pmod(Hashes.hash60(col(idCol).cast("string"), seed), lit(1000)) < rate)
  }

  /** Importance (weighted) sampling — the data-mixing primitive: keep
    * each row with probability `weight` ∈ [0, 1] (floored to permille),
    * decided by the id's hash so the sample is reproducible across
    * runs, engines and cluster sizes. Pure map-side filter; the weight
    * may be any deterministic Column (source quality, mixture rate).
    */
  def weightedByHash(
      df: DataFrame,
      idCol: String,
      weight: Column,
      seed: Int = 0): DataFrame =
    df.where(
      pmod(Hashes.hash60(col(idCol).cast("string"), seed), lit(1000))
        < floor(weight * 1000.0))

  /** Deterministic training-order shuffle: global order by the
    * md5-derived hash of the id (tie-broken by id) — reproducible
    * across runs, engines and cluster sizes, unlike `orderBy(rand())`.
    * The sort is a range-partitioned distributed sort; downstream
    * sharded writes preserve the order per shard.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Int = 0): DataFrame =
    df.orderBy(Hashes.hash60(col(idCol).cast("string"), seed), col(idCol))

  /** Keep at most `k` rows per key, deterministically ordered by
    * (orderCol, tieCol) — the per-domain/per-user cap a web-scale
    * curation pipeline applies so no single source dominates training
    * data. One shuffle by key + one window pass (rows sort within their
    * key's partition; no global sort).
    */
  def capPerKey(
      df: DataFrame,
      keyCol: String,
      orderCol: String,
      tieCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(orderCol), col(tieCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Deterministic train/val/test assignment: the md5 permille of the
    * id decides the split, so membership is stable under reshuffling,
    * re-partitioning and incremental reruns — the property a training
    * pipeline needs so examples never migrate between splits. A pure
    * (map-side) column expression.
    */
  def splitColumn(
      id: Column,
      trainPermille: Int = 800,
      valPermille: Int = 100,
      seed: Int = 0): Column = {
    val h = pmod(Hashes.hash60(id.cast("string"), seed), lit(1000))
    when(h < trainPermille, lit("train"))
      .when(h < trainPermille + valPermille, lit("val"))
      .otherwise(lit("test"))
  }
}
