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
}
