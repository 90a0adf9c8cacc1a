package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact numeric presentation.
  *
  * `round()` half-way semantics differ between engines (Spark rounds the
  * decimal rendering HALF_UP; DuckDB rounds the scaled double), so
  * rounded outputs can disagree by one ulp-of-display. These helpers use
  * only IEEE-deterministic ops (`*`, `+`, `floor`, integer sum) that any
  * engine computes bit-identically from the same inputs:
  *
  *  - fixN(x)   = floor(x·10^N + 0.5) / 10^N       (display rounding)
  *  - moneySum  = Σ floor(x·100 + 0.5) as int cents, then /100.0
  *                (an integer sum — also ORDER-independent, so parallel
  *                 aggregation order can't produce last-ulp drift)
  *
  * Each has a literal DuckDB transcription used by the oracles.
  */
object Numerics {

  def fix(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p + 0.5) / p
  }
  def fix2(c: Column): Column = fix(c, 2)
  def fix4(c: Column): Column = fix(c, 4)

  /** Integer-cents sum (exact, order-independent). */
  def centsSum(c: Column): Column = sum(floor(c * 100.0 + 0.5))

  /** Sum rendered back to currency units as an exact double. */
  def moneySum(c: Column): Column = centsSum(c) / 100.0

  /** Mean at 4 decimals from the exact cents sum. */
  def moneyAvg(c: Column): Column =
    fix(centsSum(c) / 100.0 / count(lit(1)), 4)

  // ---- DuckDB transcriptions (string fragments for oracle SQL) ----

  def sqlFix(x: String, scale: Int): String = {
    val p = math.pow(10, scale).toLong
    s"floor(($x)*$p.0 + 0.5)/$p.0"
  }
  def sqlMoneySum(x: String): String =
    s"CAST(sum(CAST(floor(($x)*100.0 + 0.5) AS BIGINT)) AS BIGINT)/100.0"
  def sqlMoneyAvg(x: String): String =
    sqlFix(s"${sqlMoneySum(x)}/count(*)", 4)
}
