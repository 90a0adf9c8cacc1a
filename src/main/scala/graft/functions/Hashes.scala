package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** md5-derived deterministic hashing, chosen so DuckDB computes the
  * bit-identical value (SURVEY.md §3): both engines agree on
  * `md5(utf8)` hex, and a fixed-width hex prefix compares
  * lexicographically exactly like its numeric value — so min-hash
  * style aggregations can stay in string space with no conv() at all.
  */
object Hashes {

  /** 15-hex-char (60-bit) md5 prefix of `seed|value`. Fixed width, so
    * lexicographic order == numeric order.
    * DuckDB: `substr(md5(seed||'|'||x), 1, 15)`.
    */
  def hexHash(c: Column, seed: Int): Column =
    substring(md5(concat(lit(s"$seed|"), c)), 1, 15)

  /** Same hash as a non-negative 60-bit long (for arithmetic use).
    * DuckDB: `('0x'||substr(md5(seed||'|'||x),1,15))::BIGINT`.
    */
  def hash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed|"), c)), 1, 15), 16, 10).cast("long")

  /** Value 0..15 of the k-th (1-based) digit of a hex string.
    * DuckDB: `strpos('0123456789abcdef', substr(hex,k,1)) - 1`.
    */
  def hexNibble(hexStr: Column, k: Int): Column =
    instr(lit("0123456789abcdef"), substring(hexStr, k, 1)) - 1

  /** Bit b (0..3) of the k-th (1-based) hex digit — building block for
    * SimHash's per-bit sign aggregation.
    * DuckDB: `(strpos(...)-1) // 2^b % 2`.
    */
  def hexNibbleBit(hexStr: Column, k: Int, b: Int): Column =
    (hexNibble(hexStr, k) / lit(1 << b)).cast("int") % 2

  /** Same over md5(x) directly. */
  def md5Nibble(c: Column, k: Int): Column = hexNibble(md5(c), k)
  def md5NibbleBit(c: Column, k: Int, b: Int): Column =
    hexNibbleBit(md5(c), k, b)

  /** The first 15 md5 hex digits as one 60-bit long — lets bit-level
    * consumers (SimHash) do ONE conv then shift/mask per bit instead
    * of per-bit string surgery. Bit b of hex digit p (1-based) is
    * `(h >> ((15-p)*4 + b)) & 1`, identical to [[md5NibbleBit]].
    * DuckDB: `('0x'||substr(md5(x),1,15))::BIGINT`.
    */
  def md5Bits60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Deterministic pseudo-uniform double in [-1, 1) derived from a
    * string key — used for LSH hyperplane components so Spark and the
    * DuckDB oracle draw the SAME hyperplanes. 2^59 = 576460752303423488.
    * DuckDB: `('0x'||substr(md5(key),1,15))::BIGINT /
    *   576460752303423488.0 - 1.0`.
    */
  def signedUnit(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("double") /
      lit(5.76460752303423488e17) - lit(1.0)
}
