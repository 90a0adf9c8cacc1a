package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

object SparkUtil {

  /** Ensure at least default-parallelism partitions before a
    * compute-heavy per-row stage. A small file scans as one partition
    * and would serialize the whole stage on one core; at production
    * scale scans already exceed the target and this is a no-op (no
    * shuffle inserted).
    *
    * Plan-free guard: logical-plan size statistics (file-index byte
    * sums — already computed at analysis) against the scan packer's
    * `files.maxPartitionBytes`. Inputs big enough that the scan itself
    * yields >= target partitions are left untouched; touching `.rdd`
    * here would force eager physical planning of the whole query on
    * every operator entry (and throw on streaming inputs).
    */
  def ensureParallelism(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val sess = df.sparkSession
    val target = sess.sparkContext.defaultParallelism
    val perPartition = sess.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.analyzed.stats.sizeInBytes
    // Only a CONFIDENTLY-small estimate triggers the repartition.
    // sizeInBytes >= Long.MaxValue means unknown OR a huge multiplied
    // join estimate — forcing such an input into defaultParallelism
    // partitions could build terabyte partitions, far worse than the
    // under-parallelism this guard prevents; unknown-stats sources
    // (e.g. RDD-backed) should pre-repartition explicitly.
    if (bytes < BigInt(target) * perPartition) df.repartition(target) else df
  }

  /** Skew-salted inner equi-join: the skewed (large) side gets a
    * deterministic salt in [0, saltFactor) per row, the other side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a hot key's rows now spread over `saltFactor`
    * reducers instead of one straggler. Result is EXACTLY the plain
    * inner join's. Use when a handful of keys dominate and AQE's
    * skew-join splitting isn't available (e.g. disabled, or the skew
    * sits in a single shuffle block).
    *
    * `skewed` carries `skewedKey`; `other` carries `otherKey`.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      skewedKey: Column,
      otherKey: Column,
      saltFactor: Int): DataFrame = {
    val s = skewed.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val o = other.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    s.join(o, skewedKey === otherKey && s("_salt") === o("_salt"))
      .drop("_salt")
  }
}
