package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated star schema (TESTDATA.md). */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Epoch-ms bounds [2000-01-01, 2100-01-01) used as the encoding
    * canary: a 1000x unit drift (micros read as nanos, or vice versa)
    * lands far outside this window, so one cheap min/max check catches
    * any future testdata re-encoding instead of silently computing
    * garbage event times.
    */
  private[graft] val MsLow = 946684800000L
  private[graft] val MsHigh = 4102444800000L

  /** `events.ts` has shipped under two parquet encodings across
    * testdata generations: INT64 TIMESTAMP(NANOS) (which Spark's
    * vectorized reader only accepts as raw epoch-nanos longs via
    * `nanosAsLong`) and TIMESTAMP(MICROS) `timestamp_ntz`. Every
    * consumer assumes the nanos-long shape (`ts DIV 1000000` → ms), so
    * this reader dispatches on the type that actually arrived and
    * normalizes `ts` to epoch-nanos Long — exact integer math in both
    * branches, and the DuckDB oracle's `epoch_ns(ts)` agrees with both
    * physical encodings. Session timezone is pinned UTC so the
    * NTZ→instant interpretation matches DuckDB's naive-as-UTC.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df // TIMESTAMP(NANOS) read as raw epoch-nanos
      case TimestampType | TimestampNTZType =>
        df.withColumn(
          "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported parquet type $other — expected " +
            "INT64 TIMESTAMP(NANOS) or TIMESTAMP(MICROS)")
    }
  }
}
