package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated star schema (TESTDATA.md). */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader refuses by default; read it as raw epoch-nanos longs (exact —
    * no precision games) and derive epoch-ms where needed.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, dir, "events")
  }
}
