package graft.sources

import org.apache.spark.sql.SparkSession

/** Session-conf handling for parquet field-id resolution — the one
  * Spark knob the lake readers/writers genuinely need
  * (`spark.sql.parquet.fieldId.{read,write}.enabled`).
  *
  * Why a session conf at all: Spark reads the READ flag from the
  * session's SQLConf at ACTION time (ParquetFileFormat overrides the
  * per-relation Hadoop conf from the session conf when building
  * readers), so a per-read data source option is silently ignored —
  * verified empirically in FieldIdResolutionSpec. A lazy scan returned
  * to the caller therefore depends on the flag's value when the action
  * eventually runs; "save/restore around the read" would hand back a
  * plan that breaks the moment the restore happens.
  */
object FieldIds {

  val ReadKey = "spark.sql.parquet.fieldId.read.enabled"
  val WriteKey = "spark.sql.parquet.fieldId.write.enabled"

  /** Ensure field-id READ resolution for the session (no-op when
    * already on). Deliberately NOT restored: lazy scans evaluate the
    * conf at action time, and the flag is inert for requested schemas
    * WITHOUT `parquet.field.id` metadata (Spark matches by name
    * exactly as before), so leaving it enabled changes nothing for
    * unrelated reads while keeping every returned lake scan valid.
    */
  def ensureReadEnabled(spark: SparkSession): Unit =
    if (!spark.conf.getOption(ReadKey).contains("true"))
      spark.conf.set(ReadKey, "true")

  /** Run an EAGER write with field-id WRITING enabled, restoring the
    * previous session value after. Unlike the read flag, write paths
    * complete inside the call, so save/restore is exact here.
    */
  def withWriteEnabled[T](spark: SparkSession)(body: => T): T = {
    val prev = spark.conf.getOption(WriteKey)
    spark.conf.set(WriteKey, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(WriteKey, v)
      case None => spark.conf.unset(WriteKey)
    }
  }
}
