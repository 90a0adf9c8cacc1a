package graft.sources

import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Pins the Spark behavior [[FieldIds]] is built around: parquet
  * field-id READ resolution obeys ONLY the session conf — a per-read
  * data source option is silently ignored (Spark rebuilds the scan's
  * Hadoop conf from the session SQLConf when readers are constructed).
  * If a future Spark release starts honoring the per-read option,
  * this spec fails and the lake readers should switch to it.
  */
class FieldIdResolutionSpec extends SparkTestBase {

  private def idMeta = new MetadataBuilder()
    .putLong(IcebergFixture.FieldIdKey, 1L).build()

  test("per-read option is ignored; session conf is load-bearing; " +
    "ensureReadEnabled is sticky and withWriteEnabled restores") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("fidspec").toString
    val df = s.range(5).select(col("id").as("old", idMeta))
    FieldIds.withWriteEnabled(s) {
      df.write.mode("overwrite").parquet(dir)
    }
    // rename old -> neu, same field id: resolves ONLY by footer id
    val want = StructType(Seq(
      StructField("neu", LongType, nullable = true, idMeta)))
    val prev = s.conf.getOption(FieldIds.ReadKey)
    try {
      s.conf.set(FieldIds.ReadKey, "false")
      // per-read option: ignored — the renamed column reads as null
      val viaOption = s.read.option(FieldIds.ReadKey, "true")
        .schema(want).parquet(dir).agg(sum(col("neu"))).head()
      assert(viaOption.isNullAt(0),
        "Spark now honors the per-read field-id option — " +
          "switch FieldIds to per-read options")
      // session conf: resolves by id
      FieldIds.ensureReadEnabled(s)
      assert(s.conf.get(FieldIds.ReadKey) == "true")
      val viaConf = s.read.schema(want).parquet(dir)
        .agg(sum(col("neu"))).head()
      assert(viaConf.getLong(0) == 10L)
    } finally prev match {
      case Some(v) => s.conf.set(FieldIds.ReadKey, v)
      case None => s.conf.unset(FieldIds.ReadKey)
    }
    // withWriteEnabled save/restores the WRITE flag exactly
    val prevW = spark.conf.getOption(FieldIds.WriteKey)
    spark.conf.set(FieldIds.WriteKey, "false")
    FieldIds.withWriteEnabled(spark) {
      assert(spark.conf.get(FieldIds.WriteKey) == "true")
    }
    assert(spark.conf.get(FieldIds.WriteKey) == "false")
    prevW match {
      case Some(v) => spark.conf.set(FieldIds.WriteKey, v)
      case None => spark.conf.unset(FieldIds.WriteKey)
    }
  }
}
