package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MetaSpec extends SparkTestBase {

  test("footerStats reproduces per-partition count/min/max from footers only") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("meta_spec_").toString
    val df = Seq(
      ("a", 1.5), ("a", -2.0), ("a", 7.25), ("b", 100.0), ("b", 3.0)
    ).toDF("k", "v")
    df.repartition(col("k"))
      .write.mode("overwrite").partitionBy("k").parquet(s"file:$dir/t")

    val stats = Meta.footerStats(spark, s"file:$dir/t", "v")
      .groupBy("part")
      .agg(sum("n_rows").as("n"), min("min_v").as("mn"), max("max_v").as("mx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(stats.toSeq ==
      Seq(("a", 3L, -2.0, 7.25), ("b", 2L, 3.0, 100.0)))
  }

  test("footerStats keeps row counts when a chunk has no statistics") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("meta_spec_null_").toString
    // all-null value chunk: stats carry no min/max but the row count
    // must still be exact
    Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "v")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"file:$dir/t")
    val rows = Meta.footerStats(spark, s"file:$dir/t", "v").collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 2L)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("min_v"))))
  }

  test("footerStats walks a nested many-file tree from one driver listing page") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("meta_spec_tree_").toString
    // two partition levels x several files per leaf: the driver lists
    // ONLY the first level (d=...); executors expand each subtree
    val df = ss.range(0, 400)
      .select(col("id"),
        (col("id") % 4).as("d"), (col("id") % 2).as("e"),
        (col("id").cast("double") * 1.5).as("v"))
    df.repartition(5)
      .write.mode("overwrite").partitionBy("d", "e").parquet(s"file:$dir/t")
    val stats = Meta.footerStats(spark, s"file:$dir/t", "v")
    assert(stats.agg(sum("n_rows")).head().getLong(0) == 400L)
    // leaf-dir partition value comes from the TRAILING key=value segment
    assert(stats.select("part").distinct().collect()
      .map(_.getString(0)).sorted.toSeq == Seq("0", "1"))
    assert(stats.agg(min("min_v"), max("max_v")).head()
      == org.apache.spark.sql.Row(0.0, 399 * 1.5))
  }

  test("footerStats reports null bounds for string statistics, keeps counts") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("meta_spec_str_").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "s")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"file:$dir/t")
    // string/binary chunk statistics are not Numbers: min/max are null
    // rather than a ClassCastException, row counts stay exact
    val rows = Meta.footerStats(spark, s"file:$dir/t", "s").collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 2L)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("min_v"))
      && r.isNullAt(r.fieldIndex("max_v"))))
  }

  test("footerStats throws on a column absent from the footer") {
    val ss = spark
    import ss.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("meta_spec_missing_").toString
    Seq((1L, 2.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"file:$dir/t")
    val ex = intercept[org.apache.spark.SparkException] {
      Meta.footerStats(spark, s"file:$dir/t", "nope").collect()
    }
    assert(ex.getMessage != null)
  }
}
