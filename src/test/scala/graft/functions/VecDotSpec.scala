package graft.functions

import org.apache.spark.sql.functions._

import graft.{GraftFunctions, SparkTestBase}
import graft.functions.expressions.VecDot

class VecDotSpec extends SparkTestBase {

  private def vdf = {
    GraftFunctions.register(spark)
    spark.createDataFrame(Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.0, 0.0), Seq(1.0, 1.0))))
      .toDF("id", "a", "b")
  }

  test("vec_dot computes the sequential dot product (codegen path)") {
    val out = vdf.select(col("id"), GraftFunctions.vecDot(col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 4.0 + 10.0 + 18.0)
    assert(out(2L) == 0.0)
  }

  test("vec_dot matches the HOF fold bit-for-bit on real embeddings") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cmp = e.select(
      GraftFunctions.vecDot(col("v"), col("v")).as("native"),
      Vectors.dot(col("v"), col("v")).as("hof"))
    assert(cmp.where(col("native") =!= col("hof")).count() == 0)
  }

  test("vec_dot is null when either side is null") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      "SELECT graft_vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS x")
    assert(df.head.isNullAt(0))
  }

  test("interpreted eval agrees with codegen") {
    val expr = VecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.5, 2.5), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(expr.eval(null) == 1.5 * 2.0 + 2.5 * 4.0)
  }

  test("sql-registered function resolves via the extensions hook") {
    // simulate the spark.sql.extensions path on the live session
    GraftFunctions.register(spark)
    val v = spark.sql("SELECT graft_vec_dot(array(1.0d,2.0d), array(3.0d,4.0d))")
      .head.getDouble(0)
    assert(v == 11.0)
  }
}
