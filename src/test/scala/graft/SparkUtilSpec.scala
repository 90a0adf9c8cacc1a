package graft

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SparkUtilSpec extends SparkTestBase {

  test("saltedJoin returns exactly the plain inner join's rows") {
    // heavily skewed: 900 of 1000 left rows share key 1
    val left = spark.range(0, 1000)
      .select(when(col("id") < 900, 1L).otherwise(col("id")).as("lk"),
        col("id").as("payload"))
    val right = spark.createDataFrame(
      Seq((1L, "hot"), (950L, "cold"), (999L, "cold2"), (12345L, "orphan")))
      .toDF("rk", "tag")
    val plain = left.join(right, col("lk") === col("rk"))
      .select("lk", "payload", "tag")
    val salted = SparkUtil.saltedJoin(left, right,
        col("lk"), col("rk"), saltFactor = 8)
      .select("lk", "payload", "tag")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("saltedJoin spreads a hot key over multiple salt values") {
    val left = spark.range(0, 1000).select(lit(1L).as("lk"))
    val right = spark.createDataFrame(Seq((1L, "x"))).toDF("rk", "tag")
    // inspect the salt distribution before the drop: rebuild inline
    val s = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
    val used = s.select("_salt").distinct().count()
    assert(used >= 6, s"salt only used $used of 8 values")
    assert(SparkUtil.saltedJoin(left, right, col("lk"), col("rk"), 8)
      .count() == 1000)
  }
}
