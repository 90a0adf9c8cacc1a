package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SURVEY.md §4: bucketing for co-located joins. Two tables bucketed
  * 8 ways on the join key join WITHOUT any Exchange in the plan — the
  * bucketed scan already provides the hash distribution, so at 100 TB
  * the recurring fact-fact join skips its dominant shuffle entirely.
  */
class BucketingSpec extends SparkTestBase {

  test("tables bucketed on the join key join with zero shuffles") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf001/lineitem.parquet")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
      orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_b_orders")
      lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_b_lineitem")
      val joined = spark.table("graft_b_orders")
        .join(spark.table("graft_b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      // and it is still a correct join
      val n = joined.count()
      val expected = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    }
  }
}
