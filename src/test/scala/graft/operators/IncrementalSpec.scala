package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IncrementalSpec extends SparkTestBase {

  private def raw = {
    val ss = spark
    import ss.implicits._
    Seq(
      ("2024-01-03", "O", 10.00),
      ("2024-01-03", "O", 2.50),
      ("2024-01-07", "O", 99.99),
      ("2024-01-07", "F", 1.00),
      ("2024-02-01", "O", 5.25),
      ("2024-02-15", "F", 0.01)
    ).toDF("day", "status", "price")
  }

  test("merged daily state equals a from-scratch monthly aggregate") {
    val state = Incremental.buildState(
      raw, col("day"), Seq("status"),
      floor(col("price") * 100.0 + 0.5).cast("long"))
    val monthly = Incremental.mergeState(
        state, substring(col("period"), 1, 7), Seq("status"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    val direct = raw
      .groupBy(substring(col("day"), 1, 7).as("m"), col("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("price") * 100.0 + 0.5).cast("long")).as("s"),
        min(floor(col("price") * 100.0 + 0.5).cast("long")).as("mn"),
        max(floor(col("price") * 100.0 + 0.5).cast("long")).as("mx"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    assert(monthly.toSeq == direct.toSeq)
  }

  test("state stays mergeable: month state re-merges to lifetime exactly") {
    val state = Incremental.buildState(
      raw, col("day"), Seq("status"),
      floor(col("price") * 100.0 + 0.5).cast("long"))
    val monthly = Incremental.mergeState(
      state, substring(col("period"), 1, 7), Seq("status"))
    val lifetime = Incremental.mergeState(
        monthly, lit("all"), Seq("status"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // O: 4 orders, cents 1000+250+9999+525; F: 2 orders, 100+1
    assert(lifetime.toSeq ==
      Seq(("F", 2L, 101L), ("O", 4L, 11774L)))
  }
}
