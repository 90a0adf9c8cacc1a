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

  test("deltaRecompute reuses unchanged partitions and recomputes changed ones") {
    val ss = spark
    import ss.implicits._
    val oldDf = Seq(
      ("2024-01", 1L, 100L), ("2024-01", 2L, 250L),
      ("2024-02", 3L, 50L), ("2024-02", 4L, 75L),
      ("2024-03", 5L, 10L) // this partition vanishes in the new snapshot
    ).toDF("m", "k", "c")
    val newDf = Seq(
      ("2024-01", 1L, 100L), ("2024-01", 2L, 250L), // unchanged
      ("2024-02", 3L, 50L), // row 4 deleted -> changed
      ("2024-04", 6L, 33L) // brand-new partition
    ).toDF("m", "k", "c")
    val dig = graft.functions.Hashes.hash60(
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.col("k").cast("string"),
        org.apache.spark.sql.functions.lit("#"),
        org.apache.spark.sql.functions.col("c").cast("string")), seed = 7)
    val out = Incremental.deltaRecompute(
        oldDf, newDf, org.apache.spark.sql.functions.col("m"), dig,
        org.apache.spark.sql.functions.col("c"))
      .orderBy("period").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      ("2024-01", 2L, 350L, 0), // digest match: previous state reused
      ("2024-02", 1L, 50L, 1), // deletion detected, re-aggregated
      ("2024-04", 1L, 33L, 1))) // new partition always recomputes
    // vanished 2024-03 is dropped, and totals equal a direct aggregate
    assert(out.map(_._3).sum == 433L)
  }

  test("deltaRecompute flags a same-count content change via the sum digest") {
    val ss = spark
    import ss.implicits._
    val oldDf = Seq(("2024-01", 1L, 100L)).toDF("m", "k", "c")
    val newDf = Seq(("2024-01", 1L, 999L)).toDF("m", "k", "c") // value edit
    val dig = graft.functions.Hashes.hash60(
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.col("k").cast("string"),
        org.apache.spark.sql.functions.lit("#"),
        org.apache.spark.sql.functions.col("c").cast("string")), seed = 7)
    val out = Incremental.deltaRecompute(
        oldDf, newDf, org.apache.spark.sql.functions.col("m"), dig,
        org.apache.spark.sql.functions.col("c")).collect()
    assert(out.length == 1)
    assert(out.head.getInt(3) == 1) // row count equal, content differs
    assert(out.head.getLong(2) == 999L)
  }

  test("deltaRecompute catches an even-multiplicity swap (xor blind spot)") {
    val ss = spark
    import ss.implicits._
    // {a,a} -> {b,b}: same row count, and a xor digest would cancel
    // (a ^ a = 0 = b ^ b); the duplicate-sensitive sum digest differs
    // by 2(h_b - h_a) and must flag the partition changed.
    val oldDf = Seq(("2024-01", 1L, 100L), ("2024-01", 1L, 100L))
      .toDF("m", "k", "c")
    val newDf = Seq(("2024-01", 2L, 100L), ("2024-01", 2L, 100L))
      .toDF("m", "k", "c")
    val dig = graft.functions.Hashes.hash60(
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.col("k").cast("string"),
        org.apache.spark.sql.functions.lit("#"),
        org.apache.spark.sql.functions.col("c").cast("string")), seed = 7)
    val out = Incremental.deltaRecompute(
        oldDf, newDf, org.apache.spark.sql.functions.col("m"), dig,
        org.apache.spark.sql.functions.col("c")).collect()
    assert(out.length == 1)
    assert(out.head.getInt(3) == 1) // sum digest catches the swap
    assert(out.head.getLong(1) == 2L && out.head.getLong(2) == 200L)
  }
}
