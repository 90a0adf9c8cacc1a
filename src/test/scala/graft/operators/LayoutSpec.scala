package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {

  test("zValue matches the reference Morton interleave") {
    val ss = spark
    import ss.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
      }
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L),
      (170L, 85L), (85L, 170L), (200L, 13L), (7L, 255L))
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue(col("x"), col("y"), 8).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (x, y, z) => assert(z == ref(x, y, 8)) }
    // canonical corners: (1,0) -> bit 1, (0,1) -> bit 0
    assert(ref(1, 0, 8) == 2L && ref(0, 1, 8) == 1L)
  }

  test("z-range buckets bound BOTH dimensions (the zone-map guarantee)") {
    val ss = spark
    import ss.implicits._
    // the full 256x256 grid: 32 z-slices of 2048 cells each fix x bits
    // {7,6,5} and y bits {7,6}, so per-bucket spans are <= 31 and <= 63
    // while the global span is 255 on both — a single-column sort
    // would leave one dimension at full range in every slice
    val grid = ss.range(0, 65536L)
      .select((col("id") / 256).cast("long").as("x"),
        (col("id") % 256).as("y"))
    val stats = Layout.zorderStats(grid, "x", "y", bits = 8, buckets = 32)
      .collect()
    assert(stats.length == 32)
    stats.foreach { r =>
      assert(r.getLong(1) == 2048L)
      assert(r.getLong(3) - r.getLong(2) <= 31L)
      assert(r.getLong(5) - r.getLong(4) <= 63L)
    }
  }

  test("skippingAudit: hand-checked blocks, skipping, amplification") {
    val ss = spark
    import ss.implicits._
    // 10 rows, blockRows=4: blocks [0..3]=p 0..3, [4..7]=p 40..43,
    // [8..9]=p 80,81 when laid out by id
    val df = (0 until 10).map(i => (i.toLong, (i / 4) * 40L + i % 4))
      .toDF("id", "p")
    val out = Layout.skippingAudit(df, Seq(col("id")), col("p"),
        blockRows = 4,
        predicates = Seq((1, 0L, 3L), (2, 41L, 99L), (3, 500L, 600L)))
      .orderBy("pred_id").collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4), r.getLong(6),
        r.getLong(7)))
    assert(out.toSeq == Seq(
      (1, 3L, 2L, 4L, 4L), // only block 0 scanned; its 4 rows all match
      (2, 3L, 1L, 6L, 5L), // blocks 1,2 scanned (6 rows), 5 match
      (3, 3L, 3L, 0L, 0L))) // nothing overlaps: all skipped
    // layout-order independence of the TILING: a shuffled input
    // produces identical blocks because rank is by the layout keys
    val shuffled = Layout.skippingAudit(df.repartition(7), Seq(col("id")),
        col("p"), 4, Seq((1, 0L, 3L), (2, 41L, 99L), (3, 500L, 600L)))
      .orderBy("pred_id").collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4), r.getLong(6),
        r.getLong(7)))
    assert(shuffled.toSeq == out.toSeq)
  }
}
