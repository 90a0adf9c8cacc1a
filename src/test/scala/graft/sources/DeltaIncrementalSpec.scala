package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DeltaIncrementalSpec extends SparkTestBase {

  private def fresh(): String =
    graft.ScratchSpace.dir(spark, "deltainc_")

  private def kv(lo: Int, hi: Int): DataFrame = {
    val ss = spark
    import ss.implicits._
    (lo until hi).map(i => (i.toLong, s"row$i")).toDF("k", "name")
  }

  test("drain consumes each version once; markers advance AFTER " +
    "process; crash replay re-feeds the unmarked version") {
    val src = fresh()
    val ckpt = fresh()
    DeltaWrite.append(kv(0, 3), src): Unit
    DeltaWrite.append(kv(3, 5), src): Unit
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def proc(df: DataFrame, v: Long): Unit =
      seen += ((v, df.count()))
    val r1 = DeltaIncremental.drain(spark, src, ckpt, proc)
    assert(r1.processedVersions == Seq(0L, 1L))
    assert(seen.toSeq == Seq((0L, 3L), (1L, 2L)))
    // nothing pending: drain is a no-op
    assert(DeltaIncremental.drain(spark, src, ckpt, proc)
      .processedVersions.isEmpty)
    assert(seen.size == 2)
    // crash simulation: marker for v1 vanishes -> v1 re-feeds
    val fs = new Path(ckpt).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(fs.delete(new Path(ckpt,
      "offsets/v00000000000000000001"), false))
    val r2 = DeltaIncremental.drain(spark, src, ckpt, proc)
    assert(r2.processedVersions == Seq(1L) && seen.size == 3)
    // new appends drain incrementally
    DeltaWrite.append(kv(5, 9), src): Unit
    val r3 = DeltaIncremental.drain(spark, src, ckpt, proc)
    assert(r3.processedVersions == Seq(2L) &&
      seen.last == ((2L, 4L)))
  }

  test("a failing process leaves the cursor BEHIND the version " +
    "(replay, never skip); non-append commits refuse like " +
    "readChanges; version batches carry __commit_version") {
    val src = fresh()
    val ckpt = fresh()
    DeltaWrite.append(kv(0, 3), src): Unit
    var calls = 0
    intercept[RuntimeException] {
      DeltaIncremental.drain(spark, src, ckpt, (_, _) => {
        calls += 1; sys.error("sink down")
      })
    }
    assert(calls == 1)
    // the version replays on the next drain
    val r = DeltaIncremental.drain(spark, src, ckpt, (df, v) => {
      assert(df.columns.contains("__commit_version"))
      assert(df.select("__commit_version").distinct().collect()
        .map(_.getLong(0)).toSeq == Seq(v))
    })
    assert(r.processedVersions == Seq(0L))
    // an update-shape commit (merge) refuses mid-drain — never a
    // silent skip
    val ss = spark
    import ss.implicits._
    DeltaWrite.merge(Seq((1L, "UPD")).toDF("k", "name"), src,
      Seq("k")): Unit
    val e = intercept[IllegalArgumentException] {
      DeltaIncremental.drain(spark, src, ckpt, (_, _) => ())
    }
    assert(e.getMessage.contains("REMOVES data"), e.getMessage)
  }
}
