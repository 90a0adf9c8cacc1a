package graft.multimodal

import graft.SparkTestBase

class Mp4Spec extends SparkTestBase {

  private def mdatPayloadStart(mp4: Array[Byte]): Long = {
    val idx = mp4.indexOfSlice("mdat".getBytes("US-ASCII"))
    assert(idx > 0, "no mdat box")
    (idx + 4).toLong
  }

  test("keyframes: timestamps, offsets and sizes from the stbl walk") {
    val mp4 = Mp4.encode(
      timescale = 1000,
      deltas = Array(100, 100, 100, 100, 100, 100),
      sampleSizes = Array(10, 20, 30, 40, 50, 60),
      samplesPerChunk = 2,
      syncSamples = Array(1, 3, 5))
    val s = mdatPayloadStart(mp4)
    val kfs = Mp4.keyframes(mp4).get
    // chunks: (1,2) at s, (3,4) at s+30, (5,6) at s+100
    assert(kfs.map(f => (f.index, f.sampleNo, f.tsMs, f.byteOffset,
      f.byteSize)) == Seq(
      (0, 1, 0L, s, 10L),
      (1, 3, 200L, s + 30, 30L),
      (2, 5, 400L, s + 100, 50L)))
    // intra-chunk keyframe: offset adds the preceding sample's size
    val mid = Mp4.keyframes(Mp4.encode(1000,
      Array(100, 100, 100, 100), Array(10, 20, 30, 40), 2,
      Array(2, 4))).get
    val s2 = mdatPayloadStart(Mp4.encode(1000,
      Array(100, 100, 100, 100), Array(10, 20, 30, 40), 2,
      Array(2, 4)))
    assert(mid.map(f => (f.sampleNo, f.tsMs, f.byteOffset, f.byteSize)) ==
      Seq((2, 100L, s2 + 10, 20L), (4, 300L, s2 + 30 + 30, 40L)))
  }

  test("keyframes: everyK/maxFrames subsampling, mixed stts runs") {
    // varying deltas exercise the run-length stts encoding
    val mp4 = Mp4.encode(90000,
      deltas = Array(3000, 3000, 6000, 3000, 3000, 3000, 6000, 6000),
      sampleSizes = Array.fill(8)(100),
      samplesPerChunk = 3,
      syncSamples = Array(1, 2, 4, 6, 8))
    val every2 = Mp4.keyframes(mp4, everyK = 2, maxFrames = 8).get
    assert(every2.map(_.sampleNo) == Seq(1, 4, 8))
    // ts of sample 4 = 3000+3000+6000 = 12000 -> 133 ms at 90 kHz
    assert(every2.map(_.tsMs) == Seq(0L, 12000L * 1000 / 90000,
      27000L * 1000 / 90000))
    val capped = Mp4.keyframes(mp4, everyK = 1, maxFrames = 2).get
    assert(capped.map(_.sampleNo) == Seq(1, 2))
  }

  test("keyframes agree with the metadata walker; corrupt-safe") {
    val mp4 = Mp4.encode(600, Array(60, 60, 60), Array(7, 8, 9), 1,
      Array(1))
    // the q71-era box walker reads the same moov: 64x48, 300 ms
    val ss = spark
    import ss.implicits._
    val meta = Multimodal.extractFeatures(
      Seq(MediaRecord(1L, mp4, "video/mp4")).toDS()).collect()(0)
    assert(meta.width.contains(64) && meta.height.contains(48))
    assert(meta.duration_ms.contains(300L))
    // never throws on truncation or bit flips; declines cleanly
    for (cut <- 0 until mp4.length) Mp4.keyframes(mp4.take(cut)): Unit
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 2000) {
      val flip = mp4.clone()
      flip(rnd.nextInt(flip.length)) =
        (flip(rnd.nextInt(flip.length)) ^ (1 << rnd.nextInt(8))).toByte
      Mp4.keyframes(flip): Unit
    }
    assert(Mp4.keyframes("not an mp4 at all".getBytes).isEmpty)
    // sync sample out of range declines
    assert(Mp4.keyframes(Mp4.encode(600, Array(60), Array(7), 1,
      Array(2))).isEmpty)
  }

  test("sampleMp4Keyframes: dataset pass, nulls for corrupt rows") {
    val ss = spark
    import ss.implicits._
    val good = Mp4.encode(1000, Array(500, 500), Array(11, 13), 2,
      Array(1, 2))
    val s = mdatPayloadStart(good)
    val rows = Multimodal.sampleMp4Keyframes(
      Seq(
        MediaRecord(1L, good, "video/mp4"),
        MediaRecord(2L, good.dropRight(9), "video/mp4"),
        MediaRecord(3L, Array[Byte](1, 2, 3), "application/octet-stream")).toDS())
      .orderBy("doc_id", "frame_idx")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5))))
      .toSeq
    assert(rows == Seq(
      (1L, Some(0), Some(0L), Some(s), Some(11L)),
      (1L, Some(1), Some(500L), Some(s + 11), Some(13L)),
      (2L, None, None, None, None),
      (3L, None, None, None, None)))
  }
}
