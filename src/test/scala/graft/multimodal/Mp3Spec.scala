package graft.multimodal

import graft.SparkTestBase
import graft.multimodal.Mp3.FrameSpec

class Mp3Spec extends SparkTestBase {

  private def walk(bytes: Array[Byte], everyK: Int = 1, max: Int = 16) =
    Multimodal.mp3FrameWalk(bytes, everyK, max)

  test("CBR walk with ID3v2 preamble and ID3v1 trailer") {
    val f = Mp3.file(Seq(
      FrameSpec(3, 1, 9, 0, pad = 0),
      FrameSpec(3, 1, 9, 0, pad = 1),
      FrameSpec(3, 1, 9, 0, pad = 0)),
      id3v2Pad = 20, id3v1 = true)
    val out = walk(f).get
    assert(out.map(_.offset) == Seq(30L, 447L, 865L))
    assert(out.map(_.size) == Seq(417, 418, 417))
    assert(out.forall(fr =>
      fr.kbps == 128 && fr.sampleRate == 44100 && fr.samples == 1152))
    assert(out.map(_.frameNo) == Seq(1, 2, 3))
  }

  test("VBR walk: every frame carries its own bitrate") {
    val f = Mp3.file(Seq(
      FrameSpec(3, 1, 9, 0), FrameSpec(3, 1, 5, 0), FrameSpec(3, 1, 10, 0)))
    val out = walk(f).get
    assert(out.map(_.size) == Seq(417, 208, 522))
    assert(out.map(_.kbps) == Seq(128, 64, 160))
    assert(out.map(_.offset) == Seq(0L, 417L, 625L))
  }

  test("layer formulas: L1 quadruples, MPEG2.5 L3 halves") {
    val l1 = walk(Mp3.file(Seq(FrameSpec(3, 3, 4, 1)))).get.head
    assert(l1.size == 128 && l1.samples == 384 && l1.sampleRate == 48000)
    val l3lo = walk(Mp3.file(Seq(
      FrameSpec(0, 1, 5, 2, mono = true),
      FrameSpec(0, 1, 5, 2, mono = true)))).get
    assert(l3lo.map(_.size) == Seq(360, 360))
    assert(l3lo.head.samples == 576 && l3lo.head.sampleRate == 8000)
    val l2 = walk(Mp3.file(Seq(FrameSpec(3, 2, 8, 0)))).get.head
    assert(l2.size == 417 && l2.samples == 1152)
  }

  test("everyK + maxFrames sampling") {
    val f = Mp3.file((0 until 10).map(_ => FrameSpec(3, 1, 9, 0)))
    val out = walk(f, everyK = 3, max = 3).get
    assert(out.map(_.frameNo) == Seq(1, 4, 7))
    assert(walk(f, everyK = 1, max = 4).get.map(_.frameNo) ==
      Seq(1, 2, 3, 4))
  }

  test("mid-stream violations decline the whole file") {
    val good = Mp3.file(Seq(FrameSpec(3, 1, 9, 0), FrameSpec(3, 1, 5, 0)))
    // truncation inside the last frame
    assert(walk(good.dropRight(50)).isEmpty)
    // garbage between frames
    val gap = good.take(417) ++ Array[Byte](0, 0, 0, 0) ++ good.drop(417)
    assert(walk(gap).isEmpty)
    // free-format bitrate index
    val free = good.clone(); free(2) = ((0 << 4) | (0 << 2)).toByte
    assert(walk(free).isEmpty)
    // reserved version bits
    val rv = good.clone(); rv(1) = (0xE0 | (1 << 3) | (1 << 1) | 1).toByte
    assert(walk(rv).isEmpty)
  }

  test("mp3FrameIndex over a media frame: rows + decline row") {
    val ss = spark
    import ss.implicits._
    val mdir = graft.ScratchSpace.dir(spark, "mp3spec_")
    graft.ScratchSpace.writeBytes(spark, mdir, "fr_1.mp3",
      Mp3.file(Seq(FrameSpec(3, 1, 9, 0))))
    graft.ScratchSpace.writeBytes(spark, mdir, "fr_2.mp3",
      Mp3.file(Seq(FrameSpec(3, 1, 9, 0))).dropRight(10))
    val out = Multimodal.mp3FrameIndex(
      Multimodal.readBinaryDir(spark, mdir,
        idFromPath = Multimodal.digitId).as[MediaRecord])
      .orderBy("doc_id", "frame_no")
      .collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getInt(1) == 1)
    assert(out(0).getLong(3) == 417L)
    assert(out(1).getLong(0) == 2L && out(1).isNullAt(1))
    (1 until out(1).length).foreach(i => assert(out(1).isNullAt(i)))
  }
}
