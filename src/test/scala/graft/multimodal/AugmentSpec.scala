package graft.multimodal

import graft.SparkTestBase

class AugmentSpec extends SparkTestBase {

  private def raster(w: Int, h: Int): PngRaster = {
    val rgba = new Array[Byte](4 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = 4 * (y * w + x)
      rgba(p) = (10 * x + y).toByte
      rgba(p + 1) = (100 + x).toByte
      rgba(p + 2) = (200 - y).toByte
      rgba(p + 3) = 255.toByte
    }
    PngRaster(w, h, rgba)
  }

  private def px(r: PngRaster, x: Int, y: Int): Seq[Int] =
    (0 until 4).map(i => r.rgba(4 * (y * r.width + x) + i) & 0xFF)

  test("flips are involutions and exact permutations") {
    val r = raster(5, 4)
    val h = Multimodal.flipH(r)
    assert(px(h, 0, 2) == px(r, 4, 2))
    assert(px(h, 3, 0) == px(r, 1, 0))
    assert(Multimodal.flipH(h).rgba.toSeq == r.rgba.toSeq)
    val v = Multimodal.flipV(r)
    assert(px(v, 2, 0) == px(r, 2, 3))
    assert(Multimodal.flipV(v).rgba.toSeq == r.rgba.toSeq)
    // permutation: multiset of bytes unchanged
    assert(h.rgba.sorted.toSeq == r.rgba.sorted.toSeq)
  }

  test("crop extracts the exact box; out-of-bounds declines") {
    val r = raster(4, 3)
    val c = Multimodal.crop(r, 1, 1, 2, 2).get
    assert(c.width == 2 && c.height == 2)
    assert(px(c, 0, 0) == px(r, 1, 1))
    assert(px(c, 1, 1) == px(r, 2, 2))
    assert(Multimodal.crop(r, 3, 0, 2, 1).isEmpty) // x overrun
    assert(Multimodal.crop(r, 0, 2, 1, 2).isEmpty) // y overrun
    assert(Multimodal.crop(r, -1, 0, 2, 2).isEmpty)
    assert(Multimodal.crop(r, 0, 0, 0, 1).isEmpty)
    assert(Multimodal.crop(r, 0, 0, 4, 3).get.rgba.toSeq == r.rgba.toSeq)
  }

  test("mirror law: left-crop of flipH == flipH of right-crop") {
    val r = raster(6, 3)
    val a = Multimodal.crop(Multimodal.flipH(r), 0, 0, 2, 3).get
    val b = Multimodal.flipH(Multimodal.crop(r, 4, 0, 2, 3).get)
    assert(a.rgba.toSeq == b.rgba.toSeq)
  }
}
