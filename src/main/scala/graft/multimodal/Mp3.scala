package graft.multimodal

/** MPEG-audio fixture encoder — the authoring twin of
  * [[Multimodal.mp3FrameWalk]] (the Wav.encode / Mp4.encode pattern:
  * every decoder ships the encoder that proves it). Builds
  * spec-exact frame headers from the public tables; payload bytes are
  * deterministic filler (the walk never reads them).
  */
object Mp3 {

  /** One frame spec: MPEG version bits (3=MPEG1, 2=MPEG2, 0=MPEG2.5),
    * layer bits (3=L1, 2=L2, 1=L3), the 4-bit bitrate index, the
    * 2-bit sample-rate index, padding bit.
    */
  final case class FrameSpec(
      ver: Int,
      layerBits: Int,
      kbpsIdx: Int,
      srIdx: Int,
      pad: Int = 0,
      mono: Boolean = false)

  private val kbpsTables: ((Int, Int)) => Array[Int] = {
    case (3, 3) =>
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
        416, 448, 0)
    case (3, 2) =>
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        320, 384, 0)
    case (3, 1) =>
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
        256, 320, 0)
    case (_, 3) =>
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
        224, 256, 0)
    case _ =>
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
        160, 0)
  }

  private val sampleRates = Map(
    3 -> Array(44100, 48000, 32000),
    2 -> Array(22050, 24000, 16000),
    0 -> Array(11025, 12000, 8000))

  /** The frame's total byte length per the public layer formulas. */
  def frameLen(s: FrameSpec): Int = {
    val kbps = kbpsTables((s.ver, s.layerBits))(s.kbpsIdx)
    require(kbps > 0, s"bitrate index ${s.kbpsIdx} is free/invalid")
    val sr = sampleRates(s.ver)(s.srIdx)
    if (s.layerBits == 3) (12 * kbps * 1000 / sr + s.pad) * 4
    else if (s.layerBits == 2 || s.ver == 3) 144 * kbps * 1000 / sr + s.pad
    else 72 * kbps * 1000 / sr + s.pad
  }

  /** One complete frame: 4-byte header + filler to [[frameLen]]. */
  def frame(s: FrameSpec): Array[Byte] = {
    val len = frameLen(s)
    val out = new Array[Byte](len)
    out(0) = 0xFF.toByte
    out(1) = (0xE0 | (s.ver << 3) | (s.layerBits << 1) | 1).toByte
    out(2) = ((s.kbpsIdx << 4) | (s.srIdx << 2) | (s.pad << 1)).toByte
    out(3) = (if (s.mono) 0xC0 else 0x00).toByte
    var i = 4
    while (i < len) { out(i) = (i % 251).toByte; i += 1 }
    out
  }

  /** A complete file: optional ID3v2 preamble (header + `id3v2Pad`
    * zero bytes), the frames, optional 128-byte ID3v1 trailer.
    */
  def file(
      frames: Seq[FrameSpec],
      id3v2Pad: Int = -1,
      id3v1: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Pad >= 0) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      // syncsafe u28 size
      out.write(Array[Byte](
        ((id3v2Pad >> 21) & 0x7F).toByte, ((id3v2Pad >> 14) & 0x7F).toByte,
        ((id3v2Pad >> 7) & 0x7F).toByte, (id3v2Pad & 0x7F).toByte))
      out.write(new Array[Byte](id3v2Pad))
    }
    frames.foreach(f => out.write(frame(f)))
    if (id3v1) {
      val tag = new Array[Byte](128)
      tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
      out.write(tag)
    }
    out.toByteArray
  }
}
