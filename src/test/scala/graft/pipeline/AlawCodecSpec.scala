package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The G.711 A-law leg of the audio codec (the µ-law UlawCodecSpec
  * contract, second companded format): the JDK's own converter must
  * agree with [[Multimodal.AlawDecodeTable]]'s closed form on ALL 256
  * byte values — the equality that lets q326's oracle recompute
  * decoded samples from interpolated literals while the engine decodes
  * a real A-law WAVE through the real codec.
  */
class AlawCodecSpec extends AnyFunSuite {

  test("JDK ALAW->PCM conversion equals the G.711 closed-form table on all 256 bytes") {
    val u = Array.tabulate(256)(_.toByte)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ALAW,
      8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(u), fmt, 256L)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false), ais).readAllBytes()
    assert(pcm.length === 512)
    (0 until 256).foreach { b =>
      val got = ((pcm(b * 2) & 0xff) | (pcm(b * 2 + 1) << 8)).toShort.toInt
      assert(got === Multimodal.AlawDecodeTable(b),
        s"alaw byte $b: JDK=$got table=${Multimodal.AlawDecodeTable(b)}")
    }
  }

  test("synthAlawWav is a format-tag-6 WAVE that decodes to the table values") {
    val id = 42L
    val wav = Multimodal.synthAlawWav(id)
    // WAVE fmt chunk: format tag 6 = A-law (bytes 20-21, little-endian)
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(((wav(20) & 0xff) | ((wav(21) & 0xff) << 8)) === 6)
    val raw = Multimodal.AudioCodec.decode(wav, "wav")
    val (rate, n) = Multimodal.AudioCodec.rawDims(raw)
    assert(rate === 8000)
    assert(n === 800 + (id % 5).toInt * 160)
    (0 until n).foreach { i =>
      val expect = Multimodal.AlawDecodeTable(((id * 131 + i * 7) % 256).toInt)
      assert(Multimodal.AudioCodec.rawSample(raw, i) === expect, s"sample $i")
    }
  }
}
