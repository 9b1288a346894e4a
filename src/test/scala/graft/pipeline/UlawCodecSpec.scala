package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The G.711 µ-law leg of the audio codec: the JDK's own companded →
  * linear converter must agree with [[Multimodal.UlawDecodeTable]]'s
  * closed form on ALL 256 byte values — that equality is what lets
  * q302's oracle recompute decoded samples from interpolated literals
  * while the engine decodes a real µ-law WAVE through the real codec.
  */
class UlawCodecSpec extends AnyFunSuite {

  test("JDK ULAW->PCM conversion equals the G.711 closed-form table on all 256 bytes") {
    val u = Array.tabulate(256)(_.toByte)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW,
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
      assert(got === Multimodal.UlawDecodeTable(b),
        s"ulaw byte $b: JDK=$got table=${Multimodal.UlawDecodeTable(b)}")
    }
  }

  test("synthUlawWav is a format-tag-7 WAVE that decodes to the table values") {
    val id = 42L
    val wav = Multimodal.synthUlawWav(id)
    // WAVE fmt chunk: format tag 7 = µ-law (bytes 20-21, little-endian)
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(((wav(20) & 0xff) | ((wav(21) & 0xff) << 8)) === 7)
    val raw = Multimodal.AudioCodec.decode(wav, "wav")
    val (rate, n) = Multimodal.AudioCodec.rawDims(raw)
    assert(rate === 8000)
    assert(n === 800 + (id % 5).toInt * 160)
    (0 until n).foreach { i =>
      val expect = Multimodal.UlawDecodeTable(((id * 131 + i * 7) % 256).toInt)
      assert(Multimodal.AudioCodec.rawSample(raw, i) === expect, s"sample $i")
    }
  }
}
