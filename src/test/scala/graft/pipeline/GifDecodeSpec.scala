package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** [[Multimodal.synthGif]] + the shared ImageCodec path: the payload
  * must be a genuine GIF container (byte signature), and because the
  * grayscale source fits the palette exactly, the LZW round trip must
  * reproduce EVERY pixel of the closed-form polynomial — the property
  * that lets q209 gate on exact sums where q201 (JPEG) needs a band.
  */
class GifDecodeSpec extends AnyFunSuite {

  test("payload carries the GIF signature") {
    Seq(0L, 7L, 123L).foreach { id =>
      val p = Multimodal.synthGif(id)
      val sig = new String(p.take(6), "US-ASCII")
      assert(sig == "GIF89a" || sig == "GIF87a", s"id=$id sig=$sig")
    }
  }

  test("LZW round trip is pixel-exact against the polynomial") {
    Seq(0L, 5L, 31L, 199L).foreach { id =>
      val raw = Multimodal.ImageCodec.decode(Multimodal.synthGif(id), "gif")
      val (w, h) = Multimodal.ImageCodec.rawDims(raw)
      assert(w == 16 + (id % 16).toInt && h == 16 + (id % 8).toInt)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val (r, g, b) = Multimodal.ImageCodec.rawPixel(raw, x, y)
        assert(r == v && g == v && b == v,
          s"id=$id pixel ($x,$y): want gray $v, got ($r,$g,$b)")
      }
    }
  }
}
