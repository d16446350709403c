package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{BmpCodec, Multimodal}

/** Golden-bytes proof: the hand-built BMP encoder and the engine's decode
  * path are cross-validated against the JDK's OWN ImageIO reference
  * decoder, pixel for pixel, at every row-padding remainder. */
class BmpCodecSpec extends AnyFunSuite {

  test("encode round-trips through the JDK ImageIO decoder pixel-for-pixel") {
    // widths 5..8 cover every 4-byte row-padding remainder of 3*w
    for (w <- 5 to 8; h <- Seq(3, 8)) {
      def gray(x: Int, y: Int): Int = (11 * x + 7 * y + w + h) % 256
      val bytes = BmpCodec.encode(w, h, gray)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"${w}x$h: ImageIO rejected the encoding")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        assert(r == gray(x, y) && g == gray(x, y) && b == gray(x, y),
          s"${w}x$h pixel ($x,$y): got ($r,$g,$b), want ${gray(x, y)}")
      }
    }
  }

  test("file size matches the BMP layout formula") {
    for (w <- 1 to 9) {
      val bytes = BmpCodec.encode(w, 4, (_, _) => 0)
      assert(bytes.length == 54 + 4 * ((3 * w + 3) / 4 * 4))
    }
  }

  test("decodeImage extracts real decoded properties") {
    val bytes = BmpCodec.encode(6, 2, (x, y) => 10 * x + y)
    val f = Multimodal.decodeImage(bytes).get
    assert(f.width == 6 && f.height == 2)
    // sum of gray values: x in 0..5, y in 0..1 of 10x+y
    val expected = (for (x <- 0 until 6; y <- 0 until 2) yield 10 * x + y).sum
    assert(f.brightness_sum == expected)
  }

  test("decodeImage returns None for non-media payloads (stub-path routing)") {
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
  }

  test("resizeImage is the exact nearest-neighbor pixel map (factor 2 and 3)") {
    def gray(x: Int, y: Int): Int = (13 * x + 5 * y + 1) % 256
    val src = BmpCodec.encode(9, 7, gray)
    for (f <- Seq(2, 3)) {
      val r = Multimodal.resizeImage(src, f).get
      val (ow, oh) = (9 / f, 7 / f)
      assert(r.src_w == 9 && r.src_h == 7 && r.out_w == ow && r.out_h == oh)
      assert(r.out_bytes == 54 + oh * ((3 * ow + 3) / 4 * 4))
      val expected =
        (for (x <- 0 until ow; y <- 0 until oh) yield gray(f * x, f * y)).sum
      assert(r.out_brightness_sum == expected,
        s"factor $f: got ${r.out_brightness_sum}, want $expected")
    }
  }

  test("resizeImage refuses non-images and sub-pixel outputs") {
    assert(Multimodal.resizeImage("not an image".getBytes, 2).isEmpty)
    // 3x3 at factor 4 has no complete output pixel
    assert(Multimodal.resizeImage(
      BmpCodec.encode(3, 3, (_, _) => 1), 4).isEmpty)
  }
}
