package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{AviCodec, Multimodal}

/** Golden-bytes proof for video: the hand-built uncompressed-AVI encoder
  * and the RIFF chunk-walking decoder are cross-validated structurally
  * (the walker parses the chunk tree generically — it shares no offset
  * table with the encoder) and pixel-for-pixel against an independent
  * recomputation of every frame's luminance sum. */
class AviCodecSpec extends AnyFunSuite {

  test("encode round-trips through the chunk walker frame-for-frame") {
    val w = 9; val h = 5 // 3*9=27 -> rows padded 27->28: exercises padding
    val frames = Seq.tabulate(4)(f => (x: Int, y: Int) => (f * 50 + x + 3 * y) % 256)
    val v = AviCodec.decode(AviCodec.encode(w, h, frames)).get
    assert(v.width == w && v.height == h && v.lumaSums.length == 4)
    val expect = frames.map { f =>
      (for (x <- 0 until w; y <- 0 until h) yield f(x, y).toLong).sum
    }
    assert(v.lumaSums.toSeq == expect)
  }

  test("file size matches the RIFF layout formula") {
    for ((w, nf) <- Seq((8, 1), (10, 3), (12, 6))) {
      val h = 6
      val row = (3 * w + 3) / 4 * 4
      val avi = AviCodec.encode(w, h, Seq.fill(nf)((_, _) => 7))
      assert(avi.length == 224 + nf * (8 + h * row))
    }
  }

  test("decodeVideo samples every stride-th frame") {
    // frame f has constant level f+1 over a 4x4 raster -> sum 16*(f+1)
    val avi = AviCodec.encode(4, 4, Seq.tabulate(5)(f => (_, _) => f + 1))
    val v = Multimodal.decodeVideo(avi, stride = 2).get
    assert(v.width == 4L && v.height == 4L && v.n_frames == 5L)
    assert(v.sampled_luma_sum == 16L * (1 + 3 + 5))
  }

  test("decode returns None for non-video payloads") {
    assert(AviCodec.decode("not an avi".getBytes).isEmpty)
    // other REAL media types must not cross into the video kernel
    assert(AviCodec.decode(
      graft.multimodal.BmpCodec.encode(4, 4, (_, _) => 128)).isEmpty)
    assert(AviCodec.decode(
      graft.multimodal.WavCodec.encode(Array[Short](1, 2, 3), 8000)).isEmpty)
  }

  test("decode survives truncated and corrupted bytes without throwing") {
    val avi = AviCodec.encode(8, 6, Seq.fill(3)((_, _) => 42))
    for (cut <- Seq(4, 11, 20, 100, avi.length - 3)) {
      AviCodec.decode(avi.take(cut)) // must not throw; None or partial ok
    }
    val corrupt = avi.clone()
    corrupt(16) = 'X'.toByte // clobber a header fourcc
    AviCodec.decode(corrupt) // must not throw
  }
}
