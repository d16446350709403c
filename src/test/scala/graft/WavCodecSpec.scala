package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Multimodal, WavCodec}

/** Golden-bytes proof for audio: the hand-built WAV encoder and the
  * engine's decode path are cross-validated against the JDK's OWN
  * javax.sound.sampled reference decoder, sample for sample. */
class WavCodecSpec extends AnyFunSuite {

  test("encode round-trips through the JDK audio decoder sample-for-sample") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7, -1)
    val wav = WavCodec.encode(samples, 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    assert(in.getFrameLength == samples.length)
    val bytes = in.readAllBytes()
    val decoded = Array.tabulate(samples.length) { i =>
      (((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)).toShort
    }
    assert(decoded.toSeq == samples.toSeq)
  }

  test("file size matches the WAV layout formula") {
    for (n <- Seq(1, 16, 129)) {
      val wav = WavCodec.encode(Array.fill[Short](n)(5), 8000)
      assert(wav.length == 44 + 2 * n)
    }
  }

  test("decodeAudio extracts real decoded properties (exact integer sum)") {
    val samples = Array[Short](10, -20, 30, -40)
    val f = Multimodal.decodeAudio(WavCodec.encode(samples, 16000)).get
    assert(f.sample_rate == 16000L)
    assert(f.n_frames == 4L)
    assert(f.sum_abs == 100L)
  }

  test("audioFrameFeatures frames the decoded PCM with exact integer algebra") {
    // 2 complete 4-sample frames + a 1-sample tail that must be dropped
    val samples = Array[Short](1, -2, 3, -4, /*frame 2*/ 5, 5, -5, 0, /*tail*/ 9)
    val f = Multimodal.audioFrameFeatures(
      WavCodec.encode(samples, 8000), frameLen = 4).get
    assert(f.n_frames == 2L)
    // frame energies: 1+4+9+16 = 30; 25+25+25+0 = 75
    assert(f.energy_sum == 105L && f.max_frame_energy == 75L)
    // crossings: frame 1 has 3 strict sign changes; frame 2 has 1 (5→-5;
    // -5→0 is not strict). The tail 9 contributes nothing.
    assert(f.zc_total == 4L)
  }

  test("decodeAudio returns None for non-audio payloads") {
    assert(Multimodal.decodeAudio("not a wav".getBytes).isEmpty)
    // a BMP is decodable media but NOT audio — the kernels don't cross
    val bmp = graft.multimodal.BmpCodec.encode(4, 4, (_, _) => 128)
    assert(Multimodal.decodeAudio(bmp).isEmpty)
  }
}
