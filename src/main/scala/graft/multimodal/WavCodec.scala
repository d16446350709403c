package graft.multimodal

/** Minimal 16-bit mono PCM WAV encoder — the audio twin of [[BmpCodec]]:
  * real media bytes built byte-by-byte with zero third-party
  * dependencies (RIFF header + fmt chunk + little-endian PCM data), read
  * back through the JDK's OWN javax.sound.sampled decoder
  * (WavCodecSpec cross-validates the round trip sample-for-sample).
  * Q-mm-08 uses it to prove the multimodal plumbing carries real
  * decodable AUDIO with decoded-property oracles. */
object WavCodec {

  /** Encode mono 16-bit PCM at `sampleRate` Hz. */
  def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(samples.nonEmpty, "empty sample buffer")
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def putLE(off: Int, v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { out(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    }
    def putTag(off: Int, tag: String): Unit =
      tag.zipWithIndex.foreach { case (c, i) => out(off + i) = c.toByte }
    putTag(0, "RIFF"); putLE(4, 36 + dataSize, 4); putTag(8, "WAVE")
    putTag(12, "fmt "); putLE(16, 16, 4)
    putLE(20, 1, 2)               // PCM
    putLE(22, 1, 2)               // mono
    putLE(24, sampleRate, 4)
    putLE(28, sampleRate * 2, 4)  // byte rate
    putLE(32, 2, 2)               // block align
    putLE(34, 16, 2)              // bits per sample
    putTag(36, "data"); putLE(40, dataSize, 4)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      out(44 + 2 * i) = (v & 0xff).toByte
      out(44 + 2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}
