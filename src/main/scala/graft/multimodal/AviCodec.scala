package graft.multimodal

/** Minimal uncompressed AVI encoder + decoder — the VIDEO member of the
  * golden-bytes codec family ([[BmpCodec]] image, [[WavCodec]] audio):
  * real media bytes built byte-by-byte with zero third-party
  * dependencies. The container is a genuine RIFF 'AVI ' file — LIST
  * hdrl (avih main header + strl stream header/format), LIST movi with
  * one '00db' chunk per uncompressed bottom-up BGR DIB frame (rows
  * padded to 4 bytes, exactly the BMP raster layout).
  *
  * The JDK ships no video codec (unlike ImageIO / javax.sound.sampled),
  * so [[decode]] is a hand-written RIFF chunk WALKER — it does not
  * mirror the encoder's offsets but parses the chunk tree generically
  * (read fourcc + size, descend LISTs, locate avih/strf/movi), which is
  * what makes the AviCodecSpec round trip a real structural check.
  * Q-mm-09 uses the pair to prove the multimodal plumbing carries real
  * decodable VIDEO with frame-accurate decoded-property oracles. */
object AviCodec {

  /** Decoded video: dimensions plus the per-frame luminance sum
    * (integer (b+g+r)/3 summed over the raster — exactly oracle-able). */
  final case class Video(width: Int, height: Int, lumaSums: Array[Long])

  /** Encode `frames` (each a (x, y) => gray-level function; the pixel is
    * written as B=G=R=level) at `w` x `h`, 10 fps. */
  def encode(w: Int, h: Int, frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    require(w > 0 && h > 0 && frames.nonEmpty, "empty video")
    val row = (3 * w + 3) / 4 * 4
    val fb = h * row
    val moviTotal = 12 + frames.length * (8 + fb)
    val out = new Array[Byte](12 + 200 + moviTotal)
    var p = 0
    def tag(t: String): Unit = { t.foreach { c => out(p) = c.toByte; p += 1 } }
    def le(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { out(p) = ((v >>> (8 * i)) & 0xff).toByte; p += 1; i += 1 }
    }
    tag("RIFF"); le(4 + 200 + moviTotal, 4); tag("AVI ")
    // LIST hdrl: avih (56-byte body) + LIST strl (strh 56 + strf 40)
    tag("LIST"); le(192, 4); tag("hdrl")
    tag("avih"); le(56, 4)
    le(100000, 4)                 // microseconds per frame (10 fps)
    le(fb * 10, 4); le(0, 4)      // max bytes/sec, padding granularity
    le(0, 4)                      // flags
    le(frames.length, 4); le(0, 4); le(1, 4); le(0, 4) // frames, init, streams, bufsize
    le(w, 4); le(h, 4)
    le(0, 4); le(0, 4); le(0, 4); le(0, 4) // reserved
    tag("LIST"); le(116, 4); tag("strl")
    tag("strh"); le(56, 4)
    tag("vids"); tag("DIB ")      // stream type, uncompressed handler
    le(0, 4); le(0, 2); le(0, 2)  // flags, priority, language
    le(0, 4)                      // initial frames
    le(1, 4); le(10, 4)           // scale / rate = 10 fps
    le(0, 4); le(frames.length, 4)
    le(fb, 4); le(-1, 4); le(0, 4) // suggested bufsize, quality, sample size
    le(0, 2); le(0, 2); le(w, 2); le(h, 2) // rcFrame
    tag("strf"); le(40, 4)        // BITMAPINFOHEADER
    le(40, 4); le(w, 4); le(h, 4); le(1, 2); le(24, 2)
    le(0, 4); le(fb, 4); le(0, 4); le(0, 4); le(0, 4); le(0, 4)
    // LIST movi: one 00db DIB chunk per frame, bottom-up BGR rows
    tag("LIST"); le(4 + frames.length * (8 + fb), 4); tag("movi")
    frames.foreach { f =>
      tag("00db"); le(fb, 4)
      var y = h - 1
      while (y >= 0) {
        val base = p
        var x = 0
        while (x < w) {
          val v = (f(x, y) & 0xff).toByte
          out(p) = v; out(p + 1) = v; out(p + 2) = v; p += 3
          x += 1
        }
        p = base + row
        y -= 1
      }
    }
    out
  }

  /** Decode by walking the RIFF chunk tree. Returns None when the bytes
    * are not an uncompressed 24-bit AVI this decoder understands. */
  def decode(bytes: Array[Byte]): Option[Video] =
    try {
      def leAt(off: Int, n: Int): Int = {
        var v = 0; var i = 0
        while (i < n) { v |= (bytes(off + i) & 0xff) << (8 * i); i += 1 }
        v
      }
      def tagAt(off: Int): String =
        new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length < 24 || tagAt(0) != "RIFF" || tagAt(8) != "AVI ")
        return None
      var width = 0
      var height = 0
      val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
      // generic walker: descend LIST chunks, inspect leaf chunks
      def walk(off: Int, end: Int): Unit = {
        var p = off
        while (p + 8 <= end) {
          val t = tagAt(p)
          val sz = leAt(p + 4, 4)
          if (t == "LIST") walk(p + 12, p + 8 + sz)
          else if (t == "strf" && sz >= 40) {
            if (leAt(p + 8 + 14, 2) != 24) throw new IllegalArgumentException(
              "not 24-bit DIB")
            width = leAt(p + 8 + 4, 4)
            height = leAt(p + 8 + 8, 4)
          } else if (t == "00db") {
            if (width <= 0 || height <= 0) throw new IllegalArgumentException(
              "frame before format")
            val rowB = (3 * width + 3) / 4 * 4
            if (sz < rowB * height) throw new IllegalArgumentException(
              "short frame")
            var sum = 0L
            var y = 0
            while (y < height) {
              val base = p + 8 + (height - 1 - y) * rowB
              var x = 0
              while (x < width) {
                val o = base + 3 * x
                sum += ((bytes(o) & 0xff) + (bytes(o + 1) & 0xff) +
                  (bytes(o + 2) & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            sums += sum
          }
          p += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
        }
      }
      walk(12, 8 + leAt(4, 4))
      if (width <= 0 || height <= 0 || sums.isEmpty) None
      else Some(Video(width, height, sums.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }
}
