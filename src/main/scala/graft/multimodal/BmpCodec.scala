package graft.multimodal

/** Minimal 24-bit uncompressed BMP encoder — real media bytes built
  * byte-by-byte with zero third-party dependencies.
  *
  * Layout: BITMAPFILEHEADER (14 bytes, 'BM' magic + file size + pixel
  * offset) + BITMAPINFOHEADER (40 bytes) + bottom-up pixel rows, each row
  * padded to a 4-byte boundary, pixels stored BGR. The output is a
  * spec-compliant BMP that the JDK's own ImageIO decoder reads back
  * (BmpCodecSpec cross-validates the round trip pixel-for-pixel), which is
  * what lets Q-mm-07 prove the multimodal plumbing carries REAL decodable
  * media — the oracle checks decoded properties (width/height/brightness),
  * not a hash of pseudo-features.
  */
object BmpCodec {

  /** Encode a grayscale image: `gray(x, y)` in 0..255, origin top-left. */
  def encode(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowSize = ((3 * width + 3) / 4) * 4 // rows pad to 4-byte boundary
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val out = new Array[Byte](fileSize)
    def putLE(off: Int, v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { out(off + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    }
    out(0) = 'B'; out(1) = 'M'
    putLE(2, fileSize, 4)
    putLE(10, 54, 4)      // pixel-data offset
    putLE(14, 40, 4)      // BITMAPINFOHEADER size
    putLE(18, width, 4)
    putLE(22, height, 4)  // positive height => bottom-up row storage
    putLE(26, 1, 2)       // color planes
    putLE(28, 24, 2)      // bits per pixel
    putLE(34, dataSize, 4)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < width) {
        val v = (gray(x, y) & 0xff).toByte
        val off = rowOff + 3 * x
        out(off) = v; out(off + 1) = v; out(off + 2) = v // B, G, R
        x += 1
      }
      y += 1
    }
    out
  }
}
