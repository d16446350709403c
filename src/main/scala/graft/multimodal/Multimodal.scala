package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md north star: treat image/audio/video
  * as opaque binary columns with typed metadata).
  *
  * The plumbing — schema, partition-parallel batch decode via
  * `mapPartitions`, typed output — is production-shaped: this is exactly
  * how a 100 TB image pipeline runs (binary parquet column in, per-partition
  * batched decode on executors, feature columns out; the decode library is
  * the only swap).
  *
  * Three decode kernels sit behind that swap point:
  *  - [[decodeImage]] — REAL image decode through the JDK's own ImageIO
  *    codecs (BMP/PNG/JPEG readers ship in `java.desktop`, no third-party
  *    dependency). Q-mm-07 drives hand-built BMP bytes ([[BmpCodec]])
  *    through it and oracles the DECODED properties.
  *  - [[decodeAudio]] — REAL audio decode through the JDK's
  *    javax.sound.sampled WAV reader. Q-mm-08 drives hand-built PCM
  *    bytes ([[WavCodec]]) through it, oracled the same way.
  *  - [[decodeVideo]] — REAL video-container decode: the JDK ships no
  *    video codec, so [[AviCodec]] provides a hand-written RIFF chunk
  *    walker over genuine uncompressed AVI bytes. Q-mm-09 drives
  *    hand-built AVIs through it with frame-accurate oracles.
  *  - [[fakeDecode]] — a clearly-marked deterministic stub retained as
  *    the generic swap point (Q-mm-01's pipeline shape); a production
  *    deployment replaces it with e.g. a JNI codec, changing only this
  *    one function.
  */
object Multimodal {

  /** A multimodal asset row: opaque payload + typed metadata. */
  case class Asset(
      asset_id: Long,
      payload: Array[Byte],
      media_type: String,   // "image" | "audio" | "video"
      declared_bytes: Long)

  /** Extracted features (schema is what a real decoder would emit). */
  case class AssetFeatures(
      asset_id: Long,
      n_bytes: Long,
      content_hash: String,
      fake_width: Long,
      fake_brightness: Long,
      frame_count: Long)

  /** Decoded-image features: every field is a REAL decoded property. */
  case class ImageFeatures(width: Long, height: Long, brightness_sum: Long)

  /** REAL image decode via the JDK's ImageIO (zero third-party deps).
    * Returns None for payloads no JDK codec recognizes — which is what
    * routes non-image assets to the stub path. brightness_sum is the sum
    * over the raster of (r+g+b)/3 — a property that only comes out right
    * if the actual pixel bytes decoded correctly (the Q-mm-07 oracle
    * recomputes it from first principles). */
  def decodeImage(payload: Array[Byte]): Option[ImageFeatures] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        Some(ImageFeatures(img.getWidth.toLong, img.getHeight.toLong, sum))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL image decode to a grayscale raster via the JDK's ImageIO: the
    * pixel-matrix sibling of [[decodeImage]], for kernels that need the
    * actual pixels (perceptual hashing, Q-mm-14) rather than summary
    * features. Returns (width, height, row-major gray values) where gray
    * = (r+g+b)/3 — exact for the grayscale BMPs [[BmpCodec]] emits (r =
    * g = b, so the average IS the stored byte). None for payloads no JDK
    * codec recognizes. */
  def decodeGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            px(y * w + x) =
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        Some((w, h, px))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Perceptual average-hash over a DECODED pixel raster — the production
    * form of Q-mm-06's fingerprint (which samples a text-byte proxy): the
    * raster mean-pools to an 8×8 grid (cell (cx, cy) covers pixels
    * [cx·w/8, (cx+1)·w/8) × [cy·h/8, (cy+1)·h/8)), and bit i = cy·8+cx is
    * set iff the cell mean exceeds the global mean of the pooled grid.
    * The compare is ALL-INTEGER: w and h must be multiples of 8 so every
    * cell has equal area, and then cellMean > globalMean reduces exactly
    * to cellSum · 64 > totalSum (both sides scaled by cellArea · 64 — no
    * float, so a DuckDB oracle can replay it bit-for-bit from the
    * generator arithmetic). Returns (lo, hi): bits 0..31 / 32..63,
    * matching Q-mm-13's packing so both feed the same Hamming algebra.
    * Uniform brightness shifts cancel exactly (every cellSum and the
    * threshold shift together) — the invariance Q-mm-14's re-encode
    * variant exercises through the real codec. */
  def aHashFromGray(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    require(w % 8 == 0 && h % 8 == 0,
      s"aHashFromGray needs dims divisible by 8, got ${w}x$h")
    val cw = w / 8; val ch = h / 8
    val cells = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = px(y * w + x).toLong
        cells((y / ch) * 8 + (x / cw)) += v
        total += v
        x += 1
      }
      y += 1
    }
    val cellArea = cw.toLong * ch
    var lo = 0L; var hi = 0L
    var i = 0
    while (i < 64) {
      // equal-area cells: cellMean > globalMean ⟺ cellSum·64 > totalSum·1
      // (both sides scaled by cellArea·64)
      if (cells(i) * 64L > total) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (lo, hi)
  }

  /** Decoded-then-RESIZED image features: the decode → transform →
    * re-encode → decode round trip a real image-preprocessing stage runs.
    * Every field is a decoded property of the RESIZED image. */
  case class ResizedImageFeatures(src_w: Long, src_h: Long, out_w: Long,
      out_h: Long, out_bytes: Long, out_brightness_sum: Long)

  /** REAL image RESIZE: decode the payload through the JDK's ImageIO,
    * nearest-neighbor downscale by `factor` (output pixel (x, y) samples
    * source pixel (factor·x, factor·y) — the standard integer-exact
    * kernel), re-encode the result as a BMP, and decode it AGAIN through
    * ImageIO to featurize. Because the second decode goes through the
    * real codec, a mangled byte anywhere in the chain shows up in the
    * brightness sum. Returns None for non-images or images smaller than
    * one output pixel. */
  def resizeImage(payload: Array[Byte], factor: Int): Option[ResizedImageFeatures] =
    try {
      require(factor >= 1, s"bad resize factor $factor")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val ow = img.getWidth / factor
        val oh = img.getHeight / factor
        if (ow < 1 || oh < 1) None
        else {
          val resized = BmpCodec.encode(ow, oh,
            (x, y) => (img.getRGB(x * factor, y * factor) >> 16) & 0xff)
          decodeImage(resized).map(f =>
            ResizedImageFeatures(img.getWidth.toLong, img.getHeight.toLong,
              f.width, f.height, resized.length.toLong, f.brightness_sum))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decoded-audio features: every field is a REAL decoded property.
    * `sum_abs` is the integer sum of |sample| over the decoded PCM —
    * exact (no float), so the Q-mm-08 oracle recomputes it bit-for-bit. */
  case class AudioFeatures(sample_rate: Long, n_frames: Long, sum_abs: Long)

  /** REAL audio decode to raw samples via the JDK's javax.sound.sampled
    * (zero third-party deps). Returns (sampleRate, samples) or None for
    * payloads no JDK codec recognizes. Supports the 16-bit mono PCM
    * shape [[WavCodec]] emits. */
  def decodeAudioSamples(payload: Array[Byte]): Option[(Long, Array[Int])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val bytes = in.readAllBytes()
          val out = new Array[Int](bytes.length / 2)
          var i = 0
          while (i + 1 < bytes.length) {
            val lo = bytes(i) & 0xff
            val hi = bytes(i + 1).toInt // sign-carrying high byte (LE)
            out(i / 2) = (hi << 8) | lo
            i += 2
          }
          Some((fmt.getSampleRate.toLong, out))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL audio decode via the JDK's javax.sound.sampled. Returns None
    * for payloads no JDK codec recognizes. */
  def decodeAudio(payload: Array[Byte]): Option[AudioFeatures] =
    decodeAudioSamples(payload).map { case (rate, v) =>
      var sum = 0L
      var i = 0
      while (i < v.length) { sum += math.abs(v(i)).toLong; i += 1 }
      AudioFeatures(rate, v.length.toLong, sum)
    }

  /** Frame-level audio features over the really-decoded PCM: the signal
    * is cut into complete `frameLen`-sample frames (the STFT hop shape a
    * real audio featurizer uses) and each frame contributes its integer
    * energy (Σ v²) and zero-crossing count (sign changes between
    * adjacent samples WITHIN the frame). All integer arithmetic — every
    * output is exactly oracle-able from the sample generator. */
  case class AudioFrameFeatures(n_frames: Long, energy_sum: Long,
      zc_total: Long, max_frame_energy: Long)

  def audioFrameFeatures(payload: Array[Byte],
      frameLen: Int = 16): Option[AudioFrameFeatures] =
    decodeAudioSamples(payload).map { case (_, v) =>
      val nf = v.length / frameLen
      var e = 0L; var zc = 0L; var maxE = 0L
      var j = 0
      while (j < nf) {
        var fe = 0L
        var i = 0
        while (i < frameLen) {
          val s = v(j * frameLen + i)
          fe += s.toLong * s
          if (i > 0 && v(j * frameLen + i - 1) * s < 0) zc += 1
          i += 1
        }
        e += fe
        if (fe > maxE) maxE = fe
        j += 1
      }
      AudioFrameFeatures(nf.toLong, e, zc, maxE)
    }

  /** Decoded-video features: dims, frame count, and the luminance sum
    * over every SAMPLED frame (integer arithmetic — exactly oracle-able). */
  case class VideoFeatures(width: Long, height: Long, n_frames: Long,
      sampled_luma_sum: Long)

  /** REAL video-container decode via [[AviCodec]]'s RIFF chunk walker
    * (zero third-party deps — the JDK has no video codec, so the parser
    * is ours, cross-validated structurally in AviCodecSpec). Frame
    * SAMPLING — keep every `stride`-th frame — is the standard video
    * preprocessing step (a 100 TB video pipeline never featurizes every
    * frame); it happens here, after decode, inside the partition-parallel
    * kernel. Returns None for payloads that are not uncompressed AVI. */
  def decodeVideo(payload: Array[Byte], stride: Int = 2): Option[VideoFeatures] =
    AviCodec.decode(payload).map { v =>
      var sum = 0L
      var i = 0
      while (i < v.lumaSums.length) { sum += v.lumaSums(i); i += stride }
      VideoFeatures(v.width.toLong, v.height.toLong,
        v.lumaSums.length.toLong, sum)
    }

  /** STUB decode: deterministic pseudo-features derived from payload size
    * and hash. A real deployment replaces ONLY this function with e.g. a
    * JNI image decoder — the surrounding plumbing is unchanged. */
  def fakeDecode(a: Asset): AssetFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hash = md.digest(a.payload).map("%02x".format(_)).mkString
    val n = a.payload.length.toLong
    AssetFeatures(
      asset_id = a.asset_id,
      n_bytes = n,
      content_hash = hash,
      fake_width = n % 640,
      fake_brightness = (n * 7) % 256,
      frame_count = n / 1000 + 1)
  }

  /** Build an asset table from the documents table (payload = utf-8 bytes —
    * stands in for real image bytes; deterministic so oracle-checkable). */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("n_chars").as("declared_bytes")).as[Asset]
  }

  /** Partition-parallel batched decode. `mapPartitions` (not per-row map) is
    * deliberate: a real decoder amortizes model/codec init once per
    * partition — the batch shape a Pandas-UDF/Arrow path would also have. */
  def decodeAll(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights…)
      it.map(fakeDecode)
    }
  }

  /** End-to-end: documents -> assets -> features (Q-mm-01). */
  def featuresFromDocuments(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeAll(assetsFromDocuments(docs)).toDF()
}
