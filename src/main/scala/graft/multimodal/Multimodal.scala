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

  /** Decoded-audio features: every field is a REAL decoded property.
    * `sum_abs` is the integer sum of |sample| over the decoded PCM —
    * exact (no float), so the Q-mm-08 oracle recomputes it bit-for-bit. */
  case class AudioFeatures(sample_rate: Long, n_frames: Long, sum_abs: Long)

  /** REAL audio decode via the JDK's javax.sound.sampled (zero
    * third-party deps). Returns None for payloads no JDK codec
    * recognizes. Supports the 16-bit PCM shape [[WavCodec]] emits. */
  def decodeAudio(payload: Array[Byte]): Option[AudioFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val bytes = in.readAllBytes()
          var sum = 0L
          var i = 0
          while (i + 1 < bytes.length) {
            val lo = bytes(i) & 0xff
            val hi = bytes(i + 1).toInt // sign-carrying high byte (LE)
            val v = (hi << 8) | lo
            sum += math.abs(v)
            i += 2
          }
          Some(AudioFeatures(fmt.getSampleRate.toLong,
            bytes.length / 2L, sum))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

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
