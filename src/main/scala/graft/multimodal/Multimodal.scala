package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md north star: treat image/audio/video
  * as opaque binary columns with typed metadata).
  *
  * The REAL parts — schema, partition-parallel batch decode via
  * `mapPartitions`, typed output — are production-shaped: this is exactly
  * how a 100 TB image pipeline runs (binary parquet column in, per-partition
  * batched decode on executors, feature columns out; the decode library is
  * the only swap). The codec itself is a clearly-marked deterministic STUB
  * (`fakeDecode`) because no image/audio library exists in this container.
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
