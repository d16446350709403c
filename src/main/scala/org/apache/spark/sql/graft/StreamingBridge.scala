package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** The one `private[sql]` bridge this library needs — the standard
  * technique a Spark-native library uses to implement a V1 streaming
  * `Source` (Delta Lake's whole codebase sits inside
  * `org.apache.spark.sql.delta` for the same reason): the micro-batch
  * engine asserts that `Source.getBatch`'s result has
  * `isStreaming=true`, and the only way to stamp that flag onto a plan
  * is `SparkSession.internalCreateDataFrame`, which is `private[sql]`.
  * This object lives in an `org.apache.spark.sql` subpackage solely to
  * reach it; everything else in the library stays in `graft.*` on
  * public API.
  */
object StreamingBridge {

  /** Re-wrap a (batch) DataFrame's physical rows as a streaming-tagged
    * DataFrame — the plan keeps full pushdown/codegen; only the flag
    * the micro-batch engine validates changes. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }

  /** The inverse, for a V1 `Sink.addBatch` input: the engine hands the
    * batch over as a streaming-tagged Dataset wrapping the ALREADY
    * PLANNED incremental execution; re-wrapping its rows as a plain
    * batch DataFrame makes every normal writer path (e.g. the TxTable
    * staging write) legal on it. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = false)
  }

  /** The session's SQLConf (`sessionState` is `private[sql]`) — needed to
    * build a ParquetToSparkSchemaConverter whose flags (binary-as-string,
    * int96, case sensitivity, timestamp_ntz inference, nanos-as-long)
    * match exactly what a `spark.read.parquet` schema inference of the
    * same session would use. */
  def sqlConf(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.internal.SQLConf =
    spark.asInstanceOf[SparkSession].sessionState.conf
}
