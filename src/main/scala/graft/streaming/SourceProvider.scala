package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-selected stream source, abstracting the reference's Kafka source
  * (`WeatherProcessingJob.java:65-77`) behind a uniform envelope-bytes
  * contract: every provider yields a streaming DataFrame with a single
  * `value: BINARY` column carrying `[magic][avro]` envelopes.
  *
  * Providers:
  *  - `kafka`: the production path — identical options to the reference
  *    (servers/topic/group, auto-commit off; reconnect backoff is a Kafka
  *    client option passed through). Compiles with no connector dependency
  *    (`format("kafka")` resolves at runtime); in this offline container it
  *    can't run, which is why the file/memory providers exist.
  *  - `file`: replayable directory of binary-file envelopes or parquet with
  *    a `value` column — the local/test twin used by the verify gate.
  *  - `rate`: synthetic load generator (encodes deterministic readings at
  *    `rowsPerSecond`) for soak/throughput experiments.
  */
object SourceProvider {

  def apply(spark: SparkSession, conf: graft.core.EngineConfig): DataFrame =
    conf.getOrElse("source", "file") match {
      case "kafka" => kafka(spark, conf)
      case "file"  => file(spark, conf)
      case "rate"  => rate(spark, conf)
      case other   => throw new IllegalArgumentException(s"unknown source: $other")
    }

  /** Reference parity: topic `weatherData`, group `weather-processing-job`,
    * auto-commit disabled, reconnect backoff 1 s -> 5 s
    * (`WeatherProcessingJob.java:24,31-37,71-73`). */
  def kafka(spark: SparkSession, conf: graft.core.EngineConfig): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", conf.getOrElse("kafka.servers", "localhost:9092"))
      .option("subscribe", conf.getOrElse("kafka.topic", "weatherData"))
      .option("kafka.group.id", conf.getOrElse("kafka.group", "weather-processing-job"))
      .option("kafka.enable.auto.commit", "false")
      .option("kafka.reconnect.backoff.ms", "1000")
      .option("kafka.reconnect.backoff.max.ms", "5000")
      .load()
      .select(col("value"))

  /** Parquet dir with a `value: BINARY` column (written by tests/producers). */
  def file(spark: SparkSession, conf: graft.core.EngineConfig): DataFrame = {
    val dir = conf.get("source.path").getOrElse(
      throw new IllegalArgumentException("file source requires --source.path"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "value", org.apache.spark.sql.types.BinaryType)))
    spark.readStream.schema(schema).parquet(dir).select(col("value"))
  }

  /** Deterministic synthetic envelopes at a configurable rate. */
  def rate(spark: SparkSession, conf: graft.core.EngineConfig): DataFrame = {
    import graft.codec.AvroEnvelope
    val encode = udf { (i: Long, tsMs: Long) =>
      AvroEnvelope.encode(
        AvroEnvelope.WeatherReading(
          s"dev-${i % 50}", tsMs, Some((i % 400) / 10.0 - 20.0),
          Some((i % 1000) / 10.0), Some((i % 300) / 10.0), Some(950.0 + i % 100)),
        2, AvroEnvelope.defaultRegistry)
    }
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", conf.getOrElse("rate.rowsPerSecond", "1000"))
      .load()
      .select(encode(col("value"), unix_millis(col("timestamp"))).as("value"))
  }
}
