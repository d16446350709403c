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
      case "kafka-shape" => kafkaShape(spark, conf)
      case "file"  => file(spark, conf)
      case "rate"  => rate(spark, conf)
      case other   => throw new IllegalArgumentException(s"unknown source: $other")
    }

  /** The exact consumer option set of the reference, as data — topic
    * `weatherData`, group `weather-processing-job`, auto-commit disabled,
    * DNS lookup over all IPs, reconnect backoff 1 s -> 5 s
    * (`WeatherProcessingJob.java:24,31-37,71-73`). Kept as a pure function
    * so the parity spec asserts the option names/values directly — any
    * drift from the reference's consumer properties fails the gate even
    * though no connector jar exists in this environment. Kafka client
    * properties ride the `kafka.` prefix (Spark's pass-through contract).
    */
  def kafkaConsumerOptions(conf: graft.core.EngineConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> conf.getOrElse("kafka.servers", "localhost:9092"),
    "subscribe" -> conf.getOrElse("kafka.topic", "weatherData"),
    "kafka.group.id" -> conf.getOrElse("kafka.group", "weather-processing-job"),
    "kafka.enable.auto.commit" -> "false",
    "kafka.client.dns.lookup" -> "use_all_dns_ips",
    "kafka.reconnect.backoff.ms" -> "1000",
    "kafka.reconnect.backoff.max.ms" -> "5000")

  /** The reference's producer option set (`WeatherProcessingJob.java:38-39,
    * 93-99`): bootstrap servers + target topic. The reference's
    * transactional-id prefix configures Flink's 2PC sink; the Spark-first
    * equivalent of that exactly-once contract is the epoch-idempotent
    * foreachBatch sink (Q-str-07/19), so no producer transaction options
    * are emitted here. */
  def kafkaProducerOptions(conf: graft.core.EngineConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> conf.getOrElse("kafka.servers", "localhost:9092"),
    "topic" -> conf.getOrElse("sink.topic", "WeatherPresenceEvent"))

  /** Reference parity (see [[kafkaConsumerOptions]]). Compiles and builds
    * the reader with the full option set; `load()` resolves the connector
    * at runtime. */
  def kafka(spark: SparkSession, conf: graft.core.EngineConfig): DataFrame =
    kafkaConsumerOptions(conf)
      .foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }
      .load()
      .select(col("value"))

  /** The connector test double: replays a staged parquet dir under the
    * EXACT kafka source schema (key/value/topic/partition/offset/
    * timestamp/timestampType/headers) and then runs the identical
    * `.select(value)` the production branch runs — so the column seam
    * the kafka path compiles against is EXECUTED in this offline
    * container, not just option-compared ([[KafkaShape]]). */
  def kafkaShape(spark: SparkSession, conf: graft.core.EngineConfig): DataFrame =
    KafkaShape.source(spark, conf.get("source.path").getOrElse(
        throw new IllegalArgumentException(
          "kafka-shape source requires --source.path")))
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
