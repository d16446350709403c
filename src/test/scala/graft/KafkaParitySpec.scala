package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{EngineConfig, EngineSession}
import graft.streaming.SourceProvider

/** Kafka option parity with the reference — no connector jar exists in
  * this environment, so the consumer/producer option sets are asserted as
  * DATA against the exact properties the reference constructs
  * (`WeatherProcessingJob.java:31-37` consumer, `:38-39,93-99` producer).
  * Any option-name or default-value drift fails here, and the kafka
  * branch itself is driven to the connector-resolution boundary. */
class KafkaParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  test("consumer options match WeatherProcessingJob.java:31-37 exactly") {
    val opts = SourceProvider.kafkaConsumerOptions(EngineConfig(Array.empty[String]))
    // the reference's consumerProps, rendered through Spark's kafka. prefix
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "localhost:9092",     // :31 default
      "subscribe" -> "weatherData",                      // :71 setTopics
      "kafka.group.id" -> "weather-processing-job",      // :24 GROUP_ID
      "kafka.enable.auto.commit" -> "false",             // :34
      "kafka.client.dns.lookup" -> "use_all_dns_ips",    // :35
      "kafka.reconnect.backoff.ms" -> "1000",            // :36
      "kafka.reconnect.backoff.max.ms" -> "5000"))       // :37
  }

  test("consumer options honor the reference's config override (kafka.servers)") {
    val opts = SourceProvider.kafkaConsumerOptions(EngineConfig(Array(
      "--kafka.servers", "broker-a:9092,broker-b:9092",
      "--kafka.topic", "otherTopic")))
    assert(opts("kafka.bootstrap.servers") == "broker-a:9092,broker-b:9092")
    assert(opts("subscribe") == "otherTopic")
    // fixed client properties are NOT overridable — parity with the
    // reference, which hardcodes them (:34-37)
    assert(opts("kafka.enable.auto.commit") == "false")
  }

  test("producer options match WeatherProcessingJob.java:38-39,93-99") {
    val opts = SourceProvider.kafkaProducerOptions(EngineConfig(Array.empty[String]))
    assert(opts == Map(
      "kafka.bootstrap.servers" -> "localhost:9092",     // :39
      "topic" -> "WeatherPresenceEvent"))                // :87 sink topic
  }

  test("kafka source branch executes to the connector-resolution boundary") {
    // the branch must build the reader with the full option set and fail
    // ONLY at connector lookup (no jar in /opt/spark/jars) — proving the
    // code path runs, not just compiles
    val ex = intercept[Exception] {
      SourceProvider(spark, EngineConfig(Array("--source", "kafka")))
    }
    val msg = Option(ex.getMessage).getOrElse("") + " " +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.toLowerCase.contains("kafka"),
      s"expected a kafka connector-resolution failure, got: $ex")
  }
}
