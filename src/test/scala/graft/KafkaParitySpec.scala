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

  test("kafka-shape double drives WeatherJob end-to-end through the connector column contract") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.codec.AvroEnvelope
    import graft.streaming.KafkaShape

    // the double's source schema IS the connector's (includeHeaders)
    val tmp = java.nio.file.Files.createTempDirectory("graft_kshape")
    val srcDir = tmp.resolve("records").toString
    val t0 = 1700000000000L
    val rows = Seq( // device A: 2 h gap at TTL 1 h; device B continuous
      ("A", t0), ("A", t0 + 60000L), ("A", t0 + 7260000L),
      ("B", t0), ("B", t0 + 1800000L), ("B", t0 + 3000000L))
    val records = rows.zipWithIndex.map { case ((dev, ts), i) =>
      (dev.getBytes("UTF-8"),
        AvroEnvelope.encode(
          AvroEnvelope.WeatherReading(dev, ts, Some(20.0), None, None, None),
          2, AvroEnvelope.defaultRegistry),
        "weatherData", i % 3, i.toLong, new java.sql.Timestamp(ts), 0,
        Seq(("traceparent", Array[Byte](1, 2))))
    }.toDF("key", "value", "topic", "partition", "offset",
        "timestamp", "timestampType", "headers")
      .select(col("key"), col("value"), col("topic"), col("partition"),
        col("offset"), col("timestamp"), col("timestampType"),
        expr("transform(headers, h -> struct(h._1 AS key, h._2 AS value))")
          .cast(KafkaShape.headerType).as("headers"))
    KafkaShape.stage(records, srcDir)
    assert(KafkaShape.source(spark, srcDir).schema == KafkaShape.sourceSchema,
      "double must present the connector's exact source columns")
    // an off-contract stage is refused (schema drift fails loudly)
    val bad = intercept[IllegalArgumentException](
      KafkaShape.stage(records.drop("offset"), srcDir))
    assert(bad.getMessage.contains("connector contract"))

    try WeatherJob.main(Array(
      "--source", "kafka-shape", "--source.path", srcDir,
      "--sink", "memory", "--sink.table", "kshape_presence",
      "--once", "true", "--stopSession", "false",
      "--presence.ttl.ms", "3600000"))
    finally
      // main's rocksdb default sets the provider on the shared session;
      // don't leak it into later suites
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    val out = spark.table("kshape_presence")
      .selectExpr("key", "get_json_object(value, '$.state') AS state",
        "get_json_object(value, '$.ts_ms') AS ts_ms", "headers")
      .collect().map { r =>
        val hs = r.getSeq[org.apache.spark.sql.Row](3)
        assert(hs.map(_.getString(0)) == Seq("ts"),
          "egress must carry exactly the ts header")
        // record-timestamp parity (ref WeatherPresenceSerializationSchema
        // .java:35): header int64 == the payload event time in the body
        assert(KafkaShape.int64(hs.head.getAs[Array[Byte]](1)) ==
          r.getString(2).toLong)
        (r.getString(0), r.getString(1), r.getString(2).toLong)
      }.sortBy(t => (t._1, t._3, t._2))
    val expected = Array(
      ("A", "online", t0),
      ("A", "offline", t0 + 60000L + 3600000L),
      ("A", "online", t0 + 7260000L),
      ("B", "online", t0),
      // round-11 production plan (detectEvict): B's trailing offline
      // emits once the final watermark (A's last event) passes
      // B's last-seen + TTL
      ("B", "offline", t0 + 3000000L + 3600000L)).sortBy(t => (t._1, t._3, t._2))
    assert(out.toSeq == expected.toSeq)

    // the sink projection satisfies the producer contract; a stowaway
    // column (what a broker-side write would reject) is refused
    val pres = spark.table("kshape_presence")
    KafkaShape.requireSinkShape(pres)
    val rejected = intercept[IllegalArgumentException](
      KafkaShape.requireSinkShape(pres.withColumn("debug", lit(1))))
    assert(rejected.getMessage.contains("unknown columns"))
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
