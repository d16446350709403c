package graft.codec

import java.io.ByteArrayOutputStream

import scala.util.control.NonFatal

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Magic-byte Avro envelope codec — the reference's ingest semantics
  * (`WeatherKafkaAvroDeserializerSchema.java:41-68`) rebuilt Spark-first:
  *
  *  - wire format `[magic:1][avro-binary:N]`; the magic byte selects the
  *    WRITER schema from a registry (`:43-46`); the framing itself is a
  *    seam ([[EnvelopeFormat]]): `--envelope.format confluent` switches
  *    to the confluent `[0x00][schemaId:4 BE][avro-binary]` wire format
  *    with the same drop-on-unknown-id / poison-pill semantics;
  *  - the reader schema is pinned; Avro schema resolution bridges
  *    writer→reader per record (`:53-63`) — old records gain defaulted
  *    fields, renamed-away fields are skipped;
  *  - records whose writer schema NAME mismatches the reader are dropped
  *    with no exception (`:47-50`), and any decode failure drops the record
  *    rather than failing the job (`:65-67`) — poison-pill tolerance;
  *  - decoder/reader instances are reused across records within a partition,
  *    mirroring the reference's per-task decoder reuse (`:26,52`).
  *
  * Spark integration is `mapPartitions` (not a UDF): schema parsing and
  * reader construction happen once per partition, the per-record hot path is
  * allocation-free except the output object.
  */
object AvroEnvelope {

  /** The pinned reader record — evidenced fields + declared telemetry
    * extension (FIXTURES.md §3). */
  case class WeatherReading(
      deviceId: String,
      timestamp: Long,
      temperature: Option[Double],
      humidity: Option[Double],
      windSpeed: Option[Double],
      pressure: Option[Double])

  private def avroField(name: String) =
    s"""{"name": "$name", "type": ["null", "double"], "default": null}"""

  val v1SchemaJson: String =
    s"""{"type": "record", "name": "WeatherReading", "namespace": "graft.model",
        "fields": [
          {"name": "deviceId", "type": "string"},
          {"name": "timestamp", "type": "long"},
          ${avroField("temperature")}, ${avroField("humidity")}, ${avroField("windSpeed")}
        ]}"""

  /** v2 = v1 + pressure: exercises writer->reader schema resolution. */
  val v2SchemaJson: String =
    s"""{"type": "record", "name": "WeatherReading", "namespace": "graft.model",
        "fields": [
          {"name": "deviceId", "type": "string"},
          {"name": "timestamp", "type": "long"},
          ${avroField("temperature")}, ${avroField("humidity")},
          ${avroField("windSpeed")}, ${avroField("pressure")}
        ]}"""

  /** A schema whose NAME mismatches the reader: must be dropped (ref :47-50). */
  val alienSchemaJson: String =
    """{"type": "record", "name": "AlienRecord", "namespace": "graft.model",
       "fields": [{"name": "deviceId", "type": "string"},
                  {"name": "timestamp", "type": "long"}]}"""

  /** magic byte -> writer schema JSON (serializable; parsed per partition). */
  val defaultRegistry: Map[Byte, String] =
    Map(1.toByte -> v1SchemaJson, 2.toByte -> v2SchemaJson, 9.toByte -> alienSchemaJson)

  val readerSchemaJson: String = v2SchemaJson

  // ---------------------------------------------------------------- encode
  // Parsed-schema cache: encode() sits in a per-record hot path (Q-scan-04
  // encodes the whole events table); re-parsing the JSON per record would
  // dominate the runtime. Schema instances are immutable/thread-safe.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()
  private def parsedSchema(json: String): Schema =
    schemaCache.computeIfAbsent(json, j => new Schema.Parser().parse(j))

  /** Encode one record under the given writer schema version (test/fixture
    * side; the reference's producers live outside its repo). */
  def encode(r: WeatherReading, magic: Byte, registry: Map[Byte, String]): Array[Byte] =
    encode(r, magic.toInt, registry(magic), EnvelopeFormat.Magic1)

  /** Format-parametric encode: id framed per `format` (1-byte magic or
    * confluent 0x00 + 4-byte BE), Avro body per `writerSchemaJson`. */
  def encode(r: WeatherReading, id: Int, writerSchemaJson: String,
      format: EnvelopeFormat): Array[Byte] = {
    val schema = parsedSchema(writerSchemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("deviceId", r.deviceId)
    rec.put("timestamp", r.timestamp)
    def put(f: String, v: Option[Double]): Unit =
      if (schema.getField(f) != null) rec.put(f, v.map(Double.box).orNull)
    put("temperature", r.temperature); put("humidity", r.humidity)
    put("windSpeed", r.windSpeed); put("pressure", r.pressure)
    val out = new ByteArrayOutputStream()
    format.writeHeader(out, id)
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode
  /** Decode a Dataset of envelope byte arrays; bad records are dropped
    * (poison-pill tolerance, ref :65-67). The reference logs each drop
    * (`:48,66`); here drops are counted distributedly in an accumulator —
    * `decodeWithMetrics` exposes it for monitoring/alerting.
    *
    * Schema resolution goes through the [[SchemaRegistry]] interface;
    * the Map overloads keep the in-repo map as the default impl. */
  def decode(
      spark: SparkSession,
      envelopes: Dataset[Array[Byte]],
      registry: Map[Byte, String] = defaultRegistry): Dataset[WeatherReading] =
    decodeWithMetrics(spark, envelopes,
      StaticSchemaRegistry(registry, readerSchemaJson))._1

  def decode(
      spark: SparkSession,
      envelopes: Dataset[Array[Byte]],
      registry: SchemaRegistry): Dataset[WeatherReading] =
    decodeWithMetrics(spark, envelopes, registry, EnvelopeFormat.Magic1)._1

  def decode(
      spark: SparkSession,
      envelopes: Dataset[Array[Byte]],
      registry: SchemaRegistry,
      format: EnvelopeFormat): Dataset[WeatherReading] =
    decodeWithMetrics(spark, envelopes, registry, format)._1

  def decodeWithMetrics(
      spark: SparkSession,
      envelopes: Dataset[Array[Byte]],
      registry: Map[Byte, String] = defaultRegistry)
      : (Dataset[WeatherReading], org.apache.spark.util.LongAccumulator) =
    decodeWithMetrics(spark, envelopes,
      StaticSchemaRegistry(registry, readerSchemaJson))

  def decodeWithMetrics(
      spark: SparkSession,
      envelopes: Dataset[Array[Byte]],
      registry: SchemaRegistry)
      : (Dataset[WeatherReading], org.apache.spark.util.LongAccumulator) =
    decodeWithMetrics(spark, envelopes, registry, EnvelopeFormat.Magic1)

  def decodeWithMetrics(
      spark: SparkSession,
      envelopes: Dataset[Array[Byte]],
      registry: SchemaRegistry,
      format: EnvelopeFormat)
      : (Dataset[WeatherReading], org.apache.spark.util.LongAccumulator) = {
    import spark.implicits._
    // wiring-time guard: a Magic1 job pointed at a wide-id registry can
    // never match those ids off the wire — fail loudly HERE, not by
    // silently dropping every record of the unreachable version
    if (format == EnvelopeFormat.Magic1)
      registry.schemasById.keys.foreach { id =>
        require(id >= Byte.MinValue && id <= Byte.MaxValue,
          s"schema id $id does not fit the 1-byte envelope magic " +
            "(use --envelope.format confluent)")
      }
    val dropped = spark.sparkContext.longAccumulator("graft.codec.dropped")
    // per-record drop LOGGING parity with the reference deserializer
    // (WeatherKafkaAvroDeserializerSchema.java:48,66 warns on every
    // dropped record). Counting in the accumulator is the scale-sane
    // default — a poisoned 100 TB topic would emit millions of log
    // lines — so the per-record line is OPT-IN for debugging sessions.
    val logDrops = sys.props.get("graft.codec.logDrops").contains("true")
    val decoded = envelopes.mapPartitions { it =>
      // per-partition init: parse schemas once, build one reader per writer
      // schema, reuse the BinaryDecoder across records (ref :26,52)
      val parser = new Schema.Parser()
      val reader = parser.parse(registry.readerSchemaJson)
      val readers: Map[Int, GenericDatumReader[GenericRecord]] =
        registry.schemasById.map { case (id, json) =>
          val writer = new Schema.Parser().parse(json)
          id -> new GenericDatumReader[GenericRecord](writer, reader)
        }
      val writerNames: Map[Int, String] =
        registry.schemasById.map {
          case (id, json) => id -> new Schema.Parser().parse(json).getName }
      val bodyOff = format.headerLen
      var decoder: BinaryDecoder = null
      var record: GenericRecord = null
      def drop(why: => String): None.type = {
        dropped.add(1)
        if (logDrops) System.err.println(s"[graft.codec] dropped record: $why")
        None
      }

      it.flatMap { bytes =>
        try {
          val id0 = if (bytes == null) None else format.readId(bytes)
          id0 match {
            case None => // null / short / malformed header (e.g. a
              // confluent record whose first byte isn't 0x00)
              drop(s"malformed envelope header (${
                if (bytes == null) "null" else s"${bytes.length} bytes"})")
            case Some(id) =>
              readers.get(id) match {
                case None => // unknown version: drop (ref logs + drops)
                  drop(s"unknown schema version id=$id")
                case Some(_) if writerNames(id) != reader.getName =>
                  // schema-name guard (ref :47-50)
                  drop(s"writer schema '${writerNames(id)}' != reader '${reader.getName}'")
                case Some(r) =>
                  decoder = DecoderFactory.get()
                    .binaryDecoder(bytes, bodyOff, bytes.length - bodyOff, decoder)
                  record = r.read(null, decoder)
                  def optD(f: String): Option[Double] =
                    Option(record.get(f)).map(_.asInstanceOf[Double])
                  Some(WeatherReading(
                    record.get("deviceId").toString,
                    record.get("timestamp").asInstanceOf[Long],
                    optD("temperature"), optD("humidity"),
                    optD("windSpeed"), optD("pressure")))
              }
          }
        } catch {
          case NonFatal(e) => // corrupt body: drop, don't fail the job
            drop(s"corrupt avro body: ${e.getClass.getSimpleName}")
        }
      }
    }
    (decoded, dropped)
  }

  /** DataFrame variant over a binary column named `value`. */
  def decodeColumn(spark: SparkSession, df: DataFrame): Dataset[WeatherReading] = {
    import spark.implicits._
    decode(spark, df.select("value").as[Array[Byte]])
  }
}
