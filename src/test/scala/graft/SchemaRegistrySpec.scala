package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{AvroEnvelope, DirectorySchemaRegistry, SchemaRegistry, StaticSchemaRegistry}
import graft.codec.AvroEnvelope.WeatherReading
import graft.core.{EngineConfig, EngineSession}

/** The SchemaRegistry interface: decode resolves writer schemas through
  * the trait, the in-repo map is one impl among equals, and registry
  * selection is a config change (the confluent-style remote seam). */
class SchemaRegistrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private def enc(id: String, magic: Byte): Array[Byte] =
    AvroEnvelope.encode(
      WeatherReading(id, 1L, Some(20.0), None, None, None),
      magic, AvroEnvelope.defaultRegistry)

  test("fromConfig default is the static in-repo registry") {
    val reg = SchemaRegistry.fromConfig(EngineConfig(Array.empty[String]))
    assert(reg.schemasByMagic == AvroEnvelope.defaultRegistry)
    assert(reg.readerSchemaJson == AvroEnvelope.readerSchemaJson)
  }

  test("decode through the interface equals decode through the map default") {
    import spark.implicits._
    val envelopes = spark.createDataset(Seq(enc("a", 1), enc("b", 2)))
    val viaTrait = AvroEnvelope.decode(spark, envelopes,
      SchemaRegistry.static).collect().sortBy(_.deviceId).toSeq
    val viaMap = AvroEnvelope.decode(spark, envelopes)
      .collect().sortBy(_.deviceId).toSeq
    assert(viaTrait == viaMap)
    assert(viaTrait.map(_.deviceId) == Seq("a", "b"))
  }

  test("DirectorySchemaRegistry resolves <magic>.avsc + reader.avsc and decodes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schema_reg")
    Files.writeString(dir.resolve("1.avsc"), AvroEnvelope.v1SchemaJson)
    Files.writeString(dir.resolve("2.avsc"), AvroEnvelope.v2SchemaJson)
    Files.writeString(dir.resolve("reader.avsc"), AvroEnvelope.readerSchemaJson)
    val reg = SchemaRegistry.fromConfig(EngineConfig(Array(
      "--schema.registry", "dir", "--schema.registry.dir", dir.toString)))
    assert(reg.isInstanceOf[DirectorySchemaRegistry])
    assert(reg.schemasByMagic.keySet == Set(1.toByte, 2.toByte))
    // v1 envelope resolved via the dir registry: pressure (reader-only
    // field) defaults to null — the schema-resolution path, not a re-read
    val out = AvroEnvelope.decode(spark,
      spark.createDataset(Seq(enc("v1dev", 1))), reg).collect()
    assert(out.map(_.deviceId).toSeq == Seq("v1dev"))
    assert(out.head.pressure.isEmpty)
  }

  test("registry selection failure modes are loud") {
    assertThrows[IllegalArgumentException] { // http without a url
      SchemaRegistry.fromConfig(EngineConfig(Array("--schema.registry", "http")))
    }
    assertThrows[IllegalArgumentException] {
      SchemaRegistry.fromConfig(EngineConfig(Array("--schema.registry", "zk")))
    }
    assertThrows[IllegalArgumentException] { // dir without a path
      SchemaRegistry.fromConfig(EngineConfig(Array("--schema.registry", "dir")))
    }
    assertThrows[IllegalArgumentException] { // dir that does not exist
      DirectorySchemaRegistry("/nonexistent/registry/path")
    }
  }

  test("HttpSchemaRegistry: confluent-style eager driver fetch, decode parity, no per-task traffic") {
    import spark.implicits._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def body(schema: String): Array[Byte] = {
      val n = om.createObjectNode(); n.put("schema", schema)
      om.writeValueAsBytes(n)
    }
    val routes = Map(
      "/schemas/ids/1" -> body(AvroEnvelope.v1SchemaJson),
      "/schemas/ids/2" -> body(AvroEnvelope.v2SchemaJson),
      "/subjects/weatherData-reader/versions/latest" ->
        body(AvroEnvelope.readerSchemaJson))
    val hits = new java.util.concurrent.atomic.AtomicInteger
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        hits.incrementAndGet()
        routes.get(ex.getRequestURI.getPath) match {
          case Some(b) =>
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val reg = SchemaRegistry.fromConfig(EngineConfig(Array(
        "--schema.registry", "http", "--schema.registry.url", url)))
      // the fetched registry IS the static one, resolved over the wire
      assert(reg.schemasByMagic == Map(
        1.toByte -> AvroEnvelope.v1SchemaJson,
        2.toByte -> AvroEnvelope.v2SchemaJson))
      assert(reg.readerSchemaJson == AvroEnvelope.readerSchemaJson)
      val fetched = hits.get()
      assert(fetched == 3, s"eager fetch = 2 ids + 1 reader, got $fetched")
      // decode parity through the http-resolved registry — and the
      // executors must NOT re-contact the registry (the trait's
      // driver-side eager contract is what makes 1000 executors safe)
      val out = AvroEnvelope.decode(spark,
        spark.createDataset(Seq(enc("a", 1), enc("b", 2))), reg)
        .collect().sortBy(_.deviceId)
      assert(out.map(_.deviceId).toSeq == Seq("a", "b"))
      assert(hits.get() == fetched,
        "decode re-contacted the registry: eager-fetch contract broken")
      // a missing schema id fails FAST at wiring time, naming the URL
      val e = intercept[IllegalArgumentException] {
        graft.codec.HttpSchemaRegistry(url, Seq(1, 7), "weatherData-reader")
      }
      assert(e.getMessage.contains("/schemas/ids/7"))
      // an id outside the 1-byte envelope magic is refused ON THE
      // 1-byte bridge (round 12: construction itself now allows wide
      // ids for the confluent wire format)
      val e2 = intercept[IllegalArgumentException] {
        graft.codec.HttpSchemaRegistry(url, Seq(1000), "weatherData-reader")
      }
      assert(e2.getMessage.contains("/schemas/ids/1000")) // not served here
    } finally server.stop(0)
  }

  test("confluent 5-byte wire format: registry ids beyond a byte round-trip " +
      "through the HTTP double; unknown-id and malformed headers drop") {
    import spark.implicits._
    import graft.codec.EnvelopeFormat
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def body(schema: String): Array[Byte] = {
      val n = om.createObjectNode(); n.put("schema", schema)
      om.writeValueAsBytes(n)
    }
    val routes = Map(
      "/schemas/ids/100042" -> body(AvroEnvelope.v1SchemaJson),
      "/schemas/ids/100043" -> body(AvroEnvelope.v2SchemaJson),
      "/subjects/weatherData-reader/versions/latest" ->
        body(AvroEnvelope.readerSchemaJson))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        routes.get(ex.getRequestURI.getPath) match {
          case Some(b) =>
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val reg = graft.codec.HttpSchemaRegistry(
        url, Seq(100042, 100043), "weatherData-reader")
      assert(reg.schemasById.keySet == Set(100042, 100043))
      // the 1-byte bridge refuses these ids; the id view carries them
      assertThrows[IllegalArgumentException] { reg.schemasByMagic }
      def encC(id: String, schemaId: Int, schema: String): Array[Byte] =
        AvroEnvelope.encode(
          WeatherReading(id, 1L, Some(20.0), None, None, None),
          schemaId, schema, EnvelopeFormat.Confluent)
      val good1 = encC("a", 100042, AvroEnvelope.v1SchemaJson)
      assert(good1(0) == 0 && good1.length > 5) // 0x00 + 4-byte BE id
      assert(((good1(1) & 0xff) << 24 | (good1(2) & 0xff) << 16 |
        (good1(3) & 0xff) << 8 | (good1(4) & 0xff)) == 100042)
      val good2 = encC("b", 100043, AvroEnvelope.v2SchemaJson)
      val unknownId = encC("x", 999999, AvroEnvelope.v1SchemaJson)
      // a 1-byte-magic envelope read as confluent: first byte != 0x00
      val wrongFormat = enc("y", 1)
      val (out, droppedAcc) = AvroEnvelope.decodeWithMetrics(spark,
        spark.createDataset(Seq(good1, good2, unknownId, wrongFormat)),
        reg, EnvelopeFormat.Confluent)
      val rows = out.collect().sortBy(_.deviceId)
      assert(rows.map(_.deviceId).toSeq == Seq("a", "b"))
      assert(rows.head.pressure.isEmpty) // v1 writer -> reader default
      assert(droppedAcc.value == 2, s"expected 2 drops, got ${droppedAcc.value}")
      // a Magic1-format job wired to this wide-id registry fails LOUDLY
      // at wiring time, not by silently dropping every record
      val e = intercept[IllegalArgumentException] {
        AvroEnvelope.decode(spark,
          spark.createDataset(Seq(good1)), reg, EnvelopeFormat.Magic1)
      }
      assert(e.getMessage.contains("confluent"), e.getMessage)
    } finally server.stop(0)
  }

  test("HttpSchemaRegistry: trailing-slash baseUrl and URL-reserved subject " +
      "characters resolve (round-11 ADVICE)") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def body(schema: String): Array[Byte] = {
      val n = om.createObjectNode(); n.put("schema", schema)
      om.writeValueAsBytes(n)
    }
    val paths = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        // raw (still-encoded) path: '//' or an unencoded space would
        // surface here exactly as a real registry router sees them
        val raw = ex.getRequestURI.getRawPath
        paths.add(raw)
        val ok = raw == "/schemas/ids/1" ||
          raw == "/subjects/my%20subject%2Fv1/versions/latest"
        if (ok) {
          val b = body(AvroEnvelope.v1SchemaJson)
          ex.sendResponseHeaders(200, b.length)
          ex.getResponseBody.write(b)
        } else ex.sendResponseHeaders(404, -1)
        ex.close()
      })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/" // trailing /
      val reg = graft.codec.HttpSchemaRegistry(
        url, Seq(1), "my subject/v1") // space + slash in the subject
      assert(reg.readerSchemaJson == AvroEnvelope.v1SchemaJson)
      import scala.jdk.CollectionConverters._
      assert(paths.asScala.forall(p => !p.startsWith("//")),
        s"trailing-slash baseUrl produced '//' paths: ${paths.asScala.toSeq}")
      // and a reserved-character subject that the registry DOESN'T know
      // fails with the registry-oriented message (the URL), not an
      // opaque URI parse error
      val e = intercept[IllegalArgumentException] {
        graft.codec.HttpSchemaRegistry(url, Seq(1), "no such subject")
      }
      assert(e.getMessage.contains("schema registry GET"), e.getMessage)
    } finally server.stop(0)
  }

  test("an alien-named writer schema still drops through a custom registry") {
    import spark.implicits._
    val reg = StaticSchemaRegistry(
      Map(9.toByte -> AvroEnvelope.alienSchemaJson),
      AvroEnvelope.readerSchemaJson)
    val alien = AvroEnvelope.encode(
      WeatherReading("alien", 7L, None, None, None, None), 9,
      AvroEnvelope.defaultRegistry)
    val out = AvroEnvelope.decode(spark,
      spark.createDataset(Seq(alien)), reg).collect()
    assert(out.isEmpty)
  }
}
