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
    assertThrows[UnsupportedOperationException] {
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
