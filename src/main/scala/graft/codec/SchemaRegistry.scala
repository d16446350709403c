package graft.codec

import java.nio.file.{Files, Paths}

import graft.core.EngineConfig

/** Writer-schema resolution as an interface — the last envelope-parity gap
  * between the in-repo registry and a deployment-grade one.
  *
  * The reference resolves writer schemas from an in-process map
  * (`WeatherKafkaAvroDeserializerSchema.java:38,43-46`); production
  * deployments resolve them from a registry SERVICE (confluent-style:
  * magic prefix → schema id → HTTP lookup, cached). This trait is the seam
  * between the two: [[AvroEnvelope.decode]] and [[graft.WeatherJob]] only
  * see the trait, so swapping the in-repo map for a remote registry is a
  * `--schema.registry` config change plus one new impl — no decode-path or
  * job edits.
  *
  * Contract notes for implementors:
  *  - instances ship to executors inside `mapPartitions` closures, so an
  *    impl must be [[Serializable]] and resolve its schema set EAGERLY on
  *    the driver (a lazy remote fetch per executor would hammer the
  *    registry once per task and fail non-deterministically mid-job —
  *    fetch once, ship the strings);
  *  - `schemasByMagic` values are schema JSON strings (parsed per
  *    partition by the decode path), keyed by the envelope magic byte.
  */
trait SchemaRegistry extends Serializable {

  /** magic byte → writer schema JSON for every known envelope version. */
  def schemasByMagic: Map[Byte, String]

  /** The pinned reader schema JSON (what the job's plan consumes). */
  def readerSchemaJson: String
}

/** The in-repo registry: a static map, parity with the reference's
  * in-process resolution. */
final case class StaticSchemaRegistry(
    schemasByMagic: Map[Byte, String],
    readerSchemaJson: String) extends SchemaRegistry

/** A registry materialized from files — the deployment-config analog of a
  * remote registry that this zero-egress environment can actually
  * exercise: a directory holding `<magic>.avsc` writer schemas and
  * `reader.avsc`. Resolution happens eagerly at construction (driver
  * side), so executors receive plain strings — the same shape a
  * confluent-style HTTP impl of this trait would have after its fetch.
  */
final case class DirectorySchemaRegistry(dir: String) extends SchemaRegistry {
  val (schemasByMagic: Map[Byte, String], readerSchemaJson: String) = {
    val base = Paths.get(dir)
    require(Files.isDirectory(base),
      s"schema registry directory not found: $dir")
    import scala.jdk.CollectionConverters._
    val files = Files.list(base).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".avsc")).toSeq
    val writers = files.flatMap { p =>
      val stem = p.getFileName.toString.stripSuffix(".avsc")
      stem.toByteOption.map(_ -> Files.readString(p))
    }.toMap
    val readerPath = base.resolve("reader.avsc")
    require(Files.exists(readerPath),
      s"schema registry directory $dir has no reader.avsc")
    require(writers.nonEmpty,
      s"schema registry directory $dir has no <magic>.avsc writer schemas")
    (writers, Files.readString(readerPath))
  }
}

object SchemaRegistry {

  /** The default in-repo two-version registry (v1/v2 + the alien-name
    * guard fixture). */
  val static: SchemaRegistry =
    StaticSchemaRegistry(AvroEnvelope.defaultRegistry, AvroEnvelope.readerSchemaJson)

  /** Config-selected resolution — `--schema.registry`:
    *  - `static` (default): the in-repo map;
    *  - `dir`: [[DirectorySchemaRegistry]] at `--schema.registry.dir`;
    *  - `http`: the confluent-style remote seam. No egress exists in this
    *    environment, so selecting it fails fast with the contract the impl
    *    must fulfill rather than pretending to resolve.
    */
  def fromConfig(conf: EngineConfig): SchemaRegistry =
    conf.getOrElse("schema.registry", "static") match {
      case "static" => static
      case "dir" => DirectorySchemaRegistry(conf.get("schema.registry.dir")
        .getOrElse(throw new IllegalArgumentException(
          "--schema.registry dir requires --schema.registry.dir <path>")))
      case "http" => throw new UnsupportedOperationException(
        "schema.registry=http: implement SchemaRegistry with a driver-side " +
        "eager fetch (subjects -> {magic, schema JSON} map + reader schema), " +
        "serializable to executors; no remote registry exists in this environment")
      case other => throw new IllegalArgumentException(
        s"unknown --schema.registry '$other' (static | dir | http)")
    }
}
