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

  /** writer-schema id → schema JSON — the format-agnostic view the
    * decode path resolves through (round 12: the confluent 5-byte wire
    * format carries ids that don't fit a byte). The default bridges the
    * 1-byte map (the magic IS the id); registries with wider id spaces
    * override it. */
  def schemasById: Map[Int, String] =
    schemasByMagic.map { case (m, s) => m.toInt -> s }

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

/** A registry resolved from a confluent-style HTTP schema-registry
  * service: writer schemas by id (`GET {base}/schemas/ids/{id}` →
  * `{"schema": "<json>"}`) and the pinned reader schema from a subject
  * (`GET {base}/subjects/{subject}/versions/latest`). Resolution is
  * EAGER at construction ON THE DRIVER (the trait contract): executors
  * receive plain schema strings inside the closure, so a 1000-executor
  * job makes ids+1 registry requests TOTAL, not one per task. Any
  * missing id / unreachable registry fails the job at wiring time with
  * the failing URL — never mid-stream on some executor. The envelope's
  * magic byte doubles as the registry schema id (the repo's envelopes
  * are 1-byte-id; a 4-byte-id wire format would change only [[toMagic]]).
  *
  * Exercised end-to-end against an in-process localhost HTTP double in
  * SchemaRegistrySpec (this environment has no egress, but the protocol,
  * eager-fetch contract, caching, and failure modes are all executed). */
final case class HttpSchemaRegistry(
    baseUrl: String, writerIds: Seq[Int], readerSubject: String,
    timeoutMs: Int = 5000) extends SchemaRegistry {

  private def toMagic(id: Int): Byte = {
    require(id >= Byte.MinValue && id <= Byte.MaxValue,
      s"schema id $id does not fit the 1-byte envelope magic " +
        "(use --envelope.format confluent for 4-byte ids)")
    id.toByte
  }

  val (fetchedById: Map[Int, String], readerSchemaJson: String) = {
    // a trailing slash in baseUrl would yield '//' paths (some registries
    // 404 on them) — normalize once here
    val base = baseUrl.reverse.dropWhile(_ == '/').reverse
    def get(path: String): String = {
      val url = java.net.URI.create(base + path).toURL
      val conn = url.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      try {
        val code = conn.getResponseCode
        require(code == 200, s"schema registry GET $url returned $code")
        new String(conn.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
      } finally conn.disconnect()
    }
    // {"schema": "<escaped schema json>"} — the confluent response shape
    def schemaField(body: String, from: String): String = {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(body).get("schema")
      require(node != null && node.isTextual,
        s"schema registry response from $from has no \"schema\" field: $body")
      node.asText()
    }
    val writers = writerIds.map { id =>
      id -> schemaField(get(s"/schemas/ids/$id"), s"id $id")
    }.toMap
    // URL-encode the subject path segment: a subject with URL-reserved
    // characters (space, '/', '%') must fail with the registry-oriented
    // error this class guarantees (a 404 naming the URL), not an opaque
    // IllegalArgumentException out of URI.create
    val subjectSeg = java.net.URLEncoder.encode(
        readerSubject, java.nio.charset.StandardCharsets.UTF_8)
      .replace("+", "%20") // form-encoding '+' is not path-segment encoding
    val reader = schemaField(
      get(s"/subjects/$subjectSeg/versions/latest"), readerSubject)
    (writers, reader)
  }

  override def schemasById: Map[Int, String] = fetchedById

  /** The 1-byte bridge — legal only when every fetched id fits the
    * envelope magic. Checked HERE (on use, not at construction) so a
    * confluent-format deployment may carry production-sized ids; a
    * Magic1-format job wired to such a registry still fails loudly at
    * wiring time via [[AvroEnvelope.decodeWithMetrics]]'s id-range
    * guard. */
  def schemasByMagic: Map[Byte, String] =
    fetchedById.map { case (id, s) => toMagic(id) -> s }
}

object SchemaRegistry {

  /** The default in-repo two-version registry (v1/v2 + the alien-name
    * guard fixture). */
  val static: SchemaRegistry =
    StaticSchemaRegistry(AvroEnvelope.defaultRegistry, AvroEnvelope.readerSchemaJson)

  /** Config-selected resolution — `--schema.registry`:
    *  - `static` (default): the in-repo map;
    *  - `dir`: [[DirectorySchemaRegistry]] at `--schema.registry.dir`;
    *  - `http`: [[HttpSchemaRegistry]] at `--schema.registry.url`, writer
    *    ids from `--schema.registry.ids` (comma list, default "1,2" — the
    *    envelope's known versions), reader subject from
    *    `--schema.registry.reader` (default "weatherData-reader").
    */
  def fromConfig(conf: EngineConfig): SchemaRegistry =
    conf.getOrElse("schema.registry", "static") match {
      case "static" => static
      case "dir" => DirectorySchemaRegistry(conf.get("schema.registry.dir")
        .getOrElse(throw new IllegalArgumentException(
          "--schema.registry dir requires --schema.registry.dir <path>")))
      case "http" => HttpSchemaRegistry(
        conf.get("schema.registry.url")
          .getOrElse(throw new IllegalArgumentException(
            "--schema.registry http requires --schema.registry.url <base>")),
        conf.getOrElse("schema.registry.ids", "1,2")
          .split(",").map(_.trim.toInt).toSeq,
        conf.getOrElse("schema.registry.reader", "weatherData-reader"))
      case other => throw new IllegalArgumentException(
        s"unknown --schema.registry '$other' (static | dir | http)")
    }
}
