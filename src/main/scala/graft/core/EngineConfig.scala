package graft.core

/** Job configuration: CLI args merged with system properties — mirroring the
  * reference's `ParameterTool.fromArgs(args)` +
  * `mergeWith(fromSystemProperties())` bootstrap
  * (`WeatherProcessingJob.java:42-45`). Args win over system properties,
  * like the reference's merge order.
  *
  * Accepted arg forms: `--key value`, `--key=value`, `key=value`.
  */
final case class EngineConfig(settings: Map[String, String]) {
  def get(key: String): Option[String] = settings.get(key)
  def getOrElse(key: String, default: String): String =
    settings.getOrElse(key, default)
  def getLong(key: String, default: Long): Long =
    settings.get(key).map(_.toLong).getOrElse(default)
}

object EngineConfig {

  def fromSystemProperties(): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    System.getProperties.asScala.toMap
  }

  def parseArgs(args: Array[String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val body = a.drop(2)
        body.indexOf('=') match {
          case -1 =>
            if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
              out += body -> args(i + 1); i += 1
            } else out += body -> "true"
          case eq => out += body.take(eq) -> body.drop(eq + 1)
        }
      } else if (a.contains('=')) {
        val eq = a.indexOf('=')
        out += a.take(eq) -> a.drop(eq + 1)
      }
      i += 1
    }
    out.result()
  }

  /** System properties first, args override (reference merge order). */
  def apply(args: Array[String]): EngineConfig =
    EngineConfig(fromSystemProperties() ++ parseArgs(args))
}
