ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "weatherflinkspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output defaults to the sbt logger, which prefixes every
// stdout line with "[info] " — the bench driver json-parses the final
// stdout line, so pass the program's stdout through verbatim instead.
run / outputStrategy := Some(StdoutOutput)
// The bench driver keeps only the last ~2000 bytes of stdout and parses the
// final line as JSON; sbt's "[success] Total time..." epilogue would land
// after Bench's JSON line and break that parse. Suppress it globally.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// local[32] runs 32 concurrent tasks in this one JVM; 8g leaves only
// ~150MB execution memory per task and produced GC-bound outliers in bench
// runs. Default to a quarter of physical RAM, clamped to [4g, 32g] so the
// JVM still starts on small hosts; override with SPARK_DRIVER_MEM (=32g for
// bench runs on this 128 GiB machine).
val defaultHeap: String = {
  val memTotalKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        l.trim.split("\\s+")(1).toLong }
      .getOrElse(64L * 1024 * 1024)
    catch { case _: Exception => 64L * 1024 * 1024 }
  val gb = (memTotalKb / 1024 / 1024 / 4).max(4).min(32)
  s"${gb}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // even with the UI off, the app-status listeners retain per-execution
  // plan graphs / job / stage / task data up to these limits (defaults:
  // 1000 executions, 1000 stages, 100k tasks); over a 115-query bench
  // suite that is hundreds of MB of old-gen churn that inflates every
  // LATE query — the round-5 position-correlated pattern. Keep a small
  // recent window; nothing in the harness reads the history.
  "-Dspark.sql.ui.retainedExecutions=20",
  "-Dspark.ui.retainedJobs=100",
  "-Dspark.ui.retainedStages=200",
  "-Dspark.ui.retainedTasks=5000",
  "-Dspark.sql.streaming.numRecentProgressUpdates=20",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
)

// Fast iteration subset (round-9): the full `test` stays the gate;
// `fastTest` excludes the tagged soak/scale cases (graft.SlowTest) so a
// mid-round edit gets a correctness signal in a fraction of the wall.
addCommandAlias("fastTest", "testOnly * -- -l graft.SlowTest")
