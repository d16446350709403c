package graft.tools

import graft.SparkEntry
import graft.core.EngineSession

/** Dev tool: write `explain("formatted")` of named queries to files —
  * the plan evidence the optimization ledger commits under `plans/<tag>/`.
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <sfDir> <query>...
  * Writes `<outDir>/<query>_<suffix>.txt` per query (e.g. suffix
  * `before`/`after`). Lifecycle queries that mutate temp tables at build
  * time run their side effects once; the dumped plan is the returned
  * DataFrame's — the same frame the bench times through the noop sink.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainDump <outDir> <suffix> <sfDir> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val d = args(2)
    val s = EngineSession.getOrCreate("explain-dump")
    args.drop(3).foreach { name =>
      try {
        val df = SparkEntry.queries(name)(s, d)
        // capture the pre-execution formatted plan (Exchange placement,
        // join strategy, PushedFilters/ReadSchema as planned)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          outDir.resolve(s"${name}_$suffix.txt"), formatted)
        println(s"[explain-dump] wrote ${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[explain-dump] $name failed: ${e.getMessage}")
      }
    }
    s.stop()
  }
}
