package graft.tools

import graft.SparkEntry
import graft.core.EngineSession

/** Dev tool: print the final (AQE-materialized) physical plan of named
  * queries. Usage: runMain graft.tools.PlanDump <sfDir> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = EngineSession.getOrCreate("plan-dump")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(s, d)
      df.collect() // finalize AQE
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head)
    }
    s.stop()
  }
}
