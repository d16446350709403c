package graft.tools

import graft.codec.AvroEnvelope
import graft.core.EngineSession

/** Dev tool: write a small envelope parquet dir for CLI runs of WeatherJob. */
object MakeEnvelopes {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/wjob_src")
    val s = EngineSession.getOrCreate("mkenv")
    import s.implicits._
    val t0 = 1700000000000L
    val rows = for (d <- 0 until 5; i <- 0 until 20) yield {
      val gap = if (d == 0 && i >= 10) 7200000L else 0L // device 0: one 2h gap
      AvroEnvelope.encode(
        AvroEnvelope.WeatherReading(s"dev-$d", t0 + i * 60000L + gap,
          Some(15.0 + i), Some(40.0), None, Some(1000.0)),
        if (i % 2 == 0) 1 else 2, AvroEnvelope.defaultRegistry)
    }
    rows.toDF("value").coalesce(1).write.mode("overwrite").parquet(out)
    println(s"MKENV wrote ${rows.size} envelopes to $out")
    s.stop()
  }
}
