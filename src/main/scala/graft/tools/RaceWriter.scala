package graft.tools

import org.apache.spark.sql.functions.{col, lit}

import graft.core.EngineSession
import graft.operators.TxTable

/** Cross-process writer for the TxTable concurrency spec: appends
  * `count` one-row batches (tagged `proc=<who>/epoch=<i>`) to the table
  * at `root` from a SEPARATE JVM, so the optimistic hard-link commit
  * protocol is exercised across real process boundaries — the situation
  * two ingest jobs on different driver nodes are in — not just across
  * threads sharing a JVM. Exits 0 when every append committed. */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    val Array(root, who, countStr) = args.take(3)
    val n = countStr.toInt
    val spark = EngineSession.getOrCreate(s"race-writer-$who")
    try {
      (0 until n).foreach { i =>
        val batch = spark.range(1).select(
          (col("id") + i).as("k"), lit(s"$who-$i").as("v"))
        val r = TxTable.append(spark, root, batch,
          tag = Some(s"proc=$who/epoch=$i"))
        require(!r.skipped, s"fresh epoch tag unexpectedly skipped: $who-$i")
      }
    } finally spark.stop()
  }
}
