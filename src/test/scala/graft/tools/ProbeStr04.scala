package graft.tools

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{EngineSession, Tables}

/** Dev probe (test scope — `Test/runMain graft.tools.ProbeStr04`) for the
  * Q-str-04 late-data replay mechanics (batch split, watermark advance,
  * drop counts). Not part of the driver contract. */
object ProbeStr04 {
  def main(args: Array[String]): Unit = {
    val s = EngineSession.getOrCreate("probe")
    val d = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("probe_str04")
    val ev = Tables.events(s, d)
    ev.filter(col("ts") >= to_timestamp(lit("2024-01-20")) && col("event_id") % 2 === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/ontime")
    ev.filter(col("ts") >= to_timestamp(lit("2024-01-20")) && col("event_id") % 2 === 1)
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/ontime2")
    ev.filter(col("ts") < to_timestamp(lit("2024-01-05")))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/late")
    val dir = Files.createDirectory(tmp.resolve("stream"))
    def copyParts(src: Path, prefix: String, t: Long): Unit =
      Files.list(src).toArray.map(_.asInstanceOf[Path])
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          val dst = dir.resolve(s"$prefix$i.parquet")
          Files.copy(f, dst)
          Files.setLastModifiedTime(dst, FileTime.fromMillis(t))
        }
    copyParts(tmp.resolve("ontime"), "a_", 1000000000000L)
    copyParts(tmp.resolve("ontime2"), "a2_", 1000000050000L)
    copyParts(tmp.resolve("late"), "b_", 1000000100000L)

    val raw = s.read.parquet(s"$tmp/ontime")
    val stream = s.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString)
      .withWatermark("ts", "3500 milliseconds")
      .groupBy(window(col("ts"), "10 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("probe04b")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("probe_ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      val drops = Option(p.stateOperators).toSeq.flatten
        .map(_.numRowsDroppedByWatermark).sum
      println(s"PROBE batch=${p.batchId} inRows=${p.numInputRows} dropped=$drops " +
        s"watermark=${p.eventTime.get("watermark")}")
    }
    println(s"PROBE sinkRows=${s.table("probe04b").count()}")
    s.stop()
  }
}
