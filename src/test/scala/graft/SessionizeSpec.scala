package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.streaming.{Replay, Sessionize}

/** Hand-computed fixtures for the timer-driven sessionizer, plus the
  * batching-invariance claim: the emitted sessions are a pure function of
  * the event set, no matter how rows split across micro-batches.
  */
class SessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private val gap = 10000L // 10 s

  // user 1: two sessions [0s..5s] (3 events) and [60s..62s] (2 events);
  // user 2: one single-event session at 30s. Sentinel user -1 far in the
  // future closes every real session's timer.
  private val base = 1700000000000L
  private val fixture = Seq(
    (1L, 0L), (1L, 3000L), (1L, 5000L), (1L, 60000L), (1L, 62000L),
    (2L, 30000L),
    (-1L, 10L * 3600 * 1000))

  private def run(filesPerTrigger: Int): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_sess_spec")
    val streamDir = Files.createDirectory(tmp.resolve("stream"))
    val rows = fixture.map { case (u, off) =>
      (u, new java.sql.Timestamp(base + off))
    }
    // one parquet file per event so filesPerTrigger controls batching
    rows.zipWithIndex.foreach { case ((u, ts), i) =>
      Seq((u, ts)).toDF("user_id", "ts")
        .coalesce(1).write.parquet(s"$tmp/f$i")
      val part = Files.list(java.nio.file.Paths.get(s"$tmp/f$i"))
      try part.filter(_.toString.endsWith(".parquet")).forEach { p =>
        Files.copy(p, streamDir.resolve(s"in_$i.parquet"))
        Files.setLastModifiedTime(
          streamDir.resolve(s"in_$i.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 1000))
      } finally part.close()
    }
    val schema = spark.read.parquet(s"$tmp/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(streamDir.toString)
      .withWatermark("ts", "1 second")
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try
      Replay.run(Sessionize.sessions(spark, stream, gap).toDF(), "append")
        .filter(col("user_id") =!= -1)
        .orderBy("user_id", "session_start_ms")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private val expected = Seq(
    (1L, base, base + 5000L, 3L),
    (1L, base + 60000L, base + 62000L, 2L),
    (2L, base + 30000L, base + 30000L, 1L))

  test("sessionizer emits hand-computed sessions (one file per batch)") {
    assert(run(filesPerTrigger = 1) == expected)
  }

  test("sessionizer output is invariant to micro-batch boundaries") {
    assert(run(filesPerTrigger = 100) == expected)
  }
}
