package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkEntry
import graft.core.{EngineSession, Tables}
import graft.operators.TxTable

/** Dev probe: where does Q-str-27's IN-SUITE inflation live? Runs the
  * TxTable-heavy prefix that reproduces it, then Q-str-27's body with
  * per-phase timers (setup commits vs each drain). */
object Str27Probe {
  def main(args: Array[String]): Unit = {
    val s = EngineSession.getOrCreate("str27-probe")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val prefix = Seq("Q-qual-06", "Q-qual-08", "Q-qual-09", "Q-qual-10",
      "Q-qual-11", "Q-qual-13", "Q-qual-14", "Q-qual-15", "Q-qual-16",
      "Q-qual-17", "Q-qual-18", "Q-qual-20", "Q-qual-21")
    val reps = args.find(_.startsWith("--reps=")).map(_.drop(7).toInt)
      .getOrElse(if (args.contains("--solo")) 0 else 1)
    for (r <- 1 to reps; q <- prefix) {
      t(s"$q#$r")(SparkEntry.queries(q)(s, d)
        .write.format("noop").mode("overwrite").save())
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      try {
        val cls = Class.forName(
          "org.apache.spark.sql.execution.streaming.state.StateStore$")
        cls.getMethod("stop").invoke(cls.getField("MODULE$").get(null))
      } catch { case _: Throwable => () }
      System.gc()
    }
    // Q-str-27 body, phase-timed
    (1 to 2).foreach { run =>
      val tmp = graft.queries.tempDir(s"probe_str27_$run")
      val (src, dst) = (s"$tmp/src", s"$tmp/dst")
      val ckpt = graft.queries.tempDir(s"probe_ckpt_$run").toString
      val ev = Tables.events(s, d)
      val wOrd = Window.orderBy(col("ts"), col("event_id"))
      val chunked = ev.withColumn("chunk", ntile(4).over(wOrd))
      t(s"r$run-setup") {
        TxTable.create(chunked.filter(col("chunk") === 1).drop("chunk")
          .coalesce(1), src, statsKey = Some("ts"))
        (2 to 4).foreach { c =>
          TxTable.append(s, src,
            chunked.filter(col("chunk") === c).drop("chunk").coalesce(1))
        }
      }
      def drain(label: String): Unit = t(label) {
        val q = s.readStream.format("graft")
          .option("maxVersionsPerTrigger", "1").load(src)
          .withWatermark("ts", "3500 milliseconds")
          .groupBy(window(col("ts"), "10 seconds"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select((floor(unix_timestamp(col("window.start"))).cast("long")).as("ws_sec"),
            col("event_type"), col("n"))
          .writeStream.outputMode("update")
          .format("graft").option("path", dst)
          .option("mergeKeys", "ws_sec,event_type")
          .option("statsKey", "ws_sec")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // per-batch phase breakdown: which micro-batch phase inflates
      // in-suite? (queryPlanning = analyzer/optimizer; addBatch = the
      // sink's merge commit; latestOffset/getBatch = source log reads)
      val phases = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val lst = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val d = e.progress.durationMs
          phases.add(f"batch=${e.progress.batchId}%2d total=${d.getOrDefault("triggerExecution", -1L)}%6d " +
            f"plan=${d.getOrDefault("queryPlanning", -1L)}%5d add=${d.getOrDefault("addBatch", -1L)}%6d " +
            f"off=${d.getOrDefault("latestOffset", -1L)}%5d get=${d.getOrDefault("getBatch", -1L)}%5d " +
            f"wal=${d.getOrDefault("walCommit", -1L)}%5d st=${d.getOrDefault("commitOffsets", -1L)}%5d")
        }
      }
      s.streams.addListener(lst)
      val gcB = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      def gcMs: Long = { var t = 0L; gcB.forEach(b => t += b.getCollectionTime); t }
      val gc0 = gcMs
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.forEach { p =>
        if (p.getName.contains("CodeHeap") || p.getName.contains("Metaspace"))
          println(f"[probe] pool ${p.getName}%-28s used=${p.getUsage.getUsed / 1048576}%5d MB max=${p.getUsage.getMax / 1048576}%5d MB")
      }
      val ct = java.lang.management.ManagementFactory.getCompilationMXBean
      println(s"[probe] jit-total-ms ${ct.getTotalCompilationTime}")
      drain(s"r$run-drain1")
      println(s"[probe] gc-in-drain1 ${gcMs - gc0} ms")
      phases.forEach(p => println(s"[probe]   $p"))
      phases.clear()
      drain(s"r$run-drain2")
      s.streams.removeListener(lst)
      t(s"r$run-read")(TxTable.read(s, dst).orderBy("ws_sec", "event_type")
        .write.format("noop").mode("overwrite").save())
    }
    s.stop()
  }
}
