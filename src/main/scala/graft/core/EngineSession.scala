package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine.
  *
  * Mirrors the reference job's environment setup
  * (`/root/reference/src/main/java/com/weather/flink/weather/WeatherProcessingJob.java:52-63`:
  * configuration merge, parallelism, watermark interval) re-expressed as
  * Spark session conf. Scale posture:
  *   - AQE on (runtime re-plan, skew-join splitting, coalesced shuffle
  *     partitions) — on a real cluster this is what absorbs skew at 100 TB;
  *   - shuffle partitions sized to the local core count (32) instead of the
  *     200 default; on a cluster this would be ~2-3x total executor cores;
  *   - UTC session timezone pinned for oracle parity;
  *   - broadcast threshold left at default 10 MB — dimension tables
  *     (region/nation/supplier/part at any SF we see) broadcast automatically.
  */
object EngineSession {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft-engine"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      // the library's install hook: native expressions (cosine_sim,
      // l2_distance, minhash_sig) + the metadata-aggregate optimizer
      // rule ride every session this factory builds — the same config a
      // cluster deployment sets via spark.sql.extensions
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE coalescing stays at the stock parallelism-first default:
      // measured on this box, respecting the 64 MB advisory globally
      // serialized the CPU-bound iterative plans (the 420 MB triangle
      // wedge join 8 s → 27 s, pointer-jumping CC 16 s → 45 s when their
      // mid-loop exchanges collapsed to ~7-12 partitions). The one place
      // the advisory IS right — table-file staging, where near-empty
      // output files cost per-file writer init, footer reads, and log
      // entries — scopes it locally (TxTable.withFileSizedCoalesce)
      // around the staged write instead of taxing every query.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ObjectHashAggregate (TypedImperativeAggregate path, e.g.
      // minhash_sig) falls back to sort-based after only 128 distinct keys
      // per partition by default — our group counts (one per doc_id) are
      // far higher and fit comfortably; keep the hash path
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
              "10000000")
      // runtime bloom-filter joins (Q-join-13): the default gate requires a
      // 10 GB application-side scan, which local SFs never reach — drop the
      // gate so the local plans exercise the same runtime-filter path a
      // 100 TB fact table would take (cluster deployments keep the default)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter" +
              ".applicationSideScanSizeThreshold", "0")
      // the UI is off but the live AppStatusStore still ingests every
      // job/stage/task event at default retention (1000 jobs / 1000
      // stages / 100k tasks / 1000 SQL executions); a long suite (or a
      // long-lived pipeline driver) accumulates to those caps and then
      // pays eviction bookkeeping on EVERY job end — measured as +50%
      // micro-batch latency on streaming drains that run late in the
      // 111-query bench. A pipeline driver needs minutes of history at
      // most, not the full app's
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "5000")
      .config("spark.sql.ui.retainedExecutions", "50")
      .config("spark.ui.retainedDeadExecutors", "10")
      // commit-path latency: v2 task commit renames task output straight
      // to the destination (v1 adds a serialized job-commit rename pass
      // on the driver), and the _SUCCESS marker is one more driver-side
      // file create per write job. The ACID layer (TxTable) never trusts
      // directory presence — a commit exists only when the log references
      // its files — so neither v1's stronger job-commit atomicity nor the
      // marker buys anything here, while multi-commit pipelines pay both
      // on every tiny staging write.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
              "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter" +
              ".marksuccessfuljobs", "false")
      // streaming state store + checkpoint root for local runs
      .config("spark.sql.streaming.checkpointLocation",
              sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-ckpt")
      // the default FileContext checkpoint manager routes every rename
      // through RawLocalFileSystem.getFileLinkStatus, which EXECS a
      // readlink shell per call (3-4 process forks per rename x 32 state
      // partitions x every micro-batch); fork cost grows with JVM RSS,
      // so streaming drains late in a long suite ran 2x their solo time
      // (jstack-profiled: 442/~960 runnable samples in forkAndExec).
      // On a POSIX local FS, FileSystem.rename is already atomic — use
      // the FileSystem-based manager; HDFS/object-store deployments
      // should keep the default (their rename needs FileContext).
      .config("spark.sql.streaming.checkpointFileManagerClass",
              "org.apache.spark.sql.execution.streaming.checkpointing" +
                ".FileSystemBasedCheckpointFileManager")
      // checkpoint checksums double the file ops (one .crc per file) to
      // detect corruption in flight — sound on a network FS, pure
      // overhead on a local disk the OS already checksums
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
              "false")
      // ENGINE DEFAULT (round 11): whenever a job selects the RocksDB
      // state store (WeatherJob --state.store rocksdb, the Q-str RocksDB
      // queries), per-batch checkpoints upload the CHANGELOG (delta)
      // instead of a full SST snapshot — PresenceScaleSpec prices
      // steady-state checkpoint bytes 12.3x smaller at fleet-sized
      // state, and StreamingSpec pins crash-recovery under changelog
      // replay. Inert under the default HDFS-backed provider, so batch
      // sessions are unaffected; a production job no longer has to
      // remember the flag.
      .config("spark.sql.streaming.stateStore.rocksdb" +
              ".changelogCheckpointing.enabled", "true")

  /** Shared session for tests/tools; honors an already-running session. */
  def getOrCreate(appName: String = "graft-engine"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
