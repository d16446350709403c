package graft.streaming

import scala.util.control.NonFatal

/** Driver-level restart supervision, mirroring the reference's
  * exponential-delay restart strategy (`WeatherProcessingJob.java:54-58`):
  * initial 15 s, max 360 s, multiplier 1.5, jitter factor 0.5. In
  * Structured Streaming the checkpoint makes each restart resume from
  * committed offsets+state, so supervision is a plain driver loop (the
  * cluster-manager equivalent of Flink's JobManager-side restart policy).
  */
object Supervisor {

  final case class Backoff(
      initialMs: Long = 15000L,
      maxMs: Long = 360000L,
      multiplier: Double = 1.5,
      jitter: Double = 0.5)

  /** Deterministic backoff schedule (before jitter): attempt n waits
    * min(initial * multiplier^n, max). */
  def delayMs(b: Backoff, attempt: Int): Long =
    math.min(b.initialMs * math.pow(b.multiplier, attempt.toDouble), b.maxMs.toDouble).toLong

  /** Jittered delay: base +- jitter fraction, seeded for reproducibility. */
  def jitteredDelayMs(b: Backoff, attempt: Int, seed: Long): Long = {
    val base = delayMs(b, attempt)
    val rnd = new java.util.Random(seed + attempt)
    val factor = 1.0 + b.jitter * (2.0 * rnd.nextDouble() - 1.0)
    math.max((base * factor).toLong, 0L)
  }

  /** Run `body` (start query + awaitTermination), restarting on failure up
    * to `maxRestarts` with the reference's backoff. `sleep` is injectable
    * for tests. Returns the number of restarts performed. */
  def supervise(
      maxRestarts: Int,
      backoff: Backoff = Backoff(),
      seed: Long = 42L,
      sleep: Long => Unit = Thread.sleep)(body: () => Unit): Int = {
    var attempt = 0
    var done = false
    while (!done) {
      try { body(); done = true }
      catch {
        // config errors are permanent: retrying a missing --sink.path with
        // 15 s+ backoffs would just stall the operator — fail fast
        case e: IllegalArgumentException => throw e
        case NonFatal(e) if attempt < maxRestarts =>
          val d = jitteredDelayMs(backoff, attempt, seed)
          System.err.println(
            s"[supervisor] attempt ${attempt + 1} failed (${e.getMessage}); retry in ${d} ms")
          sleep(d)
          attempt += 1
        case NonFatal(e) =>
          throw e
      }
    }
    attempt
  }
}
