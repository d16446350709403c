package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant inner equi-join via key salting.
  *
  * A shuffled join on a skewed key sends every row of the hot key to ONE
  * reducer — at 100 TB that reducer runs for hours while the rest idle.
  * Salting splits each hot key into `buckets` sub-keys: the probe side gets
  * a deterministic per-row salt, the build side is replicated once per
  * bucket, and the join runs on (key, salt) — the hot key's rows spread
  * across `buckets` reducers. Cost: build side inflates x buckets, so use
  * it when the build side is small-ish but too big to broadcast, or bucket
  * only the detected-hot keys (AQE's skew-join does the same split at
  * runtime; explicit salting is the plan-level guarantee).
  *
  * Result set is EXACTLY the plain inner join's (verified by oracle).
  */
object SaltedJoin {

  /** @param probeSaltExpr deterministic per-row expression on the probe
    *   side used to derive the salt (any well-distributed column, e.g. a
    *   row id). Determinism keeps replays/oracles stable (rand() would
    *   also be correct, just not reproducible). */
  def inner(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      probeSaltExpr: Column,
      buckets: Int): DataFrame = {
    val salted = probe.withColumn("__salt", pmod(probeSaltExpr, lit(buckets)))
    val replicated = build
      .withColumn("__salt", explode(array((0 until buckets).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
