package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** `private[sql]` bridge for iterative-loop checkpoint hygiene (same
  * rationale as [[StreamingBridge]]: the one capability the public API
  * does not expose).
  *
  * An iterative DataFrame loop must re-leaf each round's state or the
  * plan grows per round, and `localCheckpoint` alone carries the ORIGIN
  * plan's `sizeInBytes` estimate into its `LogicalRDD` — Catalyst
  * estimates a join as the product of its children, so a loop whose
  * rounds join k checkpointed frames grows the carried estimate's
  * bit-length k-fold per round until planning dwarfs execution
  * (BigInteger stats arithmetic — see ConnectedComponents.ckpt's
  * history). The public-API workaround, `createDataFrame(cp.rdd,
  * schema)`, resets the stats but pays an InternalRow -> external Row ->
  * InternalRow round-trip over every row of every round AND forgets the
  * checkpoint's hash partitioning, so every downstream join keyed the
  * same way re-exchanges state that was already placed.
  *
  * This helper rebuilds the checkpointed leaf directly: same
  * materialized InternalRow RDD (zero conversion), same output
  * partitioning and ordering (joins keyed the same way skip their
  * exchange), but `originStats = None` — the leaf reports the default
  * size estimate, exactly what the `createDataFrame` form achieved.
  * Broadcast decisions inside a loop then fall to AQE's runtime shuffle
  * sizes, which are the real ones.
  */
object CheckpointBridge {

  /** Re-leaf a freshly `localCheckpoint`-ed DataFrame (stats reset,
    * layout kept). Any other plan shape passes through unchanged. */
  def resetStatsKeepLayout(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    df.queryExecution.logical match {
      case l: LogicalRDD =>
        Dataset.ofRows(spark,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming)(spark))
      case _ => df
    }
  }
}
