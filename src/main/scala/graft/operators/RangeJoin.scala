package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-aware time-range join.
  *
  * A naive theta-join `b.ts BETWEEN a.ts AND a.ts + delta` plans as a
  * broadcast-nested-loop join: O(|A| * |B|) comparisons — fatal at 100 TB.
  * This operator rewrites it as an equi-join on a coarse time band: each left
  * row is replicated into the band buckets its window can overlap
  * (`floor(ts/band)` and `floor(ts/band)+1` when delta <= band), the join
  * becomes a shuffled hash/sort-merge equi-join on the band key, and the
  * exact range predicate is applied post-join. Work drops to
  * O(sum over bands of |A_band| * |B_band|) and both sides partition by the
  * band key, so it scales out on a cluster like any equi-join (AQE handles
  * band skew).
  *
  * Semantics target: the reference's event-stream shape (keyed, event-timed —
  * see /root/reference/src/main/java/com/weather/flink/weather/
  * WeatherPresenceSerializationSchema.java:33-35 for payload event time).
  */
object RangeJoin {

  /** Join rows of `left` to rows of `right` with
    * `right.ts > left.ts && right.ts <= left.ts + deltaSeconds`
    * plus an arbitrary extra predicate, via band-bucketed equi-join.
    *
    * Column name collisions are avoided by prefixing every output column
    * with `a_` (left) / `b_` (right).
    */
  def timeBand(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      deltaSeconds: Long,
      extra: (DataFrame, DataFrame) => Column): DataFrame = {
    val bandSec = deltaSeconds // band width == delta => 2 candidate buckets
    val a = left.columns.foldLeft(left)((df, c) => df.withColumnRenamed(c, s"a_$c"))
    val b = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"b_$c"))

    // left row covers (bucket, bucket+1); right row lands in its own bucket
    val aBanded = a.withColumn(
      "band",
      explode(array(
        floor(unix_timestamp(col(s"a_$leftTs")) / bandSec),
        floor(unix_timestamp(col(s"a_$leftTs")) / bandSec) + 1)))
    val bBanded = b.withColumn(
      "band", floor(unix_timestamp(col(s"b_$rightTs")) / bandSec))

    val joined = aBanded.join(bBanded, Seq("band"))
      .where(
        col(s"b_$rightTs") > col(s"a_$leftTs") &&
        col(s"b_$rightTs") <= col(s"a_$leftTs") + expr(s"INTERVAL $deltaSeconds SECONDS"))
    joined.where(extra(joined, joined)).drop("band")
  }
}
