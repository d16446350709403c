package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single right row with
  * the same `by` key and the greatest `rightOn <= leftOn`.
  *
  * Spark has no built-in as-of join. The naive composition (range join +
  * `row_number() = 1`) explodes every candidate pair before discarding all
  * but one — O(matches) shuffle volume. This implementation uses the
  * union + running-`last` pattern instead:
  *
  *   1. tag right rows side=0 carrying their payload as a struct, left rows
  *      side=1 with a null payload;
  *   2. union (by name, missing columns → null);
  *   3. one window over (`by`) ordered by (`on`, side):
  *      `last(payload, ignoreNulls=true)` over rows unbounded-preceding..current
  *      gives every left row the most recent right payload at or before its
  *      timestamp (right sorts before left on ties → inclusive semantics);
  *   4. keep side=1 rows and expand the struct.
  *
  * Cost: ONE shuffle on the key + an in-partition sort — identical envelope
  * to a groupBy, independent of match multiplicity. This is the 100 TB path:
  * no pair explosion, skew handled by AQE, state bounded by the sort buffer
  * (spillable).
  *
  * Semantics reference: DuckDB `ASOF LEFT JOIN` (the oracle for Q-join-06).
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (emitted as `right_<name>`) */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: String,
      payload: Seq[String]): DataFrame = {

    val rStruct = struct(payload.map(col): _*)
    val r2 = right.select(
      col(by), col(on),
      rStruct.as("__r"),
      lit(0).as("__side"))
    val l2 = left
      .withColumn("__side", lit(1))
      .unionByName(r2, allowMissingColumns = true)

    // __r as the final sort key: among right rows tied on (key, ts) the
    // greatest payload struct wins deterministically (matches the
    // max-struct reference semantics; without it the winner would depend
    // on sort stability)
    val w = Window.partitionBy(by)
      .orderBy(col(on), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l2
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__r", "__side")

    payload.foldLeft(matched) { (df, c) =>
      df.withColumn(s"right_$c", col(s"__match.$c"))
    }.drop("__match")
  }

  /** Forward as-of join: for each left row, the single right row with the
    * same `by` key and the SMALLEST `rightOn >= leftOn` — the mirror of
    * [[backward]] with the window reversed: left rows sort before right
    * rows on ties (inclusive semantics) and `first(payload, ignoreNulls)`
    * over current-row..unbounded-following picks the next right payload.
    * Same one-shuffle cost envelope; min payload struct wins ties. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: String,
      by: String,
      payload: Seq[String]): DataFrame = {

    val rStruct = struct(payload.map(col): _*)
    val r2 = right.select(
      col(by), col(on),
      rStruct.as("__r"),
      lit(1).as("__side"))
    val l2 = left
      .withColumn("__side", lit(0))
      .unionByName(r2, allowMissingColumns = true)

    val w = Window.partitionBy(by)
      .orderBy(col(on), col("__side"), col("__r"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matched = l2
      .withColumn("__match", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__r", "__side")

    payload.foldLeft(matched) { (df, c) =>
      df.withColumn(s"right_$c", col(s"__match.$c"))
    }.drop("__match")
  }
}
