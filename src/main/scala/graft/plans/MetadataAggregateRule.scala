package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.sources.GraftFileIndex

/** Aggregate pushdown to TABLE METADATA, as a Catalyst rule: a global
  * (no grouping, no filter) `count(*)` / `min(k)` / `max(k)` over a
  * graft relation folds entirely from the commit log — per-file
  * parquet-footer row counts and per-file [min,max] stats recorded at
  * publish — so the plan collapses to a [[LocalRelation]] and the scan
  * OPENS ZERO FILES. On a 100 TB table that turns the most common
  * sanity queries from a cluster job into a metadata read, and it
  * composes with everything SQL: views, joins against the folded row,
  * subqueries.
  *
  * Strictly conservative rewrite conditions:
  *   - every aggregate in the list is rewritable, else the plan is left
  *     untouched: `count(*)`/`count(1)` (never `count(col)` — the log
  *     has no null counts), non-DISTINCT, and `min`/`max` only on a
  *     column whose logged long-normalized stats are EXACT (integral or
  *     date types; fractional/timestamp stats are truncated) with an
  *     entry for EVERY live file;
  *   - the child is the bare relation (or a pruning Project of plain
  *     attributes over it) — any Filter blocks the rewrite;
  *   - the relation's index can prove the row count (all files carry
  *     footer counts). MoR ledgers and pending evolutions never reach
  *     here: [[graft.sources.GraftSource.relation]] refuses them.
  *
  * The all-NULL edge folds correctly: a column recorded as the empty
  * range on every file yields `min = max = NULL`, matching the SQL
  * semantic. Installed by [[graft.GraftExtensions]] via
  * `injectOptimizerRule`. */
object MetadataAggregateRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg @ Aggregate(Nil, aggExprs, GraftScan(index), _)
        if index.rowCountFromLog.isDefined =>
      val total = index.rowCountFromLog.get
      val folded = aggExprs.map(e => foldFromLog(e, index, total))
      if (folded.forall(_.isDefined))
        LocalRelation(agg.output.map(_.toAttribute),
          Seq(InternalRow.fromSeq(folded.map(_.get))))
      else agg
  }

  /** The aggregate's metadata value in Catalyst internal form, or None
    * if this expression cannot be proven from the log. */
  private def foldFromLog(e: NamedExpression, index: GraftFileIndex,
                          total: Long): Option[Any] = e match {
    case Alias(AggregateExpression(c: Count, Complete, false, None, _), _)
        if c.children.forall(_.foldable) =>
      Some(total)
    case Alias(AggregateExpression(Min(a: AttributeReference), Complete,
                                   false, None, _), _) =>
      rangeValue(a, index, isMin = true)
    case Alias(AggregateExpression(Max(a: AttributeReference), Complete,
                                   false, None, _), _) =>
      rangeValue(a, index, isMin = false)
    case _ => None
  }

  private def rangeValue(a: AttributeReference, index: GraftFileIndex,
                         isMin: Boolean): Option[Any] = {
    val exact = a.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType => true
      case _ => false
    }
    if (!exact) None
    else index.statsRangeFromLog(a.name).map { case (mn, mx) =>
      if (mn == Long.MaxValue && mx == Long.MinValue) null // all-NULL column
      else {
        val v = if (isMin) mn else mx
        a.dataType match {
          case LongType => v
          case IntegerType | DateType => v.toInt
          case ShortType => v.toShort
          case ByteType => v.toByte
        }
      }
    }
  }

  /** The clean graft relation, looked at through a plain-attribute
    * pruning Project if the optimizer already inserted one. */
  private object GraftScan {
    def unapply(p: LogicalPlan): Option[GraftFileIndex] = p match {
      case LogicalRelation(HadoopFsRelation(idx: GraftFileIndex, _, _, _, _, _), _, _, _, _) =>
        Some(idx)
      case Project(ps, LogicalRelation(
          HadoopFsRelation(idx: GraftFileIndex, _, _, _, _, _), _, _, _, _))
          if ps.forall(_.isInstanceOf[AttributeReference]) =>
        Some(idx)
      case _ => None
    }
  }
}
