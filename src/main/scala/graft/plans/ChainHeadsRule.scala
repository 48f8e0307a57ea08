package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, CreateStruct, EqualTo, Expression, GetStructField, Literal, NullsFirst, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MinBy}
import org.apache.spark.sql.catalyst.expressions.RowNumber
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the "chain heads" pattern
  *
  * {{{ filter(row_number().over(partitionBy(p).orderBy(o)) === 1) }}}
  *
  * (the reference's `firstMessagesToProcess` — one head per sequencing
  * chain, SURVEY §2.4 Q4/Q5) is semantically an argmin per group. The
  * declarative window form costs a full shuffle + per-partition SORT of
  * every row; the rewrite
  *
  * {{{ groupBy(p).agg(min_by(struct(*), struct(o))) }}}
  *
  * is a hash aggregation with MAP-SIDE PARTIAL COMBINE: each partition
  * reduces to one candidate row per group before the exchange, so the
  * shuffle carries |groups| rows instead of |input| and nothing is
  * sorted. At 100 TB with bounded chain counts that is the difference
  * between shuffling the corpus and shuffling the key set.
  *
  * Fires only when provably equivalent:
  *  - the window has a NON-EMPTY partitionSpec: a global window over an
  *    empty input emits zero rows, while an Aggregate with empty
  *    grouping emits one all-null row — not equivalent;
  *  - the window has exactly ONE window expression, a bare
  *    `row_number()` (lag/lead/rank users still need the sort);
  *  - every sort order is Ascending NullsFirst (matches struct
  *    ordering semantics);
  *  - the filter is exactly `rn = 1`;
  *  - the ordering is made total by the caller's trailing tiebreak
  *    column (as [[graft.operators.Sequencing]] always emits) — with
  *    ties min_by picks an arbitrary tied row, row_number a
  *    deterministic one, so equivalence needs the total order.
  *
  * Registered through [[graft.GraftExtensions]]
  * (`injectOptimizerRule`); semantic equivalence is pinned by the
  * `seq_heads` DuckDB-oracle query, which runs the window form through
  * this rewrite and must hash-match the oracle's windowed SQL.
  */
case class ChainHeadsRule() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      tryRewrite(cond, w).getOrElse(f)
    case f @ Filter(cond, p @ Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[Attribute]) =>
      tryRewrite(cond, w)
        .map(agg => Project(projList, agg))
        .getOrElse(f)
  }

  private def isOne(e: Expression): Boolean = e match {
    case Literal(v: Int, _) => v == 1
    case Literal(v: Long, _) => v == 1L
    case _ => false
  }

  private def tryRewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, orderSpec, _)), _))
          if w.partitionSpec.nonEmpty && orderSpec.nonEmpty &&
            orderSpec.forall(s => s.direction == Ascending &&
              s.nullOrdering == NullsFirst) &&
            (cond match {
              case EqualTo(attr: Attribute, one) =>
                isOne(one) && attr.exprId == a.exprId
              case EqualTo(one, attr: Attribute) =>
                isOne(one) && attr.exprId == a.exprId
              case _ => false
            }) =>
        val child = w.child
        val minBy = AggregateExpression(
          MinBy(CreateStruct(child.output),
            CreateStruct(orderSpec.map(_.child))),
          Complete, isDistinct = false)
        val aggExprs = child.output.zipWithIndex.map { case (attr, i) =>
          Alias(GetStructField(minBy, i, Some(attr.name)),
            attr.name)(exprId = attr.exprId)
        } :+ Alias(Literal(1), a.name)(exprId = a.exprId)
        Some(Aggregate(w.partitionSpec, aggExprs, child))
      case _ => None
    }
}
