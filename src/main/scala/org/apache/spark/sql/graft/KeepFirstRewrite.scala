package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StructField, StructType}

/** Optimizer rule: rewrite a keep-first-per-key window —
  * `Filter(rn ≤ 1, Window(row_number() OVER (PARTITION BY k ORDER BY o ASC)))`
  * — into a lexicographic struct-min aggregation
  * `Aggregate(k, min(struct(o, rest)))`.
  *
  * Why: the window form sorts every partition by key ++ order columns
  * on BOTH sides of its exchange, runs the rank machinery, and filters;
  * the aggregate form partial-aggregates map-side so one row per
  * (key, partition) crosses the shuffle, evaluates no ranks, and sorts
  * by the key alone (min(struct) plans as SortAggregate — struct
  * buffers aren't hash-aggregable — so it is not sort-free, just
  * cheaper-sorted). A `min` over a struct compares
  * fields left-to-right with nulls-first — exactly a multi-column
  * ascending NULLS FIRST sort — so the aggregation picks the same
  * winner the rank filter keeps (ties beyond the ordering columns are
  * broken deterministically by the remaining fields, a refinement of
  * row_number's arbitrary tie-break).
  *
  * Conservative by construction; fires only when
  *   - exactly one window expression: `row_number()` with the default
  *     UNBOUNDED PRECEDING..CURRENT ROW row frame,
  *   - the filter keeps rank 1 (`= 1`, `≤ 1`, `< 2`) and nothing else,
  *   - partition and order keys are plain attributes, every order
  *     ascending NULLS FIRST (descending would need per-type
  *     inversion), and all payload types orderable (struct-min needs
  *     an ordering).
  *
  * This is the `injectOptimizerRule` rung of the extension ladder
  * (expression → aggregate → optimizer rule → strategy/plan → source):
  * the round-4 survey lesson ("keep-first is an aggregation, not a
  * window") encoded once in the engine instead of rediscovered per
  * query. Registered by [[GraftExtensions]] at session build, or
  * [[KeepFirstRewrite.ensure]] at runtime (the driver path).
  */
object KeepFirstRewrite extends Rule[LogicalPlan] {

  /** Runtime registration (idempotent), mirroring
    * [[GlobalIndexPlan]]'s extraStrategies pattern.
    */
  def ensure(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(KeepFirstRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ KeepFirstRewrite

  private def keepsRankOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, _))          => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, _))  => a.semanticEquals(rn)
    case LessThan(a: Attribute, Literal(2, _))         => a.semanticEquals(rn)
    case _                                             => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) if w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(_, _,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)
            if keepsRankOne(cond, alias.toAttribute) &&
              // empty PARTITION BY must NOT rewrite: a global Aggregate
              // emits one (all-null) row on empty input where the
              // window+filter emits zero
              w.partitionSpec.nonEmpty &&
              w.partitionSpec.forall(_.isInstanceOf[Attribute]) &&
              w.orderSpec.nonEmpty &&
              w.orderSpec.forall(so => so.direction == Ascending &&
                so.nullOrdering == NullsFirst && so.child.isInstanceOf[Attribute]) =>
          val part = w.partitionSpec.map(_.asInstanceOf[Attribute])
          val order = w.orderSpec.map(_.child.asInstanceOf[Attribute])
          val rest = w.child.output.filterNot(a =>
            part.exists(_.exprId == a.exprId) || order.exists(_.exprId == a.exprId))
          val fields = order ++ rest
          if (fields.isEmpty ||
              !RowOrdering.isOrderable(StructType(fields.map(a =>
                StructField(a.name, a.dataType, a.nullable))))) f
          else {
            val minAgg = Alias(
              AggregateExpression(Min(CreateStruct(fields)), Complete, isDistinct = false),
              "_graft_keep_first")()
            val agg = Aggregate(part, part :+ minAgg, w.child)
            val kf = minAgg.toAttribute
            val proj: Seq[NamedExpression] = w.output.map { a =>
              if (part.exists(_.exprId == a.exprId)) a
              else if (a.exprId == alias.exprId) Alias(Literal(1), a.name)(exprId = a.exprId)
              else {
                val idx = fields.indexWhere(_.exprId == a.exprId)
                if (idx < 0) a // unreachable: output ⊆ part ∪ fields ∪ rn
                else Alias(GetStructField(kf, idx, Some(fields(idx).name)), a.name)(exprId = a.exprId)
              }
            }
            Project(proj, agg)
          }
        case _ => f
      }
  }
}
