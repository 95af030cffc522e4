package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: AUTOMATIC bloom-filter join pushdown — Q31's
  * explicit pattern (bloom sketch of the filtered dimension keys
  * planted as a `might_contain` pre-filter on the fact side) applied
  * by the optimizer to any eligible equi-join, so the query author
  * writes a plain join and the probe side still sheds non-matching
  * rows BEFORE its shuffle. At 100 TB this converts a fact-scale
  * exchange into a post-filter-scale one whenever the dimension
  * predicate is selective — the same economics as Spark's own
  * `InjectRuntimeFilter`, which this rule deliberately mirrors
  * (creation-side aggregate → scalar subquery → might_contain on the
  * application side) but without its shuffle-stage/size eligibility
  * gates, making the mechanism visible and assertable on any plan.
  *
  * Semantics-preserving by construction: the bloom admits a SUPERSET
  * of the matching keys (false positives only), and the join's exact
  * condition still runs — the rewrite can only reduce the rows
  * reaching the exchange, never change the result.
  *
  * Conservative contract (each condition stated, not inferred):
  *   - fires only when `spark.graft.bloomJoinPushdown` is true — an
  *     explicit per-query opt-in, so the other 275 registry entries'
  *     plans are untouched;
  *   - Inner or LeftSemi equi-join with attribute-only keys;
  *   - the CREATION side is the side with a `Filter` in its subtree
  *     (that filter is what makes the sketch selective), the
  *     APPLICATION side must have none — symmetric filters give no
  *     cheap side to sketch;
  *   - the creation side must be fully DETERMINISTIC: the rewrite
  *     duplicates that subtree into the scalar subquery, so a
  *     nondeterministic filter (rand/sample/nondeterministic UDF)
  *     would build the bloom from a DIFFERENT evaluation than the
  *     join sees and wrongly pre-drop probe rows — the same guard
  *     `InjectRuntimeFilter` applies before duplicating a plan;
  *   - idempotent: an application side already carrying a
  *     `might_contain` is left alone (the rule runs in a fixed-point
  *     batch).
  *
  * The `injectOptimizerRule` rung of the extension ladder applied to
  * JOINs (T4b's KeepFirstRewrite covers windows); registered by
  * [[GraftExtensions]] at session build or [[BloomJoinRewrite.ensure]]
  * at runtime.
  */
object BloomJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  def ensure(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(BloomJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BloomJoinRewrite

  // DOCUMENTED NARROWING (not a correctness limit — the exact join
  // still runs either way, and the rule is conf-gated opt-in): side
  // selection uses subtree-WIDE filter presence as the selectivity
  // signal, so an application side containing any Filter anywhere
  // (e.g. one pre-filtered union leg) disqualifies injection, and only
  // the FIRST equi-key is sketched on multi-key joins. Widening both
  // (per-side filter attribution at the key-bearing subtree; all keys
  // hashed into one sketch, as Spark's InjectRuntimeFilter does) only
  // grows where the pushdown fires.
  private def hasFilter(p: LogicalPlan): Boolean =
    p.exists(_.isInstanceOf[Filter])

  private def hasBloom(p: LogicalPlan): Boolean =
    p.exists(_.expressions.exists(_.exists(_.isInstanceOf[BloomFilterMightContain])))

  private def fullyDeterministic(p: LogicalPlan): Boolean =
    !p.exists(_.expressions.exists(e => !e.deterministic))

  private def inject(app: LogicalPlan, appKey: Attribute,
                     cre: LogicalPlan, creKey: Attribute): LogicalPlan = {
    val sketch = Alias(
      new BloomFilterAggregate(new XxHash64(Seq(creKey))).toAggregateExpression(),
      "graft_bloom")()
    // the subquery plan gets its own QueryExecution at physical
    // planning (PlanSubqueries), which prunes the creation side down
    // to the key column before the sketch is built
    val bloom = ScalarSubquery(Aggregate(Nil, Seq(sketch), cre))
    Filter(BloomFilterMightContain(bloom, new XxHash64(Seq(appKey))), app)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.bloomJoinPushdown", "false").toBoolean)
      return plan
    plan.transform {
      case j @ Join(left, right, jt, Some(cond), _)
          if (jt == Inner || jt == LeftSemi) =>
        val keys = splitConjunctivePredicates(cond).collectFirst {
          case EqualTo(a: AttributeReference, b: AttributeReference)
              if left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
          case EqualTo(a: AttributeReference, b: AttributeReference)
              if left.outputSet.contains(b) && right.outputSet.contains(a) => (b, a)
        }
        keys match {
          case Some((lk, rk)) if hasFilter(right) && !hasFilter(left) &&
              !hasBloom(left) && fullyDeterministic(right) =>
            j.copy(left = inject(left, lk, right, rk))
          case Some((lk, rk)) if jt == Inner &&
              hasFilter(left) && !hasFilter(right) &&
              !hasBloom(right) && fullyDeterministic(left) =>
            j.copy(right = inject(right, rk, left, lk))
          case _ => j
        }
    }
  }
}
