package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: MATERIALIZED-VIEW substitution — the classic
  * warehouse optimization (Oracle query rewrite, BigQuery/Snowflake
  * materialized views, Databricks MV): a query whose plan matches a
  * registered view DEFINITION is answered from the view's
  * MATERIALIZATION instead of the base table. At 100 TB the economics
  * are decisive: the fact-table aggregate the dashboard fleet re-runs
  * every few minutes becomes a scan of a few thousand pre-aggregated
  * rows — the rewrite moves work from query time (× every consumer)
  * to refresh time (× once), and T18/E20 already own the refresh half
  * (incremental aggregate maintenance); this rule is the missing
  * CONSUMPTION half, with zero query-author involvement.
  *
  * Matching contract (exact-match substitution, stated not inferred):
  * a plan subtree matches a registered view iff its CANONICALIZED
  * optimized form equals the definition's — Catalyst's own
  * `sameResult` machinery (expression-id-normalized structural
  * equality), the same test `ReuseExchange`/cached-plan lookup trust.
  * Exact match only — no partial/rollup matching (a coarser-grain
  * query could be answered by RE-aggregating the view; that extension
  * changes the marginal-cost story, not the mechanism, and is out of
  * scope here). Substitution preserves the matched subtree's output
  * attribute ids via an aliasing Project, so parent operators'
  * references stay valid.
  *
  * Conf discipline: opt-in via `spark.graft.mvRewrite` (the Q50
  * convention — no other registry entry's plan changes); the catalog
  * is keyed by applicationId so a new context never sees a stale
  * registration. Staleness contract: the materialization answers for
  * the base data AS OF refresh time — the same freshness trade every
  * MV system documents; K9/K23's versioned lake is where a production
  * deployment would pin that snapshot explicitly.
  */
object MvRewrite extends Rule[LogicalPlan] {

  private case class Mv(definition: LogicalPlan, materialization: LogicalPlan)

  private val catalog =
    scala.collection.concurrent.TrieMap.empty[String, Mv]

  def ensure(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(MvRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewrite

  /** Materialize `definition` to `path` and register it for
    * substitution. The stored match key is the OPTIMIZED canonical
    * plan (the rule runs after the main optimizer batches, so
    * incoming subtrees are in the same normal form).
    */
  def register(spark: SparkSession, name: String,
               definition: DataFrame, path: String): Unit = {
    definition.write.mode("overwrite").parquet(path)
    val mat = spark.read.parquet(path)
    // the substitution below restores names/exprIds/nullability, but
    // it cannot repair a TYPE drift through the parquet round-trip —
    // refuse at register time rather than corrupting parent operators
    // compare under asNullable normalization: parquet read-back widens
    // NESTED nullability too (array containsNull, struct field
    // nullability), which is the benign widening the substitution
    // repairs — only a genuine TYPE change should refuse
    val defTypes = definition.queryExecution.optimizedPlan.output
      .map(_.dataType.asNullable)
    val matTypes = mat.queryExecution.analyzed.output
      .map(_.dataType.asNullable)
    require(defTypes == matTypes,
      s"materialization of '$name' changed column types: $defTypes -> $matTypes")
    // entries of stopped applications never match again (appId-prefixed
    // keys) but would pin their plans forever in a JVM that restarts
    // contexts — evict everything not owned by a LIVE context here
    val live = org.apache.spark.SparkContext.getActive.map(_.applicationId).toSet
    catalog.keys.filterNot(k => live.exists(id => k.startsWith(id + "|")))
      .foreach(catalog.remove)
    catalog.put(spark.sparkContext.applicationId + "|" + name,
      Mv(definition.queryExecution.optimizedPlan,
        mat.queryExecution.analyzed))
  }

  /** Drop this application's registrations (test/data-refresh hook). */
  def clear(spark: SparkSession): Unit = {
    val prefix = spark.sparkContext.applicationId + "|"
    catalog.keys.filter(_.startsWith(prefix)).foreach(catalog.remove)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.mvRewrite", "false").toBoolean)
      return plan
    val views = catalog.toMap.values
    if (views.isEmpty) return plan
    plan.transformUp {
      case sub =>
        views.collectFirst {
          case v if sub.sameResult(v.definition) =>
            // FRESH leaf instance per substitution: two matches in one
            // plan (a self-join of the aggregate) must not share
            // output exprIds — the post-analysis invariant the
            // analyzer's DeduplicateRelations normally maintains
            val mat = v.materialization.transform {
              case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
                m.newInstance().asInstanceOf[LogicalPlan]
            }
            // the materialization's column ORDER matches the
            // definition's output (parquet round-trip preserves it);
            // re-alias onto the matched subtree's attribute ids so
            // parents resolve unchanged. Parquet read-back WIDENS
            // nullability (a non-nullable count() comes back nullable)
            // — restore the original contract with AssertNotNull so
            // parent operators' attribute metadata stays truthful
            // (values are non-null by construction: the file was
            // written from the non-nullable column)
            Project(sub.output.zip(mat.output).map {
              case (orig, repl) =>
                val child =
                  if (!orig.nullable && repl.nullable)
                    org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(repl)
                  else repl
                Alias(child, orig.name)(exprId = orig.exprId)
            }, mat)
        }.getOrElse(sub)
    }
  }
}
