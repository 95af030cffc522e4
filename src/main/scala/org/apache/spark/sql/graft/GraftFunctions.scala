package org.apache.spark.sql.graft

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native Catalyst expressions, so
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works exactly like the
  * Column API — same codegen'd expression, no UDF wrapper.
  *
  * Two entry points, matching Spark's two registration models:
  *   - [[GraftExtensions]]: a `SparkSessionExtensions` injector for
  *     session-build time (`builder.withExtensions(new GraftExtensions)`
  *     or `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`)
  *     — the production path; every session built from [[graft.GraftSession]]
  *     gets these.
  *   - [[GraftFunctions.register]]: runtime registration into an
  *     already-built session (temp functions) — the notebook/driver path.
  *
  * Lives in the `org.apache.spark.sql` namespace because the runtime
  * path needs `sessionState.functionRegistry` (private[sql]).
  */
object GraftFunctions {

  private def info(name: String, clazz: String): ExpressionInfo =
    new ExpressionInfo(clazz, name)

  /** (name, ExpressionInfo, builder) triples — the FunctionDescription
    * shape `SparkSessionExtensions.injectFunction` expects.
    */
  private[graft] val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine", classOf[CosineSimilarity].getName),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (FunctionIdentifier("graft_langid"),
      info("graft_langid", classOf[LangIdExpr].getName),
      (children: Seq[Expression]) => LangIdExpr(children.head, TextFunctions.langMarkers)),
    (FunctionIdentifier("graft_min_gram_md5"),
      info("graft_min_gram_md5", classOf[MinGramMd5].getName),
      (children: Seq[Expression]) => MinGramMd5(children.head, 3)),
    // Spark's runtime-filter machinery (BloomFilterAggregate /
    // BloomFilterMightContain) is internal-only — InjectRuntimeFilter
    // uses it, but no SQL name exists. Registering it makes the
    // explicit bloom-semi-join pattern (Q31) expressible on any plan.
    (FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))),
    (FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))),
    (FunctionIdentifier("graft_rproj"),
      info("graft_rproj", classOf[RademacherProject].getName),
      (children: Seq[Expression]) => RademacherProject(children(0),
        children(1).eval(null).asInstanceOf[Number].intValue())),
    (FunctionIdentifier("graft_cdc_boundaries"),
      info("graft_cdc_boundaries", classOf[CdcBoundaries].getName),
      (children: Seq[Expression]) => CdcBoundaries(children(0),
        children(1).eval(null).asInstanceOf[Number].intValue(),
        children(2).eval(null).asInstanceOf[Number].intValue())),
    (FunctionIdentifier("graft_byte_entropy"),
      info("graft_byte_entropy", classOf[ByteEntropy].getName),
      (children: Seq[Expression]) => ByteEntropy(children.head))
  )

  /** Runtime registration into an existing session (idempotent —
    * names already bound to GRAFT'S OWN expression class are left
    * alone, so operators can call this per-invocation without
    * `createOrReplaceTempFunction`'s "replacing existing function"
    * WARN spamming every bench/verify entry; a name bound to some
    * OTHER class — a stale or conflicting registration in a
    * long-lived session — is replaced, not silently kept).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    descriptions.foreach { case (ident, einfo, builder) =>
      val ours = registry.lookupFunction(ident)
        .exists(_.getClassName == einfo.getClassName)
      if (!ours)
        registry.createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
  }
}

/** Session-build-time injector (`builder.withExtensions(new GraftExtensions)`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach { case (ident, einfo, builder) =>
      ext.injectFunction((ident, einfo, builder))
    }
    // whole-operator extension: graft's custom physical operators
    ext.injectPlannerStrategy(_ => GraftStrategies)
    // optimizer extension: keep-first windows → struct-min aggregation
    ext.injectOptimizerRule(_ => KeepFirstRewrite)
  }
}
