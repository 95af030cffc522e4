package graft

import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** Round-6 late specs: the domain-cap curation sampler.
  *
  * text_domain_cap's oracle is a window (`row_number() <= cap`), but
  * the Spark plan must NOT be one — a window shuffles and sorts every
  * corpus row into its domain's reducer, and the mega-domain the cap
  * exists for becomes the straggler. These specs pin (a) the exact
  * keeper-set semantics vs a driver replay of the hash order and (b)
  * the plan shape: a bounded partial-aggregable top-k, no Window/Sort
  * over the corpus scan.
  */
class Round11Spec extends SparkSpec {

  test("text_domain_cap: keeper set matches a driver replay of the hash order") {
    val cap = 15
    val out = TextQueries.textDomainCap(spark, sfDir, cap).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySource = docs.groupBy(_._1)
    // replay: per source, sort by (knuth-hash, doc_id), take cap
    val expected = bySource.toSeq.flatMap { case (src, rows) =>
      rows.map(_._2)
        .sortBy(id => (java.lang.Long.remainderUnsigned(id * 2654435761L, 4294967296L), id))
        .take(cap).zipWithIndex
        .map { case (id, i) => (src, id, i + 1L, rows.length.toLong) }
    }.toSet
    assert(out.toSet == expected, "kept (source, doc_id, rank, n_source) must replay exactly")
    // ranks dense from 1, at most cap per source, totals honest
    out.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"$src ranks dense")
      assert(rows.length <= cap, s"$src exceeds cap")
      assert(rows.length == math.min(cap, bySource(src).length), s"$src keeps min(n, cap)")
    }
  }

  test("text_domain_cap: plans a bounded partial top-k aggregate, not a corpus window sort") {
    val plan = TextQueries.textDomainCap(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"domain cap must not shuffle+sort whole domains through a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_topkbyscore"),
      s"keeper set should be a map-side-capped mergeable aggregate:\n$plan")
  }
}
