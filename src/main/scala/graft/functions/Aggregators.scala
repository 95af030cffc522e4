package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom typed aggregates (`Aggregator` + `functions.udaf`) — the
  * extension point for domain aggregates Spark lacks. Buffers must be
  * MERGEABLE (associative+commutative combine) so partial aggregation
  * happens map-side and the shuffle carries per-partition state, not
  * rows — the same contract every built-in aggregate satisfies.
  */
object Aggregators {

  /** Exact mode over a low-cardinality string column: count-map buffer,
    * ties broken to the lexicographically smallest value so the result
    * is deterministic on any partitioning/merge order. Buffer size is
    * bounded by the value domain, NOT the row count — safe at any
    * scale for genuinely low-cardinality inputs (status codes,
    * priorities, languages).
    */
  object StringMode extends Aggregator[String, Map[String, Long], String] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    override def finish(m: Map[String, Long]): String =
      if (m.isEmpty) null
      else m.minBy { case (k, v) => (-v, k) }._1
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
