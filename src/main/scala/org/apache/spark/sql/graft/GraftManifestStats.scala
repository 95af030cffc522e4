package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.read.Statistics
import org.apache.spark.sql.types.StructType

import java.util.OptionalLong

/** K49: manifest-fed scan statistics.
  *
  * A V2 relation with no `SupportsReportStatistics` scan planes at the
  * conf default size (effectively "huge"), so a catalog dim table
  * NEVER auto-broadcasts and every lake join pays two shuffles — at
  * 100 TB the single most expensive default in the plan. The manifest
  * already knows the truth at metadata cost: per-file row counts since
  * K11, and per-file on-disk bytes since this round (measured by the
  * commit's one recursive listing, carried forward by reference). This
  * helper folds a snapshot's rows into the `Statistics` every graft
  * scan now reports:
  *
  *   - `numRows` — exact from the manifest (minus exactly-known
  *     position deletes on K42 tables; equality deletes are NOT
  *     subtracted — a delete key may match nothing, and overestimating
  *     is the safe direction for broadcast planning);
  *   - `sizeInBytes` — the summed on-disk lengths where known, with a
  *     rows × schema-width fallback for pre-K49 manifests (`bytes` -1)
  *     so old tables degrade to an estimate, never to "huge".
  *
  * Sizes are ON-DISK (compressed) bytes — the Delta/Iceberg reporting
  * convention Spark's `autoBroadcastJoinThreshold` is tuned against.
  * Stats are computed on the PRUNED file list (the builder hands the
  * scan its post-pushdown survivors), so a filtered scan reports the
  * filtered size — the same post-pushdown contract `FileScan` honors.
  */
object GraftManifestStats {

  /** K53: merge the manifest's per-file HLL sketches + null counts
    * into the DSv2 `columnStats()` map, which
    * `DataSourceV2Relation.computeStats` transforms into catalyst
    * attribute stats — the NDVs the CBO's `CostBasedJoinReorder` and
    * `JoinEstimation` consume. Driver-side and metadata-cost: the
    * sketches already rode the listing that produced `rows` (≈512 B
    * per column per file), and a DataSketches union of k files is
    * microseconds. A column reports stats only when EVERY data file
    * carries its sketch (a mixed pre-K53 snapshot yields no NDV rather
    * than a wrong one); masked MoR reads (`deletedRows` > 0) skip
    * column stats entirely — the masked NDV is unknowable from file
    * sketches alone, and rows/bytes still report.
    */
  private def columnStatsOf(data: Seq[GraftLakeTable.ManifestRow],
                            schema: StructType)
      : java.util.Map[org.apache.spark.sql.connector.expressions.NamedReference,
                      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    val out = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    val withRows = data.filter(_.nRows > 0L)
    if (withRows.isEmpty) return out
    schema.fields.foreach { f =>
      val sketches = withRows.flatMap(_.stats.get(s"__hll#${f.name}").map(_.head))
      val nulls = withRows.flatMap(_.stats.get(s"__nulls#${f.name}").map(_.head))
      // an all-null file writes no sketch but does write a null count —
      // NDV needs sketches from every file that HAS non-null values,
      // which "nulls says all rows are null" identifies exactly
      val nullsByFile = withRows.map(r =>
        r.stats.get(s"__nulls#${f.name}").map(_.head.toLong))
      val allCounted = nullsByFile.forall(_.isDefined)
      if (allCounted) {
        val nullTotal = nulls.map(_.toLong).sum
        val needSketch = withRows.zip(nullsByFile).filter {
          case (r, nc) => nc.get < r.nRows } // files with non-null values
        val haveAll = needSketch.forall(
          _._1.stats.contains(s"__hll#${f.name}"))
        val ndv: Option[Long] =
          if (!haveAll) None
          // an all-null column reports NO distinct count, not 0 — CBO
          // selectivity divides by NDV, and a 0 would crash planning
          // (review pass 1, round 13); the null count still reports
          else if (needSketch.isEmpty) None
          else try {
            val u = new org.apache.datasketches.hll.Union(12)
            needSketch.foreach { case (r, _) =>
              u.update(org.apache.datasketches.hll.HllSketch.heapify(
                java.util.Base64.getDecoder.decode(
                  r.stats(s"__hll#${f.name}").head)))
            }
            Some(math.max(1L, math.round(u.getEstimate)))
          } catch { case _: Exception => None }
        val stat = new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
          override def distinctCount(): OptionalLong =
            ndv.fold(OptionalLong.empty())(OptionalLong.of)
          override def nullCount(): OptionalLong = OptionalLong.of(nullTotal)
        }
        out.put(org.apache.spark.sql.connector.expressions
          .FieldReference(Seq(f.name)), stat)
      }
    }
    out
  }

  def of(rows: Seq[GraftLakeTable.ManifestRow], schema: StructType,
         deletedRows: Long = 0L): Statistics = {
    val data = rows.filterNot(r => GraftDeltaOperation.isDeleteFile(r.file))
    val totalRows = math.max(0L, data.map(_.nRows).sum - deletedRows)
    val width = math.max(1, schema.defaultSize).toLong
    val size = data.map(r => if (r.bytes >= 0L) r.bytes else r.nRows * width).sum
    new Statistics {
      override def sizeInBytes(): OptionalLong =
        OptionalLong.of(math.max(1L, size))
      override def numRows(): OptionalLong = OptionalLong.of(totalRows)
      // LAZY + CBO-GATED: estimateStatistics runs on EVERY query plan
      // (sizeInBytes drives broadcast), and Spark reads columnStats()
      // unconditionally inside transformV2Stats — so the sketch merge
      // (base64 + heapify + union per column per file) must not run
      // when the CBO that would consume it is off, and must run at
      // most once per Statistics object when it is on (review pass 1,
      // round 13).
      private lazy val colStats =
        if (deletedRows > 0L ||
            !org.apache.spark.sql.internal.SQLConf.get.cboEnabled)
          java.util.Collections.emptyMap[
            org.apache.spark.sql.connector.expressions.NamedReference,
            org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
        else columnStatsOf(data, schema)
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStats
    }
  }
}
