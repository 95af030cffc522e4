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
        // the ONE files-with-non-null-values list every consumer below
        // (NDV, min/max, histogram) shares — three divergent copies of
        // this predicate was a review-pass-3 finding
        val nonNullFiles = withRows.zip(nullsByFile).filter {
          case (r, nc) => nc.get < r.nRows }
        val needSketch = nonNullFiles
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
              // MIME decoder: Spark's base64() chunks outputs past 76
              // chars with CRLFs, which the basic decoder rejects — a
              // KB-sized sketch (any file with real cardinality) would
              // throw and silently lose the NDV
              u.update(org.apache.datasketches.hll.HllSketch.heapify(
                java.util.Base64.getMimeDecoder.decode(
                  r.stats(s"__hll#${f.name}").head)))
            }
            Some(math.max(1L, math.round(u.getEstimate)))
          } catch { case _: Exception => None }
        // K57: numeric columns additionally report typed min/max (from
        // the same per-file stats the pruning comparators read) and an
        // equi-height HISTOGRAM inverted from the row-weighted mixture
        // of per-file quantile vectors — what FilterEstimation needs to
        // see THROUGH skew instead of assuming uniform over [min, max].
        // Per-bin NDV is the global-NDV/bins approximation (exact
        // per-bin counting would need a sketch per bin); range
        // estimates use boundaries + height, which are mixture-exact
        // up to the per-file percentile accuracy.
        // exact typed parse per datatype: integrals must NOT round-trip
        // through Double (values past 2^53 would round, and a reported
        // min ABOVE the true min makes FilterEstimation prove matching
        // predicates empty — review pass 3); fractional parses filter
        // NaN, which would poison every range selectivity.
        // DATE joins the numeric family here (r14 #7): its stats value
        // is the ISO string, its CATALYST stat value the epoch-day Int
        // (what `EstimationUtils.toDouble` reads natively), and its
        // quantile vectors were written over the epoch-day proxy — so
        // min/max/histogram all speak days and FilterEstimation's date
        // range arithmetic consumes them unchanged.
        val isNumeric = f.dataType match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.LongType |
               org.apache.spark.sql.types.FloatType |
               org.apache.spark.sql.types.DoubleType |
               org.apache.spark.sql.types.DateType => true
          case _ => false
        }
        def parseTyped(v: String): Option[Any] = f.dataType match {
          case org.apache.spark.sql.types.ByteType => v.toByteOption
          case org.apache.spark.sql.types.ShortType => v.toShortOption
          case org.apache.spark.sql.types.IntegerType => v.toIntOption
          case org.apache.spark.sql.types.LongType => v.toLongOption
          case org.apache.spark.sql.types.FloatType =>
            v.toFloatOption.filterNot(_.isNaN)
          case org.apache.spark.sql.types.DoubleType =>
            v.toDoubleOption.filterNot(_.isNaN)
          case org.apache.spark.sql.types.DateType =>
            try Some(java.time.LocalDate.parse(v).toEpochDay.toInt)
            catch { case _: Exception => None }
          case _ => None
        }
        def ordered(vals: Seq[Any]): Seq[Any] = f.dataType match {
          case org.apache.spark.sql.types.FloatType =>
            vals.map(_.asInstanceOf[Float]).sorted
          case org.apache.spark.sql.types.DoubleType =>
            vals.map(_.asInstanceOf[Double]).sorted
          case _ =>
            // integral family (DATE included: its typed value is the
            // epoch-day Int) — sort exactly as longs, convert back
            // WITHOUT a string round-trip (parseTyped expects ISO for
            // dates, not day numbers)
            val longs = vals.map(_.asInstanceOf[Number].longValue()).sorted
            f.dataType match {
              case org.apache.spark.sql.types.ByteType => longs.map(_.toByte)
              case org.apache.spark.sql.types.ShortType => longs.map(_.toShort)
              case org.apache.spark.sql.types.IntegerType |
                   org.apache.spark.sql.types.DateType => longs.map(_.toInt)
              case _ => longs
            }
        }
        val minMax: Option[(Any, Any)] = {
          if (!isNumeric || nonNullFiles.isEmpty ||
              !nonNullFiles.forall(_._1.stats.contains(f.name))) None
          else {
            val mins = nonNullFiles.flatMap(r => parseTyped(r._1.stats(f.name).head))
            val maxs = nonNullFiles.flatMap(r => parseTyped(r._1.stats(f.name)(1)))
            if (mins.length != nonNullFiles.length ||
                maxs.length != nonNullFiles.length) None
            else Some((ordered(mins).head, ordered(maxs).last))
          }
        }
        val histo: Option[org.apache.spark.sql.connector.read.colstats.Histogram] =
          if (!isNumeric || ndv.isEmpty) None
          else {
            val vecs = nonNullFiles.flatMap { case (r, nc) =>
              r.stats.get(s"__q#${f.name}").filter(_.length == 33)
                .map(q => (r.nRows - nc.get, q.map(_.toDouble).toArray))
                .filterNot(_._2.exists(_.isNaN)) // NaN poisons bisection
            }
            if (vecs.length != nonNullFiles.length || vecs.isEmpty) None
            else {
              val nBins = 32
              val bounds = (0 to nBins).map {
                case 0 => vecs.map(_._2.head).min
                case `nBins` => vecs.map(_._2.last).max
                case j => mixtureQuantile(vecs, j.toDouble / nBins)
              }
              val rowsNonNull = vecs.map(_._1).sum
              val binNdv = math.max(1L, ndv.get / nBins)
              val binArr = (0 until nBins).map { j =>
                new org.apache.spark.sql.connector.read.colstats.HistogramBin {
                  override def lo(): Double = bounds(j)
                  override def hi(): Double = bounds(j + 1)
                  override def ndv(): Long = binNdv
                }
              }.toArray
              Some(new org.apache.spark.sql.connector.read.colstats.Histogram {
                override def height(): Double = rowsNonNull.toDouble / nBins
                override def bins(): Array[
                  org.apache.spark.sql.connector.read.colstats.HistogramBin] = binArr
              })
            }
          }
        val stat = new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
          override def distinctCount(): OptionalLong =
            ndv.fold(OptionalLong.empty())(OptionalLong.of)
          override def nullCount(): OptionalLong = OptionalLong.of(nullTotal)
          override def min(): java.util.Optional[Object] =
            minMax.fold(java.util.Optional.empty[Object]())(m =>
              java.util.Optional.of(m._1.asInstanceOf[Object]))
          override def max(): java.util.Optional[Object] =
            minMax.fold(java.util.Optional.empty[Object]())(m =>
              java.util.Optional.of(m._2.asInstanceOf[Object]))
          override def histogram(): java.util.Optional[
              org.apache.spark.sql.connector.read.colstats.Histogram] =
            histo.fold(java.util.Optional.empty[
              org.apache.spark.sql.connector.read.colstats.Histogram]())(
              java.util.Optional.of(_))
        }
        out.put(org.apache.spark.sql.connector.expressions
          .FieldReference(Seq(f.name)), stat)
      }
    }
    out
  }

  /** K57: invert the row-weighted MIXTURE of per-file piecewise-linear
    * CDFs (each file's 33-point quantile vector) at probability `p` —
    * the global quantile the snapshot's equi-height histogram bins on.
    * Bisection over the value domain; 60 iterations ≈ machine
    * precision relative to the domain width.
    */
  private def mixtureQuantile(files: Seq[(Long, Array[Double])], p: Double): Double = {
    val totalW = files.map(_._1).sum.toDouble
    def cdf(q: Array[Double], x: Double): Double = {
      if (x <= q.head) return 0.0
      if (x >= q.last) return 1.0
      var i = 1
      while (i < q.length && q(i) < x) i += 1
      // loop exit gives q(i-1) < x <= q(i), so hi > lo by construction
      val (lo, hi) = (q(i - 1), q(i))
      val frac = (x - lo) / (hi - lo)
      ((i - 1) + frac) / (q.length - 1)
    }
    def mixture(x: Double): Double =
      files.map { case (w, q) => w * cdf(q, x) }.sum / totalW
    var lo = files.map(_._2.head).min
    var hi = files.map(_._2.last).max
    var it = 0
    while (it < 60) {
      val mid = lo / 2 + hi / 2
      if (mixture(mid) < p) lo = mid else hi = mid
      it += 1
    }
    hi
  }

  def of(rows: Seq[GraftLakeTable.ManifestRow], schema: StructType,
         deletedRows: Long = 0L): Statistics = {
    val data = rows.filterNot(r => GraftDeltaOperation.isDeleteFile(r.file))
    val rawRows = data.map(_.nRows).sum
    val totalRows = math.max(0L, rawRows - deletedRows)
    val width = math.max(1, schema.defaultSize).toLong
    val rawSize = data.map(r => if (r.bytes >= 0L) r.bytes else r.nRows * width).sum
    // delete-mass adjustment (VERDICT r14 #4): `deletedRows` is the
    // K42 exact position count or the K39 distinct equality-delete KEY
    // count — on-disk bytes cover rows the mask removes, so the size
    // the broadcast planner sees scales by the surviving fraction. A
    // half-equality-deleted dim would otherwise report 2× its servable
    // bytes and miss the static broadcast K49 exists to enable. (Keys
    // that match nothing make this an underestimate bounded by the
    // delete mass itself; the key-uniqueness contract equality deletes
    // already carry makes it exact in the intended use.)
    val size =
      if (deletedRows <= 0L || rawRows <= 0L) rawSize
      else math.max(1L, (rawSize.toDouble * totalRows / rawRows).toLong)
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
