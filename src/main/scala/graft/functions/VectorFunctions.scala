package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnShim, CosineSimilarity, L2Normalize, NearestCentroids, PqAdcScore, PqAdcTables, PqEncode, Sq8Codes, Sq8Dot, Sq8Scale}

object VectorFunctions {

  /** Codegen'd cosine similarity (see
    * [[org.apache.spark.sql.graft.CosineSimilarity]]).
    */
  def cosine(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimilarity(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** The `nProbe` nearest-centroid indexes by cosine, shuffle-free (see
    * [[org.apache.spark.sql.graft.NearestCentroids]]).
    */
  def nearestCentroids(v: Column, centroids: Seq[Seq[Double]], nProbe: Int): Column =
    ColumnShim.column(NearestCentroids(ColumnShim.expression(v), centroids, nProbe))

  /** Per-subspace product-quantization codes, shuffle-free (see
    * [[org.apache.spark.sql.graft.PqEncode]]).
    */
  def pqEncode(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnShim.column(PqEncode(ColumnShim.expression(v), codebooks))

  /** Codegen'd raw inner product (see
    * [[org.apache.spark.sql.graft.DotProduct]]) — MIPS scoring, where
    * magnitude matters and cosine's normalization would erase it.
    */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(org.apache.spark.sql.graft.DotProduct(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** L2 normalization in one primitive pass (see
    * [[org.apache.spark.sql.graft.L2Normalize]]); zero vectors pass
    * through unchanged.
    */
  def l2normalize(v: Column): Column =
    ColumnShim.column(L2Normalize(ColumnShim.expression(v)))

  /** Per-query PQ ADC lookup tables, one primitive loop (see
    * [[org.apache.spark.sql.graft.PqAdcTables]]).
    */
  def pqAdcTables(q: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnShim.column(PqAdcTables(ColumnShim.expression(q), codebooks))

  /** ADC score lookup `Σ_j tbl[j·k + codes_j]` — the per-(query,
    * vector) PQ hot loop (see [[org.apache.spark.sql.graft.PqAdcScore]]).
    */
  def pqAdcScore(codes: Column, tbl: Column): Column =
    ColumnShim.column(PqAdcScore(ColumnShim.expression(codes), ColumnShim.expression(tbl)))

  /** SQ8 scalar quantization: per-vector scale, byte codes, exact
    * integer dot (see [[org.apache.spark.sql.graft.Sq8Scale]] /
    * [[org.apache.spark.sql.graft.Sq8Codes]] /
    * [[org.apache.spark.sql.graft.Sq8Dot]]).
    */
  def sq8Scale(v: Column): Column =
    ColumnShim.column(Sq8Scale(ColumnShim.expression(v)))
  def sq8Codes(v: Column): Column =
    ColumnShim.column(Sq8Codes(ColumnShim.expression(v)))
  def sq8Dot(a: Column, b: Column): Column =
    ColumnShim.column(Sq8Dot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Pure-`sql.functions` fallback with identical semantics — kept as a
    * differential-test oracle for the native expression and as the
    * shape to use where the shim is unavailable.
    */
  def cosineBuiltin(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val d = dot(a, b)
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (sqrt(na) * sqrt(nb)))
  }

  /** Dot product against a fixed plane (for LSH signatures). */
  def dotWithConst(v: Column, plane: Seq[Double]): Column =
    aggregate(
      zip_with(v, lit(plane.toArray), (x, w) => x.cast("double") * w),
      lit(0.0), (acc, x) => acc + x)
}
