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

  /** Element-wise vector sum + count: the mergeable state behind a
    * per-group centroid (mean embedding). The buffer is ONE
    * fixed-size double array per (group, partition) — the shuffle
    * never carries raw vectors, which is what makes a centroid over
    * billions of embeddings one cheap aggregate. (The posexplode →
    * groupBy(dim) alternative multiplies shuffle rows by the
    * dimensionality.) Dim is taken from the first vector seen; a
    * mismatched vector is a hard error, not silent truncation.
    */
  object VectorSum extends Aggregator[Seq[Float], (Array[Double], Long), (Seq[Double], Long)] {
    override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)
    override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
      if (v == null) b
      else {
        val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
        require(sums.length == v.length,
          s"embedding dim mismatch: ${v.length} vs ${sums.length}")
        var i = 0
        while (i < v.length) { sums(i) += v(i).toDouble; i += 1 }
        (sums, b._2 + 1L)
      }
    }
    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) =
      if (x._1.isEmpty) y
      else if (y._1.isEmpty) x
      else {
        require(x._1.length == y._1.length,
          s"embedding dim mismatch: ${x._1.length} vs ${y._1.length}")
        var i = 0
        while (i < y._1.length) { x._1(i) += y._1(i); i += 1 }
        (x._1, x._2 + y._2)
      }
    override def finish(b: (Array[Double], Long)): (Seq[Double], Long) =
      (b._1.toSeq, b._2)
    override def bufferEncoder: Encoder[(Array[Double], Long)] = ExpressionEncoder()
    override def outputEncoder: Encoder[(Seq[Double], Long)] = ExpressionEncoder()
  }

  /** Element-wise MAX over BYTE-PACKED HLL register sketches (one
    * register per byte, ρ ≤ 58 so signed comparison is safe) — the
    * HLL-union half of HyperBall (G12): merging two balls' sketches
    * is exactly register-wise max, associative and commutative, so
    * the union over a node's whole neighborhood is one
    * map-side-combined aggregate whose buffer is a single m-byte
    * array per (group, partition) — neighbor SETS never shuffle,
    * only sketches do, and the per-round payload is 4×+ smaller than
    * the int-array form ([[RegisterMax]], kept for spec replays).
    */
  object RegisterMaxBytes extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.empty[Byte]
    override def reduce(b: Array[Byte], v: Array[Byte]): Array[Byte] =
      if (v == null) b
      else if (b.isEmpty) v.clone()
      else {
        require(b.length == v.length,
          s"register width mismatch: ${v.length} vs ${b.length}")
        var i = 0
        while (i < v.length) { if (v(i) > b(i)) b(i) = v(i); i += 1 }
        b
      }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        require(x.length == y.length,
          s"register width mismatch: ${x.length} vs ${y.length}")
        var i = 0
        while (i < y.length) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
        x
      }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** [[RegisterMaxBytes]]'s original int-array form. */
  object RegisterMax extends Aggregator[Seq[Int], Array[Int], Seq[Int]] {
    override def zero: Array[Int] = Array.empty[Int]
    override def reduce(b: Array[Int], v: Seq[Int]): Array[Int] = {
      if (v == null) b
      else {
        val regs = if (b.isEmpty) new Array[Int](v.length) else b
        require(regs.length == v.length,
          s"register width mismatch: ${v.length} vs ${regs.length}")
        var i = 0
        while (i < v.length) { if (v(i) > regs(i)) regs(i) = v(i); i += 1 }
        regs
      }
    }
    override def merge(x: Array[Int], y: Array[Int]): Array[Int] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        require(x.length == y.length,
          s"register width mismatch: ${x.length} vs ${y.length}")
        var i = 0
        while (i < y.length) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
        x
      }
    override def finish(b: Array[Int]): Seq[Int] = b.toSeq
    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder()
  }

  /** Misra–Gries frequent-items summary over long keys — E36's
    * streaming heavy-hitter state. The buffer is a ≤`capacity`-entry
    * count map; `reduce` is the classic decrement-on-overflow step and
    * `merge` the summary merge (sum counts, subtract the (k+1)-largest,
    * drop non-positives), so the whole sketch is ONE map-side-combined
    * aggregate whose state-store footprint is `capacity` entries no
    * matter how many distinct keys stream past. Guarantee (any batch
    * split / merge order): every key with true count > n/(capacity+1)
    * survives, and estimates undercount by at most n/(capacity+1) —
    * the bound the spec measures against exact counts.
    */
  case class MisraGries(capacity: Int)
      extends Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] {
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(b: Map[Long, Long], key: Long): Map[Long, Long] = {
      val cur = b.getOrElse(key, 0L)
      if (cur > 0 || b.size < capacity) b.updated(key, cur + 1)
      else b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }
    override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
      val sum = (x.keySet ++ y.keySet).iterator
        .map(k => k -> (x.getOrElse(k, 0L) + y.getOrElse(k, 0L))).toMap
      if (sum.size <= capacity) sum
      else {
        val thresh = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        sum.view.mapValues(_ - thresh).filter(_._2 > 0L).toMap
      }
    }
    override def finish(b: Map[Long, Long]): Seq[(Long, Long)] =
      b.toSeq.sortBy { case (k, c) => (-c, k) }
    override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  }

  object GramMatrix
      extends Aggregator[Seq[Float], (Array[Double], Array[Double], Long),
                         (Seq[Double], Seq[Double], Long)] {
    override def zero: (Array[Double], Array[Double], Long) =
      (Array.empty[Double], Array.empty[Double], 0L)
    override def reduce(b: (Array[Double], Array[Double], Long),
                        v: Seq[Float]): (Array[Double], Array[Double], Long) = {
      // zero-length vectors are skipped like nulls: counting them would
      // break the merge law (merge treats an empty-sums state as "no
      // data", so a partition of only empty vectors would lose its n)
      if (v == null || v.isEmpty) b
      else {
        val d = v.length
        val sums = if (b._1.isEmpty) new Array[Double](d) else b._1
        val gram = if (b._2.isEmpty) new Array[Double](d * (d + 1) / 2) else b._2
        require(sums.length == d, s"embedding dim mismatch: $d vs ${sums.length}")
        var i = 0
        var t = 0
        while (i < d) {
          val xi = v(i).toDouble
          sums(i) += xi
          var j = i
          while (j < d) { gram(t) += xi * v(j).toDouble; j += 1; t += 1 }
          i += 1
        }
        (sums, gram, b._3 + 1L)
      }
    }
    override def merge(x: (Array[Double], Array[Double], Long),
                       y: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) =
      if (x._1.isEmpty) y
      else if (y._1.isEmpty) x
      else {
        require(x._1.length == y._1.length,
          s"embedding dim mismatch: ${x._1.length} vs ${y._1.length}")
        var i = 0
        while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
        var t = 0
        while (t < x._2.length) { x._2(t) += y._2(t); t += 1 }
        (x._1, x._2, x._3 + y._3)
      }
    override def finish(b: (Array[Double], Array[Double], Long)): (Seq[Double], Seq[Double], Long) =
      (b._1.toSeq, b._2.toSeq, b._3)
    // (partition/merge-order invariance property-tested in
    // AggregatorLawsProps alongside the other mergeable states)
    override def bufferEncoder: Encoder[(Array[Double], Array[Double], Long)] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[(Seq[Double], Seq[Double], Long)] =
      ExpressionEncoder()
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005): a fixed-size
    * `depth × width` counter grid whose merge is elementwise addition —
    * the mergeable frequency summary for key domains too large to
    * group exactly. Input rows arrive pre-hashed as their `depth`
    * column indices (computed with `xxhash64(key, row)` Column
    * arithmetic, so the probe side can reproduce the exact same
    * indices declaratively). Estimates only ever OVER-count (each cell
    * is a superset sum), which is what makes the sketch a sound
    * prefilter: `estimate ≥ threshold` can never drop a truly-heavy
    * key.
    */
  final case class CountMinSketch(depth: Int, width: Int)
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], idx: Seq[Int]): Array[Long] = {
      // null rows are skipped (SQL-aggregate convention); a wrong-shaped
      // or out-of-range index row fails loudly — silently wrapping
      // i*width+idx(i) into a NEIGHBORING depth row would corrupt
      // estimates instead of erroring (GramMatrix's dim-check contract)
      if (idx == null) return b
      require(idx.length == depth,
        s"CMS row has ${idx.length} indices, expected depth=$depth")
      var i = 0
      while (i < depth) {
        val j = idx(i)
        require(j >= 0 && j < width, s"CMS index $j out of [0, $width) at depth row $i")
        b(i * width + j) += 1L
        i += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Bounded top-k by (score desc, id asc): the mergeable state behind
    * a kNN join that never shuffles the candidate set. A window
    * (`row_number() over (partition by src)`) must shuffle EVERY
    * candidate row to its src's reducer — O(n·|candidates|) shuffled
    * rows; this aggregate keeps ≤ k entries per (group, partition)
    * buffer, so partial aggregation runs map-side and only k rows per
    * (src, partition) ever cross the wire. The (score desc, id asc)
    * comparison is a TOTAL order, so the kept set is independent of
    * partitioning and merge order — deterministic at any parallelism.
    */
  final case class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def order(e: (Double, Long)): (Double, Long) = {
      // -0.0 sorts below 0.0 under Ordering[Double]; collapse the zero
      // sign before negating so a ±0.0 score tie falls through to the
      // id-asc tie-break exactly like a SQL window (where -0.0 == 0.0).
      val s = if (e._1 == 0.0) 0.0 else e._1
      (-s, e._2)
    }
    override def zero: Seq[(Double, Long)] = Seq.empty
    // The buffer is kept SORTED by `order` (zero is trivially sorted;
    // reduce/merge re-sort), so a full buffer whose worst entry beats
    // the incoming row can skip it without the per-row allocate+sort —
    // on a corpus scan nearly every row loses, making the hot path one
    // comparison against b.last.
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      if (b.nonEmpty && b.length >= k &&
          Ordering[(Double, Long)].lteq(order(b.last), order(a))) b
      else ((b :+ a).sortBy(order)).take(k)
    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      ((x ++ y).sortBy(order)).take(k)
    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  }
}
