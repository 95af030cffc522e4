package graft.functions

/** Small dense linear algebra for the driver side of distributed
  * decompositions: the distributed pass reduces a 100 TB corpus to a
  * dim×dim matrix (see [[Aggregators.GramMatrix]]); everything here
  * runs on that matrix in microseconds. Hand-rolled (no native-library
  * dependency), deterministic given identical input.
  */
object LinAlg {

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (Golub &
    * Van Loan §8.5): repeated 2×2 rotations annihilate off-diagonal
    * entries; unconditionally convergent for symmetric input and
    * accurate to machine precision — the right solver for small
    * covariance matrices (no shifts, no deflation corner cases).
    *
    * Returns (eigenvalues, eigenvectors-as-rows), sorted by eigenvalue
    * descending; each vector's sign is normalized so its largest-|·|
    * coordinate is positive (eigenvectors are only defined up to sign —
    * pinning it keeps downstream projections reproducible).
    */
  def symEig(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }

    var sweep = 0
    while (sweep < 64 && offDiag() > 1e-22) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val app = a(p)(p); val aqq = a(q)(q); val apq = a(p)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var k = 0
            while (k < n) {
              if (k != p && k != q) {
                val akp = a(k)(p); val akq = a(k)(q)
                a(k)(p) = c * akp - s * akq; a(p)(k) = a(k)(p)
                a(k)(q) = s * akp + c * akq; a(q)(k) = a(k)(q)
              }
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    // columns of v are the eigenvectors; sort by eigenvalue desc
    // (index asc on exact ties), emit as rows, pin the sign
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val vec = Array.tabulate(n)(k => v(k)(i))
      var best = 0
      var k = 1
      while (k < n) { if (math.abs(vec(k)) > math.abs(vec(best))) best = k; k += 1 }
      if (vec(best) < 0.0) { k = 0; while (k < n) { vec(k) = -vec(k); k += 1 } }
      vec
    }.toArray
    (values, vectors)
  }
}
