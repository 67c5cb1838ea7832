package graft.operators

/** Driver-side dense-matrix inversion for parameter-sized models
  * (dim ≤ 1024 by the [[Pipeline.embeddingMeanCov]] contract):
  * Gauss-Jordan with partial pivoting — deterministic (no pivots
  * depend on anything but the input values), O(dim³) on a matrix that
  * is a MODEL, not data. Throws on a singular input; callers
  * regularize (mahalanobisScores adds eps·I) so a well-posed
  * covariance never trips it. */
private[graft] object MahalanobisMath {

  def invert(a: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    // augmented [A | I], row-reduced in place
    val w = Array.tabulate(n, 2 * n) { (r, c) =>
      if (c < n) a(r)(c) else if (c - n == r) 1.0 else 0.0
    }
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) {
        if (math.abs(w(r)(col)) > math.abs(w(piv)(col))) piv = r
        r += 1
      }
      if (math.abs(w(piv)(col)) < 1e-300)
        throw new IllegalArgumentException(
          s"matrix is singular at column $col — regularize (eps·I) first")
      if (piv != col) { val t = w(piv); w(piv) = w(col); w(col) = t }
      val d = w(col)(col)
      var c = 0
      while (c < 2 * n) { w(col)(c) /= d; c += 1 }
      r = 0
      while (r < n) {
        if (r != col) {
          val f = w(r)(col)
          if (f != 0.0) {
            var c2 = 0
            while (c2 < 2 * n) { w(r)(c2) -= f * w(col)(c2); c2 += 1 }
          }
        }
        r += 1
      }
      col += 1
    }
    Array.tabulate(n, n)((r, c) => w(r)(n + c))
  }
}
