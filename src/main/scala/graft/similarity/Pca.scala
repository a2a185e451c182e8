package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Distributed PCA for embedding columns — the dimensionality-reduction
  * step of an embedding-pipeline (visualisation, cheap pre-filtering,
  * whitening before clustering).
  *
  * Scale shape: ONE aggregation pass over the corpus computes the mean
  * vector and the mean outer product (d + d² doubles of mergeable state via
  * `graft_vec_avg`, map-side partials — the 100 TB path never shuffles more
  * than executor-count × d² numbers). The d×d covariance then collapses to
  * the driver (d is bounded — 64 here; d²·8B is KBs), where a fixed-cycle
  * power iteration extracts the top components with NO randomness: the
  * start vector is all-ones/√d and the sign convention (largest-magnitude
  * loading positive) pins each eigenvector. The projection back over the
  * corpus is a pure broadcast-literal expression — no second shuffle.
  *
  * Float→double accumulation order varies with partitioning, so outputs are
  * model-class (rows+spec checked), like the other embedding operators.
  */
object Pca {

  /** Top-`nComponents` principal axes of `vecCol` (array<float|double>).
    * Returns (components, eigenvalues, mean) — components row-major. */
  def fit(df: DataFrame, vecCol: String, nComponents: Int,
          iterations: Int = 100): (Array[Array[Double]], Array[Double], Array[Double]) = {
    val v = toDouble(col(vecCol))
    val outer = flatten(transform(v, x => transform(v, y => x * y)))
    val row = df.agg(
      call_function("graft_vec_avg", v).as("_mu"),
      call_function("graft_vec_avg", outer).as("_m2")).head()
    val mu = row.getSeq[Double](0).toArray
    val m2 = row.getSeq[Double](1).toArray
    val d = mu.length
    // covariance C = E[xxᵀ] − μμᵀ
    val c = Array.tabulate(d, d)((i, j) => m2(i * d + j) - mu(i) * mu(j))

    val comps = new Array[Array[Double]](nComponents)
    val eigs = new Array[Double](nComponents)
    for (k <- 0 until nComponents) {
      var x = Array.fill(d)(1.0 / math.sqrt(d))
      var it = 0
      while (it < iterations) {
        val y = multiply(c, x)
        // deflate previously extracted components
        for (p <- 0 until k) {
          val proj = dotv(comps(p), y)
          var i = 0
          while (i < d) { y(i) -= proj * comps(p)(i); i += 1 }
        }
        val n = math.sqrt(dotv(y, y))
        if (n > 0) { var i = 0; while (i < d) { y(i) /= n; i += 1 } }
        x = y
        it += 1
      }
      // deterministic sign: the largest-|loading| coordinate is positive
      val pivot = x.indices.maxBy(i => (math.abs(x(i)), -i))
      if (x(pivot) < 0) { var i = 0; while (i < d) { x(i) = -x(i); i += 1 } }
      comps(k) = x
      eigs(k) = dotv(x, multiply(c, x))
    }
    (comps, eigs, mu)
  }

  /** Fit on the corpus then project every row onto the top components as
    * broadcast-literal expressions: `pc_k = (v − μ)·comp_k`. */
  def fitTransform(df: DataFrame, idCol: String, vecCol: String,
                   nComponents: Int): DataFrame = {
    val (comps, _, mu) = fit(df, vecCol, nComponents)
    val muLit = array(mu.map(lit): _*)
    val centered = zip_with(toDouble(col(vecCol)), muLit, (a, b) => a - b)
    val pcs = comps.zipWithIndex.map { case (comp, k) =>
      dot(centered, array(comp.map(lit): _*)).as(s"pc${k + 1}")
    }
    df.select(col(idCol) +: pcs: _*)
  }

  private def multiply(m: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val d = x.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      while (j < d) { s += m(i)(j) * x(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  private def dotv(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
