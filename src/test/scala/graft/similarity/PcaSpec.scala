package graft.similarity

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("fit recovers a known dominant axis from rank-structured data") {
    // points t·(0.6, 0.8) + s·(−0.8, 0.6) with |t| spread ≫ |s| spread
    val rows = (-50 to 50).flatMap { t =>
      Seq(-1, 1).map { s =>
        val (a, b) = (t * 0.6 + s * 0.08 * (-0.8), t * 0.8 + s * 0.08 * 0.6)
        (t.toLong * 2 + (s + 1) / 2, Array(a.toFloat, b.toFloat))
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    val (comps, eigs, mu) = Pca.fit(df, "embedding", 2)
    assert(math.abs(mu(0)) < 1e-5 && math.abs(mu(1)) < 1e-5)
    // PC1 aligns with (0.6, 0.8); PC2 with the orthogonal axis
    assert(math.abs(comps(0)(0) * 0.6 + comps(0)(1) * 0.8) > 0.9999)
    assert(math.abs(comps(1)(0) * -0.8 + comps(1)(1) * 0.6) > 0.9999)
    // orthonormal, variance-ordered
    assert(math.abs(comps(0)(0) * comps(1)(0) + comps(0)(1) * comps(1)(1)) < 1e-9)
    assert(eigs(0) > eigs(1) && eigs(1) >= 0)
    // sign convention: the largest loading is positive
    assert(comps(0).maxBy(math.abs) > 0)
  }

  test("fitTransform projects every row; PC1 spread dominates PC2") {
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Pca.fitTransform(e, "vec_id", "embedding", 2)
      .as[(Long, Double, Double)].collect()
    assert(out.length == e.count())
    def varOf(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    assert(varOf(out.map(_._2)) >= varOf(out.map(_._3)))
  }
}
