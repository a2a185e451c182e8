package graft.similarity

import graft.SparkSpec

/** Drift monitor: planted orthogonal / identical half-populations must
  * score cos 0 / cos 1 with exact shifts. */
class EmbedDriftSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Array[Double], Int)]) =
    rows.map { case (id, v, l) => (id, v.map(_.toFloat), l) }
      .toDF("vec_id", "embedding", "label")

  test("orthogonal halves score cos 0 with the full mean shift; identical halves score 1") {
    val rows = Seq(
      // label 0: even ids along x, odd ids along y — orthogonal centroids
      (0L, Array(1.0, 0.0), 0), (2L, Array(1.0, 0.0), 0),
      (1L, Array(0.0, 1.0), 0), (3L, Array(0.0, 1.0), 0),
      // label 1: both halves identical
      (4L, Array(0.5, 0.5), 1), (5L, Array(0.5, 0.5), 1)
    )
    val got = EmbedDrift.halfDrift(df(rows), "vec_id", "embedding", "label")
      .as[(Int, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, ne0, no0, cos0, shift0) = got(0)
    assert((ne0, no0) == (2L, 2L))
    assert(cos0 == 0.0)
    assert(shift0 == 1.0) // dim-0 mean moves 1.0 → 0.0
    val (_, _, _, cos1, shift1) = got(1)
    assert(cos1 == 1.0 && shift1 == 0.0)
  }

  test("a label present in only one half is excluded rather than scored") {
    val rows = Seq((0L, Array(1.0, 0.0), 7), (2L, Array(1.0, 0.0), 7))
    assert(EmbedDrift.halfDrift(df(rows), "vec_id", "embedding", "label").count() == 0L)
  }

  test("small rotation shows up as cos just under 1 and a bounded shift") {
    val rows = Seq(
      (0L, Array(1.0, 0.0), 3), (1L, Array(math.cos(0.1), math.sin(0.1)), 3))
    val r = EmbedDrift.halfDrift(df(rows), "vec_id", "embedding", "label")
      .as[(Int, Long, Long, Double, Double)].collect().head
    assert(r._4 > 0.99 && r._4 < 1.0)
    assert(math.abs(r._5 - math.sin(0.1)) < 1e-4)
  }
}
