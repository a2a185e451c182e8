package graft.imputer

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KnnImputeSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force oracle: mean (exact cents) of the k nearest observed ys,
    * ties by (dist, x, id). */
  private def brute(rows: Seq[(Long, Double, Option[Double])], k: Int): Map[Long, Double] = {
    val obs = rows.collect { case (id, x, Some(y)) => (id, x, math.round(y * 100)) }
    rows.collect { case (mid, mx, None) =>
      val nn = obs.sortBy { case (oid, ox, _) => (math.abs(ox - mx), ox, oid) }.take(k)
      val cents = math.round(nn.map(_._3).sum.toDouble / nn.size)
      mid -> cents.toDouble / 100.0
    }.toMap
  }

  private def run(rows: Seq[(Long, Double, Option[Double])], k: Int, parts: Int): Map[Long, Double] = {
    val df = rows.toDF("id", "x", "y")
    KnnImpute.impute1d(df, "id", col("x"), "y", "y_imp", k, numPartitions = parts)
      .filter(col("y_imp").isNotNull).as[(Long, Double)].collect().toMap
  }

  test("knn mean matches brute force across partition boundaries") {
    val rows = (0L until 60L).map { i =>
      val y = if (i % 5 == 2) None else Some((i * 37 % 101).toDouble + 0.25)
      (i, i.toDouble, y)
    }
    val expected = rows.filter(_._3.isEmpty).map(_._1).map(i => i -> brute(rows, 3)(i)).toMap
    val got = run(rows, 3, parts = 7) // force several range partitions
    val observed = rows.collect { case (id, _, Some(y)) => id -> y }.toMap
    assert(got.filter { case (id, _) => expected.contains(id) } == expected)
    assert(got.filter { case (id, _) => observed.contains(id) } == observed)
  }

  test("knn survives sparse partitions (fewer observed than k in a range)") {
    // observed rows clustered at both ends, a long missing run in the middle:
    // middle partitions have zero observed rows, neighbors must cross 2+ ranges
    val rows: Seq[(Long, Double, Option[Double])] =
      (0L until 4L).map(i => (i, i.toDouble, Some(10.0 + i))) ++
      (4L until 16L).map(i => (i, i.toDouble, None: Option[Double])) ++
      (16L until 20L).map(i => (i, i.toDouble, Some(50.0 + i)))
    val expected = brute(rows, 3)
    val got = run(rows, 3, parts = 6)
    expected.foreach { case (id, v) => assert(got(id) == v, s"id $id") }
  }

  test("heavy ties: constant predictor degenerates to k smallest observed ids") {
    val rows = (0L until 30L).map { i =>
      (i, 5.0, if (i % 3 == 0) None: Option[Double] else Some(i.toDouble * 1.5))
    }
    val expected = brute(rows, 4)
    val got = run(rows, 4, parts = 5)
    expected.foreach { case (id, v) => assert(got(id) == v, s"id $id") }
  }

  test("tie runs longer than k still pick the k SMALLEST ids (not positional)") {
    // 20 observed rows all at x=5.0 with y=i, one missing row (id=20) also
    // at x=5.0: every neighbor ties at dist 0, so the (dist, x, id)
    // tie-break must select ids 0 and 1 → mean 0.5 — a positional ±k
    // window would grab the ids adjacent in (x, id) order instead
    val rows = (0L until 20L).map(i => (i, 5.0, Some(i.toDouble))) :+
      ((20L, 5.0, None: Option[Double]))
    val got = run(rows, 2, parts = 3)
    assert(got(20L) == 0.5, s"got ${got(20L)}")
    val expected = brute(rows, 2)
    expected.foreach { case (id, v) => assert(got(id) == v, s"id $id") }
    // same shape but the tie run straddles many partitions
    val got7 = run(rows, 2, parts = 7)
    assert(got7(20L) == 0.5)
  }

  test("ties at equal distance break by smaller x") {
    // missing at x=5; observed at 3,4,6,7 (dist 2,1,1,2), k=2 → {4,6}; k=3 adds x=3
    val rows: Seq[(Long, Double, Option[Double])] = Seq(
      (0L, 3.0, Some(1.0)), (1L, 4.0, Some(2.0)), (2L, 6.0, Some(4.0)),
      (3L, 7.0, Some(8.0)), (9L, 5.0, None))
    assert(run(rows, 2, 2)(9L) == 3.0)   // (2+4)/2
    assert(run(rows, 3, 2)(9L) == 2.33)  // round((100+200+400)/3)=233 cents
  }

  test("edge-pool bound fails fast with the knobs named") {
    val rows: Seq[(Long, Double, Option[Double])] =
      Seq((0L, 1.0, Some(1.0)), (1L, 2.0, None))
    val e = intercept[IllegalArgumentException] {
      run(rows, k = 1001, parts = 1000)
    }
    assert(e.getMessage.contains("edge pool") && e.getMessage.contains("numPartitions"))
  }
}
