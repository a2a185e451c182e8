package graft.imputer

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AlsImputeSpec extends SparkSpec {
  import spark.implicits._

  test("completes a low-rank matrix: hidden cells recover near their true values") {
    // rank-1 ground truth: value(r, c) = rf(r) * cf(c); hide ~15% of cells
    val rf = (0 until 20).map(r => 1.0 + (r % 5) * 0.5)
    val cf = (0 until 12).map(c => 2.0 - (c % 4) * 0.3)
    val cells = for (r <- 0 until 20; c <- 0 until 12) yield {
      val v = rf(r) * cf(c)
      (r, c, if ((r * 12 + c) % 7 == 3) Option.empty[Double] else Some(v))
    }
    val df = cells.toDF("row", "col", "value")
    val out = AlsImpute.complete(df, "row", "col", "value", "filled",
        rank = 2, maxIter = 15, regParam = 0.01)
      .select("row", "col", "filled").as[(Int, Int, Double)].collect()
    assert(out.length == 240)
    val truth = cells.map { case (r, c, _) => (r, c) -> (rf(r) * cf(c)) }.toMap
    val hidden = cells.collect { case (r, c, None) => (r, c) }.toSet
    assert(hidden.nonEmpty)
    out.foreach { case (r, c, v) =>
      val t = truth((r, c))
      if (hidden((r, c)))
        assert(math.abs(v - t) < 0.25 * t, s"($r,$c): got $v want ~$t")
      else assert(v == t) // observed cells pass through untouched
    }
  }

  test("cold-start rows (never observed) fill with NaN, not a silent guess") {
    val cells = Seq(
      (0, 0, Some(2.0)), (0, 1, Some(4.0)),
      (1, 0, Some(3.0)), (1, 1, Some(6.0)),
      (9, 0, Option.empty[Double])) // row 9 has NO observed cells
      .toDF("row", "col", "value")
    val out = AlsImpute.complete(cells, "row", "col", "value", "filled",
        rank = 2, maxIter = 5)
      .filter(col("row") === 9).select("filled").as[Double].collect()
    assert(out.length == 1 && out.head.isNaN)
  }

  test("ids beyond Int range fail loudly instead of overflow-colliding") {
    val cells = Seq(
      (5000000000L, 0L, Some(2.0)), (1L, 0L, Some(3.0)),
      (2L, 1L, Option.empty[Double]))
      .toDF("row", "col", "value")
    val e = intercept[IllegalArgumentException] {
      AlsImpute.complete(cells, "row", "col", "value", "filled", rank = 2, maxIter = 2)
    }
    assert(e.getMessage.contains("outside Int range") && e.getMessage.contains("row"))
  }

  test("string id columns are rejected outright, not cast to NULL keys") {
    val cells = Seq(("r1", 0, Some(2.0)), ("r2", 0, Some(3.0)),
      ("r2", 1, Option.empty[Double])).toDF("row", "col", "value")
    val e = intercept[IllegalArgumentException] {
      AlsImpute.complete(cells, "row", "col", "value", "filled", rank = 1, maxIter = 2)
    }
    assert(e.getMessage.contains("'row'") && e.getMessage.contains("string"),
      e.getMessage)
  }

  test("int-typed id columns skip the bounds scan entirely") {
    val cells = Seq((0, 0, Some(2.0)), (1, 0, Some(3.0)), (1, 1, Option.empty[Double]))
      .toDF("row", "col", "value")
    val out = AlsImpute.complete(cells, "row", "col", "value", "filled", rank = 1, maxIter = 2)
    assert(out.count() == 3)
  }
}
