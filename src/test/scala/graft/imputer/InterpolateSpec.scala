package graft.imputer

import org.apache.spark.sql.functions._
import graft.SparkSpec

class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Option[Double])]): Seq[(Long, Double)] = {
    val obs = rows.collect { case (x, Some(y)) => (x.toDouble, y) }
    rows.map {
      case (x, Some(y)) => (x, y)
      case (x, None) =>
        val pr = obs.filter(_._1 < x).lastOption
        val nx = obs.find(_._1 > x)
        val v = (pr, nx) match {
          case (Some((x0, y0)), Some((x1, y1))) =>
            y0 + (y1 - y0) * (x.toDouble - x0) / (x1 - x0)
          case (Some((_, y0)), None) => y0
          case (None, Some((_, y1))) => y1
          case _ => Double.NaN
        }
        (x, v)
    }
  }

  test("linear interpolation matches the sequential reference across partitions") {
    val rows: Seq[(Long, Option[Double])] = Seq(
      (0L, None), (1L, None),                      // leading gap → first observed
      (2L, Some(10.0)), (3L, None), (4L, None), (5L, Some(40.0)),
      (6L, Some(41.0)), (7L, None), (10L, Some(50.0)),  // uneven x spacing
      (11L, None), (12L, None))                    // trailing gap → last observed
    for (parts <- Seq(1, 3, 8)) {
      val got = Interpolate.linear1d(rows.toDF("x", "y"), "x", "y", "y_i",
          numPartitions = parts)
        .orderBy("x").select("x", "y_i").as[(Long, Double)].collect().toSeq
      assert(got == brute(rows), s"parts=$parts")
    }
  }

  test("constant impute fills with the literal and keeps observed values") {
    val df = Seq((1L, Some("A")), (2L, None)).toDF("id", "c")
    val out = Strategies.constant(df, "c", "X", "c_imp")
      .orderBy("id").select("c_imp").as[String].collect().toSeq
    assert(out == Seq("A", "X"))
  }
}
