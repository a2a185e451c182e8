package graft.imputer

import graft.SparkSpec

class IterativeImputeSpec extends SparkSpec {
  import spark.implicits._

  /** Scala reimplementation of the cents-quantized MICE algorithm. */
  private def bruteMice(rows: Seq[(Long, Option[Double], Option[Double])],
                        sweeps: Int): Map[Long, (Double, Double)] = {
    val xc = rows.map(_._2.map(v => math.round(v * 100)))
    val yc = rows.map(_._3.map(v => math.round(v * 100)))
    def mean(vs: Seq[Option[Long]]): Long = {
      val o = vs.flatten; math.round(o.sum.toDouble / o.size)
    }
    var xf = xc.map(_.getOrElse(mean(xc)))
    var yf = yc.map(_.getOrElse(mean(yc)))
    def sweepTgt(pred: Seq[Long], tgtObs: Seq[Option[Long]], tgtF: Seq[Long]): Seq[Long] = {
      val obs = pred.zip(tgtObs).collect { case (p, Some(t)) => (p, t) }
      val n = obs.size.toDouble
      val sxy = obs.map { case (p, t) => BigInt(p) * t }.sum.toDouble
      val sxx = obs.map { case (p, _) => BigInt(p) * p }.sum.toDouble
      val sx = obs.map(_._1).sum.toDouble
      val sy = obs.map(_._2).sum.toDouble
      val my = sy / n; val mx = sx / n
      val b = (sxy - sx * sy / n) / (sxx - sx * sx / n)
      tgtObs.zip(pred).map {
        case (Some(t), _) => t
        case (None, p)    => math.round(my - b * mx + b * p.toDouble)
      }
    }
    (1 to sweeps).foreach { _ =>
      yf = sweepTgt(xf, yc, yf)
      xf = sweepTgt(yf, xc, xf)
    }
    rows.map(_._1).zip(xf.zip(yf)).map { case (id, (a, b)) =>
      id -> (a.toDouble / 100.0, b.toDouble / 100.0)
    }.toMap
  }

  private val rows: Seq[(Long, Option[Double], Option[Double])] = Seq(
    (0L, Some(1.0), Some(10.5)), (1L, Some(2.0), None), (2L, Some(3.0), Some(29.25)),
    (3L, None, Some(41.0)), (4L, Some(5.0), Some(52.0)), (5L, Some(6.0), None),
    (6L, None, Some(69.75)), (7L, Some(8.0), Some(80.0)), (8L, Some(9.0), Some(91.5)),
    (9L, None, None)) // doubly-missing row: filled purely by the chain

  test("mice2 matches the quantized chained-OLS reference for 1 and 2 sweeps") {
    val df = rows.toDF("id", "x", "y")
    for (s <- Seq(1, 2)) {
      val got = IterativeImpute.mice2(df, Seq("id"), "x", "y", sweeps = s)
        .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == bruteMice(rows, s), s"sweeps=$s")
    }
  }

  test("observed cells are never modified") {
    val df = rows.toDF("id", "x", "y")
    val got = IterativeImpute.mice2(df, Seq("id"), "x", "y")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (id, x, y) =>
      x.foreach(v => assert(got(id)._1 == v))
      y.foreach(v => assert(got(id)._2 == v))
    }
  }
}
