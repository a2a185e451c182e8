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

  /** Scala reimplementation of the MULTI-predictor (2-feature Cramer)
    * chained algorithm — the mice3 reference. */
  private def bruteMice3(rows: Seq[(Long, Option[Double], Option[Double], Option[Double])],
                         sweeps: Int): Map[Long, (Double, Double, Double)] = {
    def q(v: Option[Double]) = v.map(x => math.round(x * 100))
    val (xc, yc, zc) = (rows.map(r => q(r._2)), rows.map(r => q(r._3)), rows.map(r => q(r._4)))
    def mean(vs: Seq[Option[Long]]): Long = {
      val o = vs.flatten; math.round(o.sum.toDouble / o.size)
    }
    var xf = xc.map(_.getOrElse(mean(xc)))
    var yf = yc.map(_.getOrElse(mean(yc)))
    var zf = zc.map(_.getOrElse(mean(zc)))
    def upd(p1: Seq[Long], p2: Seq[Long], tgtObs: Seq[Option[Long]]): Seq[Long] = {
      val obs = p1.lazyZip(p2).lazyZip(tgtObs).toSeq
        .collect { case (a, b, Some(t)) => (a, b, t) }
      val n = obs.size.toDouble
      def bsum(f: ((Long, Long, Long)) => BigInt) = obs.map(f).sum.toDouble
      val s1y = bsum { case (a, _, t) => BigInt(a) * t }
      val s2y = bsum { case (_, b, t) => BigInt(b) * t }
      val s11 = bsum { case (a, _, _) => BigInt(a) * a }
      val s22 = bsum { case (_, b, _) => BigInt(b) * b }
      val s12 = bsum { case (a, b, _) => BigInt(a) * b }
      val s1 = obs.map(_._1).sum.toDouble
      val s2 = obs.map(_._2).sum.toDouble
      val sy = obs.map(_._3).sum.toDouble
      val (my, m1, m2) = (sy / n, s1 / n, s2 / n)
      val c11 = s11 - s1 * s1 / n; val c22 = s22 - s2 * s2 / n
      val c12 = s12 - s1 * s2 / n
      val c1y = s1y - s1 * sy / n; val c2y = s2y - s2 * sy / n
      val b1 = (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12)
      val b2 = (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12)
      tgtObs.lazyZip(p1).lazyZip(p2).toSeq.map {
        case (Some(t), _, _) => t
        case (None, a, b) =>
          math.round(my - b1 * m1 - b2 * m2 + b1 * a.toDouble + b2 * b.toDouble)
      }
    }
    (1 to sweeps).foreach { _ =>
      xf = upd(yf, zf, xc)
      yf = upd(xf, zf, yc)
      zf = upd(xf, yf, zc)
    }
    rows.map(_._1).zip(xf.lazyZip(yf).lazyZip(zf).toSeq).map { case (id, (a, b, c)) =>
      id -> (a.toDouble / 100.0, b.toDouble / 100.0, c.toDouble / 100.0)
    }.toMap
  }

  // three correlated-but-not-collinear columns with scattered missingness,
  // including a triply-missing row filled purely by the chain
  private val rows3: Seq[(Long, Option[Double], Option[Double], Option[Double])] = Seq(
    (0L, Some(1.0), Some(10.5), Some(3.1)), (1L, Some(2.0), None, Some(4.9)),
    (2L, Some(3.0), Some(29.25), None), (3L, None, Some(41.0), Some(9.2)),
    (4L, Some(5.0), Some(52.0), Some(11.0)), (5L, Some(6.0), None, Some(12.8)),
    (6L, None, Some(69.75), Some(15.3)), (7L, Some(8.0), Some(80.0), None),
    (8L, Some(9.0), Some(91.5), Some(19.1)), (9L, None, None, None))

  test("mice3 matches the quantized 2-predictor Cramer reference for 1 and 2 sweeps") {
    val df = rows3.toDF("id", "x", "y", "z")
    for (s <- Seq(1, 2)) {
      val got = IterativeImpute.mice3(df, Seq("id"), "x", "y", "z", sweeps = s)
        .as[(Long, Double, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got == bruteMice3(rows3, s), s"sweeps=$s")
    }
  }

  test("mice3 observed cells are never modified; multi-predictor fit beats mean fill") {
    val df = rows3.toDF("id", "x", "y", "z")
    val got = IterativeImpute.mice3(df, Seq("id"), "x", "y", "z")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    rows3.foreach { case (id, x, y, z) =>
      x.foreach(v => assert(got(id)._1 == v))
      y.foreach(v => assert(got(id)._2 == v))
      z.foreach(v => assert(got(id)._3 == v))
    }
    // y ≈ 10x on this fixture: the chained fit must land the missing y at
    // id=1 (x=2) near 20, far from the observed-y mean (~53.4)
    assert(math.abs(got(1L)._2 - 20.0) < 3.0, s"got ${got(1L)._2}")
  }
}
