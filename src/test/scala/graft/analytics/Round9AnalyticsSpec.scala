package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 analytics wave: grouping sets, autocorrelation, CUSUM
  * changepoint — semantic cross-checks against brute-force recomputations
  * at sf0.001. */
class Round9AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q_groupingsets: each granularity is internally consistent") {
    val out = Analytics.qGroupingSets(spark, sf)
      .as[(String, String, Double, Long)].collect()
    val fine = out.filter(r => r._1 != "ALL" && r._2 != "ALL")
    val mid = out.filter(r => r._1 != "ALL" && r._2 == "ALL")
    val grand = out.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(grand.length == 1)
    // counts roll up exactly across the three granularities
    assert(fine.map(_._4).sum == grand.head._4)
    assert(mid.map(_._4).sum == grand.head._4)
    mid.foreach { m =>
      assert(fine.filter(_._1 == m._1).map(_._4).sum == m._4)
    }
    // and the grand total matches an independent aggregate
    val n = graft.Tables(spark, sf, "lineitem").count()
    assert(grand.head._4 == n)
  }

  test("events_autocorr: matches a driver-side Pearson over daily counts") {
    val out = Analytics.eventsAutocorr(spark, sf)
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.nonEmpty)
    val daily = graft.Tables(spark, sf, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rs) => t -> rs.map(r => r._2 -> r._3).toMap }
    out.foreach { case ((t, lag), (_, _, m, r)) =>
      val series = daily(t)
      val pairs = series.toSeq.flatMap { case (d, x) =>
        series.get(d - lag).map(y => (x, y))
      }
      assert(m == pairs.length)
      if (pairs.length >= 2) {
        val (xs, ys) = pairs.unzip
        val mm = pairs.length.toLong
        val (sx, sy) = (xs.sum, ys.sum)
        val sxx = xs.map(v => v * v).sum
        val syy = ys.map(v => v * v).sum
        val sxy = pairs.map { case (x, y) => x * y }.sum
        val (vx, vy) = (mm * sxx - sx * sx, mm * syy - sy * sy)
        if (vx > 0 && vy > 0) {
          val expect = (mm * sxy - sx * sy).toDouble /
            (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))
          assert(r.isDefined && math.abs(r.get - expect) < 1e-6, s"($t, $lag)")
          assert(math.abs(r.get) <= 1.0 + 1e-9)
        } else assert(r.isEmpty)
      }
    }
  }

  test("events_changepoint: peak matches the brute-force CUSUM arg-max") {
    val out = Analytics.eventsChangepoint(spark, sf)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val daily = graft.Tables(spark, sf, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    daily.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      val nd = sorted.length.toLong
      val tot = sorted.map(_._3).sum
      var acc = 0L
      val cusum = sorted.map { case (_, d, n) => acc += n * nd - tot; (d, acc) }
      val peakAbs = cusum.map(c => math.abs(c._2)).max
      val peakDay = cusum.filter(c => math.abs(c._2) == peakAbs).map(_._1).min
      val (_, gotNd, gotDay, gotStat) = out(t)
      assert(gotNd == nd && gotDay == peakDay)
      assert(gotStat == peakAbs.toDouble / nd.toDouble)
    }
  }
}
