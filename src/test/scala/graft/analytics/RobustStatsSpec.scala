package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** events_theilsen / profile_ks / orders_benford: statistical operators
  * checked against driver-side brute-force definitions. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("theilsen: median pairwise slope matches brute force and shrugs off an outlier") {
    val daily = graft.Tables(spark, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    val got = Analytics.eventsTheilsen(spark, dir)
      .select("event_type", "n_pairs", "slope_med")
      .as[(String, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    for ((t, rows) <- daily) {
      val pts = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
      } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1).toDouble).sorted
      val m = slopes.length
      val med = (slopes((m - 1) / 2) + slopes(m / 2)) / 2.0
      val expect = BigDecimal(med).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(t)._1 == m.toLong && math.abs(got(t)._2 - expect) < 1e-9, s"type $t")
    }
    // robustness: a wild outlier day moves the mean-based slope, not the median
    val base = (1L to 9L).map(d => (d, 10L + d)) :+ ((10L, 1000L))
    val df = base.toDF("d", "n").withColumn("event_type", lit("x"))
      .select(col("event_type"), col("d"), col("n"))
    // brute force over the planted series: median slope stays ~1
    val sl = (for { i <- base.indices; j <- base.indices if base(i)._1 < base(j)._1 }
      yield (base(j)._2 - base(i)._2).toDouble / (base(j)._1 - base(i)._1)).sorted
    val med = (sl((sl.length - 1) / 2) + sl(sl.length / 2)) / 2.0
    assert(med == 1.0)
  }

  test("profile_ks: zero on identical samples, near-one on disjoint ones") {
    def frame(vs: Seq[Double]) = vs.toDF("o_totalprice")
    val same = Profile.ks(frame(Seq(1000.0, 2000.0, 3000.0)),
      frame(Seq(1000.0, 2000.0, 3000.0)), "o_totalprice", 2, 100000L, "a", "b")
      .select("ks_stat").as[Double].collect()(0)
    assert(same == 0.0)
    val far = Profile.ks(frame(Seq(1000.0, 1500.0)), frame(Seq(900000.0, 990000.0)),
      "o_totalprice", 2, 100000L, "a", "b").select("ks_stat").as[Double].collect()(0)
    assert(far == 1.0)
  }

  test("profile_ks matches a brute-force banded KS on the sf corpus") {
    val got = Profile.ordersKs(spark, dir).collect()(0)
    val o = graft.Tables(spark, dir, "orders")
    val c = graft.Tables(spark, dir, "customer").select("c_custkey", "c_mktsegment")
    def bands(seg: String): Map[Long, Long] = o
      .join(c.filter(col("c_mktsegment") === seg), col("o_custkey") === col("c_custkey"))
      .select(expr("cast(round(o_totalprice * 100.0, 0) as bigint) div 100000").as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    val (ba, bb) = (bands("BUILDING"), bands("MACHINERY"))
    val (na, nb) = (ba.values.sum, bb.values.sum)
    val keys = (ba.keySet ++ bb.keySet).toSeq.sorted
    var (cuma, cumb, best, bestBand) = (0L, 0L, -1L, 0L)
    for (k <- keys) {
      cuma += ba.getOrElse(k, 0L); cumb += bb.getOrElse(k, 0L)
      val s = math.abs(cuma * nb - cumb * na)
      if (s > best) { best = s; bestBand = k }
    }
    val expect = BigDecimal(best.toDouble / (na.toDouble * nb.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Long]("n_a") == na && got.getAs[Long]("n_b") == nb)
    assert(got.getAs[Double]("ks_stat") == expect)
    assert(got.getAs[Long]("peak_band") == bestBand)
  }

  test("interarrival: week histogram matches brute-force per-customer median gaps") {
    val o = graft.Tables(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("d"),
        col("o_orderkey"))
      .as[(Long, Long, Long)].collect()
    val expect = o.groupBy(_._1).values
      .map { rows =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        sorted.zip(sorted.drop(1)).map { case (a, b) => b._2 - a._2 }.toSeq
      }
      .filter(_.nonEmpty)
      .map { gaps =>
        val s = gaps.sorted
        val med2 = if (s.length % 2 == 1) 2 * s(s.length / 2)
                   else s(s.length / 2 - 1) + s(s.length / 2)
        med2 / 14
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Analytics.ordersInterarrival(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("skyline: banded reduction equals brute-force dominance, ties included") {
    // planted frontier with the tricky shapes: anti-correlated points
    // (all survive), a within-band tie (both survive — no strict coord),
    // a cross-band tie (dies — count is strict), and dominated points
    val pts = Seq( // (custkey, orders, spend_cents)
      (1L, 1L, 900L), (2L, 2L, 700L), (3L, 3L, 500L), (4L, 4L, 300L),
      (5L, 2L, 700L),            // within-band tie with #2 — both stay
      (6L, 1L, 300L),            // cross-band tie with #4's spend — dies
      (7L, 2L, 100L), (8L, 3L, 499L)) // dominated
    val brute = pts.filter(p => !pts.exists(q =>
      q._1 != p._1 && q._2 >= p._2 && q._3 >= p._3 &&
        (q._2 > p._2 || q._3 > p._3))).map(_._1).toSet
    assert(brute == Set(1L, 2L, 3L, 4L, 5L))
    // run the same banded algorithm over a synthetic orders table: one
    // order row per (custkey, order) with totalprice spread so the
    // per-customer rollup reproduces pts
    val rows = pts.flatMap { case (c, n, m) =>
      // full spend on the first order, zero on the rest — per-order cents
      // rounding must reproduce the planted totals exactly
      (1L to n).map(i => (c, if (i == 1L) m.toDouble / 100.0 else 0.0, i))
    }
    val dir = java.nio.file.Files.createTempDirectory("sky").toString
    rows.toDF("o_custkey", "o_totalprice", "i")
      .withColumn("o_orderdate", lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")))
      .drop("i")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Analytics.ordersSkyline(spark, dir)
      .select("o_custkey").as[Long].collect().toSet
    assert(got == brute)
  }

  test("contribution: halves partition the stream and shares sum to 1 when delta != 0") {
    val rows = Analytics.eventsContribution(spark, dir)
      .select("event_type", "n_first", "n_second", "delta")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(r => r._2 + r._3).sum ==
      graft.Tables(spark, dir, "events").count())
    assert(rows.forall(r => r._4 == r._3 - r._2))
    val totalDelta = rows.map(_._4).sum
    if (totalDelta != 0L) {
      val shares = Analytics.eventsContribution(spark, dir)
        .select("share").as[Double].collect()
      assert(math.abs(shares.sum - 1.0) < 1e-4)
    }
  }

  test("jsd: zero on identical corpora, ln2 on disjoint, hand value in between") {
    def jsd(a: Seq[String], b: Seq[String]): Double = {
      val df = (a.map(t => (t, "A")) ++ b.map(t => (t, "B"))).toDF("text", "source")
      Profile.termJsd(df, "text", "source", "A", "B")
        .select("jsd_nats").as[Double].collect()(0)
    }
    assert(jsd(Seq("x y z"), Seq("x y z")) == 0.0)
    val disjoint = jsd(Seq("a b c"), Seq("d e f"))
    assert(math.abs(disjoint - math.log(2.0)) < 1e-6)
    // p = (1/2, 1/2, 0), q = (1/2, 0, 1/2): JSD = 0.5*ln2 over the two
    // non-shared terms (each contributes 0.5*0.5*ln2 twice)
    val half = jsd(Seq("s u"), Seq("s v"))
    assert(math.abs(half - 0.5 * math.log(2.0)) < 1e-6)
  }

  test("benford: expected fractions are the Benford masses and observed fractions sum to ~1") {
    val rows = Analytics.ordersBenford(spark, dir)
      .select("digit", "n_obs", "obs_frac", "exp_frac")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 9L))
    for ((d, _, _, ef) <- rows) {
      val expect = BigDecimal(math.log10((d + 1.0) / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ef == expect, s"digit $d")
    }
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(rows.map(_._2).sum ==
      graft.Tables(spark, dir, "orders").count())
  }
}
