package graft.analytics

import graft.SparkSpec

/** Round-8 operator specs: value histogram, Pareto revenue concentration,
  * Zipf vocabulary head. */
class Round8Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("profile_histogram: counts partition the table and shares sum to 1") {
    val rows = Profile.lineitemHistogram(spark, sf).collect()
    val total = graft.Tables(spark, sf, "lineitem").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    val pctSum = rows.map(_.getAs[Double]("pct")).sum
    assert(math.abs(pctSum - 1.0) < 1e-9, s"pct sums to $pctSum")
    // $500 bins over positive prices: bin_lo values are distinct multiples of 500
    val los = rows.map(_.getAs[Double]("bin_lo"))
    assert(los.distinct.length == los.length)
    assert(los.forall(lo => lo % 500.0 == 0.0))
  }

  test("orders_pareto: ranked top-20, cumulative share monotone and bounded") {
    val rows = Analytics.ordersPareto(spark, sf).orderBy("rank").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 20L))
    val rev = rows.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b }, "revenue non-increasing")
    val cum = rows.map(_.getAs[Double]("cum_share"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a < b }, "cum_share strictly increasing")
    assert(cum.last > 0.0 && cum.last <= 1.0)
  }

  test("histogram floor-bins negative values like the oracle's // (not toward zero)") {
    import spark.implicits._
    // bin_lo is the inclusive lower edge: [-500.00, -0.01] all floor to
    // bin -1 (lo −500.0) and -500.01 to bin -2 — a truncating div would
    // put -0.01..-499.99 with the positives and silently skew every
    // negative-valued distribution
    val d = Seq(-0.01, -499.99, -500.0, -500.01, 0.0, 499.99, 500.0)
      .toDF("v")
    val got = Profile.histogram(d, "v", 2, 50000L)
      .collect().map(r => r.getAs[Double]("bin_lo") -> r.getAs[Long]("n_rows")).toMap
    assert(got == Map(-500.0 -> 3L, -1000.0 -> 1L, 0.0 -> 2L, 500.0 -> 1L), s"got $got")
  }

  test("orders_pareto is deterministic across partitionings") {
    val a = Analytics.ordersPareto(spark, sf).collect().toSeq
    val b = Analytics.ordersPareto(spark, sf).repartition(7).collect().toSeq
    assert(a.map(_.toString).sorted == b.map(_.toString).sorted)
  }

  test("orders_seasonality: growth recurrences match a direct recomputation") {
    val rows = Analytics.ordersSeasonality(spark, sf)
      .orderBy("o_year", "o_month").collect()
    assert(rows.nonEmpty)
    // counts partition the orders table
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      graft.Tables(spark, sf, "orders").count())
    // first calendar month has no MoM predecessor; first year of each month
    // slot has no YoY predecessor
    assert(rows.head.isNullAt(rows.head.fieldIndex("mom_growth")))
    val byYm = rows.map(r => (r.getAs[Long]("o_year"), r.getAs[Long]("o_month")) -> r).toMap
    rows.foreach { r =>
      val (y, m) = (r.getAs[Long]("o_year"), r.getAs[Long]("o_month"))
      byYm.get(if (m == 1) (y - 1, 12L) else (y, m - 1)).foreach { prev =>
        val expect = (r.getAs[Double]("revenue") - prev.getAs[Double]("revenue")) /
          prev.getAs[Double]("revenue")
        assert(math.abs(r.getAs[Double]("mom_growth") - expect) < 1e-9,
          s"MoM at ($y,$m)")
      }
      byYm.get((y - 1, m)).foreach { prev =>
        val expect = (r.getAs[Double]("revenue") - prev.getAs[Double]("revenue")) /
          prev.getAs[Double]("revenue")
        assert(math.abs(r.getAs[Double]("yoy_growth") - expect) < 1e-9,
          s"YoY at ($y,$m)")
      }
    }
  }

  test("events_forecast_eval matches a driver-side seasonal-naive recomputation") {
    val got = Analytics.eventsForecastEval(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_days_eval"),
        r.getAs[Double]("mae"), r.getAs[Double]("bias")))).toMap
    // brute-force reference from the raw (type, day) counts
    val daily = graft.Tables(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.expr("ts div 86400000000000").as("d"))
      .groupBy("event_type", "d")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = daily.keys.groupBy(_._1).map { case (t, keys) =>
      val scored = keys.toSeq.flatMap { case (_, d) =>
        daily.get((t, d - 7)).map(p => (daily((t, d)), p))
      }
      t -> ((scored.size.toLong,
        scored.map { case (a, p) => math.abs(a - p) }.sum.toDouble / scored.size,
        scored.map { case (a, p) => a - p }.sum.toDouble / scored.size))
    }
    assert(got.keySet == expect.keySet)
    got.foreach { case (t, (n, mae, bias)) =>
      val (en, emae, ebias) = expect(t)
      assert(n == en, s"$t n_days")
      assert(math.abs(mae - emae) < 1e-12, s"$t mae")
      assert(math.abs(bias - ebias) < 1e-12, s"$t bias")
    }
  }

  test("embed_outliers: ~5% flagged per label, far vectors score higher") {
    import spark.implicits._
    val rows = graft.queries.Q.embedOutliers(spark, sf).collect()
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    byLabel.foreach { case (l, rs) =>
      val flagged = rs.count(_.getAs[Boolean]("is_outlier"))
      // strictly-above-p95 flags at most 5% and, with continuous scores,
      // close to it; allow slack for small labels and score ties
      assert(flagged <= math.ceil(rs.length * 0.05).toInt + 1, s"label $l overflags")
      assert(rs.length < 20 || flagged >= 1, s"label $l flags nothing")
    }
    // a synthetic far-away vector must out-score every in-distribution one
    val base = graft.Tables(spark, sf, "embeddings")
    val spiked = base.unionByName(
      Seq((999999L, Seq.fill(64)(10.0f), 0)).toDF("vec_id", "embedding", "label"))
    val spikedScores = graft.similarity.EmbedOutliers
      .score(spiked, "vec_id", "embedding", "label")
    val spike = spikedScores
      .filter(org.apache.spark.sql.functions.col("vec_id") === 999999L)
      .collect().head
    assert(spike.getAs[Boolean]("is_outlier"))
    assert(spike.getAs[Long]("score_q") ==
      spikedScores.agg(org.apache.spark.sql.functions.max("score_q")).collect().head.getLong(0))
  }

  test("embed_outliers fails fast when label cardinality exceeds maxLabels") {
    import spark.implicits._
    val many = (0L until 50L).map(i => (i, Seq.fill(4)(0.1f), i.toInt))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      graft.similarity.EmbedOutliers
        .score(many, "vec_id", "embedding", "label", maxLabels = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("maxLabels")), s"got $e")
  }

  test("text_zipf: ranks are dense, freq non-increasing, products consistent") {
    val rows = graft.queries.Q.textZipf(spark, sf).orderBy("rank").collect()
    // sf0.001's vocabulary is smaller than the top-40 limit; ranks stay dense
    assert(rows.length <= 40 && rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length.toLong))
    val freq = rows.map(_.getAs[Long]("freq"))
    assert(freq.zip(freq.tail).forall { case (a, b) => a >= b }, "freq non-increasing")
    rows.foreach { r =>
      assert(r.getAs[Long]("rank_x_freq") == r.getAs[Long]("rank") * r.getAs[Long]("freq"))
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("freq"))
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
  }
}
