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
