package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gap filling, DAU/WAU stickiness, PSI drift, and token entropy. */
class TimeseriesQualitySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("eventsGapFill: dense spine, zero-filled, totals preserved") {
    val out = Analytics.eventsGapFill(spark, sf)
      .as[(String, Long, Long)].collect()
    val days = out.map(_._2)
    val span = days.max - days.min + 1
    // 5 types × every day in [lo, hi], exactly once
    assert(out.length == 5 * span)
    assert(out.groupBy(r => (r._1, r._2)).forall(_._2.length == 1))
    // densification adds zeros but never changes the total event count
    assert(out.map(_._3).sum == graft.Tables(spark, sf, "events").count())
    // a synthetic sparse stream gets its quiet days zero-filled
    val sparse = Seq(("click", 0L, 5L), ("click", 3L, 2L)).toDF("event_type", "d", "_n")
    val bounds = sparse.agg(min("d").as("_lo"), max("d").as("_hi"))
    val spine = broadcast(bounds).select(explode(expr("sequence(_lo, _hi)")).as("d"))
      .withColumn("event_type", lit("click"))
    val filled = spine.join(sparse, Seq("event_type", "d"), "left")
      .select(col("d"), coalesce(col("_n"), lit(0L)).as("n"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(filled.toSeq == Seq((0L, 5L), (1L, 0L), (2L, 0L), (3L, 2L)))
  }

  test("eventsStickiness: WAU bounds DAU and matches a direct window count") {
    val out = Analytics.eventsStickiness(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, dau, wau, s) =>
      dau <= wau && s > 0 && s <= 1.0 && s == dau.toDouble / wau.toDouble
    })
    // direct recomputation of one mid-range day
    val a = graft.Tables(spark, sf, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("d"))
      .distinct().as[(Long, Long)].collect()
    val d0 = out.map(_._1).sorted.apply(out.length / 2)
    val wauDirect = a.filter(r => r._2 >= d0 - 6 && r._2 <= d0).map(_._1).distinct.length
    assert(out.find(_._1 == d0).get._3 == wauDirect)
  }

  test("eventsMarkov: rows per from_type sum to 1 and match pair counts") {
    val out = Analytics.eventsMarkov(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(out.nonEmpty)
    // per-from probabilities sum to 1 (exact-integer division, tiny matrix)
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-9)
      val tot = rs.map(_._3).sum
      rs.foreach(r => assert(r._4 == r._3.toDouble / tot.toDouble))
    }
    // total transitions = total events − one per active user
    val e = graft.Tables(spark, sf, "events")
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(out.map(_._3).sum == expected)
  }

  test("drift: identical slices give PSI 0; a shifted slice gives PSI > 0") {
    // block-of-100 slices: v = k % 100 has the identical distribution in
    // every block, so an even/odd-BLOCK split has exactly zero drift
    val df = (0 until 2000).map(i => (i.toLong, (i % 100).toDouble)).toDF("k", "v")
    val slice = (col("k") / 100).cast("bigint") % 2 === 0
    val same = Profile.drift(df, "v", 2, 500L, slice)
      .as[(Long, Long, Long, Double)].collect().head
    assert(same._4 == 0.0 && same._2 == 0 && same._3 == 0)
    // shift one slice by half a bin width => mass crosses bin boundaries
    val shifted = df.withColumn("v", when(slice, col("v") + 2.5).otherwise(col("v")))
    val psi = Profile.drift(shifted, "v", 2, 500L, slice)
      .as[(Long, Long, Long, Double)].collect().head
    assert(psi._4 > 0.01)
  }

  test("withEntropy: uniform tokens maximize, repeated token minimizes") {
    val df = Seq(
      (1L, "a b c d"),    // 4 distinct of 4 => H = ln 4
      (2L, "a a a a"),    // all same => H = 0
      (3L, "a a b b")     // 2 classes => H = ln 2
    ).toDF("doc_id", "text")
    val m = graft.text.TextAnalysis.withEntropy(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(1L)._4 == r6(math.log(4.0)) && m(1L)._3 == 4)
    assert(m(2L)._4 == 0.0 && m(2L)._3 == 1)
    assert(m(3L)._4 == r6(math.log(2.0)))
  }
}
