package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round5bSpec extends SparkSpec {
  import spark.implicits._

  test("hotKeysRelative flags only keys above factor × mean frequency") {
    // 10 keys with n=1, one key with n=90: mean = 100/11 ≈ 9.09
    val df = ((1 to 10).map(k => Seq.fill(1)(k)) :+ Seq.fill(90)(99))
      .flatten.toDF("k")
    val hot = SkewTools.hotKeysRelative(df, "k", factor = 3L)
      .as[(Int, Long)].collect()
    assert(hot.toSeq == Seq((99, 90L)))
    // factor high enough → nothing is hot
    assert(SkewTools.hotKeysRelative(df, "k", factor = 10L).count() == 0L)
  }

  test("events_attribution: every purchase credits the latest prior touch") {
    val out = graft.queries.Q.eventsAttribution(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[String], Option[Long])]
      .collect()
    assert(out.nonEmpty)
    for ((_, _, pt, tt, _, ttype, gap) <- out) {
      (tt, gap) match {
        case (Some(t), Some(g)) =>
          assert(t <= pt && g == pt - t)           // touch precedes purchase
          assert(ttype.exists(Set("view", "click")))
        case (None, None) => ()                     // never-touched purchase
        case other => fail(s"inconsistent attribution row: $other")
      }
    }
  }

  test("target encoding shrinks rare categories toward the global mean") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("cat", "v")
    val enc = graft.imputer.FeatureBuilder
      .targetEncode(df, "cat", "v", scale = 2, smoothing = 20.0, outCol = "enc")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val gMean = 14.0 / 3.0
    // exact shrinkage: (sum_cents + 20·global_mean_cents) / (n + 20) / 100
    assert(enc("a")._1 == 2L)
    assert(math.abs(enc("a")._2 - (400.0 + 20.0 * 1400.0 / 3.0) / 22.0 / 100.0) < 1e-12)
    assert(math.abs(enc("b")._2 - (1000.0 + 20.0 * 1400.0 / 3.0) / 21.0 / 100.0) < 1e-12)
    // each estimate lands strictly between its category mean and the prior
    assert(enc("a")._2 > 2.0 && enc("a")._2 < gMean)
    assert(enc("b")._2 > gMean && enc("b")._2 < 10.0)
  }

  test("events_path caps paths at five hops and orders by support") {
    val out = graft.analytics.Analytics.eventsPath(spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect()
    assert(out.nonEmpty && out.length <= 20)
    // ≤ 5 event types per path
    assert(out.forall(_._1.split(">").length <= 5))
    // deterministic total order: support desc, then path asc
    assert(out.sliding(2).forall {
      case Array((p1, n1), (p2, n2)) => n1 > n2 || (n1 == n2 && p1 < p2)
      case _ => true
    })
  }

  test("trimmed-mean impute fills every masked row with one in-band value") {
    val out = graft.queries.Q.impTrimmedMean(spark, "/root/testdata/sf0.001")
      .as[(Long, Double)].collect()
    val fills = out.filter(_._1 % 7 == 3).map(_._2).distinct
    assert(fills.length == 1)                       // single deterministic fill
    val observed = out.filterNot(_._1 % 7 == 3).map(_._2)
    assert(fills.head > observed.min && fills.head < observed.max)
  }

  test("bucketize bins partition the rows exactly") {
    val bins = graft.queries.Q.featBucketize(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Long)].collect()
    val total = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem").count()
    assert(bins.map(_._3).sum == total)             // no row lost or doubled
    assert(bins.forall { case (b, lo, _) => lo == b * 500.0 })
  }
}
