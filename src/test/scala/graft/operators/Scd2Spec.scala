package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 second wave: SCD-2 merge (all four op paths on synthetic data),
  * mutual information vs driver-side brute force, and the A/B z-score vs a
  * direct recomputation. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("scd2: K/C/N/I paths, closed history untouched, intervals chain") {
    // key 1: open A + a change to B at day 10 (C+N), with a closed
    //        historical row that must pass through untouched
    // key 2: open A + a no-op update to A (K)
    // key 3: open A, no update (K)
    // key 4: no dim row, update inserts (I)
    val dim = Seq(
      (1L, "A", 0L, Option.empty[Long]),
      (1L, "Z", -5L, Some(0L)),
      (2L, "A", 0L, Option.empty[Long]),
      (3L, "A", 0L, Option.empty[Long])
    ).toDF("k", "v", "valid_from", "valid_to")
    val upd = Seq((1L, "B", 10L), (2L, "A", 12L), (4L, "Q", 7L))
      .toDF("k", "v", "eff")
    val out = Scd2.merge(dim, upd, "k", "v", "eff")
      .as[(Long, String, Long, Option[Long], String)].collect().toSet
    assert(out == Set(
      (1L, "Z", -5L, Some(0L), "K"),  // closed history passes through
      (1L, "A", 0L, Some(10L), "C"),  // old version closed at eff
      (1L, "B", 10L, None, "N"),      // new version opened at eff
      (2L, "A", 0L, None, "K"),       // no-op update keeps the open row
      (3L, "A", 0L, None, "K"),       // untouched key
      (4L, "Q", 7L, None, "I")))      // insert for an unknown key
    // interval chaining: for key 1 the C row's valid_to = the N row's valid_from
    val c1 = out.find(r => r._1 == 1L && r._5 == "C").get
    val n1 = out.find(r => r._1 == 1L && r._5 == "N").get
    assert(c1._4.contains(n1._3))
  }

  test("scd2 query face: every customer has exactly one open row") {
    val out = graft.queries.Q.mergeScd2(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long, Option[Long], String)].collect()
    val byKey = out.groupBy(_._1)
    val nCust = graft.Tables(spark, "/root/testdata/sf0.001", "customer").count()
    assert(byKey.size == nCust)
    byKey.values.foreach { rs =>
      assert(rs.count(_._4.isEmpty) == 1) // exactly one open version
      // closed versions end where a later version begins
      rs.filter(_._4.isDefined).foreach { c =>
        assert(rs.exists(r => r._3 == c._4.get))
      }
    }
    // ordered customers carry C+N, never-ordered carry a single K
    val ordered = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_custkey").distinct().count()
    assert(out.count(_._5 == "N") == ordered)
    assert(out.count(_._5 == "C") == ordered)
    assert(out.count(_._5 == "K") == nCust - ordered)
  }

  test("profile_mi: matches driver-side brute force on the customer table") {
    val Array((nRows, nCells, mi, hx, hy, nmi)) =
      graft.analytics.Profile.customerMi(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Double, Double, Double, Option[Double])].collect()
    val rows = graft.Tables(spark, "/root/testdata/sf0.001", "customer")
      .select("c_mktsegment", "c_nationkey").as[(String, Long)].collect()
    val n = rows.length.toDouble
    val cxy = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cx = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cy = rows.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    def q(t: Double) = math.rint(t * 1e12)
    val miExp = cxy.map { case ((x, y), nxy) =>
      q((nxy / n) * math.log((nxy * n) / (cx(x).toDouble * cy(y).toDouble)))
    }.sum / 1e12
    val hxExp = cx.values.map(v => q((v / n) * math.log(n / v))).sum / 1e12
    assert(nRows == rows.length && nCells == cxy.size)
    assert(math.abs(mi - miExp) < 1e-9 && math.abs(hx - hxExp) < 1e-9)
    assert(mi >= 0 || math.abs(mi) < 1e-6) // MI is non-negative up to quantization
    assert(nmi.forall(v => v >= -1e-6 && v <= 1 + 1e-6))
    assert(hy > 0)
  }

  test("events_abtest: z-score matches a direct two-proportion computation") {
    val Array((na, ca, nb, cb, ra, rb, z)) =
      graft.analytics.Analytics.eventsAbtest(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, Long, Double, Double, Option[Double])].collect()
    val perUser = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .as[(Long, Long)].collect()
    val a = perUser.filter(_._1 % 2 == 0)
    val b = perUser.filter(_._1 % 2 == 1)
    assert(na == a.length && nb == b.length)
    assert(ca == a.count(_._2 >= 14) && cb == b.count(_._2 >= 14))
    assert(ra == ca.toDouble / na && rb == cb.toDouble / nb)
    if (ca + cb > 0 && ca + cb < na + nb) {
      val p = (ca + cb).toDouble / (na + nb)
      val expect = (ra - rb) / math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
      assert(z.isDefined && math.abs(z.get - expect) < 1e-6)
    } else assert(z.isEmpty)
  }
}
