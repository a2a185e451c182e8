package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 TPC-H completion (q2/q11/q16/q20 adaptations — the four queries
  * whose canonical forms need partsupp, re-derived from lineitem):
  * semantic cross-checks against driver-side brute-force recomputations at
  * sf0.001.
  */
class TpchCompleteSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def europeSupp: Map[Long, (String, Double, String)] = {
    val nat = graft.Tables(spark, sf, "nation")
      .join(graft.Tables(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select("n_nationkey", "n_name").as[(Long, String)].collect().toMap
    graft.Tables(spark, sf, "supplier")
      .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
      .as[(Long, String, Double, Long)].collect()
      .flatMap { case (k, n, b, nk) => nat.get(nk).map(nn => k -> ((n, b, nn))) }
      .toMap
  }

  test("q2: each row is a min-cost EUROPE supplier for a qualifying part") {
    val out = Analytics.q2(spark, sf)
      .as[(Double, String, String, Long, String, Double)].collect()
    assert(out.nonEmpty && out.length <= 100)
    // brute force: min cents(l_extendedprice) per (part, EUROPE supplier)
    val supp = europeSupp
    val parts = graft.Tables(spark, sf, "part")
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
      .select("p_partkey").as[Long].collect().toSet
    val pairMin = graft.Tables(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice")
      .as[(Long, Long, Double)].collect()
      .filter(r => parts(r._1) && supp.contains(r._2))
      .groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(r => math.round(r._3 * 100.0)).min }
    val partMin = pairMin.groupBy(_._1._1).map { case (p, m) => p -> m.values.min }
    val winners = pairMin.collect {
      case ((p, s), c) if c == partMin(p) => (p, s, c)
    }.toSet
    // the top-100 ordering key (acctbal desc) is respected and every
    // reported row is a true per-part minimum with exact cost
    assert(out.map(_._1).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    assert(out.forall { case (bal, name, nn, p, _, cost) =>
      val sk = supp.collectFirst { case (k, (n, b, _)) if n == name => k }.get
      supp(sk) == ((name, bal, nn)) &&
        winners((p, sk, math.round(cost * 100.0)))
    })
    // LIMIT semantics: result size is min(100, total winners)
    assert(out.length == math.min(100, winners.size))
  }

  test("q11: reported parts are exactly those above 2x the mean part value") {
    val out = Analytics.q11(spark, sf).as[(Long, Double)].collect().toMap
    assert(out.nonEmpty)
    val ns = graft.Tables(spark, sf, "supplier")
      .join(graft.Tables(spark, sf, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("NATION_7", "NATION_12"))
      .select("s_suppkey").as[Long].collect().toSet
    val vc = graft.Tables(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .as[(Long, Long, Double, Double)].collect()
      .filter(r => ns(r._2))
      .groupBy(_._1)
      .map { case (p, rs) =>
        p -> rs.map(r => math.round(r._3 * (1.0 - r._4) * 10000.0)).sum
      }
    val tot = vc.values.sum
    val np = vc.size
    val expect = vc.filter { case (_, v) => v * np > tot * 2 }
    assert(out.keySet == expect.keySet)
    assert(expect.forall { case (p, v) => out(p) == v.toDouble / 10000.0 })
  }

  test("q16: supplier counts match a set-based recomputation") {
    val out = Analytics.q16(spark, sf)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(out.nonEmpty)
    val sizes = Set(1L, 4L, 9L, 14L, 23L, 36L, 45L, 50L)
    val pmeta = graft.Tables(spark, sf, "part")
      .select("p_partkey", "p_brand", "p_type", "p_size")
      .as[(Long, String, String, Long)].collect()
      .filter(p => p._2 != "Brand#5" && p._3 != "PROMO" && sizes(p._4))
      .map(p => p._1 -> ((p._2, p._3, p._4))).toMap
    val ok = graft.Tables(spark, sf, "supplier")
      .filter(col("s_acctbal") >= 0).select("s_suppkey").as[Long].collect().toSet
    val expect = graft.Tables(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey").as[(Long, Long)].collect()
      .filter(r => pmeta.contains(r._1) && ok(r._2))
      .groupBy(r => pmeta(r._1))
      .map { case (k, rs) => k -> rs.map(_._2).distinct.length.toLong }
    assert(out == expect)
  }

  test("q20: reported suppliers are the ASIA holders of a >30% part share") {
    val out = Analytics.q20(spark, sf).as[(Long, String, Double)].collect()
    val asia = graft.Tables(spark, sf, "nation")
      .join(graft.Tables(spark, sf, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select("n_nationkey").as[Long].collect().toSet
    val asiaSupp = graft.Tables(spark, sf, "supplier")
      .select("s_suppkey", "s_nationkey").as[(Long, Long)].collect()
      .filter(r => asia(r._2)).map(_._1).toSet
    val smallParts = graft.Tables(spark, sf, "part")
      .filter(col("p_name").startsWith("small"))
      .select("p_partkey").as[Long].collect().toSet
    val qc = graft.Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .as[(Long, Long, Double)].collect()
      .filter(r => smallParts(r._1))
      .groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(r => math.round(r._3 * 100.0)).sum }
    val totByPart = qc.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val excess = qc.collect {
      case ((p, s), c) if c * 10 > totByPart(p) * 3 => s
    }.toSet
    assert(out.map(_._1).toSet == (excess intersect asiaSupp))
  }
}
