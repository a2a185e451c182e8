package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 second-wave TPC-H-breadth queries (q7/q10/q13/q17/q18/q19):
  * semantic cross-checks against direct recomputations at sf0.001. */
class TpchBreadthSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q7: every output pairs a supp nation < 13 with a cust nation >= 13") {
    val out = Analytics.q7(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(out.nonEmpty)
    val key = (n: String) => n.stripPrefix("NATION_").toInt
    assert(out.forall { case (sn, cn, y, rev) =>
      key(sn) < 13 && key(cn) >= 13 && y >= 1996 && y <= 1997 && rev > 0
    })
  }

  test("q10: top-20 by returned revenue, ordered and tie-broken") {
    val out = Analytics.q10(spark, sf)
      .as[(Long, String, String, Double, Double)].collect()
    assert(out.nonEmpty && out.length <= 20)
    val revs = out.map(_._5)
    assert(revs.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q13: distribution covers every customer exactly once") {
    val out = Analytics.q13(spark, sf).as[(Long, Long)].collect()
    val nCust = graft.Tables(spark, sf, "customer").count()
    assert(out.map(_._2).sum == nCust)
    // never-ordered customers land in the zero bucket
    val ordered = graft.Tables(spark, sf, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select("o_custkey").distinct().count()
    assert(out.filter(_._1 == 0L).map(_._2).sum == nCust - ordered)
  }

  test("q17: qualifying lines all sit below 20% of their part's average") {
    val (avgYearly, nLines) =
      Analytics.q17(spark, sf).as[(Double, Long)].collect().head
    assert(nLines > 0 && avgYearly > 0)
    // direct recomputation with plain double arithmetic on the tiny slice
    val p = graft.Tables(spark, sf, "part")
      .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)
      .select("p_partkey").as[Long].collect().toSet
    val li = graft.Tables(spark, sf, "lineitem")
      .filter(col("l_partkey").isInCollection(p))
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .as[(Long, Double, Double)].collect()
    val avg = li.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(_._2).sum / rs.length
    }
    val direct = li.filter { case (k, q, _) => q < 0.2 * avg(k) }
    assert(direct.length == nLines)
    assert(math.abs(direct.map(_._3).sum / 7.0 - avgYearly) < 1e-6)
  }

  test("q18: every reported order's quantity exceeds 300") {
    val out = Analytics.q18(spark, sf)
      .as[(Long, String, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._6 > 300.0))
    val direct = graft.Tables(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      .filter(col("q") > 300.0).count()
    assert(out.length == direct)
  }

  test("q15: reported suppliers hold exactly the maximum quarterly revenue") {
    val out = Analytics.q15(spark, sf).as[(Long, String, Double)].collect()
    assert(out.nonEmpty)
    val all = graft.Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(expr(
        "cast(round(l_extendedprice * (1.0 - l_discount) * 10000.0, 0) as bigint)"))
        .as("rc"))
      .as[(Long, Long)].collect()
    val mx = all.map(_._2).max
    assert(out.map(_._1).toSet == all.filter(_._2 == mx).map(_._1).toSet)
    assert(out.forall(_._3 == mx.toDouble / 10000.0))
  }

  test("hashScore: deterministic weights, score bounded by max |w|") {
    val df = Seq((1L, "alpha beta beta"), (2L, "alpha alpha alpha")).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.withHashScore(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 3 && out(2L)._2 == 3)
    assert(out.values.forall(r => math.abs(r._3) <= 0.5))
    // a doc of one repeated token scores exactly that token's weight
    val b = (('a'.toInt * 31 + 'a'.toInt * 7 + 5) % 64).toLong
    val w = (b * 2654435761L) % 1000L - 500L
    assert(out(2L)._3 == w.toDouble / 1000.0)
  }

  test("q19: disjunction matches the union of per-branch recomputations") {
    val (rev, n) = Analytics.q19(spark, sf).as[(Double, Long)].collect().head
    assert(n > 0 && rev > 0)
    val joined = graft.Tables(spark, sf, "lineitem")
      .join(graft.Tables(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
    def branch(b: String, lo: Int, hi: Int, qlo: Int, qhi: Int) =
      joined.filter(col("p_brand") === b && col("p_size").between(lo, hi) &&
        col("l_quantity").between(qlo, qhi))
    val direct = branch("Brand#1", 1, 10, 1, 20)
      .unionAll(branch("Brand#2", 11, 25, 10, 30))
      .unionAll(branch("Brand#3", 26, 50, 20, 40)).count()
    assert(n == direct)
  }
}
