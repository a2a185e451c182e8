package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round5Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q_basket: pairs are ordered, deduped per order, and counted correctly") {
    val top = Analytics.qBasket(spark, sf).as[(Long, Long, Long)].collect()
    assert(top.nonEmpty && top.length <= 20)
    assert(top.forall { case (a, b, _) => a < b })
    // counts are non-increasing down the ranking
    assert(top.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // cross-check the top pair against a direct recomputation
    val (pa, pb, n) = top.head
    val direct = graft.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .filter(col("l_partkey") === pa || col("l_partkey") === pb)
      .groupBy("l_orderkey").agg(countDistinct("l_partkey").as("k"))
      .filter(col("k") === 2).count()
    assert(direct == n)
  }

  test("q_cube: subtotals are consistent across granularities") {
    val rows = Analytics.qCube(spark, sf)
      .as[(String, String, Double, Long)].collect()
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    val leaves = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    val flagOnly = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    assert(grand.length == 1)
    assert(grand.head._4 == leaves.map(_._4).sum)
    assert(grand.head._4 == flagOnly.map(_._4).sum)
    assert(math.abs(grand.head._3 - leaves.map(_._3).sum) < 1e-6)
  }

  test("events_rolling: windows match a direct per-type recomputation") {
    val out = Analytics.eventsRolling(spark, sf)
      .as[(String, Long, Long, Long, Double, Long)].collect()
      .groupBy(_._1).map { case (t, rs) => t -> rs.sortBy(_._2) }
    assert(out.nonEmpty)
    for ((_, rs) <- out) {
      val counts = rs.map(_._3)
      rs.zipWithIndex.foreach { case ((_, _, _, s7, a7, run), i) =>
        val w = counts.slice(math.max(0, i - 6), i + 1)
        assert(s7 == w.sum)
        assert(a7 == BigDecimal(w.sum.toDouble / w.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        assert(run == counts.take(i + 1).sum)
      }
    }
  }

  test("corrMatrix: perfectly linear columns give corr 1, constants-free exactness") {
    val df = (1 to 100).map(i => (i.toDouble, i * 3.0, (101 - i).toDouble))
      .toDF("x", "y", "z")
    val m = Profile.corrMatrix(df, Seq("x" -> 2, "y" -> 2, "z" -> 2))
      .as[(String, String, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(m(("x", "y")) == 1.0)   // y = 3x exactly, cents-exact
    assert(m(("x", "z")) == -1.0)  // z = 101 - x exactly
    assert(m(("y", "z")) == -1.0)
  }

  test("corrMatrix: a constant column yields NULL corr, not a saturated /0") {
    // zero variance ⇒ the sqrt denominator is 0; the guard must emit NULL
    // in both engines instead of letting ±Inf/NaN reach floor rounding
    // (Spark floor(double) is LongType — saturating — DuckDB's is DOUBLE)
    val df = (1 to 50).map(i => (i.toDouble, 7.0)).toDF("x", "k")
    val rows = Profile.corrMatrix(df, Seq("x" -> 2, "k" -> 2)).collect()
    assert(rows.length == 1)
    assert(rows.head.isNullAt(2), s"constant column must give NULL corr: ${rows.head}")
  }

  test("q22: anti-join keeps exactly the above-average never-ordered customers") {
    val out = Analytics.q22(spark, sf).as[(Long, Long, Double)].collect()
    val c = graft.Tables(spark, sf, "customer")
    val o = graft.Tables(spark, sf, "orders").select("o_custkey").distinct()
      .as[Long].collect().toSet
    val avgBal = {
      val cents = c.select((round(col("c_acctbal") * 100.0, 0)).cast("long").as("v"))
        .as[Long].collect()
      math.round(cents.sum.toDouble / cents.length)
    }
    val direct = c.select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100.0, 0).cast("long").as("v"))
      .as[(Long, Long, Long)].collect()
      .filter { case (k, _, v) => v > avgBal && !o.contains(k) }
    assert(out.map(_._2).sum == direct.length)
    assert(out.map(_._1).toSet == direct.map(_._2).toSet)
  }

  test("events_pivot: per-day type counts sum to the daily totals") {
    val out = Analytics.eventsPivot(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val daily = graft.Tables(spark, sf, "events")
      .groupBy(expr("ts div 86400000000000").as("d")).count()
      .as[(Long, Long)].collect().toMap
    assert(out.nonEmpty && out.length == daily.size)
    out.foreach { case (d, a, b, c2, e, f) =>
      assert(a + b + c2 + e + f == daily(d))
    }
  }

  test("groupQuantiles: per-group medians match a direct percentile") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 20.0))
      .toDF("g", "v")
    val q = Profile.groupQuantiles(df, "g", "v", 2, Seq(0.5))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(q("a") == (("a", 3L, 2.0)))
    assert(q("b") == (("b", 2L, 15.0)))
  }
}
