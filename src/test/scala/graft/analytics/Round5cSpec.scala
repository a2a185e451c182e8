package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 third wave: q8/q9/q21 TPC-H adaptations, EWMA smoothing, the
  * binned range join, and Rubin pooling — each cross-checked against a
  * direct sequential recomputation at sf0.001. */
class Round5cSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q8: market share is a fraction and weighs NATION_7's PROMO/ASIA revenue") {
    val out = Analytics.q8(spark, sf).as[(Long, Double)].collect().toMap
    assert(out.nonEmpty)
    assert(out.values.forall(s => s >= 0.0 && s <= 1.0))
    // sequential recomputation for one year present in the output
    val y = out.keys.min
    val part = graft.Tables(spark, sf, "part")
      .filter(col("p_type") === "PROMO").select("p_partkey").as[Long].collect().toSet
    val nat = graft.Tables(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .as[(Int, String, Int)].collect()
    val asiaNations = nat.filter(_._3 == 2).map(_._1).toSet
    val asiaCust = graft.Tables(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").as[(Long, Int)].collect()
      .filter(c => asiaNations.contains(c._2)).map(_._1).toSet
    val suppNation = graft.Tables(spark, sf, "supplier")
      .select("s_suppkey", "s_nationkey").as[(Long, Int)].collect()
      .map { case (k, n) => k -> nat.find(_._1 == n).get._2 }.toMap
    val orders = graft.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("y"))
      .as[(Long, Long, Int)].collect()
      .filter(o => asiaCust.contains(o._2) && o._3 == y)
      .map(o => o._1).toSet
    val li = graft.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .as[(Long, Long, Long, Double, Double)].collect()
      .filter(l => orders.contains(l._1) && part.contains(l._2))
    def centsSum(ls: Seq[(Long, Long, Long, Double, Double)]): Long =
      ls.map(l => math.round(l._4 * (1.0 - l._5) * 10000.0)).sum
    val tot = centsSum(li)
    val n7 = centsSum(li.filter(l => suppNation(l._3) == "NATION_7"))
    assert(tot > 0)
    assert(math.abs(out(y) - n7.toDouble / tot.toDouble) < 1e-12)
  }

  test("q9: per-nation-year profits sum to the red-part total") {
    val out = Analytics.q9(spark, sf).as[(String, Long, Double)].collect()
    assert(out.nonEmpty)
    val red = graft.Tables(spark, sf, "part")
      .filter(col("p_name").contains("red")).select("p_partkey").as[Long].collect().toSet
    val liTotal = graft.Tables(spark, sf, "lineitem")
      .select("l_partkey", "l_extendedprice", "l_discount")
      .as[(Long, Double, Double)].collect()
      .filter(l => red.contains(l._1))
      .map(l => math.round(l._2 * (1.0 - l._3) * 10000.0)).sum
    val outTotal = math.round(out.map(_._3).sum * 10000.0)
    assert(math.abs(outTotal - liTotal) <= out.length) // 1e-4 rounding per row of output
  }

  test("q21: blamed supplier is the sole latest shipper on a multi-supplier F order") {
    val out = Analytics.q21(spark, sf).as[(String, Long)].collect()
    // sequential recomputation
    val fOrders = graft.Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey").as[Long].collect().toSet
    val li = graft.Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .filter(l => fOrders.contains(l._1))
    val blame = li.groupBy(_._1).toSeq.flatMap { case (_, ls) =>
      val perSupp = ls.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._3.getTime).max }
      if (perSupp.size < 2) None
      else {
        val omax = perSupp.values.max
        val at = perSupp.filter(_._2 == omax).keys.toSeq
        if (at.size == 1) Some(at.head) else None
      }
    }
    val expect = blame.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val suppName = graft.Tables(spark, sf, "supplier")
      .select("s_suppkey", "s_name").as[(Long, String)].collect().toMap
    val expectTop = expect.toSeq.map { case (s, n) => (suppName(s), n) }
      .sortBy { case (name, n) => (-n, name) }.take(20)
    assert(out.toSeq == expectTop)
  }

  test("ewma matches the sequential integer recurrence and converges to a constant") {
    val out = Analytics.eventsEwma(spark, sf)
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(out.nonEmpty)
    out.foreach { case (_, rows) =>
      var e = -1L
      rows.foreach { case (_, _, n, ewma) =>
        e = if (e < 0) n * 1000000L else (3000000L * n + 7L * e) / 10L
        assert(ewma == e.toDouble / 1000000.0)
      }
    }
    // EWMA of a constant series is that constant — through the OPERATOR,
    // not a reimplementation of its recurrence
    val constDaily = (1 to 20).map(d => ("x", d.toLong, 5L))
      .toDF("event_type", "d", "n")
    val constOut = Analytics.ewmaOverDaily(constDaily)
      .as[(String, Long, Long, Double)].collect()
    assert(constOut.length == 20)
    assert(constOut.forall(_._4 == 5.0))
  }

  test("binned range join equals the brute-force BETWEEN join") {
    val got = Analytics.promoRangeJoin(spark, sf)
      .as[(Long, Long, Double, Long)].collect().map(r => (r._1, r._4)).toMap
    val li = graft.Tables(spark, sf, "lineitem")
      .select(to_date(col("l_shipdate")).as("d")).as[java.sql.Date].collect()
    val d0 = li.map(_.toLocalDate).min
    val brute = li.map(_.toLocalDate)
      .map(d => java.time.temporal.ChronoUnit.DAYS.between(d0, d))
      .filter(diff => diff % 100 < 35)
      .groupBy(_ / 100).view.mapValues(_.size.toLong).toMap
    assert(got == brute)
  }

  test("pipeline_neardup keeps exactly the min doc of every minhash cluster") {
    val docs = graft.Tables(spark, sf, "documents")
    val kept = graft.queries.Q.pipelineNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // one keeper per cluster, and the keeper IS its cluster id (min doc)
    assert(kept.map(_._2).distinct.length == kept.length)
    assert(kept.forall { case (id, cid) => id == cid })
    // keepers + removed = the whole corpus; removed docs' clusters survive
    val clusters = graft.dedup.Dedup.connectedComponents(
        docs.select("doc_id"), "doc_id",
        graft.dedup.MinHash.pairs(docs, "doc_id", "text",
          n = 3, k = 32, bands = 8, threshold = 0.10), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.length == clusters.map(_._2).distinct.length)
    assert(kept.map(_._2).toSet == clusters.map(_._2).toSet)
  }

  test("robust z shrugs off the outlier that wrecks a stddev z-score") {
    // 29 quiet days at ~100 plus one 100x spike: the spike must dominate
    // the robust score while the quiet days stay near zero — and the
    // median/MAD must barely move vs the spike-free series
    val daily = ((1 to 29).map(d => (d.toLong, 100L + (d % 3))) :+ (30L, 10000L))
      .toDF("d", "n_events")
    val z = Analytics.robustZDaily(daily)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(z(30L) > 100.0) // the spike is unmistakable
    assert((1 to 29).forall(d => math.abs(z(d.toLong)) < 2.0))
    // plain stddev z on the same data scores the spike at only ~5.4 and
    // drags every quiet day to the same side — the robustness argument
    val noSpike = Analytics.robustZDaily(daily.filter(col("d") =!= 30L))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert((1 to 29).forall(d => math.abs(z(d.toLong) - noSpike(d.toLong)) < 1.5))
  }

  test("robust z is NULL when MAD is 0 — the /0 never reaches floor rounding") {
    // an (almost-)constant series: median = 100, every deviation 0 except
    // one ⇒ MAD = 0. Unguarded, Spark's floor(±Inf) saturates to a Long
    // while DuckDB's floor keeps ±Inf — the cross-engine divergence the
    // guard exists to prevent (ADVICE r15 / SF1_GATE finite-input class)
    val daily = ((1 to 9).map(d => (d.toLong, 100L)) :+ (10L, 500L))
      .toDF("d", "n_events")
    val z = Analytics.robustZDaily(daily).collect()
    assert(z.length == 10)
    assert(z.forall(_.isNullAt(2)), "MAD=0 must yield NULL robust_z everywhere")
  }

  test("categorical profile keeps a row for an all-null column") {
    import org.apache.spark.sql.functions.{col => c}
    val df = Seq(("a", Option.empty[String]), ("b", None), ("a", None))
      .toDF("tag", "empty")
    val out = Profile.categorical(df, Seq("tag", "empty"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("tag", "empty")) // no silent annihilation
    val e = out("empty")
    assert(e.getLong(1) == 0L && e.isNullAt(3)) // n=0, mode null
    val t = out("tag")
    assert(t.getLong(1) == 3L && t.getString(3) == "a" && t.getLong(4) == 2L)
  }

  test("rubin pooling: T = W + (4/3)B, B >= 0, qbar plausible") {
    val r = graft.queries.Q.impPool(spark, sf).collect().head
    val (qbar, w, b, t) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(b >= 0 && w > 0)
    assert(math.abs(t - (w + (1.0 + 1.0 / 3.0) * b)) < 1e-6)
    val bal = graft.Tables(spark, sf, "customer")
      .agg(avg("c_acctbal")).as[Double].collect().head
    // ~14% of values are masked, so the imputed mean drifts from the true
    // mean by up to a few hundred on a ±10k-range column at this tiny SF
    assert(math.abs(qbar - bal) < 500.0)
  }
}
