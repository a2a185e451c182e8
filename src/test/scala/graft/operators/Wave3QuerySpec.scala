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
