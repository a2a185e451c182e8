package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OperatorsSpec extends SparkSpec {

  test("as-of join matches the latest prior right row per key, inclusive") {
    import spark.implicits._
    val orders = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 50L), (4L, 30L, 99L))
      .toDF("order_id", "cust", "t")
    val events = Seq((10L, 100L, 1.5), (10L, 200L, 2.5), (20L, 60L, 9.0))
      .toDF("user", "t", "value")
    val got = AsOfJoin.latestPrior(orders, events, "cust", "user", "t", "t", Seq("t", "value"))
      .orderBy("order_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 100L, 1.5),   // equal timestamp matches (inclusive)
      (2L, 200L, 2.5),   // latest of two prior events
      (3L, null, null),  // right event is later than left time
      (4L, null, null))) // key absent on the right
  }

  test("nearest as-of picks the closer side, prior wins ties") {
    import spark.implicits._
    val orders = Seq((1L, 10L, 100L), (2L, 10L, 140L), (3L, 10L, 190L),
      (4L, 20L, 10L), (5L, 30L, 7L)).toDF("order_id", "cust", "t")
    val events = Seq((10L, 90L, 1.0), (10L, 200L, 2.0), (20L, 60L, 9.0))
      .toDF("user", "t", "value")
    val got = AsOfJoin.nearest(orders, events, "cust", "user", "t", "t", Seq("t", "value"))
      .orderBy("order_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 90L),    // prior at d=10 beats next at d=100
      (2L, 90L),    // d_prior=50 < d_next=60 → prior
      (3L, 200L),   // next at d=10 beats prior at d=100
      (4L, 60L),    // only a LATER event exists → still matches
      (5L, null)))  // key absent on the right
  }

  test("nearest as-of: exact distance tie resolves to the prior row") {
    import spark.implicits._
    val orders = Seq((1L, 10L, 100L)).toDF("order_id", "cust", "t")
    val events = Seq((10L, 90L, 1.0), (10L, 110L, 2.0)).toDF("user", "t", "value")
    val got = AsOfJoin.nearest(orders, events, "cust", "user", "t", "t", Seq("t", "value"))
      .collect().head
    assert(got.getLong(3) == 90L && got.getDouble(4) == 1.0)
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    // one hot key (80% of rows) + uniform tail
    val left = (1 to 500).map(i => (if (i % 5 != 0) 7L else i.toLong % 23, i.toLong))
      .toDF("k", "uniq")
    val right = (0 to 25).map(k => (k.toLong, s"dim_$k")).toDF("k", "attr")
    val plain = left.join(right, "k").select("k", "uniq", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewTools.saltedJoin(left, right, "k", salt = 8, leftUniquifier = "uniq")
      .select("k", "uniq", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("hotKeys flags only keys above the threshold") {
    import spark.implicits._
    val df = ((1 to 100).map(_ => 7L) ++ Seq(1L, 2L, 3L)).toDF("k")
    val hot = SkewTools.hotKeys(df, "k", 50).collect().map(_.getLong(0)).toSeq
    assert(hot == Seq(7L))
  }
}
