package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("scalarChecks counts each violation class in one pass") {
    val df = Seq(
      (1L, 5.0, Some("a")),
      (2L, -1.0, Some("b")),   // range violation
      (3L, 200.0, None),       // range + null violation
      (4L, 7.0, Some("c"))
    ).toDF("id", "x", "tag")
    val out = DataQuality.scalarChecks(df, Seq(
        "x_range" -> !col("x").between(0.0, 100.0),
        "tag_not_null" -> col("tag").isNull))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("x_range" -> (4L, 2L), "tag_not_null" -> (4L, 1L)))
  }

  test("fkCheck counts orphaned children; uniqueCheck counts extra copies") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(1L, 1L, 2L, 99L, 98L).toDF("fk")
    val fk = DataQuality.fkCheck("fk", child, "fk", parent, "pk").collect().head
    assert((fk.getLong(1), fk.getLong(2)) == (5L, 2L))
    val dup = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val u = DataQuality.uniqueCheck("u", dup, "k").collect().head
    assert((u.getLong(1), u.getLong(2)) == (5L, 2L))
  }

  test("clean frames report zero violations, empty frames report zero rows") {
    val clean = Seq((1L, 1.0)).toDF("id", "x")
    val out = DataQuality.scalarChecks(clean, Seq("x_pos" -> (col("x") <= 0.0)))
      .collect().head
    assert((out.getLong(1), out.getLong(2)) == (1L, 0L))
    val empty = Seq.empty[(Long, Double)].toDF("id", "x")
    val u = DataQuality.uniqueCheck("u", empty, "id").collect().head
    assert((u.getLong(1), u.getLong(2)) == (0L, 0L))
  }

  test("keyProfile flags a real key at 1.0 and reports the dup ratio exactly") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (3L, "b")).toDF("id", "g")
    val key = DataQuality.keyProfile("id", df, Seq("id")).collect().head
    assert((key.getLong(1), key.getLong(2), key.getDouble(3)) == (4L, 3L, 0.75))
    val pair = DataQuality.keyProfile("id,g", df, Seq("id", "g")).collect().head
    assert((pair.getLong(2), pair.getDouble(3)) == (3L, 0.75))
    val uniq = DataQuality.keyProfile("u", Seq(1L, 2L, 3L).toDF("id"), Seq("id"))
      .collect().head
    assert(uniq.getDouble(3) == 1.0)
  }

  test("fdCheck separates held, partially held, and broken dependencies") {
    val df = Seq(
      ("a", "x", 1), ("a", "x", 2),   // a -> x held
      ("b", "x", 3), ("b", "y", 4),   // b violates with 2 rhs over 2 rows
      ("c", "z", 5)
    ).toDF("l", "r", "v")
    val held = DataQuality.fdCheck("l->l", df, Seq("l"), "l").collect().head
    assert((held.getLong(1), held.getLong(2), held.getLong(3)) == (3L, 0L, 0L))
    val broken = DataQuality.fdCheck("l->r", df, Seq("l"), "r").collect().head
    assert((broken.getLong(1), broken.getLong(2), broken.getLong(3)) == (3L, 1L, 2L))
    val worse = DataQuality.fdCheck("l->v", df, Seq("l"), "v").collect().head
    assert((worse.getLong(1), worse.getLong(2), worse.getLong(3)) == (3L, 2L, 4L))
  }

  test("keyDups separates benign copies from conflicting payloads") {
    val df = Seq(
      (1L, "a"), (1L, "a"),          // dup key, identical payload — benign
      (2L, "x"), (2L, "y"),          // dup key, CONFLICTING payload
      (3L, "z")                      // clean
    ).toDF("k", "v")
    val r = DataQuality.keyDups("k", df, Seq("k")).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (3L, 2L, 2L, 1L))
    val clean = DataQuality.keyDups("k", Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      Seq("k")).collect().head
    assert((clean.getLong(2), clean.getLong(3), clean.getLong(4)) == (0L, 0L, 0L))
  }

  test("agg_incremental merged partials equal the direct recompute bitwise") {
    val direct = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"),
        graft.analytics.Analytics.cents(col("value"), 4).as("_vc"))
      .groupBy("event_type", "d")
      .agg(count(lit(1)).as("n_events"),
        (sum(col("_vc")).cast("double") / 10000.0).as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val merged = graft.queries.Q.aggIncremental(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(merged == direct)
  }

  test("scalarChecks on an EMPTY frame reports 0 violations of 0 rows, not NULL") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val rows = DataQuality.scalarChecks(empty,
      Seq("neg" -> (col("v") < 0), "big" -> (col("v") > 100))).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("n_violations")))
      assert(r.getLong(r.fieldIndex("n_rows")) == 0L)
      assert(r.getLong(r.fieldIndex("n_violations")) == 0L)
    }
  }
}
