package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0)
  ).toDF("id", "name", "bal")

  test("merge applies update, delete, insert, and keep") {
    val changes = Seq(
      (2L, "U", 99.0),   // update bob's balance
      (3L, "D", 0.0),    // delete carol
      (4L, "U", 44.0),   // insert a new key
      (5L, "D", 0.0)     // delete of an absent key is a no-op
    ).toDF("id", "op", "bal")
    val out = MergeUpsert.merge(snapshot, changes, "id")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq ==
      Seq((1L, "alice", 10.0, "K"), (2L, "bob", 99.0, "U"), (4L, null, 44.0, "I")))
  }

  test("update with a NULL new value keeps the snapshot value (partial update)") {
    val changes = Seq((1L, "U", Option.empty[Double])).toDF("id", "op", "bal")
    val out = MergeUpsert.merge(snapshot, changes, "id")
      .filter(col("id") === 1L).select("bal", "op").collect()
    assert(out.head.getDouble(0) == 10.0 && out.head.getString(1) == "U")
  }

  test("empty change batch returns the snapshot unchanged with op K") {
    val changes = Seq.empty[(Long, String, Double)].toDF("id", "op", "bal")
    val out = MergeUpsert.merge(snapshot, changes, "id")
    assert(out.filter(col("op") =!= "K").count() == 0)
    assert(out.count() == 3)
  }

  test("change columns must be a subset of the snapshot schema") {
    val bad = Seq((1L, "U", 1.0)).toDF("id", "op", "no_such_col")
    val e = intercept[IllegalArgumentException] {
      MergeUpsert.merge(snapshot, bad, "id")
    }
    assert(e.getMessage.contains("no_such_col"))
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val changes = Seq((2L, "U", 99.0), (3L, "D", 0.0)).toDF("id", "op", "bal")
    val once = MergeUpsert.merge(snapshot, changes, "id").drop("op")
    val twice = MergeUpsert.merge(once, changes, "id").drop("op")
    assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
  }

  test("a NULL op in the change batch fails execution instead of silently updating") {
    val bad = Seq((2L, Option.empty[String], Some(99.0)),
      (3L, Some("U"), Some(1.0))).toDF("id", "op", "bal")
    val e = intercept[Exception] {
      MergeUpsert.merge(snapshot, bad, "id").count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("NULL 'op'")), msgs(e).mkString(" | "))
  }

  test("a NULL key in the change batch fails execution instead of inserting") {
    val bad = Seq((Option.empty[Long], "U", 99.0), (Some(3L), "U", 1.0))
      .toDF("id", "op", "bal")
    val e = intercept[Exception] {
      MergeUpsert.merge(snapshot, bad, "id").count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("NULL 'id'")), msgs(e).mkString(" | "))
  }
}
