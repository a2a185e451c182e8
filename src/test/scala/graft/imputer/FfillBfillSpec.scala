package graft.imputer

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The two-pass distributed ffill/bfill must match the single-window
  * formulation exactly, including across partition boundaries. */
class FfillBfillSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def data(n: Int) = {
    import spark.implicits._
    (1 to n).map { i =>
      val v: Option[Double] = if (i % 3 == 0 || i % 7 == 0) None else Some(i * 1.5)
      val s: Option[String] = if (i % 4 == 0) None else Some(s"s${i % 5}")
      (i.toLong, v, s)
    }.toDF("id", "x", "s")
  }

  test("ffill matches window last(ignoreNulls) across many partitions") {
    val df = data(500)
    val got = FfillBfill.ffill(df, "id", Seq("x", "s"), numPartitions = 13)
      .orderBy("id").collect()
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    val want = df
      .withColumn("x", last("x", ignoreNulls = true).over(w))
      .withColumn("s", last("s", ignoreNulls = true).over(w))
      .orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("bfill matches reversed window first non-null") {
    val df = data(200)
    val got = FfillBfill.bfill(df, "id", Seq("x"), numPartitions = 7)
      .orderBy("id").collect()
    val w = Window.orderBy("id").rowsBetween(0, Window.unboundedFollowing)
    val want = df
      .withColumn("x", first("x", ignoreNulls = true).over(w))
      .orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("ffill then bfill leaves no nulls when any value observed") {
    val df = data(100)
    val out = FfillBfill.ffillThenBfill(df, "id", Seq("x", "s"), numPartitions = 5)
    assert(out.filter(col("x").isNull || col("s").isNull).count() == 0)
  }

  test("group-scoped fill never leaks values across groups") {
    import spark.implicits._
    val df = Seq(
      ("u1", 1L, Some(1.0)), ("u1", 2L, None: Option[Double]),
      ("u2", 1L, None: Option[Double]), ("u2", 2L, Some(9.0))).toDF("g", "id", "x")
    val out = FfillBfill.ffillThenBfillWithinGroups(df, "g", "id", Seq("x"))
      .orderBy("g", "id").as[(String, Long, Option[Double])].collect()
    assert(out.toSeq == Seq(
      ("u1", 1L, Some(1.0)), ("u1", 2L, Some(1.0)),   // ffill within u1
      ("u2", 1L, Some(9.0)), ("u2", 2L, Some(9.0)))) // bfill within u2, no leak
  }

  test("leading nulls survive ffill, are filled by bfill") {
    import spark.implicits._
    val df = Seq((1L, None: Option[Double]), (2L, None), (3L, Some(9.0)), (4L, None))
      .toDF("id", "x")
    val ff = FfillBfill.ffill(df, "id", Seq("x"), 3).orderBy("id").as[(Long, Option[Double])].collect()
    assert(ff.toSeq == Seq((1L, None), (2L, None), (3L, Some(9.0)), (4L, Some(9.0))))
    val fb = FfillBfill.ffillThenBfill(df, "id", Seq("x"), 3).orderBy("id")
      .as[(Long, Option[Double])].collect()
    assert(fb.toSeq == Seq((1L, Some(9.0)), (2L, Some(9.0)), (3L, Some(9.0)), (4L, Some(9.0))))
  }

  test("a string order key is rejected loudly, not bucketed lexicographically") {
    import spark.implicits._
    val df = Seq(("a1", Some(1.0)), ("a10", None: Option[Double]), ("a2", Some(3.0)))
      .toDF("key", "x")
    val e = intercept[IllegalArgumentException] {
      FfillBfill.ffill(df, "key", Seq("x"))
    }
    assert(e.getMessage.contains("key") && e.getMessage.contains("string"),
      e.getMessage)
  }

  test("reuseInput materialization changes nothing about the result") {
    val df = data(150)
    val plain = FfillBfill.ffillThenBfill(df, "id", Seq("x", "s"), numPartitions = 5)
      .orderBy("id").collect()
    val reused = FfillBfill.ffillThenBfill(df, "id", Seq("x", "s"), numPartitions = 5,
        reuseInput = true)
      .orderBy("id").collect()
    assert(plain.toSeq == reused.toSeq)
  }

  test("a NULL order key fails execution instead of silently dropping the row") {
    import spark.implicits._
    val df = Seq((Some(1L), Some(1.0)), (None: Option[Long], Some(2.0)),
      (Some(3L), None: Option[Double])).toDF("id", "x")
    val e = intercept[Exception] {
      FfillBfill.ffillThenBfill(df, "id", Seq("x")).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("contains NULLs")), msgs(e).mkString(" | "))
  }
}
