package graft.imputer

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StrategiesSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some(10.0), Some("a"), "g1"),
      (2L, Some(20.0), Some("b"), "g1"),
      (3L, None: Option[Double], Some("a"), "g1"),
      (4L, Some(40.0), None: Option[String], "g2"),
      (5L, None: Option[Double], Some("a"), "g2")
    ).toDF("id", "x", "c", "g")
  }

  private def vals(d: org.apache.spark.sql.DataFrame, c: String) =
    d.orderBy("id").select(c).collect().map(r => if (r.isNullAt(0)) null else r.get(0)).toSeq

  test("mean impute fills with observed mean") {
    val out = Strategies.mean(df, "x", "xi")
    assert(vals(out, "xi") == Seq(10.0, 20.0, 70.0 / 3, 40.0, 70.0 / 3))
  }

  test("median impute uses interpolated median") {
    val out = Strategies.median(df, "x", "xi")
    assert(vals(out, "xi") == Seq(10.0, 20.0, 20.0, 40.0, 20.0))
  }

  test("mode impute uses most frequent with deterministic tie-break") {
    val out = Strategies.mode(df, "c", "ci")
    assert(vals(out, "ci") == Seq("a", "b", "a", "a", "a"))
  }

  test("group mean falls back to global mean for all-null groups") {
    import spark.implicits._
    val d = Seq((1L, Some(10.0), "g1"), (2L, Some(30.0), "g1"),
      (3L, None: Option[Double], "g2")).toDF("id", "x", "g")
    val out = Strategies.groupMean(d, "x", "g", "xi")
    assert(vals(out, "xi") == Seq(10.0, 30.0, 20.0))
  }

  test("regression impute predicts from the covariate") {
    import spark.implicits._
    // y = 2x exactly on observed rows → imputed row must get 2*x
    val d = Seq((1L, 1.0, Some(2.0)), (2L, 2.0, Some(4.0)), (3L, 3.0, Some(6.0)),
      (4L, 10.0, None: Option[Double])).toDF("id", "x", "y")
    val out = Strategies.regression(d, "y", "x", "yi")
    val yi = vals(out, "yi")
    assert(math.abs(yi(3).asInstanceOf[Double] - 20.0) < 1e-9)
  }

  test("MLlib Imputer strategy engine fills numerics like our exact mean") {
    val out = Strategies.mllib(df, Seq("x"), "mean")
    assert(out.filter(col("x_imp").isNull).count() == 0)
    val mean = df.agg(avg("x")).collect()(0).getDouble(0)
    val imputedRows = out.filter(col("x").isNull).select("x_imp")
      .collect().map(_.getDouble(0))
    assert(imputedRows.forall(v => math.abs(v - mean) < 1e-9))
    val med = Strategies.mllib(df, Seq("x"), "median")
    assert(med.filter(col("x_imp").isNull).count() == 0)
  }

  test("driver contract: entry() returns rows; every query name has a fn") {
    val e = graft.SparkEntry.entry(spark)
    assert(e.count() > 0)
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(graft.SparkEntry.queries.keySet))
  }

  test("missing metrics + indicator") {
    val m = MissingStats.metrics(df.select("x", "c")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    assert(m("x") == (3L, 2L, 0.4))
    assert(m("c") == (4L, 1L, 0.2))
    val ind = MissingStats.indicator(df, Seq("id"), Seq("x", "c")).orderBy("id").collect()
    assert(ind.map(_.getBoolean(1)).toSeq == Seq(false, false, true, false, true))
  }

  test("mode and groupMode preserve rows when the column is entirely null") {
    import spark.implicits._
    val allNull = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"))
      .toDF("id", "g").withColumn("c", lit(null).cast("string"))
    val m = Strategies.mode(allNull, "c", "c_imp")
    assert(m.count() == 3 && m.filter(col("c_imp").isNotNull).count() == 0)
    val gm = Strategies.groupMode(allNull, "c", "g", "c_imp")
    assert(gm.count() == 3 && gm.filter(col("c_imp").isNotNull).count() == 0)
  }

  test("one-hot + minmax scale + class threshold") {
    val oh = FeatureBuilder.oneHot(df, "c", "c")
    assert(oh.columns.contains("c_a") && oh.columns.contains("c_b"))
    assert(vals(oh, "c_a") == Seq(1, 0, 1, 0, 1))
    val sc = FeatureBuilder.minMaxScale(df, Seq("x"))
    assert(vals(sc, "x_scaled") == Seq(0.0, 1.0 / 3, null, 1.0, null))
    val ct = FeatureBuilder.classThreshold(df, Seq("c", "g"), 1).collect()
      .map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(ct == Map("c" -> false, "g" -> false))
  }

  test("oneHot fails fast above maxClasses instead of flooding the driver") {
    import spark.implicits._
    val wide = (0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "c")
    val e = intercept[IllegalArgumentException] {
      FeatureBuilder.oneHot(wide, "c", "c", maxClasses = 3)
    }
    assert(e.getMessage.contains("maxClasses"))
    // an explicit values list bypasses the collect entirely
    val oh = FeatureBuilder.oneHot(wide, "c", "c", values = Seq("v1"), maxClasses = 3)
    assert(oh.columns.contains("c_v1"))
  }
}
