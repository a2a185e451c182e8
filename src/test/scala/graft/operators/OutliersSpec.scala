package graft.operators

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clips to the exact percentile bounds, nulls pass through") {
    val vals = (1 to 100).map(_.toDouble) :+ 10000.0 // one wild outlier
    val df = (vals.zipWithIndex.map { case (v, i) => (i.toLong, Option(v)) }
      :+ (999L, None: Option[Double])).toDF("id", "v")
    val out = Outliers.winsorize(df, "v", "v_clip", lo = 0.10, hi = 0.90)
      .select("id", "v_clip").as[(Long, Option[Double])].collect().toMap
    val clipped = out.collect { case (id, Some(v)) if id != 999L => v }
    assert(clipped.min >= 10.0 && clipped.max <= 91.0 + 1e-9)
    assert(out(0L).get >= 10.0)           // low tail raised
    assert(out(100L).get <= 92.0)         // outlier clipped to ~p90
    assert(out(999L).isEmpty)             // null passes through
    assert(out(50L).get == 51.0)          // interior value untouched
  }
}
