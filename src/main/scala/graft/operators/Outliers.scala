package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.analytics.Analytics.cents

/** Outlier handling for numeric pipeline columns: winsorization (clip to
  * exact [lo, hi] percentiles) in integer fixed-point units so the bounds
  * and the clip are bitwise-reproducible. The percentile pass is one
  * aggregation broadcast back as a 1-row frame; the clip itself is a pure
  * projection. Scale path: swap `percentile` for `approx_percentile`
  * (same plan shape, no exact sort buffer). */
object Outliers {

  /** Clip `valueCol` to its [lo, hi] percentile range (exact, computed on
    * `floor(v·10^scale + 0.5)` integer units rounded back to one unit). NULLs
    * pass through untouched. */
  def winsorize(df: DataFrame, valueCol: String, outCol: String,
                lo: Double = 0.05, hi: Double = 0.95, scale: Int = 2): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad percentile range [$lo, $hi]")
    val pow = math.pow(10, scale)
    val vc: Column = cents(col(valueCol), scale)
    val bounds = df.select(vc.as("_vc"))
      .agg(floor((expr(s"percentile(_vc, $lo)")) + lit(0.5)).cast("bigint").as("_lo"),
        floor((expr(s"percentile(_vc, $hi)")) + lit(0.5)).cast("bigint").as("_hi"))
    df.crossJoin(broadcast(bounds))
      // greatest/least SKIP nulls (both engines), which would clip a NULL to
      // the low bound — pass NULLs through explicitly
      .withColumn(outCol,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(vc, col("_lo")), col("_hi")).cast("double") / pow))
      .drop("_lo", "_hi")
  }
}
