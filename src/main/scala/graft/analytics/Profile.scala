package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.analytics.Analytics.cents

/** Column profiling for pipeline data quality: per-variable row/distinct
  * counts, min/max, exact fixed-point mean, exact median. One aggregation
  * pass per statistic family; the scale path swaps exact distinct/median
  * for `approx_count_distinct` / `approx_percentile` (same shape, no sort).
  */
object Profile {

  /** Profile the given numeric columns (fixed-decimal data, `scales(i)`
    * decimal places) of a table. Output: one row per variable. */
  def numeric(df: DataFrame, cols: Seq[(String, Int)]): DataFrame = {
    val parts = cols.map { case (c, scale) =>
      val k = math.pow(10, scale)
      df.select(cents(col(c), scale).as("_c"), col(c).as("_raw"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("_raw")).as("n_distinct"),
          min(col("_raw")).as("min_value"),
          max(col("_raw")).as("max_value"),
          (sum(col("_c")).cast("double") / (lit(k) * count(lit(1)))).as("mean_value"),
          (expr("percentile(_c, 0.5)") / k).as("p50"))
        .select(lit(c).as("variable"), col("n"), col("n_distinct"),
          col("min_value"), col("max_value"), col("mean_value"), col("p50"))
    }
    parts.reduce(_ unionAll _)
  }

  def lineitemProfile(spark: SparkSession, dir: String): DataFrame =
    numeric(Tables(spark, dir, "lineitem"),
      Seq("l_quantity" -> 2, "l_extendedprice" -> 2, "l_discount" -> 4, "l_tax" -> 4))

  /** The 100 TB profiling face: identical output schema to [[numeric]] but
    * sketch-based distinct (HyperLogLog++ `approx_count_distinct`) and
    * quantile (`approx_percentile`, 1e-4 relative error) — no exact-median
    * sort, no exact-distinct shuffle; every statistic is a single-pass
    * mergeable sketch with map-side partials. `rsd`/`accuracy` trade
    * memory for error explicitly. */
  def numericApprox(df: DataFrame, cols: Seq[(String, Int)],
                    rsd: Double = 0.05, accuracy: Int = 10000): DataFrame = {
    val parts = cols.map { case (c, scale) =>
      val k = math.pow(10, scale)
      df.select(cents(col(c), scale).as("_c"), col(c).as("_raw"))
        .agg(
          count(lit(1)).as("n"),
          approx_count_distinct(col("_raw"), rsd).as("n_distinct"),
          min(col("_raw")).as("min_value"),
          max(col("_raw")).as("max_value"),
          (sum(col("_c")).cast("double") / (lit(k) * count(lit(1)))).as("mean_value"),
          (expr(s"approx_percentile(_c, 0.5, $accuracy)") / k).as("p50"))
        .select(lit(c).as("variable"), col("n"), col("n_distinct"),
          col("min_value"), col("max_value"), col("mean_value"), col("p50"))
    }
    parts.reduce(_ unionAll _)
  }

  def lineitemProfileApprox(spark: SparkSession, dir: String): DataFrame =
    numericApprox(Tables(spark, dir, "lineitem"),
      Seq("l_quantity" -> 2, "l_extendedprice" -> 2, "l_discount" -> 4, "l_tax" -> 4))

  /** Categorical profiling: observed count, distinct count, deterministic
    * mode (count desc, value asc) with its frequency, and the Shannon
    * entropy of the value distribution (6dp-rounded; the imp_variance
    * discipline — ln(N) − Σc·ln(c)/N with rounding absorbing double
    * sum-order noise). One count shuffle per column over its value
    * cardinality; everything downstream of the counts is tiny. */
  def categorical(df: DataFrame, cols: Seq[String]): DataFrame = {
    val parts = cols.map { c =>
      val counts = df.filter(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("_v")).agg(count(lit(1)).as("_c"))
      val mode = counts.orderBy(desc("_c"), asc("_v")).limit(1)
        .select(col("_v").as("mode_value"), col("_c").as("mode_n"))
      counts.agg(
          sum("_c").as("n"),
          count(lit(1)).as("n_distinct"),
          round(log(sum(col("_c")).cast("double"))
            - sum(col("_c").cast("double") * log(col("_c").cast("double")))
              / sum(col("_c")).cast("double"), 6).as("entropy"))
        .crossJoin(broadcast(mode))
        .select(lit(c).as("variable"), col("n"), col("n_distinct"),
          col("mode_value"), col("mode_n"), col("entropy"))
    }
    parts.reduce(_ unionAll _)
  }

  def customerCategoricalProfile(spark: SparkSession, dir: String): DataFrame =
    categorical(Tables(spark, dir, "customer"), Seq("c_mktsegment", "c_nationkey"))
}
