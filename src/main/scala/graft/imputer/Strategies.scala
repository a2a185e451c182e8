package graft.imputer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-free imputation strategies (the reference's Dummy* / LinearRegression
  * paths, ref scikit_learn_imputer.py:178-304 with sklearn estimators).
  *
  * Every strategy is: (1) one distributed aggregation producing a TINY stats
  * frame (1..#groups rows), (2) a broadcast join back, (3) a `coalesce`
  * projection. No windows over unpartitioned data, no driver-side row loops —
  * the shape that survives 100 TB.
  */
object Strategies {

  private def withScalar(df: DataFrame, stats: DataFrame)(impute: DataFrame => DataFrame): DataFrame =
    impute(df.crossJoin(broadcast(stats)))

  /** Impute `valueCol` with the global mean of observed values. */
  def mean(df: DataFrame, valueCol: String, outCol: String): DataFrame =
    withScalar(df, df.agg(avg(col(valueCol)).as("_stat"))) { d =>
      d.withColumn(outCol, coalesce(col(valueCol), col("_stat"))).drop("_stat")
    }

  /** Impute with a caller-supplied constant (sklearn
    * SimpleImputer(strategy='constant', fill_value=...)). Pure projection —
    * zero shuffle. */
  def constant(df: DataFrame, valueCol: String, fill: Any, outCol: String): DataFrame =
    df.withColumn(outCol, coalesce(col(valueCol), lit(fill)))

  /** Impute with the exact interpolated median (matches SQL percentile_cont
    * 0.5). Scale path: swap `percentile` for `approx_percentile` — exact
    * median needs a sort of the observed values. */
  def median(df: DataFrame, valueCol: String, outCol: String): DataFrame =
    // typed percentile, not expr() — valueCol is caller data, never SQL text
    withScalar(df, df.agg(percentile(col(valueCol), lit(0.5)).as("_stat"))) { d =>
      d.withColumn(outCol, coalesce(col(valueCol), col("_stat"))).drop("_stat")
    }

  /** Deterministic mode as an always-1-row aggregate: min_by over
    * (−count, value) = highest count, then smallest value. Unlike an
    * orderBy+limit(1) frame this yields ONE row (null) even when nothing
    * is observed, so a crossJoin never annihilates the input. */
  private def modeAgg(valueCol: Column, cntCol: Column): Column =
    min_by(valueCol, struct((-cntCol).as("nc"), valueCol.as("v")))

  /** Impute a categorical with the most frequent observed value.
    * Deterministic tie-break: higher count wins, then smaller value.
    * An entirely-null column imputes to null (rows preserved). */
  def mode(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(valueCol).agg(count(lit(1)).as("_cnt"))
    val m = counts.agg(modeAgg(col(valueCol), col("_cnt")).as("_stat"))
    withScalar(df, m) { d =>
      d.withColumn(outCol, coalesce(col(valueCol), col("_stat"))).drop("_stat")
    }
  }

  /** Hierarchical group-wise mode: fill a categorical from its group's most
    * frequent observed value (count desc, value asc tie-break), falling
    * back to the global mode for all-missing groups. Per-group argmax is a
    * window over the (group, value) count frame — #groups·#values rows,
    * tiny next to the data — broadcast-joined back. */
  def groupMode(df: DataFrame, valueCol: String, groupCol: String, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("_cnt"))
    val gm = counts
      .withColumn("_rk", row_number().over(
        Window.partitionBy(groupCol).orderBy(desc("_cnt"), asc(valueCol))))
      .filter(col("_rk") === 1)
      .select(col(groupCol), col(valueCol).as("_gmode"))
    // global counts RE-AGGREGATE the per-group counts frame
    // (#groups·#values rows) — a second groupBy over df would be a full
    // redundant scan and shuffle of the input
    val gcnt = counts.groupBy(valueCol).agg(sum("_cnt").as("_cnt"))
    // 1-row aggregate, not orderBy+limit: an all-null column must impute to
    // null with rows preserved, never annihilate the crossJoin
    val g = gcnt.agg(modeAgg(col(valueCol), col("_cnt")).as("_mode"))
    df.join(broadcast(gm), Seq(groupCol), "left")
      .crossJoin(broadcast(g))
      .withColumn(outCol, coalesce(col(valueCol), col("_gmode"), col("_mode")))
      .drop("_gmode", "_mode")
  }

  /** Hierarchical group-wise mean: impute from the group's observed mean,
    * falling back to the global mean for all-missing groups. The per-group
    * stats frame is small (#groups rows) and broadcast. */
  def groupMean(df: DataFrame, valueCol: String, groupCol: String, outCol: String): DataFrame = {
    val gm = df.groupBy(groupCol).agg(avg(col(valueCol)).as("_gm"))
    val g = df.agg(avg(col(valueCol)).as("_g"))
    df.join(broadcast(gm), Seq(groupCol), "left")
      .crossJoin(broadcast(g))
      .withColumn(outCol, coalesce(col(valueCol), col("_gm"), col("_g")))
      .drop("_gm", "_g")
  }

  /** MLlib's built-in Imputer as the strategy engine for numeric columns —
    * strategies "mean" | "median" | "mode". Fits one distributed pass over
    * all `cols` at once and returns the frame with `<col>_imp` outputs;
    * the fitted ImputerModel can be persisted with MLlib writers. */
  def mllib(df: DataFrame, cols: Seq[String], strategy: String,
            suffix: String = "_imp"): DataFrame = {
    import org.apache.spark.ml.feature.Imputer
    new Imputer()
      .setInputCols(cols.toArray)
      .setOutputCols(cols.map(_ + suffix).toArray)
      .setStrategy(strategy)
      .fit(df)
      .transform(df)
  }

  /** One-feature OLS imputation: y ~ a + b*x with the closed form
    * b = covar_pop(y,x)/var_pop(x) over rows where y is observed. One
    * aggregation pass — no iterative solver needed for the univariate case
    * the reference exercises with LinearRegression. */
  def regression(df: DataFrame, yCol: String, xCol: String, outCol: String): DataFrame = {
    val obs = df.filter(col(yCol).isNotNull)
    val stats = obs.agg(
      (covar_pop(col(yCol), col(xCol)) / var_pop(col(xCol))).as("_b"),
      avg(col(yCol)).as("_my"), avg(col(xCol)).as("_mx"))
    withScalar(df, stats) { d =>
      d.withColumn(outCol,
          coalesce(col(yCol), col("_my") - col("_b") * col("_mx") + col("_b") * col(xCol)))
        .drop("_b", "_my", "_mx")
    }
  }
}
