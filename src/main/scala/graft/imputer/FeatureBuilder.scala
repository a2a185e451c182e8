package graft.imputer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-space construction — the reference's `create_features()`
  * (scikit_learn_imputer.py:140-176): hierarchical impute, class-threshold
  * filter, one-hot encoding, optional missing flags — plus the MinMax scaling
  * applied in `fit()` (scikit_learn_imputer.py:201-205).
  *
  * One-hot category sets are collected to the driver, but only for columns
  * that passed the class threshold (≤ `classThreshold` ≤ ~30 values), so the
  * collect is O(threshold) — scale-safe by construction, exactly like the
  * reference's rationale for the threshold (ref L56-58).
  */
object FeatureBuilder {

  /** Distinct-value counts per candidate categorical column with the
    * keep/drop decision — a single aggregation pass using exact
    * count_distinct (scale path: approx_count_distinct). */
  def classThreshold(df: DataFrame, catCols: Seq[String], threshold: Int = 30): DataFrame = {
    // index-based aliases + typed explode, not a spliced stack()
    // selectExpr — column names are caller data, never SQL text
    val aggs = catCols.zipWithIndex.map { case (c, i) =>
      countDistinct(col(c)).as(s"_n_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(catCols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("variable"), col(s"_n_$i").as("n_classes"))
    }: _*)
    one.select(explode(rows).as("_r"))
      .select(col("_r.variable").as("variable"), col("_r.n_classes").as("n_classes"))
      .withColumn("keep", col("n_classes") <= threshold)
  }

  /** One-hot encode `catCol` into 0/1 integer columns `<prefix>_<value>`.
    * If `values` is empty, the distinct observed values are collected
    * (limit-capped at `maxClasses` — the collect AND the output width are
    * both one column per class, so an uncapped high-cardinality column
    * would flood the driver twice) and sorted for determinism. */
  def oneHot(df: DataFrame, catCol: String, prefix: String,
             values: Seq[String] = Nil, maxClasses: Int = 1000): DataFrame = {
    val vals =
      if (values.nonEmpty) values
      else {
        val observed = df.select(catCol).distinct().limit(maxClasses + 1).collect()
          .map(_.get(0)).filter(_ != null).map(_.toString).sorted.toSeq
        require(observed.size <= maxClasses,
          s"oneHot: column '$catCol' has more than $maxClasses distinct values — " +
            "one-hot would add one output column per class; raise maxClasses " +
            "only if the schema can take it, or pass an explicit `values` list " +
            "(e.g. the classThreshold keep-set)")
        observed
      }
    val encoded = vals.map(v =>
      when(col(catCol) === v, 1).otherwise(0).as(s"${prefix}_${sanitize(v)}"))
    df.select(df.columns.map(col).toIndexedSeq ++ encoded: _*)
  }

  /** Min-max scale to [0,1]; constant columns map to 0.0 (sklearn
    * MinMaxScaler behavior). Global min/max is one aggregation, broadcast
    * back as scalars. */
  def minMaxScale(df: DataFrame, cols: Seq[String], suffix: String = "_scaled"): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"_mn_$c"), max(col(c)).as(s"_mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val out = df.crossJoin(broadcast(stats))
    val scaled = cols.foldLeft(out) { (d, c) =>
      d.withColumn(s"$c$suffix",
        when(col(s"_mx_$c") === col(s"_mn_$c"), lit(0.0))
          .otherwise((col(c) - col(s"_mn_$c")) / (col(s"_mx_$c") - col(s"_mn_$c"))))
    }
    scaled.drop(cols.flatMap(c => Seq(s"_mn_$c", s"_mx_$c")): _*)
  }

  def sanitize(v: String): String = v.replaceAll("[^A-Za-z0-9]", "_")

  /** Percent-rank (quantile) feature transform of a fixed-decimal column
    * WITHOUT the naive `percent_rank() OVER (ORDER BY v)` — a global row
    * window funnels the entire table through one task. Instead the rank is
    * computed on the VALUE HISTOGRAM: one groupBy over the value domain
    * (bounded by the fixed-decimal range, e.g. ≤ ~1.1M distinct cents for
    * a ±10k-dollar balance — independent of row count), a cumulative sum
    * over that tiny frame, and a broadcast join back. Every row gets
    * `(#rows with strictly smaller value) / (n − 1)` — exactly SQL
    * percent_rank, bitwise, since both factors are exact integers. */
  def percentRank(df: DataFrame, idCol: String, valueCol: String,
                  scale: Int, outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vc = df.select(col(idCol),
      graft.analytics.Analytics.cents(col(valueCol), scale).as("_v"))
    val hist = vc.groupBy("_v").agg(count(lit(1)).as("_c"))
    val w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, -1)
    val ranks = hist.select(col("_v"), coalesce(sum("_c").over(w), lit(0L)).as("_lt"))
    val n = vc.agg(count(lit(1)).as("_n"))
    vc.join(broadcast(ranks), Seq("_v")).crossJoin(broadcast(n))
      .select(col(idCol),
        // SQL percent_rank defines the single-row frame as 0.0; without
        // the guard _lt/(n-1) would be 0/0 = NaN here
        when(col("_n") <= 1L, lit(0.0))
          .otherwise(col("_lt").cast("double")
            / (col("_n") - lit(1L)).cast("double")).as(outCol))
  }

  /** Smoothed mean target encoding of a categorical column:
    * `enc = (sum + m·global_mean) / (n + m)` — the additive-smoothing
    * estimator that shrinks rare categories toward the prior. The target is
    * summed as EXACT integer fixed-decimal (no float drift at any scale);
    * the plan is two aggregations over the same frame (per-category +
    * global scalar) and a broadcast of the one-row prior — category
    * cardinality never touches more than one shuffle. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   scale: Int, smoothing: Double, outCol: String): DataFrame = {
    require(smoothing >= 0, s"smoothing must be non-negative, got $smoothing")
    val vc = df.select(col(catCol),
      graft.analytics.Analytics.cents(col(targetCol), scale).as("_t"))
    val per = vc.groupBy(catCol).agg(sum("_t").as("_s"), count(lit(1)).as("_n"))
    val g = vc.agg(sum("_t").as("_gs"), count(lit(1)).as("_gn"))
    per.crossJoin(broadcast(g)).select(
      col(catCol), col("_n").as("n_rows"),
      (((col("_s").cast("double")
          + lit(smoothing) * (col("_gs").cast("double") / col("_gn").cast("double")))
        / (col("_n").cast("double") + lit(smoothing)))
        / lit(math.pow(10, scale))).as(outCol))
  }
}
