package graft.imputer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Missing-data diagnostics.
  *
  * Mirrors the reference's `missing_indicator()` (scikit_learn_imputer.py:109)
  * and `missing_metrics()` (scikit_learn_imputer.py:117), re-expressed as a
  * single aggregation pass — one scan, map-side partial aggregation, no
  * per-column jobs. Scales to arbitrary row counts; width is bounded by the
  * column count.
  */
object MissingStats {

  /** Per-column boolean missing flags (`<col>_flag`), keeping `idCols` for
    * joinability. A pure projection — codegen'd, no shuffle. */
  def indicator(df: DataFrame, idCols: Seq[String], flagCols: Seq[String] = Nil): DataFrame = {
    val targets = if (flagCols.nonEmpty) flagCols else df.columns.toSeq.diff(idCols)
    val flags = targets.map(c => col(c).isNull.as(s"${c}_flag"))
    df.select(idCols.map(col) ++ flags: _*)
  }

  /** variable / observed / missing / total / imputation_rate, one row per
    * column. One aggregation over the data, then a `stack` unpivot of the
    * single result row. */
  def metrics(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    // index-based internal aliases + typed explode, not a spliced stack()
    // selectExpr — column names are caller data and must never be parsed
    // as SQL text (quotes/dots/backticks in a name would break or misbind);
    // explode(array(struct…)) emits rows in the same order stack() did
    val aggs = count(lit(1)).as("_total") +:
      cols.zipWithIndex.map { case (c, i) => count(col(c)).as(s"_obs_$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("variable"), col(s"_obs_$i").as("observed"))
    }: _*)
    one
      .select(explode(rows).as("_r"), col("_total").as("total"))
      .select(col("_r.variable").as("variable"),
        col("_r.observed").as("observed"), col("total"))
      .withColumn("missing", col("total") - col("observed"))
      .withColumn("imputation_rate", col("missing").cast("double") / col("total"))
      .select("variable", "observed", "missing", "total", "imputation_rate")
  }
}
