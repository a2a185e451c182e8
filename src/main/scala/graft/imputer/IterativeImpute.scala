package graft.imputer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MICE-style iterative imputation (sklearn `IterativeImputer` analog) for a
  * pair of numeric columns with (possibly overlapping) missingness, using
  * chained closed-form OLS sweeps:
  *
  *  1. initialize both columns' missing cells with the column mean;
  *  2. each sweep regresses y on the currently-filled x over the
  *     y-OBSERVED rows and re-predicts the missing ys, then does the same
  *     for x on the freshly-filled y.
  *
  * Every fill is quantized to integer units (`round(v·10^2)` cents — the
  * oracle discipline), so the OLS moments of the NEXT sweep are sums of
  * integers: exact, order-free, bitwise-reproducible by the DuckDB oracle.
  * Cross-moment sums run in decimal(38,0) (HUGEINT on the oracle side) so a
  * Σy² over 100 TB of price-scale cents cannot overflow a long; the single
  * decimal→double cast at the end is correctly rounded in both engines.
  *
  * Plan shape: each sweep is two 1-row aggregations broadcast back via
  * crossJoin — the whole `sweeps`-deep chain stays ONE declarative plan
  * over the base table, no driver-side loops over data, no checkpoint
  * needed (the lineage is a fixed small number of scans that Catalyst
  * collapses into shared exchanges under AQE).
  */
object IterativeImpute {

  private val dec = "decimal(20,0)"

  /** OLS of `tgtObs` (observed integer units) on `predFilled` over the
    * tgt-observed rows: 1-row frame (_my, _mx, _b). */
  private def olsStats(filled: DataFrame, predFilled: String, tgtObs: String): DataFrame =
    filled.filter(col(tgtObs).isNotNull)
      .agg(
        sum(col(predFilled).cast(dec) * col(tgtObs).cast(dec)).cast("double").as("_sxy"),
        sum(col(predFilled).cast(dec) * col(predFilled).cast(dec)).cast("double").as("_sxx"),
        sum(col(predFilled)).cast("double").as("_sx"),
        sum(col(tgtObs)).cast("double").as("_sy"),
        count(lit(1)).cast("double").as("_n"))
      .select(
        (col("_sy") / col("_n")).as("_my"),
        (col("_sx") / col("_n")).as("_mx"),
        ((col("_sxy") - col("_sx") * col("_sy") / col("_n"))
          / (col("_sxx") - col("_sx") * col("_sx") / col("_n"))).as("_b"))

  /** One chained update: refit tgt ~ pred, re-predict missing tgt cells,
    * quantize back to integer units. */
  private def sweepOne(cur: DataFrame, predF: String, tgtObs: String, tgtF: String): DataFrame =
    cur.crossJoin(broadcast(olsStats(cur, predF, tgtObs)))
      .withColumn(tgtF, when(col(tgtObs).isNotNull, col(tgtObs))
        .otherwise(round(col("_my") - col("_b") * col("_mx")
          + col("_b") * col(predF).cast("double"), 0).cast("bigint")))
      .drop("_my", "_mx", "_b")

  /** @param sweeps full x/y rounds after the mean initialization
    * @return idCols ++ (xCol_imp, yCol_imp) as doubles at cent precision */
  def mice2(df: DataFrame, idCols: Seq[String], xCol: String, yCol: String,
            sweeps: Int = 2): DataFrame = {
    require(sweeps > 0, s"sweeps must be positive, got $sweeps")
    val c = graft.analytics.Analytics.cents _
    val base = df.select(
      idCols.map(col) ++ Seq(c(col(xCol), 2).as("_xc"), c(col(yCol), 2).as("_yc")): _*)
    val means = base.agg(
      round(sum("_xc").cast("double") / count(col("_xc")), 0).cast("bigint").as("_mxc"),
      round(sum("_yc").cast("double") / count(col("_yc")), 0).cast("bigint").as("_myc"))
    val init = base.crossJoin(broadcast(means))
      .withColumn("_xf", coalesce(col("_xc"), col("_mxc")))
      .withColumn("_yf", coalesce(col("_yc"), col("_myc")))
      .drop("_mxc", "_myc")
    val out = (1 to sweeps).foldLeft(init) { (cur, _) =>
      sweepOne(sweepOne(cur, "_xf", "_yc", "_yf"), "_yf", "_xc", "_xf")
    }
    out.select(idCols.map(col)
      ++ Seq((col("_xf").cast("double") / 100.0).as(s"${xCol}_imp"),
             (col("_yf").cast("double") / 100.0).as(s"${yCol}_imp")): _*)
  }
}
