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
  * Every fill is quantized to integer units (`floor(v·10^2 + 0.5)` cents — the
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
        .otherwise(floor((col("_my") - col("_b") * col("_mx")
          + col("_b") * col(predF).cast("double")) + lit(0.5)).cast("bigint")))
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
      floor((sum("_xc").cast("double") / count(col("_xc"))) + lit(0.5)).cast("bigint").as("_mxc"),
      floor((sum("_yc").cast("double") / count(col("_yc"))) + lit(0.5)).cast("bigint").as("_myc"))
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

  /** Two-predictor OLS of `tgtObs` on (p1, p2) over the tgt-observed rows:
    * exact integer cross-moments in decimal (HUGEINT on the oracle side),
    * then the CENTERED 2×2 normal equations solved in-plan by Cramer's
    * rule — 1-row frame (_my, _m1, _m2, _b1, _b2). Collinear predictors
    * (det → 0) produce non-finite betas, exactly as sklearn's
    * unregularized closed form would; callers own predictor choice. */
  private def ols2Stats(filled: DataFrame, p1: String, p2: String,
                        tgtObs: String): DataFrame =
    filled.filter(col(tgtObs).isNotNull)
      .agg(
        sum(col(p1).cast(dec) * col(tgtObs).cast(dec)).cast("double").as("_s1y"),
        sum(col(p2).cast(dec) * col(tgtObs).cast(dec)).cast("double").as("_s2y"),
        sum(col(p1).cast(dec) * col(p1).cast(dec)).cast("double").as("_s11"),
        sum(col(p2).cast(dec) * col(p2).cast(dec)).cast("double").as("_s22"),
        sum(col(p1).cast(dec) * col(p2).cast(dec)).cast("double").as("_s12"),
        sum(col(p1)).cast("double").as("_s1"),
        sum(col(p2)).cast("double").as("_s2"),
        sum(col(tgtObs)).cast("double").as("_sy"),
        count(lit(1)).cast("double").as("_n"))
      .select(
        (col("_sy") / col("_n")).as("_my"),
        (col("_s1") / col("_n")).as("_m1"),
        (col("_s2") / col("_n")).as("_m2"),
        (col("_s11") - col("_s1") * col("_s1") / col("_n")).as("_c11"),
        (col("_s22") - col("_s2") * col("_s2") / col("_n")).as("_c22"),
        (col("_s12") - col("_s1") * col("_s2") / col("_n")).as("_c12"),
        (col("_s1y") - col("_s1") * col("_sy") / col("_n")).as("_c1y"),
        (col("_s2y") - col("_s2") * col("_sy") / col("_n")).as("_c2y"))
      .select(col("_my"), col("_m1"), col("_m2"),
        ((col("_c1y") * col("_c22") - col("_c2y") * col("_c12"))
          / (col("_c11") * col("_c22") - col("_c12") * col("_c12"))).as("_b1"),
        ((col("_c11") * col("_c2y") - col("_c12") * col("_c1y"))
          / (col("_c11") * col("_c22") - col("_c12") * col("_c12"))).as("_b2"))

  /** One multi-predictor chained update: refit tgt ~ p1 + p2, re-predict
    * missing tgt cells, quantize back to integer units. */
  private def sweep3One(cur: DataFrame, p1F: String, p2F: String,
                        tgtObs: String, tgtF: String): DataFrame =
    cur.crossJoin(broadcast(ols2Stats(cur, p1F, p2F, tgtObs)))
      .withColumn(tgtF, when(col(tgtObs).isNotNull, col(tgtObs))
        .otherwise(floor((col("_my") - col("_b1") * col("_m1") - col("_b2") * col("_m2")
            + col("_b1") * col(p1F).cast("double")
            + col("_b2") * col(p2F).cast("double")) + lit(0.5)).cast("bigint")))
      .drop("_my", "_m1", "_m2", "_b1", "_b2")

  /** MICE with MULTIPLE predictors — the sklearn `IterativeImputer`
    * semantic that [[mice2]]'s single-feature sweeps approximate: each of
    * THREE numeric columns regresses on BOTH others (d = 2 predictors),
    * chained x → y → z per sweep after mean initialization. The normal
    * equations stay CLOSED-FORM IN-PLAN (exact decimal cross-moments →
    * centered 2×2 Cramer solve in the same 1-row projection — no driver
    * matrix state, no MLlib fit), so every fill is reproducible bitwise
    * by the DuckDB oracle replaying the same expression tree: the face is
    * hash-checked, not rows-only. Every fill quantizes to integer cents
    * before the next update, so each update's moments are sums of
    * integers — exact, order-free, scale-safe (decimal(38)-class sums
    * survive 100 TB row counts; the single decimal→double cast per
    * moment is correctly rounded in both engines).
    *
    * Plan shape: per update, one 1-row aggregation broadcast back via
    * crossJoin — 3·sweeps aggregations over one base scan lineage, no
    * driver loops over data, no checkpoint (a fixed small plan Catalyst
    * collapses under AQE).
    *
    * Reference anchor: scikit_learn_imputer.py:178–304 (model-based
    * family; sklearn IterativeImputer regresses each target on all other
    * features).
    * @return idCols ++ (xCol_imp, yCol_imp, zCol_imp) doubles at cents */
  def mice3(df: DataFrame, idCols: Seq[String], xCol: String, yCol: String,
            zCol: String, sweeps: Int = 2): DataFrame = {
    require(sweeps > 0, s"sweeps must be positive, got $sweeps")
    val c = graft.analytics.Analytics.cents _
    val base = df.select(
      idCols.map(col) ++ Seq(c(col(xCol), 2).as("_xc"), c(col(yCol), 2).as("_yc"),
        c(col(zCol), 2).as("_zc")): _*)
    val means = base.agg(
      floor((sum("_xc").cast("double") / count(col("_xc"))) + lit(0.5)).cast("bigint").as("_mxc"),
      floor((sum("_yc").cast("double") / count(col("_yc"))) + lit(0.5)).cast("bigint").as("_myc"),
      floor((sum("_zc").cast("double") / count(col("_zc"))) + lit(0.5)).cast("bigint").as("_mzc"))
    val init = base.crossJoin(broadcast(means))
      .withColumn("_xf", coalesce(col("_xc"), col("_mxc")))
      .withColumn("_yf", coalesce(col("_yc"), col("_myc")))
      .withColumn("_zf", coalesce(col("_zc"), col("_mzc")))
      .drop("_mxc", "_myc", "_mzc")
    val out = (1 to sweeps).foldLeft(init) { (cur, _) =>
      val a = sweep3One(cur, "_yf", "_zf", "_xc", "_xf")
      val b = sweep3One(a, "_xf", "_zf", "_yc", "_yf")
      sweep3One(b, "_xf", "_yf", "_zc", "_zf")
    }
    out.select(idCols.map(col)
      ++ Seq((col("_xf").cast("double") / 100.0).as(s"${xCol}_imp"),
             (col("_yf").cast("double") / 100.0).as(s"${yCol}_imp"),
             (col("_zf").cast("double") / 100.0).as(s"${zCol}_imp")): _*)
  }
}
