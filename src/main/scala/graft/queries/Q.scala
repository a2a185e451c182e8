package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.analytics.Analytics
import graft.analytics.Analytics.cents
import graft.imputer.{FeatureBuilder, FfillBfill, HotDeck, MissingStats, SparkImputer, Strategies}
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.functions.VectorFunctions._

/** The Spark faces of every operator in SURVEY.md §2. Each query has a
  * DuckDB oracle in [[OracleSql]] built with the identical expression trees
  * (see SURVEY.md §4 for the bitwise-reproducibility discipline).
  */
object Q {

  val segments: Seq[String] =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  // ---------------------------------------------------------------- imputer

  def impMissingIndicator(s: SparkSession, dir: String): DataFrame =
    MissingStats.indicator(Tables.maskedCustomer(s, dir),
      Seq("c_custkey"), Seq("c_acctbal", "c_mktsegment"))

  def impMissingMetrics(s: SparkSession, dir: String): DataFrame =
    MissingStats.metrics(Tables.maskedCustomer(s, dir))

  /** Missingness-pattern analysis (R md.pattern / missingno): one row per
    * DISTINCT missing/observed pattern across the maskable columns with
    * its row count — the diagnostic that separates MCAR-looking masks
    * from structural co-missingness. ONE hash aggregation over the
    * pattern tuple (cardinality ≤ 2^cols, tiny), counts exact. */
  def impMissingPatterns(s: SparkSession, dir: String): DataFrame =
    Tables.maskedCustomer(s, dir)
      .groupBy(
        col("c_acctbal").isNull.as("acctbal_missing"),
        col("c_mktsegment").isNull.as("seg_missing"))
      .agg(count(lit(1)).as("n_rows"))

  /** Co-missingness association: the φ coefficient between the two mask
    * indicators — the number that separates MCAR-looking masks (φ≈0) from
    * structurally coupled missingness (the case where listwise deletion
    * and independent per-column imputes both bias). One conditional
    * aggregation pass (the 2×2 table), closed-form φ from exact integers,
    * 6dp round. */
  def impMissingCorr(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    mc.agg(
        count(lit(1)).as("_n"),
        sum(when(col("c_acctbal").isNull && col("c_mktsegment").isNull, 1L)
          .otherwise(0L)).as("_n11"),
        sum(when(col("c_acctbal").isNull, 1L).otherwise(0L)).as("_na"),
        sum(when(col("c_mktsegment").isNull, 1L).otherwise(0L)).as("_ns"))
      .select(lit("c_acctbal~c_mktsegment").as("pair"),
        col("_n").as("n_rows"), col("_na").as("n_miss_a"),
        col("_ns").as("n_miss_b"), col("_n11").as("n_miss_both"),
        (floor(((col("_n11").cast("double") * col("_n").cast("double")
          - col("_na").cast("double") * col("_ns").cast("double"))
          / sqrt(col("_na").cast("double") * (col("_n") - col("_na")).cast("double")
            * col("_ns").cast("double") * (col("_n") - col("_ns")).cast("double"))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("phi"))
  }

  def impFfillBfill(s: SparkSession, dir: String): DataFrame =
    FfillBfill.ffillThenBfill(Tables.maskedCustomer(s, dir), "c_custkey",
        Seq("c_acctbal", "c_mktsegment"))
      .select(col("c_custkey"), col("c_acctbal").as("acctbal_filled"),
        col("c_mktsegment").as("seg_filled"))

  /** Sequential hot-deck: masked acctbal and mktsegment imputed from REAL
    * donor rows within the c_nationkey adjustment cell, donors visited in
    * the RNG-free scrambled order ([[graft.imputer.HotDeck]] — reproducible
    * in any engine). Donor values are picked, never averaged, so the doubles
    * pass through bitwise. */
  def impHotdeck(s: SparkSession, dir: String): DataFrame =
    HotDeck.sequential(Tables.maskedCustomer(s, dir), "c_nationkey", "c_custkey",
        Seq("c_acctbal", "c_mktsegment"))
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").as("acctbal_filled"), col("c_mktsegment").as("seg_filled"))

  def impClassThreshold(s: SparkSession, dir: String): DataFrame =
    FeatureBuilder.classThreshold(Tables(s, dir, "customer"),
      Seq("c_name", "c_mktsegment", "c_nationkey"), 30)

  def impOnehot(s: SparkSession, dir: String): DataFrame =
    FeatureBuilder.oneHot(Tables(s, dir, "customer"), "c_mktsegment", "mkt", segments)
      .select((col("c_custkey") +: segments.map(v => col(s"mkt_$v"))): _*)

  def impMinmaxScale(s: SparkSession, dir: String): DataFrame =
    FeatureBuilder.minMaxScale(Tables(s, dir, "customer"), Seq("c_acctbal"))
      .select(col("c_custkey"), col("c_acctbal_scaled").as("acctbal_scaled"))

  /** Mean of observed acctbal (exact integer cents, rounded to a cent) fills
    * the masked rows. */
  def impMean(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    val ac = cents(col("c_acctbal"), 2)
    val stats = mc.agg(
      floor((sum(ac).cast("double") / count(col("c_acctbal"))) + lit(0.5)).cast("bigint").as("_m"))
    mc.crossJoin(broadcast(stats))
      .select(col("c_custkey"),
        coalesce(col("c_acctbal"), col("_m").cast("double") / 100.0).as("acctbal_imp"))
  }

  /** Standard-scaler impute face: mean-impute the masked balances (exact
    * integer-cents mean, like [[impMean]]) then z-score every row against
    * the OBSERVED distribution — μ and the sample σ come from one exact
    * integer-moment pass (Σc, Σc², n), broadcast back as scalars, and the
    * z itself is the only double arithmetic (identical expression tree in
    * the oracle ⇒ bitwise match, the events_anomaly discipline). */
  def impZscore(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    val ac = cents(col("c_acctbal"), 2)
    val st = mc.agg(
        sum(ac).cast("double").as("_s"),
        sum(ac * ac).cast("double").as("_ss"),
        count(col("c_acctbal")).cast("double").as("_n"))
      .select(
        (col("_s") / col("_n")).as("_mu"),
        sqrt((col("_ss") - col("_s") * col("_s") / col("_n"))
          / (col("_n") - 1.0)).as("_sigma"),
        floor((col("_s") / col("_n")) + lit(0.5)).cast("bigint").as("_mc"))
    mc.crossJoin(broadcast(st))
      .select(col("c_custkey"),
        ((coalesce(ac, col("_mc")).cast("double") - col("_mu")) / col("_sigma"))
          .as("acctbal_z"))
  }

  def impMedian(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    val stats = mc.select(cents(col("c_acctbal"), 2).as("_ac"))
      .agg(floor((expr("percentile(_ac, 0.5)")) + lit(0.5)).cast("bigint").as("_m"))
    mc.crossJoin(broadcast(stats))
      .select(col("c_custkey"),
        coalesce(col("c_acctbal"), col("_m").cast("double") / 100.0).as("acctbal_imp"))
  }

  /** KNN impute (k=3 nearest by custkey) — distributed sorted-neighbor
    * algorithm, oracle is the brute-force definition. */
  def impKnn(s: SparkSession, dir: String): DataFrame =
    graft.imputer.KnnImpute.impute1d(Tables.maskedCustomer(s, dir),
      "c_custkey", col("c_custkey"), "c_acctbal", "acctbal_imp", k = 3)

  /** Constant-fill impute (SimpleImputer strategy='constant'). */
  def impConstant(s: SparkSession, dir: String): DataFrame =
    Strategies.constant(Tables.maskedCustomer(s, dir), "c_mktsegment",
        "UNKNOWN", "seg_imp")
      .select("c_custkey", "seg_imp")

  /** pandas interpolate(): linear fill between observed neighbors in
    * custkey order, edge gaps taking the nearest observed value. */
  def impInterpolate(s: SparkSession, dir: String): DataFrame =
    graft.imputer.Interpolate.linear1d(Tables.maskedCustomer(s, dir),
        "c_custkey", "c_acctbal", "acctbal_interp")
      .select("c_custkey", "acctbal_interp")

  def impMode(s: SparkSession, dir: String): DataFrame =
    Strategies.mode(Tables.maskedCustomer(s, dir), "c_mktsegment", "seg_imp")
      .select("c_custkey", "seg_imp")

  /** Group-wise mode: each nation's most frequent observed segment fills
    * that nation's masked rows (global mode fallback). */
  def impGroupMode(s: SparkSession, dir: String): DataFrame =
    Strategies.groupMode(Tables.maskedCustomer(s, dir),
        "c_mktsegment", "c_nationkey", "seg_imp")
      .select("c_custkey", "seg_imp")

  def impGroupMean(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    val ac = cents(col("c_acctbal"), 2)
    val gm = mc.groupBy("c_nationkey").agg(
      floor((sum(ac).cast("double") / count(col("c_acctbal"))) + lit(0.5)).cast("bigint").as("_gm"))
    val g = mc.agg(
      floor((sum(ac).cast("double") / count(col("c_acctbal"))) + lit(0.5)).cast("bigint").as("_g"))
    mc.join(broadcast(gm), Seq("c_nationkey"), "left")
      .crossJoin(broadcast(g))
      .select(col("c_custkey"),
        coalesce(col("c_acctbal"), col("_gm").cast("double") / 100.0,
          col("_g").cast("double") / 100.0).as("acctbal_imp"))
  }

  /** Group-median impute: per-nation exact median (cents-quantized, the
    * imp_median discipline) fills masked acctbal, global median as the
    * fallback for donor-free cells — the robust sibling of imp_group_mean
    * (a cell's outlier whales shift its mean, not its median). Per-group
    * percentile aggregates at group cardinality; broadcast joins back. */
  def impGroupMedian(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    val gm = mc.select(col("c_nationkey"), cents(col("c_acctbal"), 2).as("_ac"))
      .groupBy("c_nationkey").agg(
        floor((expr("percentile(_ac, 0.5D)")) + lit(0.5)).cast("bigint").as("_gm"))
    val g = mc.select(cents(col("c_acctbal"), 2).as("_ac")).agg(
      floor((expr("percentile(_ac, 0.5D)")) + lit(0.5)).cast("bigint").as("_g"))
    mc.join(broadcast(gm), Seq("c_nationkey"), "left")
      .crossJoin(broadcast(g))
      .select(col("c_custkey"),
        coalesce(col("c_acctbal"), col("_gm").cast("double") / 100.0,
          col("_g").cast("double") / 100.0).as("acctbal_imp"))
  }

  /** Customer lifetime value summary: spend, tenure, run rate, and a
    * naive 365-day projection — exact cents and day integers until the
    * two 6dp divisions. One custkey aggregation (map-side partials). */
  def ordersCltv(s: SparkSession, dir: String): DataFrame = {
    val day = expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
    Tables(s, dir, "orders")
      .select(col("o_custkey"), cents(col("o_totalprice"), 2).as("_tc"), day.as("_d"))
      .groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("_tc")).as("_spend"),
        (max(col("_d")) - min(col("_d")) + 1).as("tenure_days"))
      .select(col("o_custkey"), col("n_orders"),
        (col("_spend").cast("double") / 100.0).as("total_spend"),
        col("tenure_days"),
        (floor((col("_spend").cast("double") / (lit(100.0) * col("tenure_days"))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("spend_per_day"),
        (floor((lit(365.0) * col("_spend").cast("double")
          / (lit(100.0) * col("tenure_days"))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("cltv_365"))
  }

  /** Label-quality audit: confusion matrix of the declared `lang` column
    * against the n-gram language-ID heuristic — the noisy-label screen a
    * pipeline runs before trusting metadata for filtering or mixing. One
    * (declared, predicted) aggregation over the langid projection. */
  def textLangConfusion(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withLangId(Tables(s, dir, "documents"), "text")
      .groupBy(col("lang").as("declared_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("lang_score")).as("sum_score"))

  /** Closed-form univariate OLS (price ~ quantity) in exact cents space. */
  def impRegression(s: SparkSession, dir: String): DataFrame = {
    val ml = Tables.maskedLineitem(s, dir)
    val xc = cents(col("l_quantity"), 2)
    val yc = cents(col("l_extendedprice"), 2)
    val stats = ml.filter(col("l_extendedprice").isNotNull)
      .select(xc.as("_xc"), yc.as("_yc"))
      .agg(
        sum(col("_xc") * col("_yc")).cast("double").as("_sxy"),
        sum(col("_xc") * col("_xc")).cast("double").as("_sxx"),
        sum(col("_xc")).cast("double").as("_sx"),
        sum(col("_yc")).cast("double").as("_sy"),
        count(lit(1)).cast("double").as("_n"))
      .select(
        (col("_sy") / col("_n")).as("_my"),
        (col("_sx") / col("_n")).as("_mx"),
        ((col("_sxy") - col("_sx") * col("_sy") / col("_n"))
          / (col("_sxx") - col("_sx") * col("_sx") / col("_n"))).as("_b"))
    ml.crossJoin(broadcast(stats))
      .select(col("l_orderkey"), col("l_linenumber"),
        coalesce(col("l_extendedprice"),
          (col("_my") - col("_b") * col("_mx") + col("_b") * xc) / 100.0).as("price_imp"))
  }

  /** MICE chained imputation: quantity and price both partially missing,
    * two closed-form OLS sweeps after mean init, cents-quantized so the
    * oracle reproduces every sweep bitwise. */
  def impIterative(s: SparkSession, dir: String): DataFrame =
    graft.imputer.IterativeImpute.mice2(Tables.miceLineitem(s, dir),
      Seq("l_orderkey", "l_linenumber"), "l_quantity", "l_extendedprice")

  /** MULTI-predictor MICE (sklearn IterativeImputer semantics): quantity,
    * price and discount each partially missing, each target regressing on
    * BOTH other columns via exact-moment in-plan Cramer normal equations
    * ([[graft.imputer.IterativeImpute.mice3]]) — hash-checked, the oracle
    * replays the identical algebra. */
  def impIterativeMulti(s: SparkSession, dir: String): DataFrame =
    graft.imputer.IterativeImpute.mice3(Tables.miceLineitem3(s, dir),
      Seq("l_orderkey", "l_linenumber"), "l_quantity", "l_extendedprice",
      "l_discount")

  /** Simulation study (ref fit() test split): deterministic modulo split,
    * mean-impute MSE on the continuous column, mode-impute accuracy on the
    * categorical one. */
  def impSimulation(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    val ac = cents(col("c_acctbal"), 2)
    val obs = mc.filter(col("c_acctbal").isNotNull).select(col("c_custkey"), ac.as("_ac"))
    val m = obs.filter(col("c_custkey") % 10 =!= 0)
      .agg(floor((sum(col("_ac")).cast("double") / count(lit(1))) + lit(0.5)).cast("bigint").as("_m"))
    val mse = obs.filter(col("c_custkey") % 10 === 0).crossJoin(broadcast(m))
      .agg(sum((col("_m") - col("_ac")) * (col("_m") - col("_ac"))).cast("double").as("_sse"),
        count(lit(1)).as("_n"))
      .select((col("_sse") / (lit(10000.0) * col("_n"))).as("score"))

    val obc = mc.filter(col("c_mktsegment").isNotNull)
    val md = obc.filter(col("c_custkey") % 10 =!= 0)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("_cnt"))
      .orderBy(desc("_cnt"), asc("c_mktsegment")).limit(1)
      .select(col("c_mktsegment").as("_mode"))
    val acc = obc.filter(col("c_custkey") % 10 === 0).crossJoin(broadcast(md))
      .agg(sum(when(col("c_mktsegment") === col("_mode"), 1).otherwise(0)).cast("double").as("_h"),
        count(lit(1)).as("_n"))
      .select((col("_h") / col("_n")).as("score"))

    mse.select(lit("c_acctbal").as("variable"), lit("mse").as("metric"), col("score"))
      .unionAll(acc.select(lit("c_mktsegment").as("variable"), lit("accuracy").as("metric"), col("score")))
  }

  /** select_model (ref L427): four strategies scored on the same
    * deterministic test split of masked lineitem, ranked by test MSE. */
  def impSelectModel(s: SparkSession, dir: String): DataFrame = {
    val ml = Tables.maskedLineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        cents(col("l_quantity"), 2).as("_xc"), cents(col("l_extendedprice"), 2).as("_yc"),
        ((col("l_orderkey") + col("l_linenumber")) % 10).as("_k"))
    val obs = ml.filter(col("_yc").isNotNull)
    val train = obs.filter(col("_k") =!= 0)
    val test = obs.filter(col("_k") === 0)

    def mseOf(pred: DataFrame): DataFrame =
      // pred: test rows with column _p (BIGINT predicted cents)
      pred.agg(sum((col("_p") - col("_yc")) * (col("_p") - col("_yc"))).cast("double").as("_sse"),
          count(lit(1)).as("_n"))
        .select((col("_sse") / (lit(10000.0) * col("_n"))).as("mse"))

    val meanStat = train.agg(
      floor((sum(col("_yc")).cast("double") / count(lit(1))) + lit(0.5)).cast("bigint").as("_m"))
    val mseMean = mseOf(test.crossJoin(broadcast(meanStat)).withColumn("_p", col("_m")))

    val medStat = train.agg(
      floor((expr("percentile(_yc, 0.5)")) + lit(0.5)).cast("bigint").as("_m"))
    val mseMedian = mseOf(test.crossJoin(broadcast(medStat)).withColumn("_p", col("_m")))

    val gmStat = train.groupBy("l_suppkey").agg(
      floor((sum(col("_yc")).cast("double") / count(lit(1))) + lit(0.5)).cast("bigint").as("_gm"))
    val mseGroup = mseOf(
      test.join(broadcast(gmStat), Seq("l_suppkey"), "left")
        .crossJoin(broadcast(meanStat))
        .withColumn("_p", coalesce(col("_gm"), col("_m"))))

    val regStat = train.agg(
        sum(col("_xc") * col("_yc")).cast("double").as("_sxy"),
        sum(col("_xc") * col("_xc")).cast("double").as("_sxx"),
        sum(col("_xc")).cast("double").as("_sx"),
        sum(col("_yc")).cast("double").as("_sy"),
        count(lit(1)).cast("double").as("_n"))
      .select(
        (col("_sy") / col("_n")).as("_my"), (col("_sx") / col("_n")).as("_mx"),
        ((col("_sxy") - col("_sx") * col("_sy") / col("_n"))
          / (col("_sxx") - col("_sx") * col("_sx") / col("_n"))).as("_b"))
    val mseReg = mseOf(test.crossJoin(broadcast(regStat))
      .withColumn("_p",
        floor((col("_my") - col("_b") * col("_mx") + col("_b") * col("_xc")) + lit(0.5)).cast("bigint")))

    val all = mseMean.select(lit("mean").as("strategy"), col("mse"))
      .unionAll(mseMedian.select(lit("median").as("strategy"), col("mse")))
      .unionAll(mseGroup.select(lit("group_mean").as("strategy"), col("mse")))
      .unionAll(mseReg.select(lit("regression").as("strategy"), col("mse")))
    all.withColumn("rank",
      row_number().over(Window.orderBy(asc("mse"), asc("strategy"))).cast("bigint"))
  }

  /** find_imputation_variance (ref L556): three deterministic imputations per
    * variable; variance of per-dataset means (continuous) / per-dataset class
    * entropy (categorical). */
  def impVariance(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    val ac = cents(col("c_acctbal"), 2)

    // continuous: mean-, median-, and nation-group-mean-imputed datasets
    val meanStat = mc.agg(
      floor((sum(ac).cast("double") / count(col("c_acctbal"))) + lit(0.5)).cast("bigint").as("_m"))
    val medStat = mc.select(ac.as("_ac"))
      .agg(floor((expr("percentile(_ac, 0.5)")) + lit(0.5)).cast("bigint").as("_m"))
    val gmStat = mc.groupBy("c_nationkey").agg(
      floor((sum(ac).cast("double") / count(col("c_acctbal"))) + lit(0.5)).cast("bigint").as("_gm"))

    def dsMean(imputed: DataFrame): DataFrame =
      // imputed: one BIGINT column _ic (imputed cents); exact mean, 6dp-rounded
      imputed.agg((floor((sum(col("_ic")).cast("double") / (lit(100.0) * count(lit(1)))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("_dm"))

    val m1 = dsMean(mc.crossJoin(broadcast(meanStat)).select(coalesce(ac, col("_m")).as("_ic")))
    val m2 = dsMean(mc.crossJoin(broadcast(medStat)).select(coalesce(ac, col("_m")).as("_ic")))
    val m3 = dsMean(mc.join(broadcast(gmStat), Seq("c_nationkey"), "left")
      .crossJoin(broadcast(meanStat))
      .select(coalesce(ac, col("_gm"), col("_m")).as("_ic")))
    val contVar = m1.unionAll(m2).unionAll(m3)
      .agg((floor((var_samp(col("_dm"))) * lit(1e8) + lit(0.5)) / lit(1e8)).as("imputation_variance"))
      .select(lit("c_acctbal").as("variable"), col("imputation_variance"))

    // categorical: mode-, group-mode-, and ffill/bfill-imputed datasets
    val modeStat = mc.filter(col("c_mktsegment").isNotNull)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("_cnt"))
      .orderBy(desc("_cnt"), asc("c_mktsegment")).limit(1)
      .select(col("c_mktsegment").as("_mode"))
    val gmodeStat = mc.filter(col("c_mktsegment").isNotNull)
      .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("_cnt"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("c_nationkey").orderBy(desc("_cnt"), asc("c_mktsegment"))))
      .filter(col("_rn") === 1)
      .select(col("c_nationkey"), col("c_mktsegment").as("_gmode"))

    def entropy(ds: DataFrame): DataFrame =
      // ds: one string column _v; entropy = ln N − Σ c·ln c / N, 6dp-rounded
      ds.groupBy("_v").agg(count(lit(1)).as("_c"))
        .agg((floor((log(sum(col("_c")).cast("double"))
            - sum(col("_c").cast("double") * log(col("_c").cast("double")))
              / sum(col("_c")).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("_ent"))

    val e1 = entropy(mc.crossJoin(broadcast(modeStat))
      .select(coalesce(col("c_mktsegment"), col("_mode")).as("_v")))
    val e2 = entropy(mc.join(broadcast(gmodeStat), Seq("c_nationkey"), "left")
      .crossJoin(broadcast(modeStat))
      .select(coalesce(col("c_mktsegment"), col("_gmode"), col("_mode")).as("_v")))
    val e3 = entropy(
      FfillBfill.ffillThenBfill(mc, "c_custkey", Seq("c_mktsegment"))
        .select(col("c_mktsegment").as("_v")))
    val catVar = e1.unionAll(e2).unionAll(e3)
      .agg((floor((var_samp(col("_ent"))) * lit(1e8) + lit(0.5)) / lit(1e8)).as("imputation_variance"))
      .select(lit("c_mktsegment").as("variable"), col("imputation_variance"))

    contVar.unionAll(catVar)
  }

  /** Rubin's rules pooling across m=3 imputed datasets (the natural
    * completion of find_imputation_variance, ref L556): pooled estimate
    * Q̄ = mean of per-dataset means, within-imputation variance W̄ = mean of
    * the per-dataset variances OF the mean (s²/n), between-imputation
    * variance B = sample variance of the means, total T = W̄ + (1+1/m)·B.
    *
    * Scale shape: each imputed dataset contributes ONE distributed moment
    * pass (n, Σc, Σc² over exact integer cents — map-side partials, 1-row
    * reduce); the three 1-row frames chain-crossJoin in a FIXED order so
    * every double op runs in one deterministic projection — no
    * order-dependent double aggregation anywhere. */
  def impPool(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    val ac = cents(col("c_acctbal"), 2)

    val meanStat = mc.agg(
      floor((sum(ac).cast("double") / count(col("c_acctbal"))) + lit(0.5)).cast("bigint").as("_m"))
    val medStat = mc.select(ac.as("_ac"))
      .agg(floor((expr("percentile(_ac, 0.5)")) + lit(0.5)).cast("bigint").as("_m"))
    val gmStat = mc.groupBy("c_nationkey").agg(
      floor((sum(ac).cast("double") / count(col("c_acctbal"))) + lit(0.5)).cast("bigint").as("_gm"))

    // one exact-integer moment pass per imputed dataset (c² ≤ 1e12 keeps the
    // Σc² sum far inside BIGINT at any n the 1-row reduce will ever see)
    def moments(imputed: DataFrame, i: Int): DataFrame =
      imputed.agg(count(lit(1)).as(s"n$i"), sum(col("_ic")).as(s"sc$i"),
        sum(col("_ic") * col("_ic")).as(s"sc2$i"))

    val m1 = moments(mc.crossJoin(broadcast(meanStat))
      .select(coalesce(ac, col("_m")).as("_ic")), 1)
    val m2 = moments(mc.crossJoin(broadcast(medStat))
      .select(coalesce(ac, col("_m")).as("_ic")), 2)
    val m3 = moments(mc.join(broadcast(gmStat), Seq("c_nationkey"), "left")
      .crossJoin(broadcast(meanStat))
      .select(coalesce(ac, col("_gm"), col("_m")).as("_ic")), 3)

    // identical formula text in OracleSql — bitwise-equal doubles from
    // identical integer operands
    def q(i: Int) = col(s"sc$i").cast("double") / (lit(100.0) * col(s"n$i").cast("double"))
    def u(i: Int) = {
      val sd = col(s"sc$i").cast("double") / 100.0
      ((col(s"sc2$i").cast("double") / 10000.0 - sd * sd / col(s"n$i").cast("double"))
        / (col(s"n$i").cast("double") - 1.0)) / col(s"n$i").cast("double")
    }
    val qbar = (q(1) + q(2) + q(3)) / 3.0
    val b = ((q(1) - qbar) * (q(1) - qbar) + (q(2) - qbar) * (q(2) - qbar)
      + (q(3) - qbar) * (q(3) - qbar)) / 2.0
    val w = (u(1) + u(2) + u(3)) / 3.0
    m1.crossJoin(m2).crossJoin(m3).select(
      lit("c_acctbal").as("variable"), lit(3L).as("m"),
      (floor((qbar) * lit(1e8) + lit(0.5)) / lit(1e8)).as("qbar"),
      (floor((w) * lit(1e8) + lit(0.5)) / lit(1e8)).as("within_var"),
      (floor((b) * lit(1e8) + lit(0.5)) / lit(1e8)).as("between_var"),
      (floor((w + lit(1.0 + 1.0 / 3.0) * b) * lit(1e8) + lit(0.5)) / lit(1e8)).as("total_var"))
  }

  /** Data-quality constraint report: one row per declared check with row
    * and violation counts. Scalar range/null/set checks for a table ride
    * ONE conditional-aggregation pass over its scan (sum(CASE WHEN)
    * map-side partials — adding a check adds a column, not a job);
    * referential integrity is a left-anti join that shuffles only the FK
    * key column; uniqueness is a count-over-cardinality aggregate. Every
    * output is an exact integer, trivially hash-checkable. */
  def dqCheck(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataQuality
    val li = Tables(s, dir, "lineitem")
    val o = Tables(s, dir, "orders")
    DataQuality.scalarChecks(li, Seq(
        "lineitem_quantity_range" -> !col("l_quantity").between(1.0, 50.0),
        "lineitem_discount_range" -> (col("l_discount") < 0.0 || col("l_discount") > 0.1),
        "lineitem_shipdate_not_null" -> col("l_shipdate").isNull))
      .unionAll(DataQuality.scalarChecks(o, Seq(
        "orders_totalprice_positive" -> (col("o_totalprice") <= 0.0),
        "orders_status_domain" -> !col("o_orderstatus").isin("F", "O", "P"))))
      .unionAll(DataQuality.fkCheck("lineitem_fk_orders",
        li, "l_orderkey", o, "o_orderkey"))
      .unionAll(DataQuality.uniqueCheck("customer_custkey_unique",
        Tables(s, dir, "customer"), "c_custkey"))
  }

  /** Z-order layout audit: Morton-interleave (customer, order-day) with
    * [[graft.sources.Sources.zValue]] (the writeZOrdered clustering key —
    * pure codegen bit arithmetic) and report each 64-bucket z-range's row
    * count and per-dimension bounding box — the min/max statistics parquet
    * would carry per file after a z-ordered write, i.e. the data-skipping
    * evidence itself, now hash-checked cross-engine (the oracle replays
    * the identical generated shift/and/or chain). zValue places the FIRST
    * key's bits at odd positions, so (a=y, b=x) yields x at even bits. */
  def layoutZorder(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders").select(
      pmod(col("o_custkey"), lit(1024L)).as("x"),
      pmod(expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"),
        lit(1024L)).as("y"))
    o.withColumn("z", graft.sources.Sources.zValue(col("y"), col("x"), 10))
      .groupBy(shiftright(col("z"), 14).as("z_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
  }

  /** Embedding-health audit: per-label norm profile (zero vectors, NaN
    * components, min/mean/max L2 norm) — the cheap encoder-failure screen
    * that runs BEFORE centroid-based scoring (a zero or NaN vector
    * poisons every cosine downstream). Norms quantize to integer 1e-6
    * units so the label-level sums are order-free; one label-keyed
    * aggregation, corpus streams once. */
  def embedNormAudit(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("label"),
        floor((sqrt(graft.functions.VectorFunctions.dot(
          toDouble(col("embedding")), toDouble(col("embedding")))) * 1e6) + lit(0.5))
          .cast("bigint").as("_nq"),
        size(filter(col("embedding"), x => isnan(x.cast("double"))))
          .cast("bigint").as("_nan"))
      .groupBy("label").agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("_nq") === 0, 1L).otherwise(0L)).as("n_zero"),
        sum(col("_nan")).as("n_nan_components"),
        min(col("_nq")).as("_mn"), max(col("_nq")).as("_mx"),
        sum(col("_nq")).as("_sn"))
      .select(col("label"), col("n_vecs"), col("n_zero"), col("n_nan_components"),
        (col("_mn").cast("double") / 1e6).as("min_norm"),
        (floor((col("_sn").cast("double") / col("n_vecs")) + lit(0.5)).cast("bigint")
          .cast("double") / 1e6).as("mean_norm"),
        (col("_mx").cast("double") / 1e6).as("max_norm"))

  /** Embedding-distribution drift between the even/odd vec_id halves —
    * per-label centroid cosine + max per-dim mean shift
    * ([[graft.similarity.EmbedDrift]]): exact decimal(38) integer algebra
    * until the final divisions. */
  def embedDrift(s: SparkSession, dir: String): DataFrame =
    graft.similarity.EmbedDrift.halfDrift(
      Tables(s, dir, "embeddings"), "vec_id", "embedding", "label")

  /** MMR diversified top-10 (pool 50, λ=0.7) for the vec_id-0 query
    * vector: the distributed relevance stage streams embeddings once;
    * the greedy re-rank is driver-side over the bounded pool
    * ([[graft.similarity.Mmr]]). Rows-only: the greedy recurrence has no
    * ANSI-SQL form; MmrSpec pins the diversification semantics. */
  def embedMmr(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val qv = e.filter(col("vec_id") === 0L)
      .select(toDouble(col("embedding"))).head().getSeq[Double](0).toArray
    graft.similarity.Mmr.select(s, e.filter(col("vec_id") =!= 0L),
      "vec_id", "embedding", qv, pool = 50, k = 10, lambda = 0.7)
  }

  /** Automated-traffic gate: per-user burst statistics (events per active
    * minute, peak single-minute burst) with a bot flag at the burst
    * threshold — the filter a training-data pipeline runs before treating
    * event streams as human behavior. Two keyed aggregations — (user,
    * minute) then user — both map-side partial; the rate is one double
    * division of exact counts (6dp round). Thresholds sit at this
    * corpus's scale (max observed burst is 2/min); production knobs are
    * the same expressions with bigger constants. */
  def eventsBots(s: SparkSession, dir: String): DataFrame = {
    val perMin = Tables(s, dir, "events")
      .select(col("user_id"), expr("ts div 60000000000").as("m"))
      .groupBy("user_id", "m").agg(count(lit(1)).as("c"))
    perMin.groupBy("user_id").agg(
        sum(col("c")).as("n_events"),
        count(lit(1)).as("active_minutes"),
        max(col("c")).as("peak_per_min"))
      .select(col("user_id"), col("n_events"), col("active_minutes"),
        col("peak_per_min"),
        (floor((col("n_events").cast("double") / col("active_minutes")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("events_per_minute"),
        (col("peak_per_min") >= 2).as("bot_flag"))
  }

  /** Deterministic fixed-k sample per source — exactly 10 docs per stratum
    * via the scrambled-key reservoir ([[graft.operators.Sampling
    * .fixedPerStratum]]), re-derivable from ids alone in any engine. */
  def sampleReservoir(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.fixedPerStratum(
        Tables(s, dir, "documents"), "doc_id", "source", k = 10)
      .select(col("doc_id"), col("source"), col("lang"))

  /** Candidate-key discovery: uniqueness ratio of declared key candidates
    * over orders and lineitem — the profiling step before dq_check's
    * uniqueness GATE (ratio 1.0 ⇒ a real key; 0.97 ⇒ a near-key worth a
    * dedup look). Each candidate is one two-phase distinct aggregate at
    * key cardinality; [[graft.operators.DataQuality.keyProfile]] documents
    * `approx_count_distinct` as the extreme-cardinality sketch path. */
  def dqKeys(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataQuality
    val o = Tables(s, dir, "orders")
    val li = Tables(s, dir, "lineitem")
    DataQuality.keyProfile("orders(o_orderkey)", o, Seq("o_orderkey"))
      .unionAll(DataQuality.keyProfile("orders(o_custkey)", o, Seq("o_custkey")))
      .unionAll(DataQuality.keyProfile("orders(o_custkey,o_orderdate)", o,
        Seq("o_custkey", "o_orderdate")))
      .unionAll(DataQuality.keyProfile("lineitem(l_orderkey,l_linenumber)", li,
        Seq("l_orderkey", "l_linenumber")))
      .unionAll(DataQuality.keyProfile("lineitem(l_partkey,l_suppkey)", li,
        Seq("l_partkey", "l_suppkey")))
  }

  /** Functional-dependency audit: does the left side determine the right?
    * Three plausible-sounding FDs, all of which this synthetic generator
    * breaks (unlike dbgen, it draws returnflag and linestatus
    * independently — itself a fact worth a report row) — the shape
    * schema-inference and anomaly tooling runs over candidate dimension
    * hierarchies. One lhs-cardinality groupBy per FD, exact integers
    * out. */
  def dqFd(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataQuality
    val o = Tables(s, dir, "orders")
    val li = Tables(s, dir, "lineitem")
    DataQuality.fdCheck("o_custkey->o_orderpriority", o,
        Seq("o_custkey"), "o_orderpriority")
      .unionAll(DataQuality.fdCheck("l_orderkey->l_returnflag", li,
        Seq("l_orderkey"), "l_returnflag"))
      .unionAll(DataQuality.fdCheck("l_returnflag->l_linestatus", li,
        Seq("l_returnflag"), "l_linestatus"))
  }

  /** Per-source corpus scorecard: the curation dashboard row a mixing
    * recipe ([[graft.operators.CorpusMix]]) is tuned against — volume,
    * length profile, short-doc rate, language spread per source. ONE
    * source-keyed aggregation with map-side partials; ratios are 6dp
    * divisions of exact integers. */
  def corpusScorecard(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("bigint").as("_tok"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("_tok")).as("_st"),
        sum(col("n_chars")).as("_sc"),
        sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("_short"),
        count_distinct(col("lang")).as("n_langs"))
      .select(col("source"), col("n_docs"),
        (floor((col("_st").cast("double") / col("n_docs")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("avg_tokens"),
        (floor((col("_sc").cast("double") / col("n_docs")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("avg_chars"),
        (floor((col("_short").cast("double") / col("n_docs")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("pct_short"),
        col("n_langs"))

  /** Topic mining over the documents corpus: hashed bag-of-words →
    * deterministic k-means → per-cluster top terms
    * ([[graft.text.Topics]]). Rows-only: the Lloyd recurrence has no
    * ANSI-SQL form; TopicsSpec pins that planted vocabularies separate
    * and label themselves. */
  def textTopics(s: SparkSession, dir: String): DataFrame =
    graft.text.Topics.mine(Tables(s, dir, "documents"), "doc_id", "text",
      dim = 64, k = 6, iters = 3, topTerms = 5)

  /** Key-collision audit: dq_keys showed (l_orderkey, l_linenumber) is NOT
    * a key in this generator's lineitem — this report says how bad (dup
    * keys, extra rows) and, crucially, that the collisions carry
    * CONFLICTING payloads (the upsert-must-resolve case, not benign exact
    * copies); orders' real key rides along as the clean control. */
  def dqKeydups(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataQuality
    DataQuality.keyDups("lineitem(l_orderkey,l_linenumber)",
        Tables(s, dir, "lineitem"), Seq("l_orderkey", "l_linenumber"))
      .unionAll(DataQuality.keyDups("orders(o_orderkey)",
        Tables(s, dir, "orders"), Seq("o_orderkey")))
  }

  /** Incremental aggregation: merge pre-aggregated per-(type, day) partial
    * states from disjoint ingest batches into the running summary — the
    * batch face of a mergeable-state pipeline (counts and exact integer
    * cent sums are associative, so merged partials are BITWISE the direct
    * recompute, which is exactly what the oracle verifies). Each batch
    * aggregates map-side before its one shuffle; the merge combines frames
    * that are already day-grain tiny. */
  def aggIncremental(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"),
        cents(col("value"), 4).as("_vc"))
    def partial(batch: DataFrame) = batch.groupBy("event_type", "d")
      .agg(count(lit(1)).as("n_events"), sum(col("_vc")).as("_sc"))
    val stateEven = partial(e.filter(col("d") % 2 === 0))
    val deltaOdd = partial(e.filter(col("d") % 2 === 1))
    stateEven.unionAll(deltaOdd)
      .groupBy("event_type", "d")
      .agg(sum(col("n_events")).as("n_events"), sum(col("_sc")).as("_sc"))
      .select(col("event_type"), col("d"), col("n_events"),
        (col("_sc").cast("double") / 10000.0).as("sum_value"))
  }

  /** SCD-1 merge face: apply the per-customer change batch derived from each
    * customer's LATEST order (status P ⇒ delete, else acctbal := totalprice)
    * to the customer snapshot. The change batch is one custkey-keyed argmax
    * aggregation (lexicographic struct max — no window over raw orders);
    * the merge itself is [[graft.operators.MergeUpsert]]'s single full-outer
    * join, broadcast by AQE when the batch is small. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val snapshot = Tables(s, dir, "customer")
    val changes = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"), col("o_orderstatus"))).as("_m"))
      .select(col("o_custkey").as("c_custkey"),
        when(col("_m.o_orderstatus") === "P", lit("D")).otherwise(lit("U")).as("op"),
        col("_m.o_totalprice").as("c_acctbal"))
    graft.operators.MergeUpsert.merge(snapshot, changes, "c_custkey")
  }

  /** SCD-2 history merge: customers start as one open NONE-status version
    * at day 0; each customer's LATEST order (max-struct idiom, orderkey
    * tie-break) changes their status effective that order's epoch day —
    * closing the open version and opening a new one. Customers who never
    * ordered pass through open and untouched. */
  def mergeScd2(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables(s, dir, "customer")
      .select(col("c_custkey"), lit("NONE").as("status"),
        lit(0L).as("valid_from"), lit(null).cast("bigint").as("valid_to"))
    val upd = Tables(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"),
        col("o_orderstatus"))).as("_m"))
      .select(col("o_custkey").as("c_custkey"),
        col("_m.o_orderstatus").as("status"),
        expr("unix_micros(cast(_m.o_orderdate as timestamp)) div 86400000000").as("eff"))
    graft.operators.Scd2.merge(dim, upd, "c_custkey", "status", "eff")
  }

  /** create_features (ref L140): ffill/bfill impute → one-hot (class-
    * threshold keeps c_mktsegment, drops c_name) → missing flags → MinMax
    * scale of every feature column. */
  def impFeatureMatrix(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    val filled = FfillBfill.ffillThenBfill(mc, "c_custkey", Seq("c_acctbal", "c_mktsegment"))
    val oh = FeatureBuilder.oneHot(filled, "c_mktsegment", "mkt", segments)
    val flagged = oh
      .withColumn("acctbal_flag", when(col("c_custkey") % 7 === 3, 1).otherwise(0))
      .withColumn("seg_flag", when(col("c_custkey") % 11 === 5, 1).otherwise(0))
    val featCols = Seq("c_acctbal", "c_nationkey") ++ segments.map(v => s"mkt_$v") ++
      Seq("acctbal_flag", "seg_flag")
    val scaled = FeatureBuilder.minMaxScale(flagged, featCols)
    val renames = Seq(col("c_acctbal_scaled").as("f_acctbal"), col("c_nationkey_scaled").as("f_nationkey")) ++
      segments.map(v => col(s"mkt_${v}_scaled").as(s"f_mkt_$v")) ++
      Seq(col("acctbal_flag_scaled").as("f_acctbal_flag"), col("seg_flag_scaled").as("f_seg_flag"))
    scaled.select(col("c_custkey") +: renames: _*)
  }

  // ------------------------------------------------------------------ text

  def textTokens(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withTokenCounts(Tables(s, dir, "documents"), "text")
      .select("doc_id", "n_tokens", "n_bpeish")

  /** TRUE BPE token counts from the embedded merge table (graft_bpe_count,
    * a native codegen expression over [[graft.text.Bpe]]) beside the regex
    * approximation — the honest context-window budget. The oracle replays
    * the SAME merge table as a chain of SQL `replace` calls generated from
    * it, so the two faces cannot drift. */
  def textTokensBpe(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(col("doc_id"),
      call_function("graft_bpe_count", col("text")).cast("bigint").as("n_bpe"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("bigint").as("n_bpeish"))

  def textQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withQuality(Tables(s, dir, "documents"), "text")
      .select("doc_id", "n_chars_obs", "n_tokens", "stop_ratio", "alpha_ratio", "quality_score")

  def textLangid(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withLangId(Tables(s, dir, "documents"), "text")
      .select("doc_id", "pred_lang", "lang_score")

  /** Context-window packing: global token offsets over doc_id order (two-pass
    * distributed cumsum) chunked into 512-token windows. */
  def textPack(s: SparkSession, dir: String): DataFrame =
    graft.text.Packing.packWindows(Tables(s, dir, "documents"), "doc_id",
      size(split(col("text"), " ")).cast("bigint"), budget = 512)

  /** End-to-end corpus curation — the composed LLM-data pipeline: quality
    * gate → English-only gate → exact-dedup keep-one-per-content-hash →
    * deterministic 50% thin. Every stage is one of the library's operators;
    * the whole thing stays a single declarative plan (filters fuse into the
    * scan, one shuffle for the content-hash window, sample is a filter). */
  def pipelineCurate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.withLangId(
      TextAnalysis.withQuality(Tables(s, dir, "documents"), "text"), "text")
    val kept = scored.filter(col("quality_score") >= 0.5 && col("pred_lang") === "en")
    val deduped = kept
      .withColumn("_keep", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("_keep"))
    graft.operators.Sampling.uniform(deduped, "doc_id", 0.5)
      .select("doc_id", "source", "n_tokens", "quality_score")
  }

  /** Composed NEAR-dup removal pipeline — the flagship corpus-cleaning
    * flow: MinHash-LSH candidate pairs → exact-Jaccard-verified edges →
    * connected components → keep the lowest doc id per cluster → emit the
    * cleaned corpus with its cluster provenance. Every stage is the
    * already-hardened operator (banded LSH candidates only, union-find
    * below the threshold, HashMin loop above); composing them stays one
    * lineage with shuffles only on band buckets and cluster ids — the
    * near-dup generalization of [[pipelineCurate]]'s exact-hash keep-one.
    * rows-only (hash-family). */
  def pipelineNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val pairs = graft.dedup.MinHash.pairs(docs, "doc_id", "text",
      n = 3, k = 32, bands = 8, threshold = 0.10)
    val clusters = Dedup.connectedComponents(
      docs.select("doc_id"), "doc_id", pairs, "id_a", "id_b")
    // connectedComponents labels every vertex with its component's MIN id,
    // so "keep one per cluster" is a pure narrow filter — re-deriving the
    // min with a window would be a redundant corpus-wide shuffle
    docs.join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), col("source"), col("cluster_id"))
  }

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withFingerprint(Tables(s, dir, "documents"), "text")
      .select("doc_id", "fingerprint")

  /** Corpus collocations by pointwise mutual information (count ≥ 5). */
  def textPmi(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiCollocations(Tables(s, dir, "documents"), "text", minCount = 5)

  /** Winnowing fingerprint summary per document (k=4 grams, w=4 windows). */
  def textWinnow(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withWinnow(Tables(s, dir, "documents"), "doc_id", "text")

  /** MOSS-style near-dup pairs sharing ≥2 winnowing fingerprints. */
  def dedupWinnow(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowPairs(Tables(s, dir, "documents"), "doc_id", "text")

  /** Per-doc top-5 tf-idf terms (sklearn smoothed idf, ln bitwise-matched
    * by the oracle). */
  def textTfidf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopK(Tables(s, dir, "documents"), "doc_id", "text", 5)

  /** Unigram LM (perplexity-proxy) scoring of every document against the
    * corpus's own token distribution; deterministic ordered-fold sum. */
  def textLogprob(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withLogprob(Tables(s, dir, "documents"), "doc_id", "text")

  /** Token-distribution entropy per document — the diversity/repetition
    * quality signal (ordered-fold deterministic doubles). */
  def textEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withEntropy(Tables(s, dir, "documents"), "doc_id", "text")

  /** Hashed-feature linear scoring of every document (the learned-quality-
    * classifier shape, deterministic stand-in weights). */
  def textHashfeat(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withHashScore(Tables(s, dir, "documents"), "doc_id", "text")

  /** PSI drift report between the even- and odd-keyed halves of lineitem
    * prices ($500 bins) — the train-vs-serve distribution monitor. */
  def profileDrift(s: SparkSession, dir: String): DataFrame =
    graft.analytics.Profile.lineitemDrift(s, dir)

  /** Winsorize lineitem prices at the exact [p05, p95] cents percentiles. */
  def clipOutliers(s: SparkSession, dir: String): DataFrame =
    graft.operators.Outliers.winsorize(Tables(s, dir, "lineitem"),
        "l_extendedprice", "price_clip")
      .select("l_orderkey", "l_linenumber", "price_clip")

  /** Nearest-event as-of variant: same frames as asofJoin, nearest in
    * |time| with prior-wins ties. */
  def asofNearest(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val orders = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").as("t"))
    val events = Tables(s, dir, "events")
      .select(col("user_id"), expr("ts div 1000000000").as("t"),
        col("value"), col("event_id"))
      .groupBy("user_id", "t").agg(max_by(col("value"), col("event_id")).as("value"))
    AsOfJoin.nearest(orders, events, "o_custkey", "user_id", "t", "t", Seq("t", "value"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("near_t").as("event_t"), col("near_value").as("event_value"))
  }

  /** RAG chunking: 64-token chunks per document, one row per chunk. */
  def textChunk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunk(Tables(s, dir, "documents"), "doc_id", "text", 64)

  /** Decontamination gate: src0 plays the held-out eval benchmark, every
    * other source is training data; per-doc eval-shingle overlap. */
  def textContamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    TextAnalysis.withContamination(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"), "doc_id", "text")
  }

  /** Cross-doc boilerplate detection: 5-token shingles appearing in ≥3
    * documents, per-doc counts and ratio. */
  def textBoilerplate(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withBoilerplate(Tables(s, dir, "documents"), "doc_id", "text")

  /** Corpus-wide top-20 bigrams — TakeOrderedAndProject over one count
    * shuffle, deterministic (cnt desc, bigram asc) tie-break. */
  def textNgrams(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.topBigrams(Tables(s, dir, "documents"), "text", 20)

  /** Zipf head of the corpus vocabulary: top-40 terms with corpus/document
    * frequency and the rank×freq product — the vocabulary-law sanity check
    * a corpus-health pass renders next to [[textNgrams]]. */
  def textZipf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfHead(Tables(s, dir, "documents"), "doc_id", "text", 40)

  /** Bigram-LM fluency scoring: Σ tf·ln P(w₂|w₁) per doc — one LM order
    * above [[textLogprob]]; word salad with common unigrams but rare
    * transitions scores far lower here. */
  def textBigramLogprob(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withBigramLogprob(Tables(s, dir, "documents"), "doc_id", "text")

  /** PII-style redaction pass over the corpus (emails / URLs / digit runs /
    * blocklist term → sentinel) with per-doc hit counts. */
  def textScrub(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.withScrub(Tables(s, dir, "documents"), "text")
      .select("doc_id", "scrubbed", "n_hits")

  /** Embedding-quality gate: per-label centroid-distance outlier scores
    * with a p95 flag — drop mis-embedded vectors before they poison ANN
    * indexes or dedup thresholds. */
  def embedOutliers(s: SparkSession, dir: String): DataFrame =
    graft.similarity.EmbedOutliers.score(
      Tables(s, dir, "embeddings"), "vec_id", "embedding", "label")

  /** Int8 max-abs quantization of the embedding corpus, exploded to
    * per-component rows for the exact-integer oracle. */
  def embedQuantize(s: SparkSession, dir: String): DataFrame =
    graft.similarity.Quantize.int8Exploded(
      Tables(s, dir, "embeddings"), "vec_id", "embedding")

  // ----------------------------------------------------------------- dedup

  /** Stratified corpus sample: up-weight two sources, thin the rest —
    * deterministic id-arithmetic splitter, reproducible in any engine. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratified(Tables(s, dir, "documents"),
        "doc_id", "source", Map("src0" -> 0.5, "src1" -> 0.25), defaultFraction = 0.1)
      .select("doc_id", "source")

  /** Deterministic 80/10/10 train/val/test assignment over documents — a
    * pure projection on the id bucket, no RNG, no shuffle. */
  def sampleSplit(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.split(Tables(s, dir, "documents"),
        "doc_id", trainFrac = 0.8, valFrac = 0.1)
      .select("doc_id", "source", "split")

  /** Target mixture for [[corpusMix]]: cycle the 20 sources through four
    * weight tiers (1.0 / 0.5 / 0.25 / 0.1) — mirrored literally in the
    * oracle's CASE. */
  val mixWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> Seq(1.0, 0.5, 0.25, 0.1)(i % 4)).toMap

  /** Corpus source-mixing: deterministic down-sample to the target domain
    * mixture (the "data recipe" step of corpus assembly). */
  def corpusMix(s: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusMix.resample(Tables(s, dir, "documents"),
      "doc_id", "source", mixWeights)

  /** Gopher-style per-document repetition signals over the word stream. */
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetition(Tables(s, dir, "documents"), "doc_id", "text")

  /** Incremental ingest dedup: src0 plus a slice of src1 arrive as the new
    * batch against the src≠0 corpus — the src1 slice is already present
    * (caught by the digest anti-join), src0 is novel and kept. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val batch = docs.filter(col("source") === "src0" ||
      (col("source") === "src1" && col("doc_id") % 3 === 0))
    val corpus = docs.filter(col("source") =!= "src0")
    // this face's "batch" is a corpus-proportional slice (it scales with
    // sf), so it takes the graceful-shuffle path, not the broadcast
    // ingest contract
    Dedup.incremental(batch, corpus, "doc_id", "text", smallBatch = false)
  }

  /** Percent-rank feature transform of customer balances — histogram
    * ranks, no global row window. */
  def featRank(s: SparkSession, dir: String): DataFrame =
    FeatureBuilder.percentRank(Tables(s, dir, "customer"),
      "c_custkey", "c_acctbal", 2, "acctbal_pctrank")

  /** Smoothed target encoding of part brand by line-item price: broadcast
    * dimension join, then [[FeatureBuilder.targetEncode]]'s exact-cents
    * shrinkage estimator (m = 20). */
  def featTargetEncode(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part")),
        col("l_partkey") === col("p_partkey"))
    FeatureBuilder.targetEncode(joined, "p_brand", "l_extendedprice",
      scale = 2, smoothing = 20.0, outCol = "price_enc")
  }

  /** Fixed-width discretization histogram: $500 price bins over lineitem.
    * The bin id is exact integer division on cents (`div` truncates, all
    * prices positive) — a single hash-aggregate shuffle over bin
    * cardinality, nothing else. */
  def featBucketize(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .select(cents(col("l_extendedprice"), 2).as("_c"))
      .select(expr("_c div 50000").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_rows"))
      .select(col("bin"), (col("bin") * 500.0).as("bin_lo"), col("n_rows"))

  /** Robust (trimmed-mean) impute: the fill value is the mean of observed
    * balances inside the exact [p05, p95] cents band — outliers don't
    * drag the imputation. Two broadcast scalar stats, then a projection. */
  def impTrimmedMean(s: SparkSession, dir: String): DataFrame = {
    val mc = Tables.maskedCustomer(s, dir)
    val ac = cents(col("c_acctbal"), 2)
    val band = mc.select(ac.as("_ac"))
      .agg(floor((expr("percentile(_ac, 0.05D)")) + lit(0.5)).cast("bigint").as("_lo"),
        floor((expr("percentile(_ac, 0.95D)")) + lit(0.5)).cast("bigint").as("_hi"))
    val stat = mc.select(ac.as("_ac")).crossJoin(broadcast(band))
      .filter(col("_ac") >= col("_lo") && col("_ac") <= col("_hi"))
      .agg(floor((sum(col("_ac")).cast("double") / count(lit(1))) + lit(0.5))
        .cast("bigint").as("_m"))
    mc.crossJoin(broadcast(stat))
      .select(col("c_custkey"),
        coalesce(col("c_acctbal"), col("_m").cast("double") / 100.0).as("acctbal_imp"))
  }

  /** Skew-detection face: parts whose lineitem frequency exceeds 3× the
    * mean part frequency — exact-integer comparison, scale-invariant. */
  def hotKeys(s: SparkSession, dir: String): DataFrame =
    graft.operators.SkewTools.hotKeysRelative(
      Tables(s, dir, "lineitem"), "l_partkey", factor = 3L)

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables(s, dir, "documents"), "doc_id", "text")

  def dedupJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables(s, dir, "documents"), "doc_id", "text", "source",
      n = 3, threshold = 0.10)

  /** Subset/quotation duplication: containment pairs (|A∩B|/|A| over
    * 3-shingle sets, smaller side first) — catches a short doc embedded in
    * a longer one, which Jaccard structurally cannot see. */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables(s, dir, "documents"), "doc_id", "text", "source",
      n = 2, threshold = 0.30)

  /** Duplicated-SPAN detection (the Lee et al. 2022 suffix-array family,
    * relational form): verbatim runs of ≥ 20 tokens shared between two
    * otherwise-distinct documents, with exact 0-based token offsets —
    * the duplication Jaccard and containment both miss. Shuffles on the
    * repeated-shingle key and (pair, diagonal) only. */
  def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    Dedup.substringSpans(Tables(s, dir, "documents"), "doc_id", "text",
      k = 8, minSpanTokens = 20)

  /** Span-dedup APPLIED: strip every verbatim ≥ 20-token run from the
    * higher doc id (keep-first-copy — exactly one copy of each
    * duplicated span survives corpus-wide) and emit the cleaned corpus
    * with per-doc removal stats — the ACTION half of dedup_substring's
    * find (Lee et al. 2022 deduplicate by REMOVING spans, not just
    * reporting them). Pure strings + bigints, so the face hash-matches
    * the DuckDB oracle exactly. */
  def dedupStripSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.stripSpans(Tables(s, dir, "documents"), "doc_id", "text",
      k = 8, minSpanTokens = 20)

  /** Within-document duplicated spans (self-repetition ≥ 20 tokens —
    * pasted boilerplate, template stutter, generation loops). Empty on
    * this synthetic corpus (documents carry no internal repeats — itself
    * a verified property); the spec proves the operator on planted
    * repeats and periodic text. */
  def dedupSubstringSelf(s: SparkSession, dir: String): DataFrame =
    Dedup.selfSpans(Tables(s, dir, "documents"), "doc_id", "text",
      k = 8, minSpanTokens = 20)

  /** Duplicate clusters: connected components over the near-dup Jaccard
    * pairs; every document gets the min doc_id of its component (singletons
    * keep their own id). Oracle: DuckDB recursive-CTE transitive closure. */
  def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", "source",
      n = 3, threshold = 0.10)
    Dedup.connectedComponents(docs.select("doc_id"), "doc_id", pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("cluster_id"))
  }

  /** Duplication report: histogram of near-dup cluster sizes (size 1 =
    * unique docs) — the corpus-health summary a curation run reads first.
    * Two tiny aggregations over the CC labels. */
  def dedupStats(s: SparkSession, dir: String): DataFrame =
    dedupCluster(s, dir)
      .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))

  /** Label-blocked exact cosine near-dup pairs. The blocked face is
    * oracle-checkable but quadratic per block, so it runs through the
    * guarded generator: execution fails fast (pointing at
    * AnnLsh.selfPairs) if any block outgrows the bound. */
  def dedupEmbed(s: SparkSession, dir: String): DataFrame =
    graft.similarity.AnnLsh.blockedSelfPairs(
      Tables(s, dir, "embeddings"), "vec_id", "embedding", "label", minCos = 0.35)

  /** Semantic duplicate clusters: connected components over the
    * embedding-cosine near-dup pairs — same CC engine as dedup_cluster,
    * composed over a different pair generator. */
  def embedCluster(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    Dedup.connectedComponents(e.select(col("vec_id")), "vec_id",
        dedupEmbed(s, dir), "id_a", "id_b")
      .select(col("id").as("vec_id"), col("cluster_id"))
  }

  // ------------------------------------------------------------ similarity

  /** Brute-force cosine top-k via the native bounded-heap `graft_topk`
    * aggregate: map-side partial top-k per partition, then a k·P-row merge —
    * never a per-query global sort (see [[graft.similarity.AnnLsh.topK]]). */
  def annTopk(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    graft.similarity.AnnLsh.bruteTopK(e, e.filter(col("vec_id") % 97 === 0),
        "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Radius similarity search: all candidates with cosine ≥ 0.30 of each
    * query vector — pure broadcast-join + filter, no window. */
  def annRange(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    graft.similarity.AnnLsh.rangeSearch(e, e.filter(col("vec_id") % 97 === 0),
      "vec_id", "embedding", minCos = 0.30)
  }

  /** Last-touch marketing attribution: every purchase is credited to the
    * same user's latest preceding view/click. Pure composition of the
    * as-of join over two filtered faces of the event stream — one
    * user-keyed shuffle, no per-user event-list collection. Ties at one
    * timestamp are pre-collapsed deterministically (max event_id wins),
    * mirroring the oracle's arg_max. */
  def eventsAttribution(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val e = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("t"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("t"))
    val touches = e.filter(col("event_type").isin("view", "click"))
      .groupBy("user_id", "t")
      .agg(max(col("event_id")).as("touch_id"),
        max_by(col("event_type"), col("event_id")).as("touch_type"))
    AsOfJoin.latestPrior(purchases, touches, "user_id", "user_id", "t", "t",
        Seq("t", "touch_id", "touch_type"))
      .select(col("purchase_id"), col("user_id"), col("t").as("purchase_t"),
        col("asof_t").as("touch_t"), col("asof_touch_id").as("touch_id"),
        col("asof_touch_type").as("touch_type"),
        (col("t") - col("asof_t")).as("gap_sec"))
  }

  /** As-of join: each order matched to the user's latest event at or before
    * the order date — union+window algorithm, one shuffle on the key.
    * Oracle: DuckDB's native ASOF LEFT JOIN. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    // o_orderdate is TIMESTAMP_NTZ; session is UTC, so the cast's epoch
    // equals DuckDB's naive epoch_ms
    val orders = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000").as("t"))
    val events = Tables(s, dir, "events")
      .select(col("user_id"), expr("ts div 1000000000").as("t"),
        col("value"), col("event_id"))
      .groupBy("user_id", "t").agg(max_by(col("value"), col("event_id")).as("value"))
    AsOfJoin.latestPrior(orders, events, "o_custkey", "user_id", "t", "t", Seq("t", "value"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("asof_t").as("event_t"), col("asof_value").as("event_value"))
  }

  // ------------------------------------------------------------ multimodal

  def mmBinary(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast("bigint").as("n_bytes"),
        sha2(col("text"), 256).as("digest"))

  /** Binary-payload dedup: group identical payloads by content digest —
    * the multimodal face of exact dedup (images/audio dedup by bytes,
    * never by decoding). One digest-keyed shuffle with map-side partials;
    * the payload itself never shuffles. */
  def mmDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    Multimodal.asBinaryTable(Tables(s, dir, "documents"), "doc_id", "text")
      .groupBy("digest")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
        min("n_bytes").as("n_bytes"))
  }

  /** Multimodal NEAR-dup: perceptual aHash over the (stub-) decoded 8×8
    * grid, then the SimHash pigeonhole candidate join — catches re-encoded
    * / slightly-edited media that mm_dedup's exact digest cannot.
    * The block-combination width is derived from corpus cardinality
    * exactly as [[dedupSimhash]]'s is ([[graft.dedup.SimHash
    * .adaptiveBlocks]]): the hamming-8 radius stays exact at every scale
    * while the bucket count per combinatorial step grows with the corpus
    * — fixed d=1 would freeze this face at 64/(8+1)=7-bit chunks (128
    * buckets per chunk forever), the same super-linear saturation law
    * the text face already escaped. Rows-only (the decoder is the
    * sandbox stub). */
  def mmPhash(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.{Multimodal, StubDecoder}
    val docs = Tables(s, dir, "documents")
    val bin = Multimodal.asBinaryTable(docs, "doc_id", "text")
    val hashed = Multimodal.withPerceptualHash(bin, StubDecoder)
      .select("doc_id", "phash")
    // regime switch (SimHash.pairsFromFingerprintsAdaptive): exact
    // pigeonhole until the block-combination geometry saturates (~5M
    // media at h=8), then permuted-mask tables at measured probabilistic
    // recall — never the 0.061-recall radius truncation. Cardinality is
    // the session-cached stat: zero count jobs per execution.
    graft.dedup.SimHash.pairsFromFingerprintsAdaptive(hashed, "doc_id", "phash",
        maxHamming = 8, n = Tables.cachedCount(s, dir, "documents"))
      .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
  }

  /** Binary payload → partition-parallel (stub) decode; rows-only check. */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.{Multimodal, StubDecoder}
    val bin = Multimodal.asBinaryTable(Tables(s, dir, "documents"), "doc_id", "text")
    Multimodal.decodeFeatures(bin, StubDecoder, 16)
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        element_at(col("features"), 1).cast("double").as("f0"))
  }

  // ------------------------------------------------- rows-only (model/hash)

  /** Deterministic shuffled sharding of the corpus into 8 equal shards
    * with engine-portable pseudo-random within-shard order — the
    * reproducible training-export shuffle. One shard-keyed shuffle. */
  def corpusShuffle(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.shuffledShards(
        Tables(s, dir, "documents").select("doc_id", "source"), "doc_id", 8)
      .select(col("doc_id"), col("source"), col("shard"), col("pos"))

  /** Per-user lag/rolling features over the event stream — the standard
    * windowed feature-engineering shape for sequence models. ONE shuffle on
    * user_id serves every window (lag-1, lag-2, delta, trailing-3 mean);
    * ordering key (t, event_id) is unique so every function is
    * deterministic, and the moving average divides a 3-element exact
    * integer sum. Always partitioned — never a global window (PlanLint
    * enforces this for every query). */
  def featLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    val w3 = w.rowsBetween(-2, 0)
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("t"), col("value"),
        cents(col("value"), 4).as("_vc"))
      .select(col("event_id"), col("user_id"), col("t"), col("value"),
        lag(col("value"), 1).over(w).as("lag1"),
        lag(col("value"), 2).over(w).as("lag2"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta1"),
        (sum(col("_vc")).over(w3).cast("double")
          / (count(lit(1)).over(w3) * 10000).cast("double")).as("ma3"))
  }

  /** Image-resize face over the binary table: partition-parallel stub
    * re-encode to 64×48, digest of the resized payload — rows-only (codec
    * stub; spec recomputes sequentially). */
  def mmResize(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.{Multimodal, StubDecoder}
    val bin = Multimodal.asBinaryTable(
      Tables(s, dir, "documents").limit(500), "doc_id", "text")
    Multimodal.resized(bin.select("doc_id", "payload"), StubDecoder, 64, 48)
      .select("doc_id", "width", "height", "n_bytes", "digest")
  }

  /** Video frame-sampling face: split payloads into 512-byte "frames"
    * executor-side, keep every 2nd, roll up per-doc frame count and
    * distinct-frame count — rows-only (stub framing; spec recomputes). */
  def mmFrames(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.{Multimodal, StubDecoder}
    val bin = Multimodal.asBinaryTable(
      Tables(s, dir, "documents").limit(500), "doc_id", "text")
    Multimodal.sampleFrames(bin.select("doc_id", "payload"), StubDecoder,
        frameBytes = 512, everyN = 2)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("frame_digest")).as("n_distinct_frames"))
  }

  /** Compression-ratio quality signal (Gopher-style): zlib-deflated length
    * over raw UTF-8 length per document via the native codegen'd
    * `graft_deflate_len` (no SQL engine can express deflate → rows-only;
    * the spec recomputes with java.util.zip). Repetitive/boilerplate docs
    * score low, natural prose sits near ~0.4–0.7. Zero shuffle. */
  def textCompress(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      octet_length(col("text")).as("n_bytes"),
      expr("graft_deflate_len(text)").as("deflate_len"),
      (floor((expr("graft_deflate_len(text)").cast("double")
        / octet_length(col("text")).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("compress_ratio"))

  /** ALS matrix-completion impute over the (user × event_type) mean-value
    * matrix: cells masked by a deterministic modulo rule are recovered
    * from the rank-4 factorization of the observed cells — model-based,
    * rows-only (float factor iteration). */
  def impAls(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg((sum(cents(col("value"), 4)).cast("double") / 10000.0).as("_mv"))
      .withColumn("_ci", abs(hash(col("event_type"))) % 1000)
      .withColumn("value",
        when((col("user_id") + col("_ci")) % 11 === 3, lit(null).cast("double"))
          .otherwise(col("_mv")))
    graft.imputer.AlsImpute.complete(cells
        .select(col("user_id"), col("_ci").as("type_idx"), col("value")),
      "user_id", "type_idx", "value", "value_imp", rank = 4, maxIter = 5)
      .select(col("user_id"), col("type_idx"), col("value_imp"))
  }

  /** MLlib decision-tree imputation through the full SparkImputer API
    * (per-column pipelines, simulation split) — model-based, rows-only. */
  def impMlTree(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.DecisionTreeClassifier
    import org.apache.spark.ml.regression.DecisionTreeRegressor
    val mc = Tables.maskedCustomer(s, dir)
    val imp = new SparkImputer(idCol = "c_custkey",
      categorical = Seq("c_mktsegment", "c_name"), classThreshold = 30)
    imp.fitTransform(mc, new DecisionTreeClassifier(), new DecisionTreeRegressor())
      .select(col("c_custkey"),
        col("c_acctbal").as("acctbal_imp"), col("c_mktsegment").as("seg_imp"))
  }

  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    graft.dedup.MinHash.pairs(Tables(s, dir, "documents"), "doc_id", "text",
      n = 3, k = 32, bands = 8, threshold = 0.10)

  /** Incremental NEAR-dup workflow face: persist the band index over the
    * standing corpus (everything but src0), then find every near-dup pair
    * the src0 ingest batch introduces — against the index AND within the
    * batch — without rescanning corpus text. Rows-only (MinHash hash
    * family has no SQL form); the spec pins equivalence to corpus-wide
    * [[graft.dedup.MinHash.pairs]] restricted to batch-touching pairs. */
  def dedupNearIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_neardup_idx_" +
      math.abs(dir.hashCode).toString
    graft.dedup.MinHash.writeBandIndex(docs.filter(col("source") =!= "src0"),
      "doc_id", "text", path, n = 3, k = 32, bands = 8, threshold = 0.10)
    // the src0 "batch" is corpus-proportional (scales with sf):
    // smallBatch=false drops the broadcast hints for graceful shuffles
    graft.dedup.MinHash.pairsIncremental(s, path,
      docs.filter(col("source") === "src0"), "doc_id", "text",
      smallBatch = false)
  }

  /** Incremental HAMMING-family ingest over the persisted fingerprint
    * index ([[graft.dedup.FingerprintIndex]] — the dedup_near_incremental
    * pattern applied to simhash/phash): the non-src0 corpus builds the
    * index once (simhash fingerprints, pinned adaptive geometry), the
    * src0 slice probes it — every hamming-≤7 pair touching the batch,
    * with the corpus side a clustered narrow keys scan, never a corpus
    * re-fingerprint. The batch is corpus-proportional (scales with sf) so
    * smallBatch=false drops the broadcast hints for graceful shuffles.
    * Rows-only (the hash family has no SQL form); the spec pins probe ≡
    * corpus-wide pairs restricted to batch-touching. */
  def dedupFpIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val fps = docs.select(col("doc_id"),
      graft.dedup.SimHash.simhash64(split(col("text"), " "), 42L).as("fp"))
    // unique scratch dir per run (the bench protocol runs the face 4+
    // times a session, possibly concurrently) + finally-delete — the
    // annIndexRecall tmpdir-hygiene contract
    val path = java.nio.file.Files.createTempDirectory("graft_fp_idx").toString
    try {
      graft.dedup.FingerprintIndex.write(fps.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "fp", path)
      // eager checkpoint: the returned plan must read nothing from the
      // scratch index once the finally-delete has run
      graft.dedup.FingerprintIndex.pairsIncremental(s, path,
          fps.filter(col("doc_id") % 5 === 0), "doc_id", "fp",
          smallBatch = false)
        .localCheckpoint()
    } finally {
      // LOCAL FileSystem explicitly: the scratch dir is a java.nio local
      // tempdir, and on a cluster the default FS (HDFS) would mis-resolve
      // the bare path
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
    }
  }

  /** Estimator-quality audit for the dedup family — the ann_recall
    * pattern applied to MinHash: precision/recall of the banded MinHash
    * pair finder against the EXACT prefix-filter Jaccard ground truth at
    * the same threshold. The honest answer to "what does LSH banding
    * miss on THIS corpus" — the number you tune k/bands against before
    * trusting approximate dedup at 100 TB. Pair sets never collect: the
    * overlap is one equality join on (id_a, id_b) and three 1-row
    * aggregates broadcast together. Rows-only (MinHash hash family has
    * no SQL form); the spec pins the set algebra. */
  def dedupRecall(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    // ONE shingle scan feeds BOTH generators: the exact prefix-filter
    // ground truth and the banded MinHash finder consume the same
    // lazily-checkpointed (id, block, sh) frame — previously each
    // re-tokenized the corpus (the face's curve is its components' sum;
    // this removes the duplicated scan term, measured in CurveProfile)
    val sh = Dedup.shingleFrame(docs, "doc_id", "text", "source", n = 3)
      .localCheckpoint(eager = false)
    val exact = Dedup.jaccardPairsFromShingles(sh, threshold = 0.10)
      .select(col("id_a"), col("id_b")).localCheckpoint(eager = false)
    // MinHash runs corpus-wide; split its finds into within-block (the
    // apples-to-apples recall comparison) and CROSS-block (pairs the
    // source-blocking scheme is structurally blind to — running the audit
    // on this corpus surfaced 24 of them at sf0.01, an honest measure of
    // what blocking trades away)
    val mh = graft.dedup.MinHash.pairsFromShingles(
        sh.select(col("id"), col("sh")), k = 32, bands = 8, threshold = 0.10)
      .select(col("id_a"), col("id_b"))
      .join(src.select(col("doc_id").as("id_a"), col("source").as("_sa")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("_sb")), "id_b")
      .localCheckpoint(eager = false)
    val within = mh.filter(col("_sa") === col("_sb")).select("id_a", "id_b")
      .localCheckpoint(eager = false)
    val both = exact.join(within, Seq("id_a", "id_b"))
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(within.agg(count(lit(1)).as("n_minhash_within"))))
      .crossJoin(broadcast(
        mh.filter(col("_sa") =!= col("_sb")).agg(count(lit(1)).as("n_cross_block"))))
      .crossJoin(broadcast(both.agg(count(lit(1)).as("n_both"))))
      .select(col("n_exact"), col("n_minhash_within"), col("n_cross_block"),
        col("n_both"),
        (floor((col("n_both").cast("double") / col("n_minhash_within")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("precision"),
        (floor((col("n_both").cast("double") / col("n_exact")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("recall"))
  }

  /** SimHash near-dup pairs with the pigeonhole geometry DERIVED from
    * corpus cardinality ([[graft.dedup.SimHash.adaptiveBlocks]]): the
    * hamming radius stays at the full 7 at EVERY scale — the generalized
    * block-combination pigeonhole keeps recall exact while multiplying
    * the bucket count per combinatorial step — so the result SET is
    * scale-invariant; only the candidate geometry adapts. ≤8k-doc
    * corpora run the legacy d=1 8-bit chunks bitwise; sf1's 50k docs
    * derive d=2 (C(9,2)=36 combinations of 7-bit block pairs — 2¹⁴
    * buckets instead of the 2⁸ that bent the fixed face 17.5×
    * super-linear). The count is one metadata-cheap parquet job; the
    * (identity) recall of each derived geometry is verified per decade
    * in docs/GEOMETRY_RECALL.json. PAST saturation (~8M docs, where even
    * d=3's key width runs out of buckets) the face routes to the
    * permuted-mask tables ([[graft.dedup.SimHash.pairsAdaptive]]) —
    * occupancy held flat at measured ≥0.9-design recall, replacing the
    * radius-truncation fallback whose measured recall was 0.061. The
    * cardinality is the session-cached stat — zero count jobs per
    * execution. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    graft.dedup.SimHash.pairsAdaptive(docs, "doc_id", "text", maxHamming = 7,
      n = Tables.cachedCount(s, dir, "documents"))
  }

  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    graft.similarity.AnnLsh.lshTopK(e, e.filter(col("vec_id") % 97 === 0),
      "vec_id", "embedding", dim = 64, k = 5, planes = 8, tables = 8)
  }

  /** Scale path of [[embedCluster]]: the SAME connected-components engine
    * over LSH-bucketed pair generation instead of the label-blocked exact
    * join — no block is ever all-pairs. The signature width is DERIVED
    * from corpus cardinality ([[graft.similarity.AnnLsh.adaptivePlanes]]):
    * ≤1k-vector test corpora keep the legacy wide-recall 4 planes
    * bitwise; each corpus doubling adds a plane so buckets grow with rows
    * and the bucket-collision join stays ~linear (the fixed-4-plane face
    * was unmeasurable at sf1 — 16 buckets/table at any size). Recall is
    * HELD as planes grow by margin-aware multi-probe
    * ([[graft.similarity.AnnLsh.adaptiveProbes]]): each vector also
    * probes its lowest-|margin| flip buckets on one side of the candidate
    * join, so per-table collision probability stays ~flat where frozen
    * 16-table recall fell 0.76 → 0.196 across the third-to-fourth decade;
    * the measured per-decade recall (overall and the cos≥0.7 dedup-regime
    * tier, with planted high-cosine pairs so the tier is non-vacuous)
    * lives in docs/GEOMETRY_RECALL.json. */
  def embedClusterLsh(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val n = Tables.cachedCount(s, dir, "embeddings")
    val planes = graft.similarity.AnnLsh.adaptivePlanes(n)
    // the face already paid the count for adaptivePlanes, so it can also
    // assert the broadcast contract for the verify joins: ≤200k 64-dim
    // vectors is ~100MB — model-sized; beyond that AQE decides
    // recall is HELD as planes grow by the measured two-dial law:
    // margin-aware multi-probe up to 4 (cheap, then dominated) plus
    // +8 TABLES per plane past 8 (AnnLsh.adaptiveTables — ProbeSweep:
    // sf1 overall recall 0.737 @ 16 tables → 0.862 @ the derived 24);
    // sf≤0.1 corpora keep the legacy 16-table geometry bitwise.
    // PAST CAP-64 EXHAUSTION (planes > 14, ~1M vectors) the table dial
    // has no affordable answer (tables ∝ (1/p)^planes) — route to the
    // IVF tier: coarse partition + exact within-list pairing, linear in
    // n at fixed list size, recall measured/floored per decade alongside
    // the LSH geometry (docs/GEOMETRY_RECALL.json). Every current
    // testdata decade stays on the LSH side bitwise.
    val pairs =
      if (graft.similarity.AnnLsh.tablesExhausted(planes))
        graft.similarity.AnnIvf.selfPairs(e, "vec_id", "embedding",
          minCos = 0.35, nLists = graft.similarity.AnnIvf.ivfLists(n),
          assign = graft.similarity.AnnIvf.ivfAssign(
            graft.similarity.AnnIvf.ivfLists(n)))
      else graft.similarity.AnnLsh.selfPairs(e, "vec_id", "embedding",
        dim = 64, minCos = 0.35,
        planes = planes, tables = graft.similarity.AnnLsh.adaptiveTables(planes),
        broadcastVectors = n <= 200000L,
        probes = graft.similarity.AnnLsh.adaptiveProbes(planes))
    Dedup.connectedComponents(e.select(col("vec_id")), "vec_id",
        pairs, "id_a", "id_b")
      .select(col("id").as("vec_id"), col("cluster_id"))
  }

  /** The IVF-routed tier of [[embedClusterLsh]] run EXPLICITLY at this
    * decade's derived geometry (the generator the face switches to past
    * the LSH table dial's cap-64 exhaustion, ~1M vectors) — registered
    * as its own face so the routing target has a measured bench curve
    * and a rows-only correctness gate BEFORE any corpus crosses the
    * boundary, exactly like dedup_permuted backs dedup_simhash. Same
    * output shape as embed_cluster_lsh (vec_id, cluster_id); pair recall
    * vs exact ground truth is measured per decade with its own floor in
    * docs/GEOMETRY_RECALL.json. */
  def embedClusterIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val n = Tables.cachedCount(s, dir, "embeddings")
    val nl = graft.similarity.AnnIvf.ivfLists(n)
    val pairs = graft.similarity.AnnIvf.selfPairs(e, "vec_id", "embedding",
      minCos = 0.35, nLists = nl,
      assign = graft.similarity.AnnIvf.ivfAssign(nl))
    Dedup.connectedComponents(e.select(col("vec_id")), "vec_id",
        pairs, "id_a", "id_b")
      .select(col("id").as("vec_id"), col("cluster_id"))
  }

  /** Incremental EMBEDDING near-dup ingest over the persisted IVF index
    * ([[graft.similarity.AnnIndex.pairsIncremental]]) — the embedding
    * member of the incremental-ingest family, completing the triple the
    * digest / band / fingerprint indexes already carry: the standing
    * corpus (vec_id % 13 ≠ 5) trains and persists the layout once, the
    * ingest batch (% 13 = 5, corpus-proportional ⇒ smallBatch=false)
    * probes it — every cosine ≥ 0.35 pair touching the batch, with the
    * corpus side a PARTITION-PRUNED scan of the probed lists, never a
    * corpus re-scan. Precision exact (cosine verify); recall is the
    * measured IVF multi-assign recall (GEOMETRY_RECALL floors).
    * Rows-only (IVF probe has no SQL form); the spec pins precision,
    * planted-pair recall, and fold visibility. Scratch index in a unique
    * tempdir with the finally-delete hygiene contract; the eager
    * checkpoint pins the result before the delete. */
  def embedDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("graft_embinc").toString
    try {
      graft.similarity.AnnIndex.writeIvf(e.filter(!(col("vec_id") % 13 === 5)),
        "vec_id", "embedding", "label", path)
      graft.similarity.AnnIndex.pairsIncremental(s, path,
          e.filter(col("vec_id") % 13 === 5), "vec_id", "embedding",
          minCos = 0.35, nProbe = graft.similarity.AnnIndex.dedupNProbe,
          smallBatch = false)
        .localCheckpoint()
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
    }
  }

  /** Re-aggregatable distinct-count rollup — THE 100 TB pre-aggregation
    * pattern: per-(type, day) HLL sketches are built in one pass (the
    * frame a pipeline would PERSIST as its daily summary table), then the
    * per-type distinct-user estimate merges from the SKETCHES alone —
    * `hll_union_agg` is max-per-register, so the rollup never rescans raw
    * events and is exactly mergeable across any partitioning (unlike
    * `approx_count_distinct`, whose sketch cannot be stored and re-merged
    * from SQL). Estimates are deterministic: datasketches hashing is
    * seed-fixed and union is commutative. Rows-only (DuckDB's sketch
    * family differs); the spec checks the estimate against exact distinct
    * counts. */
  def eventsDistinctRollup(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"), col("user_id"))
      .groupBy("event_type", "d")
      .agg(hll_sketch_agg(col("user_id"), 12).as("_sk"), count(lit(1)).as("_n"))
    daily.groupBy("event_type")
      .agg(
        hll_sketch_estimate(hll_union_agg(col("_sk"))).as("approx_users"),
        sum("_n").as("n_events"), count(lit(1)).as("n_days"))
  }

  /** Re-aggregatable QUANTILE rollup — the percentile twin of
    * [[eventsDistinctRollup]], completing the 100 TB pre-aggregation
    * pattern pair: per-(type, day) KLL sketches of the value stream are
    * built in ONE pass (the frame a pipeline persists as its daily
    * summary), then per-type p50/p95/p99 merge from the SKETCHES alone —
    * `kll_merge_agg_double` is a true sketch union, so the rollup never
    * rescans raw events and re-aggregates exactly across any partitioning
    * (unlike `approx_percentile`/`percentile_approx`, whose sketch cannot
    * be stored and re-merged from SQL). k=200 ⇒ ~1.65% normalized rank
    * error. Rows-only (DuckDB has no KLL; KLL compaction coin-flips are
    * not seed-pinned, so the spec checks the merged estimates against
    * exact percentiles within rank-error bounds, not bitwise). */
  def eventsQuantileRollup(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"),
        col("value").cast("double").as("v"))
      .groupBy("event_type", "d")
      .agg(expr("kll_sketch_agg_double(v, 200)").as("_sk"),
        count(lit(1)).as("_n"))
    daily.groupBy("event_type")
      .agg(expr("kll_sketch_get_quantile_double(kll_merge_agg_double(_sk), " +
          "array(0.5D, 0.95D, 0.99D))").as("_qs"),
        sum("_n").as("n_events"), count(lit(1)).as("n_days"))
      .select(col("event_type"),
        element_at(col("_qs"), 1).as("p50"),
        element_at(col("_qs"), 2).as("p95"),
        element_at(col("_qs"), 3).as("p99"),
        col("n_events"), col("n_days"))
  }

  /** Audience SET ALGEBRA from sketches — the third member of the
    * re-aggregatable rollup family (HLL distinct counts, KLL quantiles,
    * and now Theta set operations): one pass builds a per-event-type
    * Theta sketch of the user audience (the frame a pipeline persists);
    * every ordered type pair then derives |A|, |B|, |A∩B|, |A\B| and the
    * audience Jaccard FROM THE SKETCHES ALONE — `theta_intersection` /
    * `theta_difference` are true set-algebra operators on the stored
    * sketch (HLL unions but can never intersect; exact distinct
    * intersections rescan raw events per pair — at 100 TB that is P
    * pair-scans vs one). The pair join is a broadcast self-join of the
    * 5-row sketch frame. Rows-only (DuckDB has no theta sketches; the
    * spec pins every estimate against exact per-pair distincts within
    * sketch error). */
  def eventsThetaOverlap(s: SparkSession, dir: String): DataFrame = {
    val sk = Tables(s, dir, "events")
      .select(col("event_type"), col("user_id"))
      .groupBy("event_type")
      .agg(expr("theta_sketch_agg(user_id)").as("_sk"))
      .localCheckpoint(eager = false)
    val a = sk.select(col("event_type").as("type_a"), col("_sk").as("_ska"))
    val b = sk.select(col("event_type").as("type_b"), col("_sk").as("_skb"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        expr("theta_sketch_estimate(_ska)").cast("bigint").as("users_a"),
        expr("theta_sketch_estimate(_skb)").cast("bigint").as("users_b"),
        expr("theta_sketch_estimate(theta_intersection(_ska, _skb))")
          .cast("bigint").as("users_both"),
        expr("theta_sketch_estimate(theta_difference(_ska, _skb))")
          .cast("bigint").as("users_only_a"),
        (floor((expr("theta_sketch_estimate(theta_intersection(_ska, _skb))") /
          expr("theta_sketch_estimate(theta_union(_ska, _skb))")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("audience_jaccard"))
  }

  /** N-WAY audience intersection from sketches — the strictest retention
    * cut ("users active on EVERY day"), via `theta_intersection_agg` over
    * the persisted per-(type, day) audience sketches: the daily sketch
    * table is built once (the same frame the other rollups persist) and
    * the always-on audience derives from the sketches alone — exact SQL
    * needs a per-(type, user) distinct-day count over raw events, a scan
    * that grows with history; the sketch path re-aggregates the daily
    * summaries. Below the sketch's 4096 retained entries intersection
    * stays in exact mode, so the face hash-matches the exact SQL at every
    * test scale (oracle registered); production cardinality degrades to
    * the documented estimate. */
  def eventsRetentionSketch(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"),
        col("user_id"))
      .groupBy("event_type", "d")
      .agg(expr("theta_sketch_agg(user_id)").as("_sk"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        expr("theta_sketch_estimate(theta_intersection_agg(_sk))")
          .cast("bigint").as("users_every_day"))
      .select(col("event_type"), col("n_days"), col("users_every_day"))
  }

  /** ANN quality monitoring: recall@5 of the LSH index against the exact
    * brute-force neighbors, per query — the metric a pipeline watches to
    * size planes/tables before trusting an approximate index. Both sides
    * are the registered ann faces; the hit count is a left-semi join on
    * (query, neighbor) and zero-recall queries are preserved. */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val q = e.filter(col("vec_id") % 97 === 0)
    val k = 5
    val brute = graft.similarity.AnnLsh.bruteTopK(e, q, "vec_id", "embedding", k)
      .select("query_id", "neighbor_id")
    // wide-recall config (4 planes × 16 tables) — the synthetic corpus's
    // neighbors sit at low cosine (same regime note as embed_cluster_lsh)
    val lsh = graft.similarity.AnnLsh.lshTopK(e, q, "vec_id", "embedding",
        dim = 64, k = k, planes = 4, tables = 16)
      .select("query_id", "neighbor_id")
    val hits = brute.join(lsh, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    q.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / k).as("recall_at_5"))
  }

  /** Full-vector deterministic k-means over the embedding corpus — the
    * semantic-sharding / coarse-index-training primitive (see
    * [[graft.similarity.KMeans]]: codegen argmin assignment, mergeable
    * vec-avg updates, model-sized driver state). */
  def embedKmeans(s: SparkSession, dir: String): DataFrame =
    graft.similarity.KMeans.assign(Tables(s, dir, "embeddings"),
      "vec_id", "embedding", k = 8, iters = 3)

  /** Distributed PCA of the embedding corpus: one covariance pass, driver
    * eigensolve, broadcast projection to the top-2 axes — rows-only (float
    * accumulation order). */
  def embedPca(s: SparkSession, dir: String): DataFrame =
    graft.similarity.Pca.fitTransform(Tables(s, dir, "embeddings"),
      "vec_id", "embedding", nComponents = 2)

  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    graft.similarity.AnnLsh.ivfTopK(e, e.filter(col("vec_id") % 97 === 0),
      "vec_id", "embedding", listCol = "label", k = 5, nProbe = 3)
  }

  /** IVF-PQ ANN (FAISS-style coarse-prune + residual-code search): label
    * lists prune to 3 probes, residual PQ codes score by ADC — rows-only. */
  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    graft.similarity.Pq.ivfPqTopK(e, e.filter(col("vec_id") % 97 === 0),
      "vec_id", "embedding", listCol = "label", dim = 64,
      m = 8, kCode = 16, iters = 2, nProbe = 3, k = 5)
  }

  /** Product-quantization ANN (the memory-compression scale path): train
    * an 8×16 codebook (2 Lloyd passes), encode the corpus to 8 bytes per
    * vector, ADC top-5 per probe — rows-only (float iteration). */
  def annPq(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val model = graft.similarity.Pq.fit(e, "vec_id", "embedding", dim = 64,
      m = 8, k = 16, iters = 2)
    val encoded = graft.similarity.Pq.encode(e, "vec_id", "embedding", model)
    graft.similarity.Pq.adcTopK(encoded, e.filter(col("vec_id") % 97 === 0),
      "vec_id", "embedding", model, k = 5)
  }

  /** Quality monitoring of the PERSISTED IVF index — recall@5 of
    * [[graft.similarity.AnnIndex.ivfTopK]] serving (partition-pruned scan
    * of the written layout) against exact brute-force, measured BEFORE and
    * AFTER an [[graft.similarity.AnnIndex.append]] of a held-out ingest
    * batch: the number a pipeline's refresh policy watches — a drift-gated
    * append that silently degraded recall would surface here, where
    * ann_recall (the in-memory LSH face) never touches the persisted path.
    * Rows-only (float accumulation order). One train + one append + two
    * (brute, served) query passes; queries are the tiny vec_id%97 sample,
    * so every join broadcasts the query side. The scratch index lives in
    * the driver's tmpdir — a LOCAL-MODE (or shared-filesystem) contract,
    * like the other rows-only index faces; on a real cluster point the
    * index at shared storage. The two recall frames materialize eagerly
    * so the scratch index deletes before this returns (no leak per run). */
  def annIndexRecall(s: SparkSession, dir: String): DataFrame = {
    import graft.similarity.{AnnIndex, AnnLsh}
    val e = Tables(s, dir, "embeddings")
    // deterministic split: the held-out ingest batch an index would see
    // AFTER training (vec_id ≡ 5 mod 13 ≈ 7.7% of the corpus)
    val base = e.filter(!(col("vec_id") % 13 === 5)).localCheckpoint(eager = false)
    val batch = e.filter(col("vec_id") % 13 === 5)
    val q = e.filter(col("vec_id") % 97 === 0)
    val k = 5
    val tmp = java.nio.file.Files.createTempDirectory("graft_annidx")
    val path = tmp.toString
    try {
      AnnIndex.writeIvf(base, "vec_id", "embedding", "label", path)
      def recallOf(phase: String, corpus: DataFrame): DataFrame = {
        val brute = AnnLsh.bruteTopK(corpus, q, "vec_id", "embedding", k)
          .select("query_id", "neighbor_id")
        val served = AnnIndex.ivfTopK(s, path, q, "vec_id", "embedding",
            k = k, nProbe = 3)
          .select("query_id", "neighbor_id")
        // zero-recall queries must stay in the denominator: total hits and
        // total queries aggregate separately, then ride a 1-row crossJoin
        val nh = brute.join(served, Seq("query_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("_nh"))
        q.agg(count(lit(1)).as("_nq")).crossJoin(nh)
          .select(lit(phase).as("phase"), col("_nq").as("n_queries"),
            (col("_nh").cast("double") / (col("_nq") * k)).as("mean_recall_at_5"))
      }
      // each audit is ONE row — eager checkpoints pin the before-audit to
      // the pre-append index state and leave the returned plan reading
      // nothing from the scratch index, so the finally-delete is safe
      val before = recallOf("1_before_append", base).localCheckpoint()
      AnnIndex.append(s, path, batch, "vec_id", "embedding")
      // after the append the index must serve the FULL corpus's truth
      val after = recallOf("2_after_append", e).localCheckpoint()
      before.unionByName(after)
    } finally {
      // recursive delete of the scratch index — tmpdir hygiene is part of
      // the face's contract (the bench protocol runs it 4+ times a session).
      // The scratch dir is a java.nio LOCAL tempdir, so delete through the
      // LOCAL FileSystem explicitly: the default FS on a cluster is HDFS and
      // would resolve the bare path against it — leaking the local scratch
      // every run and deleting any coincidentally same-named HDFS path
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
    }
  }

  /** BPE end-to-end: TRAIN a merge table on the corpus itself
    * ([[graft.text.Bpe.trainFromCorpus]] — distributed word count, bounded
    * driver-side count-greedy merges), then apply it with the native
    * `graft_bpe_count(text, merges)` codegen loop — the production
    * train→count path (text_tokens_bpe applies a FIXED default table).
    * Per-doc trained-BPE token counts plus the untrained baseline, so the
    * compression the learned merges buy is visible in-row. Rows-only
    * (the trained table depends on corpus statistics, not SQL-expressible). */
  def bpeTrainCount(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val merges = graft.text.Bpe.trainFromCorpus(docs, "text",
      numMerges = 256, minCount = 2L, maxVocab = 50000)
    val table = graft.text.Bpe.renderMerges(merges)
    docs.select(col("doc_id"),
      call_function("graft_bpe_count", col("text"), lit(table))
        .cast("bigint").as("n_bpe_trained"),
      call_function("graft_bpe_count", col("text"))
        .cast("bigint").as("n_bpe_default"),
      lit(merges.length).cast("bigint").as("n_merges"))
  }

  /** The SATURATED-REGIME near-dup tier as a first-class face: permuted-
    * mask simhash tables ([[graft.dedup.SimHash.pairsFromFingerprintsPermuted]])
    * at the production-shaped geometry the regime switch would derive past
    * blocked saturation (targetOccupancy=1 forces the occupancy-flat mask
    * width at this corpus — what dedup_simhash/mm_phash actually run at
    * ~32× this cardinality). PRECISION is exact (every emitted pair
    * hamming-verified inside the join stage); RECALL is probabilistic by
    * design — ≥0.9 in expectation from the compounding table count,
    * measured 0.947–0.965 per decade against the exact pigeonhole in
    * docs/GEOMETRY_RECALL.json, whose floor gate fails below 0.8.
    * Summarized per hamming. Rows-only (probabilistic recall has no SQL
    * form; AdaptiveGeometrySpec pins precision, determinism, and the
    * recall law on a planted corpus). */
  def dedupPermuted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val n = Tables.cachedCount(s, dir, "documents")
    val (w, t) = graft.dedup.SimHash.permutedGeometry(n, maxHamming = 7,
      targetOccupancy = 1L)
    val fp = docs.select(col("doc_id").as("id"),
      graft.dedup.SimHash.simhash64(split(col("text"), " "), 42L).as("fp"))
    graft.dedup.SimHash.pairsFromFingerprintsPermuted(fp, "id", "fp",
        maxHamming = 7, maskBits = w, tables = t)
      .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
  }

  /** Fuzzy entity matching over part names: every distinct-name pair within
    * Levenshtein distance 2, found via the lossless q-gram count-filter
    * join (never all-pairs) — see [[graft.operators.FuzzyJoin]]. */
  def fuzzyJoin(s: SparkSession, dir: String): DataFrame =
    graft.operators.FuzzyJoin.namePairs(Tables(s, dir, "part"), "p_name", k = 2, q = 2)

  /** Flesch readability scoring per document (word / sentence / vowel-group
    * syllable counts + reading-ease and grade-level). */
  def textReadability(s: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.withReadability(Tables(s, dir, "documents"), "text")
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch", "fk_grade")
}
