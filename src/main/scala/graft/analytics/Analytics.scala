package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational backbone queries over the TPC-H-ish tables. Declarative
  * DataFrame plans — Catalyst handles pushdown/pruning; small dimension
  * tables are explicitly broadcast so the fact table never shuffles for them.
  *
  * Numeric discipline: monetary/quantity aggregates are summed as integer
  * "cents" (BIGINT) — `floor(x·10^k + 0.5)` per row is exact for fixed-decimal
  * source data — then converted back with a single division. Integer sums are
  * order-independent, so results are bitwise-reproducible across engines and
  * across shuffle orders (a plain double sum of 600k values drifts ~1e-4 with
  * partition order, which would break verification AND reproducibility at
  * 100 TB).
  */
object Analytics {

  /** Exact fixed-point lift: x·10^scale rounded half-up to BIGINT via the
    * cross-engine-exact floor(x+0.5) form (docs/SF1_GATE.md class 1: native
    * round() on doubles disagrees between Spark and DuckDB on grid-boundary
    * values; floor/×/+ are IEEE ops both engines run identically). */
  def cents(c: Column, scale: Int): Column =
    floor((c * math.pow(10, scale)) + lit(0.5)).cast("bigint")

  /** TPC-H Q1-style pricing summary: one shuffle, partial aggregation
    * map-side, group-key cardinality 6. */
  def q1(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(cents(col("l_quantity"), 2)).as("_qc"),
        sum(cents(col("l_extendedprice"), 2)).as("_pc"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("_dpc"),
        sum(cents(col("l_discount"), 4)).as("_dc"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        (col("_qc").cast("double") / 100.0).as("sum_qty"),
        (col("_pc").cast("double") / 100.0).as("sum_base_price"),
        (col("_dpc").cast("double") / 10000.0).as("sum_disc_price"),
        (col("_qc").cast("double") / (lit(100.0) * col("count_order"))).as("avg_qty"),
        (col("_dc").cast("double") / (lit(10000.0) * col("count_order"))).as("avg_disc"),
        col("count_order"))

  /** TPC-H Q3-style revenue per order for one market segment. The
    * customer⋈orders build side is broadcast; the only shuffle is the final
    * aggregation on orderkey. */
  def q3(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    li.join(broadcast(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderpriority")
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("_rc"))
      .select(col("l_orderkey"), col("o_orderpriority"),
        (col("_rc").cast("double") / 10000.0).as("revenue"))
  }

  /** TPC-H Q5-style revenue by nation: region→nation→customer dim chain is
    * built once and broadcast; lineitem is scanned once. */
  def q5(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables(spark, dir, "nation")
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val dims = cust
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("_rc"))
      .select(col("n_name"), (col("_rc").cast("double") / 10000.0).as("revenue"))
  }

  /** TPC-H Q4-style EXISTS: orders with at least one line shipped after the
    * order date, counted per priority. The left-semi join short-circuits on
    * first match and never widens the orders row — THE pattern for
    * existence predicates at scale (a plain join + distinct would shuffle
    * every matching lineitem). */
  def q4(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val l = Tables(spark, dir, "lineitem").select("l_orderkey", "l_shipdate")
    o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q12-style conditional aggregation: one equi-join, then
    * high/low-priority line counts per return flag as map-side
    * sum(CASE WHEN) partials — no second shuffle for the pivot. */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders").select("o_orderkey", "o_orderpriority")
    val l = Tables(spark, dir, "lineitem").select("l_orderkey", "l_returnflag")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
  }

  /** TPC-H Q6-style selective revenue aggregate: every predicate reaches the
    * parquet scan (PushedFilters) and only three columns are read. */
  def q6(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_discount") >= 0.02 && col("l_discount") <= 0.05 &&
        col("l_quantity") < 24)
      .agg(sum(cents(col("l_extendedprice") * col("l_discount"), 4)).as("_rc"),
        count(lit(1)).as("n_rows"))
      .select((col("_rc").cast("double") / 10000.0).as("revenue"), col("n_rows"))

  /** Semi-structured extraction: pull an int out of the JSON `props` column
    * and aggregate — the JSON path evaluates inside codegen, no UDF. */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))

  /** Top-3 orders by totalprice per priority class; deterministic tie-break
    * on orderkey. */
  def topnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
  }

  /** Gap-based sessionization (30-min inactivity) per user. The events
    * table stores TIMESTAMP(NANOS); it is read as raw int64 ns
    * (`spark.sql.legacy.parquet.nanosAsLong=true`) and reduced to exact
    * integer epoch seconds, so ns/µs precision differences can't shift a
    * session boundary. */
  def sessionize(spark: SparkSession, dir: String, gapSec: Long = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("t"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    val cum = Window.partitionBy("user_id").orderBy("t", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    e.withColumn("brk",
        when(col("t") - lag("t", 1).over(w) > gapSec || lag("t", 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum("brk").over(cum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        (max("t") - min("t")).as("duration_sec"),
        sum(cents(col("value"), 2)).as("_vc"))
      .select(col("user_id"), col("session_id"), col("n_events"), col("duration_sec"),
        (col("_vc").cast("double") / 100.0).as("session_value"))
  }

  /** Tumbling 1-hour window aggregation by event type (batch face of the
    * streaming operator in graft.streaming). */
  def eventsWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(
        expr("(ts div 3600000000000) * 3600").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(cents(col("value"), 2)).as("_vc"))
      .select(col("window_start"), col("event_type"), col("n_events"),
        (col("_vc").cast("double") / 100.0).as("sum_value"),
        (col("_vc").cast("double") / (lit(100.0) * col("n_events"))).as("avg_value"))

  /** TPC-H Q14-style promo revenue share: part-keyed join, then ONE
    * aggregation holding both the conditional and total revenue in exact
    * integer 10⁻⁴ units — the ratio is a single double division at the
    * end. */
  def q14(spark: SparkSession, dir: String): DataFrame = {
    val rc = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
    Tables(spark, dir, "lineitem").select(col("l_partkey"), rc.as("_rc"))
      .join(Tables(spark, dir, "part").select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", col("_rc")).otherwise(0L)).as("_promo"),
        sum(col("_rc")).as("_total"))
      .select((lit(100.0) * col("_promo").cast("double") / col("_total").cast("double"))
        .as("promo_revenue_pct"))
  }

  /** Volume-anomaly detection: per-day event counts z-scored against the
    * corpus of days. Moments are exact integer sums (Σc, Σc²) so μ and σ
    * are bitwise-deterministic; the stats ride back as a broadcast 1-row
    * frame and the z-score is a projection. */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("d"))
      .agg(count(lit(1)).as("n_events"))
    // Σc² lifts each square into decimal(38,0) BEFORE multiplying: a day
    // above ~3e9 events would overflow the int64 product silently. The
    // decimal sum stays an exact order-free integer; values below 2^53
    // cast to the identical double the bigint path produced.
    val st = daily.agg(
        sum("n_events").cast("double").as("_s"),
        sum(col("n_events").cast("decimal(19,0)") * col("n_events"))
          .cast("double").as("_ss"),
        count(lit(1)).cast("double").as("_n"))
      .select((col("_s") / col("_n")).as("_mu"),
        sqrt((col("_ss") - col("_s") * col("_s") / col("_n")) / (col("_n") - 1.0)).as("_sigma"))
    daily.crossJoin(broadcast(st))
      .select(col("d"), col("n_events"),
        ((col("n_events").cast("double") - col("_mu")) / col("_sigma")).as("z"))
  }

  /** Day-of-week-adjusted volume anomaly — the seasonal variant of
    * [[eventsAnomaly]]: a quiet Sunday is only anomalous against OTHER
    * Sundays, so each day's z-score is computed against its own weekday's
    * mean/std ((days+4) mod 7 — the eventsHeatmap integer calendar, no
    * locale functions). Two aggregations over the daily frame (days, then
    * 7 weekday rows, broadcast back); exact integer moments, closed-form
    * doubles. A weekday observed once (σ undefined) or with zero variance
    * emits NULL z rather than a fake 0; two observations yield a real
    * df=1 z-score. */
  def eventsAnomalyDow(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("d"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("dow", pmod(col("d") + 4, lit(7L)))
    // same decimal lift as eventsAnomaly: n² must not square in int64
    val st = daily.groupBy("dow").agg(
        sum("n_events").cast("double").as("_s"),
        sum(col("n_events").cast("decimal(19,0)") * col("n_events"))
          .cast("double").as("_ss"),
        count(lit(1)).cast("double").as("_n"))
      .select(col("dow"), (col("_s") / col("_n")).as("_mu"),
        when(col("_n") > 1.0,
          sqrt((col("_ss") - col("_s") * col("_s") / col("_n")) / (col("_n") - 1.0)))
          .as("_sigma"))
    daily.join(broadcast(st), "dow")
      .select(col("d"), col("dow"), col("n_events"),
        when(col("_sigma") > 0.0,
          (floor(((col("n_events").cast("double") - col("_mu")) / col("_sigma")) * lit(1e6) + lit(0.5)) / lit(1e6)))
          .as("z_dow"))
  }

  /** Open-order backlog aging: orders still open ('O') bucketed by age in
    * 90-day bands against the dataset's reference date (max order date —
    * deterministic, no wall clock), with exact integer value totals. One
    * broadcast 1-row anchor, one hash aggregation at bucket cardinality —
    * the receivables-aging shape every ops dashboard carries. */
  def ordersBacklog(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val anchor = o.agg(max(to_date(col("o_orderdate"))).as("_ref"))
    o.filter(col("o_orderstatus") === "O")
      .crossJoin(broadcast(anchor))
      .select(expr("datediff(_ref, to_date(o_orderdate)) div 90").cast("bigint")
          .as("age_bucket"),
        cents(col("o_totalprice"), 2).as("_vc"))
      .groupBy("age_bucket")
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("_vc")).cast("double") / 100.0).as("open_value"))
      .select(col("age_bucket"), (col("age_bucket") * 90).as("age_days_lo"),
        col("n_orders"), col("open_value"))
  }

  /** Day-of-week × hour activity heatmap with per-cell share of total —
    * the usage-rhythm profile. Calendar math stays in INTEGER epoch
    * arithmetic ((days+4) mod 7, epoch-hour mod 24 — identical in any
    * engine; engine `dayofweek`/locale functions vary by timezone
    * semantics), one hash aggregation at 7×24 cardinality, share divides
    * by a broadcast exact total. */
  def eventsHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "events")
      .groupBy(
        expr("pmod(ts div 86400000000000 + 4, 7)").as("dow"),
        expr("pmod(ts div 3600000000000, 24)").as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val tot = cells.agg(sum("n_events").as("_tot"))
    cells.crossJoin(broadcast(tot))
      .select(col("dow"), col("hour"), col("n_events"),
        (floor((col("n_events").cast("double") / col("_tot").cast("double")) * lit(1e8) + lit(0.5)) / lit(1e8))
          .as("share"))
  }

  /** ROBUST per-day volume anomaly scores: modified z against the median
    * and the Median Absolute Deviation (z = (x−med)/(1.4826·MAD)), the
    * outlier-resistant face of [[eventsAnomaly]] — one extreme day inflates
    * a stddev enough to hide the very anomaly being hunted, while the
    * median/MAD pair shrugs it off. Exact `percentile` over the INTEGER
    * daily counts (the tiny pre-aggregated frame), two broadcast scalars,
    * pure projection; 6dp rounding absorbs ulp noise in the constant
    * multiply. Scale path: approx_percentile, same shape. */
  def eventsAnomalyRobust(spark: SparkSession, dir: String): DataFrame =
    robustZDaily(Tables(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("d"))
      .agg(count(lit(1)).as("n_events")))

  /** Generic robust-z face over a pre-aggregated (d, n_events) frame.
    * MAD = 0 (half the days share the median count) yields NULL, guarded
    * in BOTH engines: the floor(x+0.5) rounding idiom is cross-engine-
    * exact only on FINITE inputs — Spark's floor(double) returns LongType
    * (±Inf saturates, NaN → 0) while DuckDB's floor keeps DOUBLE, so an
    * unguarded /0 here would diverge face-from-oracle on degenerate data
    * instead of matching (SF1_GATE "finite-input precondition"). */
  def robustZDaily(daily: DataFrame): DataFrame = {
    val med = daily.agg(expr("percentile(n_events, 0.5)").as("_med"))
    val mad = daily.crossJoin(broadcast(med))
      .select(abs(col("n_events").cast("double") - col("_med")).as("_dev"))
      .agg(expr("percentile(_dev, 0.5)").as("_mad"))
    daily.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .select(col("d"), col("n_events"),
        when(col("_mad") =!= 0.0,
          floor(((col("n_events").cast("double") - col("_med"))
            / (lit(1.4826) * col("_mad"))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("robust_z"))
  }

  /** Cohort retention matrix: users grouped by first-activity day, distinct
    * active users counted per (cohort, days-since-cohort) cell. Two
    * user-keyed shuffles (first-day agg, distinct activity) and one cell
    * aggregation — nothing windows over the raw stream. */
  def eventsCohort(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("d")).distinct()
    val first = e.groupBy("user_id").agg(min("d").as("cohort_d"))
    e.join(first, "user_id")
      .groupBy(col("cohort_d"), (col("d") - col("cohort_d")).as("age_days"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Top-20 opening navigation paths: each user's first five event types
    * (ordered by time, event_id tie-break) joined into a path string, then
    * counted. ONE shuffle on user_id builds the per-user sequence with a
    * map-side partial collect_list; the sort + slice happen inside the
    * aggregated row (bounded arrays), never in a global window. The top-k
    * is TakeOrderedAndProject (per-partition heaps, k·P merge) with a
    * deterministic total order through the limit boundary. */
  def eventsPath(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg(expr(
        """array_join(slice(transform(
          |  sort_array(collect_list(struct(ts, event_id, event_type))),
          |  x -> x.event_type), 1, 5), '>')""".stripMargin).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)

  /** RFM customer scoring with scale-safe quartile bucketing: per-customer
    * recency/frequency/monetary aggregates, then quartile assignment by
    * comparing against broadcast percentile thresholds — NOT `ntile` over a
    * global ORDER BY, which funnels every customer into one task. Monetary
    * stays exact integer cents until the final projection. */
  def ordersRfm(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "orders").groupBy("o_custkey").agg(
      max(expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000")).as("recency_t"),
      count(lit(1)).as("frequency"),
      sum(cents(col("o_totalprice"), 2)).as("_mc"))
    val th = base.agg(
      expr("percentile(recency_t, array(0.25, 0.5, 0.75))").as("_rt"),
      expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("_ft"),
      expr("percentile(_mc, array(0.25, 0.5, 0.75))").as("_mt"))
    def quartile(v: org.apache.spark.sql.Column, t: String) =
      lit(1) + (v > element_at(col(t), 1)).cast("int") +
        (v > element_at(col(t), 2)).cast("int") + (v > element_at(col(t), 3)).cast("int")
    base.crossJoin(broadcast(th)).select(
      col("o_custkey"), col("recency_t"), col("frequency"),
      (col("_mc").cast("double") / 100.0).as("monetary"),
      quartile(col("recency_t"), "_rt").as("r_q"),
      quartile(col("frequency"), "_ft").as("f_q"),
      quartile(col("_mc"), "_mt").as("m_q"))
  }

  /** Revenue-concentration (Pareto) report: the top-20 customers by total
    * order value with each one's running share of GLOBAL revenue — the
    * "how top-heavy is this corpus/customer base" curve. Per-customer
    * revenue is ONE exact-cents aggregation; the top-20 crosses the limit
    * as TakeOrderedAndProject (per-partition heaps, k·P merge) under a
    * total order (revenue desc, custkey asc); rank and the running cents
    * sum window ONLY over the 20 surviving rows (the global window sits
    * above the aggregate+limit, so its input is bounded by construction —
    * the PlanLint-sanctioned shape); total revenue rides back as a
    * broadcast 1-row frame. `cum_share` is one double division of two
    * exact bigints per row — bitwise-deterministic. */
  def ordersPareto(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perCust = Tables(spark, dir, "orders")
      .groupBy("o_custkey").agg(sum(cents(col("o_totalprice"), 2)).as("_rc"))
    val total = perCust.agg(sum(col("_rc")).as("_t"))
    val ord = Window.orderBy(desc("_rc"), asc("o_custkey"))
    perCust.orderBy(desc("_rc"), asc("o_custkey")).limit(20)
      .withColumn("rank", row_number().over(ord).cast("bigint"))
      .withColumn("_cum", sum(col("_rc")).over(ord))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("o_custkey"),
        (col("_rc").cast("double") / 100.0).as("revenue"),
        (col("_cum").cast("double") / col("_t").cast("double")).as("cum_share"))
  }

  /** Monthly order seasonality: per-(year, month) order counts and exact
    * revenue with month-over-month and year-over-year growth rates — the
    * trend/seasonality decomposition a revenue dashboard opens with. ONE
    * hash aggregation collapses orders to the (year, month) grid (bounded
    * by the calendar, not data volume); both lag windows run over that
    * collapsed frame only — MoM globally ordered (lint-sanctioned above
    * the aggregate), YoY partitioned by month. Growth is one double
    * division of two exact cents bigints; first periods are NULL. */
  def ordersSeasonality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = Tables(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"),
        month(col("o_orderdate")).cast("bigint").as("o_month"))
      .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"), 2)).as("_tc"))
    val mom = Window.orderBy("o_year", "o_month")
    val yoy = Window.partitionBy("o_month").orderBy("o_year")
    def growth(prev: org.apache.spark.sql.Column) =
      (col("_tc") - prev).cast("double") / prev.cast("double")
    monthly
      .withColumn("mom_growth", growth(lag(col("_tc"), 1).over(mom)))
      .withColumn("yoy_growth", growth(lag(col("_tc"), 1).over(yoy)))
      .select(col("o_year"), col("o_month"), col("n_orders"),
        (col("_tc").cast("double") / 100.0).as("revenue"),
        col("mom_growth"), col("yoy_growth"))
  }

  /** Seasonal-naive forecast backtest: predict each (type, day) event
    * count with the count from 7 days earlier, then score per type — MAE
    * and signed bias over every day whose season-lag day exists. The
    * one-step evaluation harness a pipeline runs BEFORE trusting any
    * fancier forecaster (seasonal-naive is the canonical baseline that
    * real models must beat). ONE raw-stream aggregation to the (type,
    * day) grid (lazily checkpointed — both join sides read the SAME
    * materialized frame, raw events scan once); the forecast is a
    * self-join on (type, day−7) at grid cardinality; errors are exact
    * integer counts, so MAE/bias are one double division each. */
  def eventsForecastEval(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false)
    val pred = daily.select(col("event_type"), (col("d") + 7).as("d"),
      col("n").as("n_pred"))
    daily.join(pred, Seq("event_type", "d"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days_eval"),
        (sum(abs(col("n") - col("n_pred"))).cast("double") / count(lit(1))).as("mae"),
        (sum(col("n") - col("n_pred")).cast("double") / count(lit(1))).as("bias"))
  }

  /** Ordered-stage funnel (view → click → purchase, strictly increasing
    * timestamps): per-stage user counts plus the median seconds from first
    * view to completing purchase.
    *
    * Each stage is a user-keyed groupBy-min chained through a user-keyed
    * join — shuffles only on user_id (high cardinality), stage frames
    * shrink monotonically, and the final counts are broadcast 1-row
    * aggregates. No window over the raw event stream, no per-user
    * event-list collection. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events").select(col("user_id"), col("ts"), col("event_type"))
    val a = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_a"))
    val b = e.filter(col("event_type") === "click").join(a, "user_id")
      .filter(col("ts") > col("t_a")).groupBy("user_id").agg(min("ts").as("t_b"))
    val c = e.filter(col("event_type") === "purchase").join(b, "user_id")
      .filter(col("ts") > col("t_b")).groupBy("user_id").agg(min("ts").as("t_c"))
    val conv = c.join(a, "user_id")
      .select(expr("(t_c - t_a) div 1000000000").as("_secs"))
    e.agg(countDistinct(col("user_id")).as("n_users"))
      .crossJoin(broadcast(a.agg(count(lit(1)).as("n_view"))))
      .crossJoin(broadcast(b.agg(count(lit(1)).as("n_view_click"))))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_full_funnel"))))
      .crossJoin(broadcast(conv.agg(
        floor((expr("percentile(_secs, 0.5)")) + lit(0.5)).cast("bigint").as("median_convert_sec"))))
  }

  /** Market-basket co-occurrence: top-20 part pairs appearing in the same
    * order. ONE shuffle on the order key builds each order's sorted
    * distinct-part set (map-side partial collect_set); the pair expansion
    * is a per-row array comprehension over those bounded sets (order line
    * counts are single digits), so pair volume stays linear in orders and
    * no self-join or distinct pre-shuffle is needed. The top-k is
    * TakeOrderedAndProject (per-partition heap, k·P merge), never a global
    * sort; the total order (count desc, part_a, part_b) is deterministic
    * through the limit boundary. */
  def qBasket(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_orderkey").agg(sort_array(collect_set(col("l_partkey"))).as("_ps"))
      .select(explode(expr(
        "flatten(transform(_ps, (x, i) -> " +
          "transform(slice(_ps, i + 2, size(_ps)), y -> struct(x, y))))")).as("_p"))
      .select(col("_p.x").as("part_a"), col("_p.y").as("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_orders"))
      .orderBy(desc("n_orders"), asc("part_a"), asc("part_b"))
      .limit(20)

  /** Association rules over the same order baskets [[qBasket]] mines:
    * support / directed confidence / lift for every part pair co-occurring
    * in ≥2 orders, top-20 by lift. ONE orderkey shuffle builds the sorted
    * distinct-part baskets; item counts, pair counts, and the basket total
    * all derive from that frame (lazily checkpointed — three consumers,
    * different downstream keys, Catalyst can't merge the exchanges). The
    * pair expansion is the same per-row array comprehension as qBasket
    * (linear in orders, no self-join); metrics are 6dp-rounded IEEE
    * divisions of exact counts CAST to double FIRST (the integer product
    * n_ab·N would overflow bigint at real corpus scale; the double product
    * is exact for counts < 2^53 and engine-identical). Top-k is
    * TakeOrderedAndProject under a total order. */
  /** Pre-checkpoint basket frame for [[qAssoc]] — factored out so the
    * PushdownSpec tripwire can pin the lineitem scan that the lazy
    * checkpoint hides behind a Scan ExistingRDD in the composed plan. */
  def assocBaskets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_orderkey").agg(sort_array(collect_set(col("l_partkey"))).as("_ps"))

  /** Library face: association rules over any (basket-id, sorted distinct
    * item array `_ps`) frame — see [[qAssoc]] for the scale commentary. */
  def associationRules(basketsIn: DataFrame, minSupport: Long,
                       topK: Int): DataFrame = {
    val baskets = basketsIn.localCheckpoint(eager = false)
    val nOrders = baskets.agg(count(lit(1)).as("_n"))
    // the item-count frame feeds BOTH join sides; un-pinned, Catalyst
    // re-runs the explode+agg once per side (verified in the plan dump)
    val items = baskets.select(explode(col("_ps")).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_item"))
      .localCheckpoint(eager = false)
    val pairs = baskets
      .select(explode(expr(
        "flatten(transform(_ps, (x, i) -> " +
          "transform(slice(_ps, i + 2, size(_ps)), y -> struct(x, y))))")).as("_p"))
      .select(col("_p.x").as("part_a"), col("_p.y").as("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(items.select(col("part").as("part_a"), col("n_item").as("_na")), "part_a")
      .join(items.select(col("part").as("part_b"), col("n_item").as("_nb")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_ab"),
        (floor((col("n_ab").cast("double") / col("_n").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("support"),
        (floor((col("n_ab").cast("double") / col("_na").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("conf_a_b"),
        (floor((col("n_ab").cast("double") / col("_nb").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("conf_b_a"),
        (floor((col("n_ab").cast("double") * col("_n").cast("double")
          / (col("_na").cast("double") * col("_nb").cast("double"))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }

  def qAssoc(spark: SparkSession, dir: String): DataFrame =
    associationRules(assocBaskets(spark, dir), minSupport = 2L, topK = 20)

  /** Conversion-lag distribution: seconds from each converting user's FIRST
    * view to their first subsequent purchase — the latency face of
    * [[eventsFunnel]] (which reports only the median). Two user-keyed min
    * aggregations; the percentile runs over the tiny conversions frame
    * (one row per converting user), quantized to whole seconds — exact
    * integers end to end. */
  def eventsConvlag(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
    val a = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_a"))
    val p = e.filter(col("event_type") === "purchase").join(a, "user_id")
      .filter(col("ts") > col("t_a")).groupBy("user_id").agg(min("ts").as("t_p"))
    val lags = p.join(a, "user_id")
      .select(expr("(t_p - t_a) div 1000000000").as("_secs"))
    lags.agg(count(lit(1)).as("n_conversions"),
        expr("percentile(_secs, array(0.25D, 0.5D, 0.75D, 0.9D))").as("_q"),
        min(col("_secs")).as("min_sec"), max(col("_secs")).as("max_sec"))
      .select(col("n_conversions"),
        floor((element_at(col("_q"), 1)) + lit(0.5)).cast("bigint").as("p25_sec"),
        floor((element_at(col("_q"), 2)) + lit(0.5)).cast("bigint").as("p50_sec"),
        floor((element_at(col("_q"), 3)) + lit(0.5)).cast("bigint").as("p75_sec"),
        floor((element_at(col("_q"), 4)) + lit(0.5)).cast("bigint").as("p90_sec"),
        col("min_sec"), col("max_sec"))
  }

  /** TPC-H Q22-flavored ANTI join: per-nation count and balance total of
    * above-average-balance customers who never ordered. The average rides
    * back as a broadcast scalar; the anti join shuffles only custkeys from
    * the orders side (payload never moves) and short-circuits on first
    * match. */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val ac = cents(col("c_acctbal"), 2)
    val avgStat = c.agg(
      floor((sum(ac).cast("double") / count(lit(1))) + lit(0.5)).cast("bigint").as("_avg"))
    c.crossJoin(broadcast(avgStat))
      .filter(ac > col("_avg"))
      .join(Tables(spark, dir, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"),
        (sum(ac).cast("double") / 100.0).as("totacctbal"))
  }

  /** Dynamic pivot: daily event counts spread across one column per event
    * type (explicit value list ⇒ deterministic schema, no extra
    * values-discovery job). ONE hash aggregate with map-side partials —
    * the pivot is a projection inside the aggregate, not a per-type scan. */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = graft.Tables.eventTypes
    Tables(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("d"))
      .pivot("event_type", types).agg(count(lit(1)))
      .select(col("d") +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
  }

  /** CUBE aggregation: quantity/row totals at every grouping granularity of
    * (returnflag, linestatus) in ONE pass — Spark expands the grouping sets
    * before the single hash aggregate, so the scan isn't repeated per
    * granularity. Subtotal NULLs are folded to 'ALL' (the data itself is
    * null-free, so the sentinel is unambiguous). */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(cents(col("l_quantity"), 2)).as("_qc"), count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        (col("_qc").cast("double") / 100.0).as("sum_qty"), col("n_rows"))

  /** ROLLUP hierarchy totals (year → year+month grain plus the grand
    * total): like [[qCube]], the grouping sets expand inside ONE hash
    * aggregate pass — the scan is not repeated per granularity. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .rollup(year(col("o_orderdate")).cast("bigint").as("o_year"),
        month(col("o_orderdate")).cast("bigint").as("o_month"))
      .agg(sum(cents(col("o_totalprice"), 2)).as("_tc"), count(lit(1)).as("n_orders"))
      .select(coalesce(col("o_year"), lit(-1L)).as("o_year"),
        coalesce(col("o_month"), lit(-1L)).as("o_month"),
        (col("_tc").cast("double") / 100.0).as("sum_total"), col("n_orders"))

  /** TPC-H Q7-style volume shipping between two disjoint nation groups
    * (supplier nations keyed < 13, customer nations ≥ 13), by ship year.
    * Both nation-filtered dimension chains (supplier⋈nation, customer⋈nation)
    * collapse to keyed frames and broadcast; lineitem joins orders on the
    * order key (the one genuine big-big shuffle, left to AQE) only after the
    * broadcast supplier filter and the ship-date pushdown have pruned it. */
  def q7(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables(spark, dir, "nation")
    val s2 = Tables(spark, dir, "supplier")
      .join(broadcast(n.filter(col("n_nationkey") < 13)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c2 = Tables(spark, dir, "customer")
      .join(broadcast(n.filter(col("n_nationkey") >= 13)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    // customer/supplier-cardinality frames are left UNHINTED: they grow
    // with the data (a hard broadcast would hit Spark's 8 GB limit at
    // large SF) — AQE broadcasts them at runtime while they fit
    val o2 = Tables(spark, dir, "orders").select("o_orderkey", "o_custkey")
      .join(c2, col("o_custkey") === col("c_custkey"))
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(s2, col("l_suppkey") === col("s_suppkey"))
      .join(o2, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("_rc"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        (col("_rc").cast("double") / 10000.0).as("revenue"))
  }

  /** TPC-H Q10-style returned-item report: top-20 customers by revenue lost
    * to returns in one quarter. The orderkey join is the only big shuffle;
    * the customer names ride in on a broadcast only AFTER the per-customer
    * aggregation has shrunk the frame, and the top-k is
    * TakeOrderedAndProject (per-partition heaps), never a global sort. */
  def q10(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-07-01"))
      .select("o_orderkey", "o_custkey")
    val rev = Tables(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("_rc"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum(col("_rc")).as("_rc"))
    val c = Tables(spark, dir, "customer")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_name", "c_acctbal", "n_name")
    rev.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"),
        (col("_rc").cast("double") / 10000.0).as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13-style customer order-count distribution, including the
    * never-ordered zero bucket. Orders aggregate per custkey first (the big
    * shuffle), then the LEFT join against customer runs at customer
    * cardinality — the distribution aggregate at the end is tiny. */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .groupBy("o_custkey").agg(count(lit(1)).as("_n"))
    Tables(spark, dir, "customer").select("c_custkey")
      .join(cnt, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("_n"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q17-style small-quantity revenue: lines of one brand's small
    * parts whose quantity is below 20% of that part's average quantity.
    * The brand/size filter broadcasts into BOTH lineitem passes (per-part
    * average, then the qualifying-line scan), and the per-part threshold
    * comparison `5·qty·n < Σqty` is exact integer cents — no double
    * division anywhere before the single output projection. */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
      .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)
      .select("p_partkey")
    val li = Tables(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
    // stats scales with the brand's part count — unhinted, AQE decides
    val stats = li.groupBy(col("l_partkey").as("_pk"))
      .agg(sum(cents(col("l_quantity"), 2)).as("_sq"), count(lit(1)).as("_nq"))
    li.join(stats, col("l_partkey") === col("_pk"))
      .filter(cents(col("l_quantity"), 2) * lit(5L) * col("_nq") < col("_sq"))
      .agg(sum(cents(col("l_extendedprice"), 2)).as("_pc"), count(lit(1)).as("n_lines"))
      .select((col("_pc").cast("double") / 700.0).as("avg_yearly"), col("n_lines"))
  }

  /** TPC-H Q18-style large-volume orders: orders whose total quantity tops
    * 300 units. The per-order quantity rollup is the one big shuffle; its
    * survivors are a handful of rows that broadcast into orders, and the
    * customer dimension broadcasts last — the fact table never re-shuffles. */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("_ok"))
      .agg(sum(cents(col("l_quantity"), 2)).as("_qc"))
      .filter(col("_qc") > 300L * 100L)
    // `big` (the >300-qty survivors) is the genuinely tiny side and
    // broadcasts INTO orders; the customer dim grows with the data, so its
    // join is unhinted — the surviving handful of orders is the build side
    // AQE will pick at runtime
    Tables(spark, dir, "orders")
      .join(broadcast(big), col("o_orderkey") === col("_ok"))
      .join(Tables(spark, dir, "customer").select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("o_day"),
        col("o_totalprice"),
        (col("_qc").cast("double") / 100.0).as("sum_qty"))
  }

  /** TPC-H Q15-style top supplier: suppliers whose quarterly revenue equals
    * the global maximum. The per-supplier rollup is the one shuffle; the max
    * rides back as a broadcast 1-row frame (exact integer — ties are exact,
    * no epsilon), and the supplier dimension broadcasts into the surviving
    * handful of rows. */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("_rc"))
    val mx = rev.agg(max("_rc").as("_mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("_rc") === col("_mx"))
      .join(broadcast(Tables(spark, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("_rc").cast("double") / 10000.0).as("total_revenue"))
  }

  /** TPC-H Q19-style disjunctive-predicate revenue: three (brand, size,
    * quantity) branches OR-ed together. One broadcast part join; the
    * disjunction is a single codegen'd filter — no per-branch scan, no
    * union of three plans. */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part").select("p_partkey", "p_brand", "p_size")
    val branch1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
      col("l_quantity").between(1, 20)
    val branch2 = col("p_brand") === "Brand#2" && col("p_size").between(11, 25) &&
      col("l_quantity").between(10, 30)
    val branch3 = col("p_brand") === "Brand#3" && col("p_size").between(26, 50) &&
      col("l_quantity").between(20, 40)
    Tables(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(branch1 || branch2 || branch3)
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("_rc"),
        count(lit(1)).as("n_lines"))
      .select((col("_rc").cast("double") / 10000.0).as("revenue"), col("n_lines"))
  }

  /** Behavioral Markov transitions: per-user consecutive event-type pairs
    * (lag window keyed on user_id — the sessionize shuffle shape, never a
    * self-join on the stream), counted into a type×type matrix with
    * transition probabilities. The matrix is bounded by type cardinality
    * squared; the probability is one exact-integer division against the
    * broadcast per-source row totals. */
  def eventsMarkov(spark: SparkSession, dir: String): DataFrame =
    markovTransitions(Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("t"), col("event_type")))

  /** Generic Markov face: expects (user_id, t, event_id, event_type). */
  def markovTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    val pairs = events
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("_tot"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("_tot").cast("double")).as("p"))
  }

  /** Time-series gap filling: densify the per-type daily counts onto the
    * full day spine so downstream windows see explicit zeros instead of
    * silently skipping quiet days. The spine is generated from ONE broadcast
    * min/max row (`sequence` + `explode` — days × types is bounded no matter
    * how big the raw stream), and the left join against the pre-aggregated
    * daily frame runs at spine cardinality, never over raw events. The type
    * list is explicit, so there is no values-discovery job (same rationale
    * as [[eventsPivot]]). */
  def eventsGapFill(spark: SparkSession, dir: String): DataFrame = {
    val types = graft.Tables.eventTypes
    // localCheckpoint the tiny daily frame (≤ types × days rows) so the
    // bounds aggregate and the spine join BOTH read the materialized copy —
    // ONE scan of the raw stream instead of two, which at 100 TB is the
    // whole cost of this operator. (ReuseExchange cannot do this for us:
    // the bounds branch prunes `_n`, so the two agg subtrees aren't
    // byte-identical. Same eager-materialization precedent as KnnImpute;
    // cluster path: persist + unpersist.)
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("d"))
      .agg(count(lit(1)).as("_n"))
      .localCheckpoint()
    // bounds from the daily frame: min/max day is identical (every observed
    // day has a daily row)
    val bounds = daily.agg(min(col("d")).as("_lo"), max(col("d")).as("_hi"))
    val spine = broadcast(bounds)
      .select(explode(expr("sequence(_lo, _hi)")).as("d"))
      .select(col("d"), explode(array(types.map(lit): _*)).as("event_type"))
    spine.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"), coalesce(col("_n"), lit(0L)).as("n_events"))
  }

  /** DAU/WAU stickiness: daily active users over 7-day-window active users.
    * The distinct (user, day) frame is the only user-keyed shuffle; each
    * active day then fans out to the ≤7 window days it supports (linear 7×
    * blowup, never a range join) and WAU is a count-distinct per day. The
    * ratio is one exact-integer division — bitwise-deterministic. */
  def eventsStickiness(spark: SparkSession, dir: String): DataFrame =
    stickiness(Tables(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("d")).distinct())

  /** Audience overlap between event types: |users(a) ∩ users(b)| and the
    * Jaccard overlap for every type pair — the cross-sell / cannibalization
    * read on behavioral segments. One distinct (user, type) frame; the
    * pair expansion is a user-keyed self-join whose fan-out is ≤ types²
    * per user (types is a small enum), rolled up to ≤ types² rows. Exact
    * integers; Jaccard is one 6dp division. */
  /** Pre-checkpoint distinct (user, type) frame — factored for the
    * PushdownSpec scan tripwire. */
  def overlapActive(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()

  def eventsOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ut = overlapActive(spark, dir).localCheckpoint(eager = false)
    val totals = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    val both = ut.select(col("user_id"), col("event_type").as("type_a"))
      .join(ut.select(col("user_id"), col("event_type").as("type_b")), "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_both"))
    both
      .join(totals.select(col("event_type").as("type_a"), col("n").as("n_a")), "type_a")
      .join(totals.select(col("event_type").as("type_b"), col("n").as("n_b")), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        (floor((col("n_both").cast("double")
          / (col("n_a") + col("n_b") - col("n_both")).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("jaccard"))
  }

  /** Gini concentration of event volume across users — "do 1% of users
    * generate 90% of the traffic?", the inequality summary a bot screen
    * and a sampling design both start from. Computed WITHOUT a global
    * rank over users: the per-user counts collapse to a VALUE HISTOGRAM
    * (distinct activity levels — bounded by behavior, not user count),
    * and the rank-weighted sum Σ i·xᵢ unrolls per value block as
    * m·C₍₋₎ + m(m+1)/2 from a window over that collapsed frame (the
    * lint-sanctioned aggregate-below shape). Exact integers until the
    * final division. Library face [[giniOf]] takes any (key, cnt) frame. */
  def eventsGini(spark: SparkSession, dir: String): DataFrame =
    giniOf(Tables(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("cnt")))

  /** Gini over any frame with a positive bigint `cnt` column — the
    * value-histogram rank-sum unroll described on [[eventsGini]]. */
  def giniOf(perKey: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = perKey.groupBy("cnt").agg(count(lit(1)).as("m"))
    val w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    val blocks = hist
      .withColumn("_cle", sum(col("m")).over(w))
      .select(col("cnt"), col("m"),
        (col("_cle") - col("m")).as("_clt"))
      // m(m+1) is even, so `div` is exact — Column./ would go double.
      // The rank-weighted block term is ~cnt·m·n_users and its SUM is on
      // the order of n_users × total_events — far past int64 at the 100 TB
      // tier (1e9 users × 1e12 events ~ 1e21) — so the cnt factor lifts
      // the product into decimal(38,0) BEFORE multiplying and the sum
      // accumulates exactly in 128-bit (order-free, like the hugeint DuckDB
      // promotes its own SUM(BIGINT) to). The inner m·_clt ≤ n_users² stays
      // bigint-safe to 3e9 users. Values below 2^53 cast to the identical
      // double the old bigint path produced.
      .select(expr(
          "cast(cnt as decimal(38,0)) * (m * _clt + (m * (m + 1)) div 2)")
          .as("_s1"),
        (col("cnt") * col("m")).as("_sx"), col("m"))
    blocks.agg(sum(col("m")).as("n_users"), sum(col("_sx")).as("total_events"),
        sum(col("_s1")).as("_rs"))
      .select(col("n_users"), col("total_events"),
        (floor(((lit(2.0) * col("_rs").cast("double")
          - (col("n_users") + 1).cast("double") * col("total_events").cast("double"))
          / (col("n_users").cast("double") * col("total_events").cast("double"))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("gini"))
  }

  /** Growth accounting over daily activity: every active (user, day) is
    * NEW (first day ever), RETAINED (also active yesterday) or RESURRECTED
    * (active before, but not yesterday); CHURNED counts users active the
    * previous day who went quiet. The single source of truth is one
    * user-keyed window over the distinct (user, day) frame (lag/lead +
    * running min — activity-days-sized, never events-sized); the churn
    * side re-keys the SAME frame by day+1, so the whole report is two
    * shuffles (user, then day) and exact integers. The spec pins the
    * identity dau(d) = new + retained + resurrected. */
  /** Pre-checkpoint per-(user, day) frame with prev/next activity markers —
    * factored so PushdownSpec can pin the events scan the lazy checkpoint
    * hides in the composed plan. */
  def lifecycleMarked(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val active = Tables(spark, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("d")).distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    active
      .withColumn("_prev", lag(col("d"), 1).over(w))
      .withColumn("_next", lead(col("d"), 1).over(w))
  }

  def eventsLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val marked = lifecycleMarked(spark, dir).localCheckpoint(eager = false)
    val statuses = marked.groupBy("d").agg(
      sum(when(col("_prev").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("_prev") === col("d") - 1, 1L).otherwise(0L)).as("n_retained"),
      sum(when(col("_prev").isNotNull && col("_prev") < col("d") - 1, 1L)
        .otherwise(0L)).as("n_resurrected"))
    val churned = marked
      .filter(col("_next").isNull || col("_next") > col("d") + 1)
      .groupBy((col("d") + 1).as("d")).agg(count(lit(1)).as("n_churned"))
    statuses.join(churned, Seq("d"), "full_outer")
      .select(col("d"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** Generic stickiness face: expects a distinct (user_id, d) frame. */
  def stickiness(active: DataFrame): DataFrame = {
    val dau = active.groupBy("d").agg(count(lit(1)).as("dau"))
    val wau = active.select(col("user_id"), explode(expr("sequence(d, d + 6)")).as("d"))
      .groupBy("d").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "d")
      .select(col("d"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double")).as("stickiness"))
  }

  /** Rolling time-series stats over the daily event counts: per event type,
    * a 7-day moving sum/average and the running total. Windows run over the
    * DENSIFIED daily frame ([[eventsGapFill]]'s spine — explicit zero rows
    * for quiet days), so a "7-day" window really spans 7 CALENDAR days; a
    * rowsBetween window over the sparse frame would silently stretch
    * across gaps (7 observations, not 7 days). The frame stays one row per
    * (type, day) — thousands of rows per type even at decades of history —
    * never the raw stream, and the moving average is exact-integer
    * division. */
  def eventsRolling(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = eventsGapFill(spark, dir)
    val w7 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-6, 0)
    val wRun = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.select(col("event_type"), col("d"), col("n_events"),
      sum("n_events").over(w7).as("sum_7d"),
      (floor((sum("n_events").over(w7).cast("double")
        / count(lit(1)).over(w7).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("avg_7d"),
      sum("n_events").over(wRun).as("running_total"))
  }

  /** EWMA smoothing (α=0.3) of the per-type daily event counts. The raw
    * stream collapses to one row per (type, day) in a single map-side-partial
    * shuffle; the recurrence then runs INSIDE one aggregated row per type
    * (`sort_array` + `aggregate` fold over the bounded day list — thousands
    * of entries even for decades of history), so no window function ever
    * sees raw events. The recurrence is pure integer arithmetic in 1e-6
    * units — `e_t = (3·10^6·x_t + 7·e_{t-1}) div 10` is exactly
    * `0.3·x_t + 0.7·ewma_{t-1}` under floor division — making every
    * intermediate bitwise-reproducible across engines and shuffle orders. */
  def eventsEwma(spark: SparkSession, dir: String): DataFrame =
    ewmaOverDaily(Tables(spark, dir, "events")
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("d"))
      .agg(count(lit(1)).as("n")))

  /** Generic EWMA face over a pre-aggregated (event_type, d, n) frame. */
  def ewmaOverDaily(daily: DataFrame): DataFrame = {
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("d"), col("n")))).as("_days"))
      .select(col("event_type"), explode(expr(
        """aggregate(
          | _days,
          | struct(CAST(-1 AS BIGINT) AS e,
          |        CAST(array() AS ARRAY<STRUCT<d: BIGINT, n: BIGINT, e: BIGINT>>) AS out),
          | (acc, x) -> struct(
          |   IF(acc.e < 0, x.n * 1000000L, (3000000L * x.n + 7L * acc.e) div 10) AS e,
          |   array_append(acc.out, struct(x.d AS d, x.n AS n,
          |     IF(acc.e < 0, x.n * 1000000L, (3000000L * x.n + 7L * acc.e) div 10) AS e)) AS out),
          | acc -> acc.out)""".stripMargin)).as("_r"))
      .select(col("event_type"), col("_r.d").as("d"), col("_r.n").as("n_events"),
        (col("_r.e").cast("double") / 1000000.0).as("ewma"))
  }

  /** Customer spend-quartile migration: bucket every customer's spend into
    * quartiles separately for the EARLY and LATE half of the order
    * history (split at the integer midpoint of the date range — no wall
    * clock), then count the (early-quartile → late-quartile) transition
    * matrix; bucket 0 = absent from that half. The segment-migration view
    * every retention deck carries, built scale-safe: per-half spends are
    * custkey aggregations, the quartile thresholds are 1-row exact-cents
    * percentile aggregates broadcast back (never ntile over a global
    * sort), the matrix is a ≤5×5 rollup. All-integer cent comparisons. */
  def ordersMigration(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders").select(col("o_custkey"),
      cents(col("o_totalprice"), 2).as("_tc"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("_d"))
    val mid = o.agg(expr("(min(_d) + max(_d)) div 2").as("_mid"))
    val tagged = o.crossJoin(broadcast(mid)).localCheckpoint(eager = false)
    def half(cond: Column) = tagged.filter(cond)
      .groupBy("o_custkey").agg(sum(col("_tc")).as("_s"))
    def quartile(spend: DataFrame): DataFrame =
      spend.agg(
        floor((expr("percentile(_s, 0.25D)")) + lit(0.5)).cast("bigint").as("_q1"),
        floor((expr("percentile(_s, 0.5D)")) + lit(0.5)).cast("bigint").as("_q2"),
        floor((expr("percentile(_s, 0.75D)")) + lit(0.5)).cast("bigint").as("_q3"))
    def bucket(spend: DataFrame, out: String): DataFrame =
      spend.crossJoin(broadcast(quartile(spend)))
        .select(col("o_custkey"),
          when(col("_s") <= col("_q1"), 1L)
            .when(col("_s") <= col("_q2"), 2L)
            .when(col("_s") <= col("_q3"), 3L)
            .otherwise(4L).as(out))
    bucket(half(col("_d") <= col("_mid")), "q_early")
      .join(bucket(half(col("_d") > col("_mid")), "q_late"), Seq("o_custkey"), "full_outer")
      .groupBy(coalesce(col("q_early"), lit(0L)).as("q_early"),
        coalesce(col("q_late"), lit(0L)).as("q_late"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Holt double-exponential smoothing (level + trend) of the daily
    * series — one model order above [[ewmaOverDaily]]: the EWMA lags a
    * trending series by design; Holt's trend state closes the lag and its
    * (level + trend) one-step forecast is the natural upgrade of the
    * seasonal-naive baseline events_forecast_eval scores. Identical
    * execution/determinism discipline: a row-local integer fixed-point
    * fold over each type's sorted day array (α=0.3, β=0.2 as exact /10
    * rationals, 1e-6 units, floor-div — bitwise replayable by the
    * oracle's recursive CTE), ONE type-keyed shuffle, days-bounded rows. */
  def eventsHolt(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("d"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("d"), col("n")))).as("_days"))
      .select(col("event_type"), explode(expr(
        """aggregate(
          | _days,
          | struct(CAST(-1 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
          |        CAST(array() AS ARRAY<STRUCT<d: BIGINT, n: BIGINT,
          |          l: BIGINT, b: BIGINT>>) AS out),
          | (acc, x) -> struct(
          |   IF(acc.l < 0, x.n * 1000000L,
          |      (3000000L * x.n + 7L * (acc.l + acc.b)) div 10) AS l,
          |   IF(acc.l < 0, CAST(0 AS BIGINT),
          |      (2L * ((3000000L * x.n + 7L * (acc.l + acc.b)) div 10 - acc.l)
          |       + 8L * acc.b) div 10) AS b,
          |   array_append(acc.out, struct(x.d AS d, x.n AS n,
          |     IF(acc.l < 0, x.n * 1000000L,
          |        (3000000L * x.n + 7L * (acc.l + acc.b)) div 10) AS l,
          |     IF(acc.l < 0, CAST(0 AS BIGINT),
          |        (2L * ((3000000L * x.n + 7L * (acc.l + acc.b)) div 10 - acc.l)
          |         + 8L * acc.b) div 10) AS b)) AS out),
          | acc -> acc.out)""".stripMargin)).as("_r"))
      .select(col("event_type"), col("_r.d").as("d"), col("_r.n").as("n_events"),
        (col("_r.l").cast("double") / 1000000.0).as("level"),
        (col("_r.b").cast("double") / 1000000.0).as("trend"),
        ((col("_r.l") + col("_r.b")).cast("double") / 1000000.0).as("forecast_next"))

  /** Binned range join: revenue falling inside recurring promo windows
    * ([min+100k, min+100k+35) days, a derived interval table). A naive
    * range join is O(rows × windows); because the windows have a fixed
    * stride, each row computes its ONLY candidate window id with integer
    * division — the range join becomes an equality key + residual filter,
    * fully codegen'd inside the scan, no join at all. (Overlapping windows
    * generalize to exploding ≤ ⌈len/stride⌉ candidate ids per row — still
    * O(rows), never O(rows × windows).) The date anchor is one broadcast
    * 1-row aggregate. */
  def promoRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val anchor = li.agg(min(to_date(col("l_shipdate"))).as("_d0"))
    li.crossJoin(broadcast(anchor))
      .withColumn("_diff", datediff(to_date(col("l_shipdate")), col("_d0")))
      .withColumn("window_id", expr("_diff div 100").cast("bigint"))
      .filter(col("_diff") - col("window_id") * 100 < 35)
      .groupBy("window_id")
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("_rc"),
        count(lit(1)).as("n_items"))
      .select(col("window_id"),
        (col("window_id") * 100).cast("bigint").as("start_offset_days"),
        (col("_rc").cast("double") / 10000.0).as("revenue"), col("n_items"))
  }

  /** TPC-H Q8-style national market share: of the revenue from PROMO parts
    * sold to ASIA-region customers, the fraction supplied by NATION_7, per
    * order year. Every dimension chain (part filter, supplier→nation,
    * customer→nation→region) broadcasts into the lineitem scan; the one
    * big-big exchange (lineitem⋈orders) is left to AQE. Share is a single
    * division of two exact integer sums held in ONE aggregation row per
    * year — no second pass over the fact. */
  def q8(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part").filter(col("p_type") === "PROMO")
      .select("p_partkey")
    val n = Tables(spark, dir, "nation")
    val s = Tables(spark, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val asiaCust = Tables(spark, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val o = Tables(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
    Tables(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_7",
          cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
          .otherwise(lit(0L))).as("_nc"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("_tc"))
      .select(col("o_year"),
        (col("_nc").cast("double") / col("_tc").cast("double")).as("mkt_share"))
  }

  /** TPC-H Q9-style product-line profit (adapted: the test schema has no
    * partsupp, so profit omits the supplycost term): revenue from parts
    * whose name contains "red", by supplier nation and order year. Part
    * filter and supplier→nation chain broadcast; lineitem⋈orders is the one
    * big exchange (AQE); the group-by runs at nation×year cardinality. */
  def q9(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part").filter(col("p_name").contains("red"))
      .select("p_partkey")
    val s = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    Tables(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("_pc"))
      .select(col("nation"), col("o_year"),
        (col("_pc").cast("double") / 10000.0).as("profit"))
  }

  /** TPC-H Q21-style blocking supplier (adapted: the test schema has no
    * commit/receipt dates, so "kept the order waiting" = sole supplier with
    * the LATEST ship date on a multi-supplier finished order). The fact
    * table shuffles ONCE, into the per-(order, supplier) aggregation; the
    * order-level rollup and the sole-latest filter exchange only that
    * already-shrunk frame (≈ one row per order×supplier combination),
    * supplier names broadcast in last, and the top-20 is
    * TakeOrderedAndProject. */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val fOrders = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    // one shuffle: per (order, supplier) max shipdate over finished orders
    val perSupp = Tables(spark, dir, "lineitem")
      .join(broadcast(fOrders), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("l_shipdate")).as("_smax"))
    // order-level stats ride the same hash partitioning (orderkey prefix)
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("_nsupp"), max(col("_smax")).as("_omax"))
      .filter(col("_nsupp") >= 2)
    val blamed = perSupp.join(perOrder, "l_orderkey")
      .filter(col("_smax") === col("_omax"))
      // sole latest supplier: no OTHER supplier shares the order max
      .groupBy("l_orderkey", "_omax").agg(
        count(lit(1)).as("_nmax"), max(col("l_suppkey")).as("l_suppkey"))
      .filter(col("_nmax") === 1)
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
    blamed
      .join(broadcast(Tables(spark, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** GROUPING SETS at three explicit granularities ((flag, status), (flag),
    * grand total) — the general form of [[qCube]]/[[qRollup]]: all sets
    * expand inside ONE hash-aggregate pass over a single scan, never one
    * scan per granularity. Exact integer-cents sums per set. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty[Column]),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(cents(col("l_quantity"), 2)).as("_qc"), count(lit(1)).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        (col("_qc").cast("double") / 100.0).as("sum_qty"), col("n_rows"))

  /** Lag-1..7 autocorrelation of the per-type daily event count series —
    * the seasonality detector behind [[eventsForecastEval]]'s lag-7 choice.
    * Pearson r per (type, lag) from EXACT integer moments (counts are
    * BIGINTs; all five sums accumulate bigints, order-free), with the only
    * doubles appearing in the final closed-form expression, rounded 6dp for
    * the cross-engine sqrt ulp. Constant series (zero variance) yield NULL.
    *
    * Shape at scale: the daily rollup is one map-side-combined shuffle at
    * (type × day) cardinality; the lag expansion explodes 7 rows per
    * DAILY row (not per event) and joins back on (type, day) — everything
    * after the first rollup operates on the tiny aggregated frame. */
  /** Per-(type, day) event counts — the shared rollup behind autocorr /
    * changepoint / theilsen. Exposed pre-checkpoint so PushdownSpec can pin
    * the events scan at exactly (event_type, ts); callers lazy-checkpoint
    * the tiny aggregated frame. */
  private[graft] def dailyTypeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("n"))

  def eventsAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = dailyTypeCounts(spark, dir)
      .localCheckpoint(eager = false)
    val lagged = daily.select(col("event_type"),
        explode(sequence(lit(1L), lit(7L))).as("lag"),
        col("d").as("_dl"), col("n").as("nl"))
      .select(col("event_type"), col("lag"), (col("_dl") + col("lag")).as("d"),
        col("nl"))
    val m = daily.join(lagged, Seq("event_type", "d"))
      .groupBy("event_type", "lag")
      .agg(count(lit(1)).as("m"),
        sum(col("n")).as("sx"), sum(col("nl")).as("sy"),
        sum(col("n") * col("n")).as("sxx"),
        sum(col("nl") * col("nl")).as("syy"),
        sum(col("n") * col("nl")).as("sxy"))
    val vx = m("m") * col("sxx") - col("sx") * col("sx")
    val vy = m("m") * col("syy") - col("sy") * col("sy")
    m.select(col("event_type"), col("lag"), col("m").as("n_pairs"),
      when(vx > 0L && vy > 0L,
        (floor(((m("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))) * lit(1e6) + lit(0.5)) / lit(1e6)))
        .as("autocorr"))
  }

  /** CUSUM changepoint scan over the per-type daily count series: the
    * cumulative deviation from the series mean, kept EXACT by scaling away
    * the division (Σ(nᵢ·D − T) for D days and total T — bigints all the
    * way), peaks where the level shifts. Reports the peak day (earliest on
    * ties) and the normalized peak |CUSUM|/D; the single division is the
    * only double. One shuffle builds the daily rollup; the window cumsum
    * and arg-max run per type over the aggregated frame. */
  def eventsChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = dailyTypeCounts(spark, dir)
      .localCheckpoint(eager = false)
    val st = daily.groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum(col("n")).as("tot"))
    val cu = daily.join(st, "event_type")
      .withColumn("cusum", sum(col("n") * col("nd") - col("tot"))
        .over(Window.partitionBy("event_type").orderBy("d")))
    cu.groupBy("event_type")
      .agg(max(col("nd")).as("n_days"),
        max(struct(abs(col("cusum")).as("_a"), (-col("d")).as("_negd"))).as("_pk"))
      .select(col("event_type"), col("n_days"),
        (-col("_pk._negd")).as("peak_day"),
        (col("_pk._a").cast("double") / col("n_days").cast("double")).as("peak_stat"))
  }

  /** Two-proportion A/B conversion test over a deterministic hash split:
    * users split by id parity (the deterministic assignment a replayable
    * experiment pipeline needs), conversion = at least 14 purchase events
    * (the corpus-median purchase count — a threshold that discriminates at
    * every scale factor, where "any purchase" saturates to 100%); the
    * pooled two-proportion z-score decides whether the split is balanced.
    * ONE user-keyed shuffle collapses the event stream to per-user
    * conversion flags; both arms aggregate in the same pass as conditional
    * sums; counts are exact BIGINTs and the z expression is the only
    * double, rounded 6dp for the cross-engine sqrt ulp; a degenerate pool
    * (0% or 100% conversion) yields NULL instead of a zero denominator. */
  def eventsAbtest(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables(spark, dir, "events")
      .select(col("user_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("_p"))
      .groupBy("user_id").agg(sum(col("_p")).as("_np"))
      .select((col("user_id") % 2L).as("grp"),
        when(col("_np") >= 14L, 1L).otherwise(0L).as("conv"))
    val g = u.agg(
      sum(when(col("grp") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("grp") === 0L, col("conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("grp") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("grp") === 1L, col("conv")).otherwise(0L)).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a").cast("double")
    val pb = col("conv_b").cast("double") / col("n_b").cast("double")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    g.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      pa.as("rate_a"), pb.as("rate_b"),
      when(col("conv_a") + col("conv_b") > 0L &&
          col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
        (floor(((pa - pb) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n_a").cast("double") +
            lit(1.0) / col("n_b").cast("double")))) * lit(1e6) + lit(0.5)) / lit(1e6))).as("z_score"))
  }

  /** TPC-H Q2-style minimum-cost supplier (adapted: no partsupp table, so
    * "supply cost" is the cheapest observed line price per (part, supplier)
    * pair in lineitem). Both dimension filters broadcast into the fact scan
    * BEFORE the pair aggregation — the one wide shuffle carries only
    * qualifying (STANDARD small part × EUROPE supplier) rows, not the whole
    * fact. The correlated "min cost per part over eligible suppliers"
    * subquery is a window min over the already-aggregated pair frame (one
    * row per surviving part×supplier — tiny relative to the fact), and the
    * top-100 is TakeOrderedAndProject, never a global sort. */
  def q2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables(spark, dir, "part")
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
      .select("p_partkey", "p_name")
    val esupp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val pairs = Tables(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(esupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"),
        col("p_name"), col("s_name"), col("s_acctbal"), col("n_name"))
      .agg(min(cents(col("l_extendedprice"), 2)).as("cost_c"))
    pairs
      .withColumn("_min_c", min(col("cost_c")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("cost_c") === col("_min_c"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_name"),
        (col("cost_c").cast("double") / 100.0).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  /** TPC-H Q11-style important stock (adapted: part "value" is discounted
    * revenue supplied by two nations' suppliers, no partsupp). The supplier
    * filter broadcasts into the fact scan; one shuffle aggregates value per
    * part; the HAVING threshold is SCALE-FREE — value > 2× the mean part
    * value (TPC-H's fixed fraction-of-total shrinks every part below it as
    * the corpus grows) — carried as a broadcast 1-row cross join and
    * compared in EXACT integer cents (vc·n_parts > tot·2 — no fp threshold
    * drift across engines or partition orders). */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val ns = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")
          .filter(col("n_name").isin("NATION_7", "NATION_12"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val v = Tables(spark, dir, "lineitem")
      .join(broadcast(ns), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("vc"))
    val tot = v.agg(sum(col("vc")).as("tot"), count(lit(1)).as("np"))
    v.crossJoin(broadcast(tot))
      .filter(col("vc") * col("np") > col("tot") * 2L)
      .select(col("l_partkey").as("p_partkey"),
        (col("vc").cast("double") / 10000.0).as("part_value"))
  }

  /** TPC-H Q16-style supplier count per part descriptor (adapted: the
    * part↔supplier relationship is the distinct lineitem pair set; the
    * excluded-supplier predicate is a negative account balance). Part and
    * supplier filters broadcast into the fact scan, so the only shuffle is
    * the count-distinct aggregation at (brand, type, size) cardinality —
    * duplicate pairs collapse in its map-side partials, no pre-distinct
    * pass over the fact. */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 50))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val okSupp = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") >= 0).select("s_suppkey")
    Tables(spark, dir, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(okSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q20-style excess-inventory supplier (adapted: a supplier "holds
    * excess" of a part when it shipped >30% of that part's total 1996
    * quantity — no availqty column). Date + part-name predicates reach the
    * parquet scan before the one wide shuffle (per (part, supplier)
    * quantity); the per-part total rides the SAME hash partitioning as a
    * window sum (no second exchange of the pair frame); the >30% test is
    * exact integer cents (qc·10 > tc·3). Qualifying supplier ids collapse
    * to a distinct set a few orders smaller than the pair frame before the
    * broadcast dimension join. */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables(spark, dir, "part")
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val pairs = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(cents(col("l_quantity"), 2)).as("qc"))
    val excess = pairs
      .withColumn("tc", sum(col("qc")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("qc") * 10L > col("tc") * 3L)
      .select("l_suppkey").distinct()
    val asiaNation = Tables(spark, dir, "nation")
      .join(broadcast(Tables(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    Tables(spark, dir, "supplier")
      .join(broadcast(asiaNation), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(broadcast(excess), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
  }

  /** Frequent contiguous event-type trigrams WITHIN sessions (sequence
    * mining at depth 3 — the PrefixSpan cut that catches "view>click>
    * purchase"-style funnel motifs [[eventsPath]]'s whole-prefix rollup
    * can't, because it buckets by the session's first five steps only).
    * Sessionization is the same 30-min-gap rule as [[sessionize]] (one
    * user-keyed shuffle, cumulative break-flag sum); trigrams come from
    * two `lead`s over the (user, session) window — session boundaries
    * fall out of the window partitioning, no self-join; the global count
    * is one trigram-keyed shuffle (domain ≤ |types|³) and top-20 lowers
    * to TakeOrderedAndProject with a full (n desc, trigram) tiebreak. */
  def eventsTrigrams(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000000000").as("t"))
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    val s = e.withColumn("brk",
        when(col("t") - lag("t", 1).over(w) > 1800L || lag("t", 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum("brk").over(cum))
    val ws = Window.partitionBy("user_id", "session_id").orderBy("t", "event_id")
    s.withColumn("t2", lead("event_type", 1).over(ws))
      .withColumn("t3", lead("event_type", 2).over(ws))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("trigram"))
      .groupBy("trigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("trigram"))
      .limit(20)
  }

  /** Theil–Sen robust trend per event type: the MEDIAN pairwise slope of
    * the daily count series (Theil 1950 / Sen 1968 — the outlier-immune
    * alternative to least-squares the anomaly-laden event stream wants).
    * Like [[eventsAutocorr]], the O(D²) pair expansion runs over the
    * AGGREGATED daily frame (bounded by days², never events²). Slopes are
    * exact IEEE divisions of integer-valued doubles; the median is
    * positional (row_number over (slope, da, db) — fully tie-broken), the
    * two middle ranks averaged, so engine and oracle select literally the
    * same rows. One rollup shuffle; the pair join and window both key on
    * event_type. */
  def eventsTheilsen(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = dailyTypeCounts(spark, dir)
      .localCheckpoint(eager = false)
    val a = daily.select(col("event_type"), col("d").as("da"), col("n").as("na"))
    val b = daily.select(col("event_type"), col("d").as("db"), col("n").as("nb"))
    val pairs = a.join(b, Seq("event_type")).filter(col("da") < col("db"))
      .select(col("event_type"), col("da"), col("db"),
        ((col("nb") - col("na")).cast("double") /
          (col("db") - col("da")).cast("double")).as("slope"))
    val r = pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("slope", "da", "db")))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("event_type")))
    r.filter(col("rn") === expr("(m + 1) div 2") || col("rn") === expr("m div 2 + 1"))
      .groupBy("event_type")
      .agg(max(col("m")).as("n_pairs"), (floor((avg(col("slope"))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("slope_med"))
  }

  /** Period-over-period contribution decomposition: split the event range
    * into halves at the midpoint day and attribute the total volume change
    * to event types — the "why did the metric move" breakdown behind every
    * metrics dashboard. The midpoint is derived from the data (min/max
    * day) and rides a broadcast scalar frame; per-type half-counts are
    * conditional sums in ONE type-keyed pass; the total delta broadcasts
    * back as a second scalar frame. Counts and deltas are exact BIGINTs;
    * the share is the single division (6dp round), NULL when the total
    * delta is zero. */
  def eventsContribution(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables(spark, dir, "events")
      .select(col("event_type"), expr("ts div 86400000000000").as("d"))
    val mid = days.agg(min(col("d")).as("_mn"), max(col("d")).as("_mx"))
      .select(expr("(_mn + _mx + 1) div 2").as("mid"))
    val perType = days.crossJoin(broadcast(mid))
      .groupBy("event_type")
      .agg(sum(when(col("d") < col("mid"), 1L).otherwise(0L)).as("n_first"),
        sum(when(col("d") >= col("mid"), 1L).otherwise(0L)).as("n_second"))
      .withColumn("delta", col("n_second") - col("n_first"))
      .localCheckpoint(eager = false)
    val tot = perType.agg(sum(col("delta")).as("total_delta"))
    perType.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_first"), col("n_second"), col("delta"),
        when(col("total_delta") =!= 0L,
          (floor((col("delta").cast("double") / col("total_delta").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)))
          .as("share"))
  }

  /** Pareto-frontier (skyline) customers on (order count, spend): the
    * multi-objective "best customers" query — no other customer weakly
    * dominates with one strict improvement. Two-level banded reduction
    * instead of the textbook O(n²) dominance join OR a global sort: order
    * count is a BOUNDED small domain, so (1) per-count max spend, (2)
    * strict-suffix max over the tiny count-band frame via a band<band
    * join, (3) a survivor is a row at its band's max that beats every
    * higher band's max. Exactly the skyline: within-band ties all
    * survive (neither dominates — no strict coordinate), cross-band ties
    * die (count is strict). One custkey rollup shuffle; everything after
    * runs at count-band cardinality. Spend stays exact integer cents.
    * The oracle is a structurally DIFFERENT formulation (brute-force
    * NOT EXISTS over the aggregate frame) — a real cross-check, not an
    * echo. */
  def ordersSkyline(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"), 2)).as("mc"))
      .localCheckpoint(eager = false)
    val bands = base.groupBy("n_orders").agg(max(col("mc")).as("bandmax"))
      .localCheckpoint(eager = false)
    val suffix = bands.select(col("n_orders").as("f"))
      .join(bands.select(col("n_orders").as("fh"), col("bandmax").as("bh")),
        col("fh") > col("f"))
      .groupBy("f").agg(max(col("bh")).as("suffmax"))
    base.join(bands, "n_orders")
      .join(suffix, col("n_orders") === col("f"), "left_outer")
      .filter(col("mc") === col("bandmax") &&
        (col("suffmax").isNull || col("mc") > col("suffmax")))
      .select(col("o_custkey"), col("n_orders"),
        (col("mc").cast("double") / 100.0).as("monetary"))
  }

  /** Purchase-cadence histogram: per-customer MEDIAN inter-order gap,
    * bucketed to weeks — the replenishment-rhythm profile behind
    * subscription/churn models (medians, not means: one long vacation gap
    * shouldn't move a weekly shopper's cadence). Stays in INTEGERS end to
    * end: the median is carried as 2×median (sum of the two positional
    * middle gaps, or twice the single middle one), so the week bucket is
    * `med2 div 14` — no doubles anywhere. One custkey-keyed shuffle
    * computes gaps (lag) and the positional median (row_number / count,
    * both on the same partitioning); the final rollup is week-bucket
    * cardinality. Customers with <2 orders have no gap and drop out. */
  def ordersInterarrival(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("d"),
        col("o_orderkey"))
    val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    val gaps = o.withColumn("gap", col("d") - lag("d", 1).over(w))
      .filter(col("gap").isNotNull)
    val wg = Window.partitionBy("o_custkey").orderBy("gap", "d", "o_orderkey")
    val med = gaps
      .withColumn("rn", row_number().over(wg))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("o_custkey")))
      .filter(col("rn") === expr("(m + 1) div 2") || col("rn") === expr("m div 2 + 1"))
      .groupBy("o_custkey")
      .agg((sum(col("gap")) * when(max(col("m")) % 2L === 1L, 2L).otherwise(1L))
        .as("med2"))
    med.select(expr("med2 div 14").as("gap_weeks"))
      .groupBy("gap_weeks").agg(count(lit(1)).as("n_customers"))
  }

  /** Benford first-significant-digit profile of order prices — the classic
    * fraud / synthetic-data screen. Exact-cents digit extraction, ONE
    * digit-keyed shuffle (cardinality 9) with map-side partials; the total
    * rides a broadcast 1-row frame (the scalar-frame pattern); expected
    * Benford mass log10((d+1)/d) and the observed fraction are the only
    * doubles, 6dp-rounded. */
  def ordersBenford(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "orders")
      .select(cents(col("o_totalprice"), 2).as("v")).filter(col("v") > 0L)
      .select(substring(col("v").cast("string"), 1, 1).cast("bigint").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = c.agg(sum(col("n_obs")).as("n_total"))
    c.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        (floor((col("n_obs").cast("double") / col("n_total").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("obs_frac"),
        (floor((log10((col("digit") + 1L).cast("double") / col("digit").cast("double"))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("exp_frac"))
  }

  /** Wide→long reshape (melt / UNPIVOT) of the daily event metrics frame:
    * the inverse of [[eventsPivot]], and the missing half of the reshaping
    * pair a feature store round-trips through. One shuffle builds the
    * (day × {n_events, n_users, n_purchases}) wide rollup (the distinct
    * user count rides the same aggregation); `stack` then melts it
    * row-locally — a pure narrow projection, NO second shuffle, unlike the
    * naive union-of-three-scans a SQL engine would run. All values are
    * exact BIGINT counts. */
  def eventsUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("d"), col("user_id"),
        col("event_type"))
      .groupBy("d")
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))
      .selectExpr("d",
        "stack(3, 'n_events', n_events, 'n_users', n_users, " +
          "'n_purchases', n_purchases) AS (metric, value)")
}
