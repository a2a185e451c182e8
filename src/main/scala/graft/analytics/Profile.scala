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
      // mode folded into the SAME always-1-row aggregate (min_by over
      // (−count, value)): an orderBy+limit(1) frame is EMPTY for an
      // all-null column, and crossJoining it would annihilate the
      // column's profile row entirely (the Strategies.modeAgg hazard)
      counts.agg(
          coalesce(sum("_c"), lit(0L)).as("n"),
          count(lit(1)).as("n_distinct"),
          min_by(col("_v"), struct((-col("_c")).as("nc"), col("_v").as("v")))
            .as("mode_value"),
          max(col("_c")).as("mode_n"),
          (floor((log(sum(col("_c")).cast("double"))
            - sum(col("_c").cast("double") * log(col("_c").cast("double")))
              / sum(col("_c")).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("entropy"))
        .select(lit(c).as("variable"), col("n"), col("n_distinct"),
          col("mode_value"), col("mode_n"), col("entropy"))
    }
    parts.reduce(_ unionAll _)
  }

  def customerCategoricalProfile(spark: SparkSession, dir: String): DataFrame =
    categorical(Tables(spark, dir, "customer"), Seq("c_mktsegment", "c_nationkey"))

  /** Exact per-group quantiles of a fixed-decimal column, cent-quantized
    * like [[graft.operators.Outliers]]: one `percentile` aggregation per
    * group (group cardinality is tiny — the sort happens within each
    * group's partial state, not globally). Scale path: swap `percentile`
    * for `approx_percentile`, identical shape. */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     scale: Int, ps: Seq[Double]): DataFrame = {
    val k = math.pow(10, scale)
    val arr = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    df.select(col(groupCol), cents(col(valueCol), scale).as("_vc"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), expr(s"percentile(_vc, $arr)").as("_q"))
      .select(col(groupCol) +: col("n") +: ps.zipWithIndex.map { case (p, i) =>
        (floor((element_at(col("_q"), i + 1)) + lit(0.5)).cast("bigint").cast("double") / k)
          .as(s"p${math.round(p * 100)}")
      }: _*)
  }

  def lineitemGroupQuantiles(spark: SparkSession, dir: String): DataFrame =
    groupQuantiles(Tables(spark, dir, "lineitem"), "l_returnflag",
      "l_extendedprice", 2, Seq(0.25, 0.5, 0.75, 0.95))

  /** Exact Pearson correlation matrix from a SINGLE aggregation pass:
    * every moment (Σx, Σx², Σxy) accumulates in decimal(38,0) over the
    * cent-quantized columns (HUGEINT on the oracle side), so the
    * correlations are closed-form doubles computed from exact integers —
    * bitwise-reproducible across engines and shuffle orders, no
    * second-pass centering, no `corr()` nondeterminism. One map-side
    * partial agg → one 1-row reduce regardless of data size; the pair
    * expansion is a driver-side projection of that row. */
  def corrMatrix(df: DataFrame, cols: Seq[(String, Int)]): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val names = cols.map(_._1)
    val moments =
      Seq(count(lit(1)).cast("decimal(38,0)").as("_n")) ++
      cols.flatMap { case (c, s) =>
        val v = dec(cents(col(c), s))
        Seq(sum(v).as(s"_s_$c"), sum(v * v).as(s"_ss_$c"))
      } ++
      names.combinations(2).map { case Seq(a, b) =>
        val sa = cols.find(_._1 == a).get._2; val sb = cols.find(_._1 == b).get._2
        sum(dec(cents(col(a), sa)) * dec(cents(col(b), sb))).as(s"_sp_${a}_${b}")
      }.toSeq
    val m = df.agg(moments.head, moments.tail: _*)
    val pairs = names.combinations(2).toSeq
    val stackArgs = pairs.map { case Seq(a, b) =>
      val num = (col("_n") * col(s"_sp_${a}_${b}") - col(s"_s_$a") * col(s"_s_$b")).cast("double")
      val da = (col("_n") * col(s"_ss_$a") - col(s"_s_$a") * col(s"_s_$a")).cast("double")
      val db = (col("_n") * col(s"_ss_$b") - col(s"_s_$b") * col(s"_s_$b")).cast("double")
      // constant column ⇒ zero variance ⇒ NULL corr, guarded in BOTH
      // engines: floor(x+0.5) is cross-engine-exact only on FINITE inputs
      // (Spark floor(double) is LongType — ±Inf/NaN saturate; DuckDB's
      // stays DOUBLE), so /0 must never reach the rounding idiom
      (lit(a), lit(b), when(da =!= 0.0 && db =!= 0.0,
        floor((num / (sqrt(da) * sqrt(db))) * lit(1e6) + lit(0.5)) / lit(1e6)))
    }
    val rows = stackArgs.map { case (a, b, c) =>
      struct(a.as("col_a"), b.as("col_b"), c.as("corr"))
    }
    m.select(explode(array(rows: _*)).as("_r"))
      .select(col("_r.col_a"), col("_r.col_b"), col("_r.corr"))
  }

  def lineitemCorr(spark: SparkSession, dir: String): DataFrame =
    corrMatrix(Tables(spark, dir, "lineitem"),
      Seq("l_quantity" -> 2, "l_extendedprice" -> 2, "l_discount" -> 4, "l_tax" -> 4))

  /** Population-stability-index drift report between two slices of the same
    * frame (train-vs-serve, yesterday-vs-today): fixed-width bins over the
    * cent-quantized value, per-bin counts for both slices in ONE conditional
    * aggregation pass (sum(CASE WHEN) map-side partials — the slices are
    * never scanned separately), totals broadcast back as a 1-row frame.
    * PSI = Σ (p−q)·ln(p/q) over bins populated in both slices; each term is
    * a bitwise-deterministic double (exact-integer inputs, one expression
    * tree) quantized to integer 1e-12 units so the SUM itself is exact and
    * order-independent — the profile_corr discipline applied to drift. Bins
    * seen in only one slice are reported as counts (they'd make PSI
    * infinite; at scale they're the signal you alert on first). */
  def drift(df: DataFrame, valueCol: String, scale: Int, binWidth: Long,
            inA: org.apache.spark.sql.Column): DataFrame = {
    // FLOOR division in exact integers: `cents / lit` would be a double
    // true-division (lossy past 2^53) and a plain `div` truncates toward
    // zero — both mis-bin negative values relative to the oracle's
    // floor-dividing `//`. Subtracting the non-negative pmod first makes
    // the quotient exact, so truncation and floor coincide.
    val binned = df
      .select(cents(col(valueCol), scale).as("_c"), inA.as("_a"))
      .select(expr(s"(_c - pmod(_c, ${binWidth}L)) div ${binWidth}L").as("_bin"),
        col("_a"))
      .groupBy("_bin")
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("_na"),
        sum(when(col("_a"), 0L).otherwise(1L)).as("_nb"))
    val totals = binned.agg(sum("_na").as("_ta"), sum("_nb").as("_tb"))
    val p = col("_na").cast("double") / col("_ta").cast("double")
    val q = col("_nb").cast("double") / col("_tb").cast("double")
    binned.crossJoin(broadcast(totals))
      .select(col("_na"), col("_nb"),
        when(col("_na") > 0 && col("_nb") > 0,
          floor(((p - q) * log(p / q) * 1e12) + lit(0.5)).cast("bigint"))
          .otherwise(lit(null)).as("_term"))
      .agg(
        sum(when(col("_term").isNotNull, 1L).otherwise(0L)).as("n_bins_common"),
        sum(when(col("_na") > 0 && col("_nb") === 0, 1L).otherwise(0L)).as("n_bins_a_only"),
        sum(when(col("_na") === 0 && col("_nb") > 0, 1L).otherwise(0L)).as("n_bins_b_only"),
        (sum(col("_term")).cast("double") / 1e12).as("psi"))
  }

  /** Drift face on the testdata: even-keyed vs odd-keyed order halves of
    * lineitem prices, $500 bins — a deterministic A/B with expected PSI≈0,
    * the calibration point for real train-vs-serve runs. */
  def lineitemDrift(spark: SparkSession, dir: String): DataFrame =
    drift(Tables(spark, dir, "lineitem"), "l_extendedprice", 2, 50000L,
      col("l_orderkey") % 2 === 0)

  /** Equi-width value histogram: per-bin row counts plus each bin's share
    * of the total — the distribution view a profiling pass renders next to
    * [[numeric]]'s moments. ONE hash aggregation over the bin id (map-side
    * partials; bin cardinality is value-range/binWidth, not row count) and
    * the total rides back as a broadcast 1-row frame. Binning happens in
    * exact integers at `scale` decimals with the floor-division discipline
    * of [[drift]] (subtract the non-negative pmod first so truncating
    * `div` and the oracle's floor `//` coincide on negatives). `pct` is
    * one double division of two exact bigints — bitwise-deterministic. */
  def histogram(df: DataFrame, valueCol: String, scale: Int, binWidth: Long): DataFrame = {
    val k = math.pow(10, scale)
    val binned = df
      .select(cents(col(valueCol), scale).as("_c"))
      .select(expr(s"(_c - pmod(_c, ${binWidth}L)) div ${binWidth}L").as("_bin"))
      .groupBy("_bin")
      .agg(count(lit(1)).as("n_rows"))
    val total = binned.agg(sum(col("n_rows")).as("_t"))
    binned.crossJoin(broadcast(total))
      .select(((col("_bin") * binWidth).cast("double") / k).as("bin_lo"),
        col("n_rows"),
        (col("n_rows").cast("double") / col("_t").cast("double")).as("pct"))
  }

  /** Histogram face on the testdata: lineitem prices in $500 bins. */
  def lineitemHistogram(spark: SparkSession, dir: String): DataFrame =
    histogram(Tables(spark, dir, "lineitem"), "l_extendedprice", 2, 50000L)

  /** Mutual information between two categorical columns — the
    * dependence-profiling complement of [[corrMatrix]] (which needs
    * numerics): MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))), with marginal
    * entropies and the normalized MI/√(H(x)H(y)).
    *
    * Determinism: all probabilities come from EXACT contingency counts
    * (one (x,y) groupBy, marginals re-aggregated from the cell frame, not
    * the data); every fp term is one expression tree over those integers
    * quantized to 1e-12 units so the sums are exact and order-free — the
    * [[drift]] discipline. NMI carries a 6dp round for the cross-engine
    * sqrt ulp. Shape at scale: ONE shuffle over the (x,y) cell cardinality;
    * marginals/totals are aggregations of the tiny cell frame (pinned with
    * a lazy checkpoint — it feeds four branches); everything else is
    * broadcast 1-row frames. */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.select(col(xCol).as("_x"), col(yCol).as("_y"))
      .groupBy("_x", "_y").agg(count(lit(1)).as("_nxy"))
      .localCheckpoint(eager = false)
    val mx = cells.groupBy("_x").agg(sum(col("_nxy")).as("_nx"))
    val my = cells.groupBy("_y").agg(sum(col("_nxy")).as("_ny"))
    val tot = cells.agg(sum(col("_nxy")).as("_n"))
    val ratio = (col("_nxy").cast("double") * col("_n").cast("double")) /
      (col("_nx").cast("double") * col("_ny").cast("double"))
    val miRow = cells.join(mx, "_x").join(my, "_y").crossJoin(broadcast(tot))
      .select(floor(((col("_nxy").cast("double") / col("_n").cast("double")) *
          log(ratio) * 1e12) + lit(0.5)).cast("bigint").as("_t"))
      .agg(count(lit(1)).as("n_cells"), sum(col("_t")).as("_mi"))
    def entropy(marg: DataFrame, nCol: String, out: String): DataFrame =
      marg.crossJoin(broadcast(tot))
        .select(floor(((col(nCol).cast("double") / col("_n").cast("double")) *
            log(col("_n").cast("double") / col(nCol).cast("double")) * 1e12) + lit(0.5))
          .cast("bigint").as("_e"))
        .agg(sum(col("_e")).as(out))
    miRow.crossJoin(broadcast(entropy(mx, "_nx", "_hx")))
      .crossJoin(broadcast(entropy(my, "_ny", "_hy")))
      .crossJoin(broadcast(tot))
      .select(col("_n").as("n_rows"), col("n_cells"),
        (col("_mi").cast("double") / 1e12).as("mi"),
        (col("_hx").cast("double") / 1e12).as("h_x"),
        (col("_hy").cast("double") / 1e12).as("h_y"),
        when(col("_hx") > 0L && col("_hy") > 0L,
          (floor(((col("_mi").cast("double") / 1e12) /
            sqrt((col("_hx").cast("double") / 1e12) *
              (col("_hy").cast("double") / 1e12))) * lit(1e6) + lit(0.5)) / lit(1e6))).as("nmi"))
  }

  /** MI face on the testdata: market segment × nation dependence. */
  def customerMi(spark: SparkSession, dir: String): DataFrame =
    mutualInformation(Tables(spark, dir, "customer"), "c_mktsegment", "c_nationkey")

  /** Jensen–Shannon divergence between two corpora's term distributions —
    * the symmetric, bounded ([0, ln 2]) vocabulary-drift measure for
    * corpus governance (did source B's language shift away from A?).
    * Same determinism discipline as [[mutualInformation]]: per-term
    * contributions quantize to 1e-12 BIGINTs before the order-free sum,
    * so the result is bitwise reproducible and oracle-matchable; zero
    * counts contribute exactly 0 (0·ln 0 handled by the guard, never
    * NaN). One (term, side) exploded shuffle builds the union-vocabulary
    * frame; totals ride a broadcast scalar frame; everything after runs
    * at vocabulary cardinality. */
  def termJsd(docs: DataFrame, textCol: String, srcCol: String,
              srcA: String, srcB: String): DataFrame = {
    val terms = docs
      .filter(col(srcCol) === srcA || col(srcCol) === srcB)
      .select(col(srcCol).as("_s"), explode(split(col(textCol), " ")).as("_t"))
      .filter(length(col("_t")) > 0)
      .groupBy("_t")
      .agg(sum(when(col("_s") === srcA, 1L).otherwise(0L)).as("na"),
        sum(when(col("_s") === srcB, 1L).otherwise(0L)).as("nb"))
      .localCheckpoint(eager = false)
    val tot = terms.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    val p = col("na").cast("double") / col("ta").cast("double")
    val q = col("nb").cast("double") / col("tb").cast("double")
    val m = (p + q) / 2.0
    val contrib =
      when(col("na") > 0L, p * log(p / m)).otherwise(lit(0.0)) +
        when(col("nb") > 0L, q * log(q / m)).otherwise(lit(0.0))
    terms.crossJoin(broadcast(tot))
      .select(floor((contrib * 0.5 * 1e12) + lit(0.5)).cast("bigint").as("_c"))
      .agg(count(lit(1)).as("n_terms"), sum(col("_c")).as("_j"))
      .select(lit(srcA).as("src_a"), lit(srcB).as("src_b"), col("n_terms"),
        (floor((col("_j").cast("double") / 1e12) * lit(1e6) + lit(0.5)) / lit(1e6)).as("jsd_nats"),
        (floor((col("_j").cast("double") / 1e12 / math.log(2.0)) * lit(1e6) + lit(0.5)) / lit(1e6)).as("jsd_bits"))
  }

  /** JSD face on the testdata: src0 vs src1 vocabulary drift. */
  def documentsJsd(spark: SparkSession, dir: String): DataFrame =
    termJsd(Tables(spark, dir, "documents"), "text", "source", "src0", "src1")

  /** Two-sample Kolmogorov–Smirnov distance between the value distributions
    * of two groups, on a fixed-width band grid (KS over binned data — the
    * distribution-drift test profile_drift's PSI can't localize). All
    * arithmetic until the final statistic is exact BIGINT: per-band counts,
    * cumulative counts via a band≤band self-join over the AGGREGATED band
    * frame (bounded by the value range / bandWidth — deliberately no
    * global window, the one construct that can't scale out), and the
    * scaled statistic |cumA·nB − cumB·nA|. The peak band is the earliest
    * arg-max (max-struct idiom). One value-keyed shuffle builds the bands;
    * everything after runs at band-grid cardinality. The bigint-scaled
    * statistic overflows past ~3e9 rows per group — at that scale switch
    * the final compare to the double fractions (documented trade, same
    * SCALE_BOUNDS class as the exact-percentile profiles). */
  /** The per-band count frame, pre-checkpoint — exposed so PushdownSpec
    * can pin both source scans (ks' lazy checkpoint hides them). */
  private[graft] def ksBandFrame(dfA: DataFrame, dfB: DataFrame, valueCol: String,
                                 scale: Int, bandCents: Long): DataFrame = {
    def band(df: DataFrame) = df
      .select(cents(col(valueCol), scale).as("_v"))
      .select(expr(s"_v div ${bandCents}L").as("band"))
    val a = band(dfA).groupBy("band").agg(count(lit(1)).as("ca"))
    val b = band(dfB).groupBy("band").agg(count(lit(1)).as("cb"))
    a.join(b, Seq("band"), "full_outer")
      .select(col("band"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
  }

  def ks(dfA: DataFrame, dfB: DataFrame, valueCol: String, scale: Int,
         bandCents: Long, labelA: String, labelB: String): DataFrame = {
    val bands = ksBandFrame(dfA, dfB, valueCol, scale, bandCents)
      .localCheckpoint(eager = false)
    val tot = bands.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val lo = bands.select(col("band").as("blo"), col("ca").as("cal"), col("cb").as("cbl"))
    val cum = bands.select(col("band")).join(lo, col("blo") <= col("band"))
      .groupBy("band").agg(sum(col("cal")).as("cuma"), sum(col("cbl")).as("cumb"))
    cum.crossJoin(broadcast(tot))
      .select(col("band"),
        abs(col("cuma") * col("nb") - col("cumb") * col("na")).as("stat"),
        col("na"), col("nb"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("stat")).as("_s"),
        max(struct(col("stat").as("s"), (-col("band")).as("nb_"))).as("_pk"))
      .select(lit(labelA).as("seg_a"), lit(labelB).as("seg_b"),
        col("n_a"), col("n_b"),
        (floor((col("_s").cast("double") / (col("n_a") * col("n_b")).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("ks_stat"),
        (-col("_pk.nb_")).as("peak_band"))
  }

  /** KS face on the testdata: BUILDING vs MACHINERY customers' order
    * totals, $1000 bands. The customer→orders attach is one key-keyed
    * join; each arm then collapses to its band frame independently. */
  private[graft] def ordersKsArms(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    def arm(seg: String) = o.join(
      c.filter(col("c_mktsegment") === seg),
      col("o_custkey") === col("c_custkey"), "left_semi")
    (arm("BUILDING"), arm("MACHINERY"))
  }

  def ordersKs(spark: SparkSession, dir: String): DataFrame = {
    val (a, b) = ordersKsArms(spark, dir)
    ks(a, b, "o_totalprice", 2,
      bandCents = 100000L, labelA = "BUILDING", labelB = "MACHINERY")
  }
}
