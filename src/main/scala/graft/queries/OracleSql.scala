package graft.queries

/** DuckDB oracle SQL for every SQL-checkable query in [[Q]].
  *
  * Discipline (SURVEY.md §4): expression trees mirror the Spark plans
  * operation-for-operation so doubles are bitwise-identical — integer-cents
  * sums for monetary aggregates, raw passthrough for source doubles, 6dp
  * rounding only on order-nondeterministic fp statistics before reuse.
  */
object OracleSql {

  /** Masked customer — mirrors [[graft.Tables.maskedCustomer]]. */
  private val MCV =
    """SELECT c_custkey, c_name, c_nationkey,
      | CASE WHEN c_custkey % 7 = 3 THEN NULL ELSE c_acctbal END AS c_acctbal,
      | CASE WHEN c_custkey % 11 = 5 THEN NULL ELSE c_mktsegment END AS c_mktsegment
      |FROM customer""".stripMargin

  /** Masked lineitem — mirrors [[graft.Tables.maskedLineitem]]. */
  private val MLV =
    """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
      | CASE WHEN (l_orderkey + l_linenumber) % 13 = 1 THEN NULL ELSE l_extendedprice END AS l_extendedprice
      |FROM lineitem""".stripMargin

  private def ac(c: String) = s"CAST(floor(($c * 100.0) + 0.5) AS BIGINT)"

  /** Inverted-index bigram-shingle Jaccard pairs (same source, id_a <
    * id_b, jaccard ≥ 0.10) — shared by dedup_jaccard / dedup_cluster /
    * dedup_stats. The naive all-pairs `list_intersect` form is quadratic
    * in docs-per-source and was 4 of the sf1 gate's 7 oracle-slow
    * queries (docs/SF1_GATE.md); postings lists here are bounded (max
    * per-source shingle df 6 at sf1), so the candidate join is linear in
    * shared-shingle postings. Lossless: a pair with zero shared shingles
    * cannot reach the 0.10 threshold, and the jaccard value divides the
    * same BIGINT counts in the same DOUBLE expression shape, so surviving
    * rows are bitwise identical to the all-pairs form. MATERIALIZED:
    * DuckDB 1.0 inlines multiply-referenced CTEs. */
  private val jaccardPairsCte =
    """t AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |sh AS MATERIALIZED (SELECT doc_id, source,
      |  unnest(list_distinct([array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)])) AS g
      | FROM t),
      |sz AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      |ix AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
      | FROM sh a JOIN sh b ON a.g = b.g AND a.source = b.source AND a.doc_id < b.doc_id
      | GROUP BY 1, 2),
      |p AS MATERIALIZED (SELECT id_a, id_b,
      |  CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
      | FROM ix JOIN sz sa ON sa.doc_id = ix.id_a JOIN sz sb ON sb.doc_id = ix.id_b
      | WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.10)""".stripMargin

  /** Chained hook+jump min-label rounds — connected components WITHOUT a
    * recursive CTE (the recursive `reach` form materializes the full
    * node×reachable-label closure and was the other half of the sf1
    * oracle-slow cost). Expects CTEs `nodes(node)` and `e(src, dst)`
    * (both edge directions) in scope; emits l0..l&lt;rounds&gt;.
    *
    * Exactness is CHECKED, not assumed from the round count: labels are
    * node ids, non-increasing, only ever propagate within a component,
    * and the component-minimum node keeps its own id forever — so if no
    * edge joins two different labels (the sentinel the callers append,
    * which breaks the row-count compare LOUDLY when it fires), labels
    * are constant per component and that constant is the component min:
    * exactly the recursive form's answer. */
  private def ccChain(rounds: Int): String = {
    val sb = new StringBuilder(
      "l0 AS MATERIALIZED (SELECT node, node AS lab FROM nodes)")
    for (i <- 1 to rounds) sb.append(
      s""",
         |h$i AS MATERIALIZED (
         | SELECT l.node, least(l.lab, coalesce(min(nl.lab), l.lab)) AS lab
         | FROM l${i - 1} l LEFT JOIN e ON e.src = l.node
         |  LEFT JOIN l${i - 1} nl ON nl.node = e.dst
         | GROUP BY l.node, l.lab),
         |l$i AS MATERIALIZED (
         | SELECT h.node, least(h.lab, p2.lab) AS lab
         | FROM h$i h JOIN h$i p2 ON p2.node = h.lab)""".stripMargin)
    sb.toString
  }

  /** Convergence sentinel for [[ccChain]]: one impossible row when any
    * edge still joins two labels — turns "not yet converged" into a loud
    * row-count mismatch instead of a silently wrong clustering. */
  private def ccSentinel(rounds: Int, cols: Int): String = {
    val sel = Seq.fill(cols)("CAST(-1 AS BIGINT)").mkString(", ")
    s"""UNION ALL
       |SELECT $sel
       |WHERE EXISTS (SELECT 1 FROM e JOIN l$rounds a ON a.node = e.src
       |  JOIN l$rounds b ON b.node = e.dst WHERE a.lab <> b.lab)""".stripMargin
  }

  private val CcRounds = 10

  /** Shared event-type spine (graft.Tables.eventTypes) rendered as a SQL
    * VALUES list — oracle and engine derive from the same constant. */
  private val typeValues = graft.Tables.eventTypes.map(t => s"('$t')").mkString(", ")

  val sql: Map[String, String] = Map(

    // Theta audience set algebra: below the sketch's k = 4096 retained
    // entries the theta sketch is in EXACT mode (theta = 1.0, every hash
    // retained), so estimates ARE the exact distinct counts at every test
    // scale (≤ ~1.5k users/type at sf0.1) and the face hash-matches exact
    // SQL set algebra; at production cardinalities it degrades gracefully
    // to the documented ~2% estimate (the spec's error-bound tier).
    // audience_jaccard divides the same exact integer-valued doubles in
    // both engines (IEEE division + floor(x·10⁶+0.5)/10⁶ — bitwise-stable).
    "events_theta_overlap" ->
      """WITH au AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
        | sz AS (SELECT t, count(*) AS n FROM au GROUP BY t),
        | ovl AS (SELECT x.t AS ta, y.t AS tb, count(*) AS nboth
        |         FROM au x JOIN au y ON x.u = y.u AND x.t < y.t
        |         GROUP BY x.t, y.t)
        |SELECT a.t AS type_a, b.t AS type_b,
        | a.n AS users_a, b.n AS users_b,
        | COALESCE(o.nboth, 0) AS users_both,
        | a.n - COALESCE(o.nboth, 0) AS users_only_a,
        | floor((CAST(COALESCE(o.nboth, 0) AS DOUBLE)
        |   / CAST(a.n + b.n - COALESCE(o.nboth, 0) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |   AS audience_jaccard
        |FROM sz a JOIN sz b ON a.t < b.t
        |LEFT JOIN ovl o ON o.ta = a.t AND o.tb = b.t""".stripMargin,

    // N-way theta intersection (exact mode at test scales, like the
    // overlap face): always-on audience = users whose distinct-day count
    // equals the type's day count.
    "events_retention_sketch" ->
      """WITH ud AS (SELECT DISTINCT event_type AS t, epoch_ns(ts) // 86400000000000 AS d,
        |   user_id AS u FROM events),
        | days AS (SELECT t, count(DISTINCT d) AS nd FROM ud GROUP BY t),
        | peruser AS (SELECT t, u, count(DISTINCT d) AS c FROM ud GROUP BY t, u)
        |SELECT days.t AS event_type, CAST(days.nd AS BIGINT) AS n_days,
        | CAST((SELECT count(*) FROM peruser p WHERE p.t = days.t AND p.c = days.nd)
        |   AS BIGINT) AS users_every_day
        |FROM days""".stripMargin,

    // -------------------------------------------------------------- backbone
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(SUM(${ac("l_quantity")}) AS DOUBLE) / 100.0 AS sum_qty,
         | CAST(SUM(${ac("l_extendedprice")}) AS DOUBLE) / 100.0 AS sum_base_price,
         | CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
         | CAST(SUM(${ac("l_quantity")}) AS DOUBLE) / (100.0 * count(*)) AS avg_qty,
         | CAST(SUM(CAST(floor((l_discount * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / (10000.0 * count(*)) AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      s"""SELECT l_orderkey, o_orderpriority,
         | CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY l_orderkey, o_orderpriority""".stripMargin,

    "q5_multijoin" ->
      s"""SELECT n_name,
         | CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name""".stripMargin,

    "q4_semijoin" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY 1""".stripMargin,

    "q12_condagg" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q6_filter" ->
      s"""SELECT
         | CAST(SUM(CAST(floor(((l_extendedprice * l_discount) * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
         | count(*) AS n_rows
         |FROM lineitem
         |WHERE l_discount >= 0.02 AND l_discount <= 0.05 AND l_quantity < 24""".stripMargin,

    "events_json" ->
      """SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        | count(*) AS n,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2""".stripMargin,

    "profile_numeric" -> {
      Seq("l_quantity" -> "100.0", "l_extendedprice" -> "100.0",
        "l_discount" -> "10000.0", "l_tax" -> "10000.0").map { case (c, k) =>
        s"""SELECT '$c' AS variable, count(*) AS n, count(DISTINCT $c) AS n_distinct,
           | min($c) AS min_value, max($c) AS max_value,
           | CAST(SUM(CAST(floor(($c * $k) + 0.5) AS BIGINT)) AS DOUBLE) / ($k * count(*)) AS mean_value,
           | quantile_cont(CAST(floor(($c * $k) + 0.5) AS BIGINT), 0.5) / $k AS p50
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    "asof_join" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) // 1000 AS t FROM orders),
        |e0 AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS t, max_by(value, event_id) AS value
        |       FROM events GROUP BY 1, 2)
        |SELECT o.o_orderkey, o.o_custkey, e0.t AS event_t, e0.value AS event_value
        |FROM o ASOF LEFT JOIN e0 ON o.o_custkey = e0.user_id AND e0.t <= o.t""".stripMargin,

    "q14_promo" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END) AS DOUBLE)
        |  / CAST(SUM(rc) AS DOUBLE) AS promo_revenue_pct
        |FROM (SELECT CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT) AS rc,
        |             p_type
        |      FROM lineitem JOIN part ON l_partkey = p_partkey)""".stripMargin,

    "events_anomaly" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS d, count(*) AS n_events
        |               FROM events GROUP BY 1),
        |st AS (SELECT CAST(SUM(n_events) AS DOUBLE) AS s,
        |              CAST(SUM(n_events * n_events) AS DOUBLE) AS ss,
        |              CAST(count(*) AS DOUBLE) AS n FROM daily),
        |mu AS (SELECT s / n AS mu, sqrt((ss - s * s / n) / (n - 1.0)) AS sigma FROM st)
        |SELECT d, n_events, (CAST(n_events AS DOUBLE) - mu) / sigma AS z
        |FROM daily CROSS JOIN mu""".stripMargin,

    "orders_backlog" ->
      """WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref FROM orders),
        |aged AS (SELECT date_diff('day', CAST(o_orderdate AS DATE), ref) // 90 AS age_bucket,
        |          CAST(floor((o_totalprice * 100.0) + 0.5) AS BIGINT) AS vc
        |         FROM orders CROSS JOIN anchor
        |         WHERE o_orderstatus = 'O')
        |SELECT age_bucket, age_bucket * 90 AS age_days_lo,
        | CAST(count(*) AS BIGINT) AS n_orders,
        | CAST(SUM(vc) AS DOUBLE) / 100.0 AS open_value
        |FROM aged GROUP BY 1""".stripMargin,

    "events_heatmap" ->
      """WITH cells AS (
        | SELECT (epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow,
        |        (epoch_ns(ts) // 3600000000000) % 24 AS hour,
        |        CAST(count(*) AS BIGINT) AS n_events
        | FROM events GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t FROM cells)
        |SELECT dow, hour, n_events,
        | floor((CAST(n_events AS DOUBLE) / CAST(t AS DOUBLE)) * 100000000.0 + 0.5) / 100000000.0 AS share
        |FROM cells CROSS JOIN tot""".stripMargin,

    "events_anomaly_robust" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS d,
        |                CAST(count(*) AS BIGINT) AS n_events
        |               FROM events GROUP BY 1),
        |med AS (SELECT quantile_cont(n_events, 0.5) AS m FROM daily),
        |mad AS (SELECT quantile_cont(abs(CAST(n_events AS DOUBLE) - m), 0.5) AS mad
        |        FROM daily CROSS JOIN med)
        |SELECT d, n_events,
        | CASE WHEN mad <> 0 THEN
        |  floor(((CAST(n_events AS DOUBLE) - m) / (1.4826 * mad)) * 1000000.0 + 0.5) / 1000000.0
        | END AS robust_z
        |FROM daily CROSS JOIN med CROSS JOIN mad""".stripMargin,

    "events_cohort" ->
      """WITH e AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort_d FROM e GROUP BY 1)
        |SELECT cohort_d, d - cohort_d AS age_days,
        | CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin,

    "orders_rfm" ->
      """WITH b AS (SELECT o_custkey,
        |    max(epoch_ms(o_orderdate) // 1000) AS recency_t,
        |    count(*) AS frequency,
        |    SUM(CAST(floor((o_totalprice * 100.0) + 0.5) AS BIGINT)) AS mc
        |  FROM orders GROUP BY 1),
        |t AS (SELECT quantile_cont(recency_t, [0.25, 0.5, 0.75]) AS rt,
        |             quantile_cont(frequency, [0.25, 0.5, 0.75]) AS ft,
        |             quantile_cont(mc, [0.25, 0.5, 0.75]) AS mt FROM b)
        |SELECT o_custkey, recency_t, CAST(frequency AS BIGINT) AS frequency,
        | CAST(mc AS DOUBLE) / 100.0 AS monetary,
        | CAST(1 + CAST(recency_t > rt[1] AS INT) + CAST(recency_t > rt[2] AS INT) + CAST(recency_t > rt[3] AS INT) AS INT) AS r_q,
        | CAST(1 + CAST(frequency > ft[1] AS INT) + CAST(frequency > ft[2] AS INT) + CAST(frequency > ft[3] AS INT) AS INT) AS f_q,
        | CAST(1 + CAST(mc > mt[1] AS INT) + CAST(mc > mt[2] AS INT) + CAST(mc > mt[3] AS INT) AS INT) AS m_q
        |FROM b CROSS JOIN t""".stripMargin,

    "profile_categorical" -> {
      def one(c: String) =
        s"""SELECT '$c' AS variable, n, n_distinct, mode_value, mode_n, entropy FROM
           | (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS n_distinct,
           |   floor((ln(CAST(SUM(c) AS DOUBLE))
           |     - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS entropy
           |  FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS c FROM customer
           |        WHERE $c IS NOT NULL GROUP BY 1))
           | CROSS JOIN
           | (SELECT v AS mode_value, CAST(c AS BIGINT) AS mode_n
           |  FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS c FROM customer
           |        WHERE $c IS NOT NULL GROUP BY 1)
           |  ORDER BY c DESC, v ASC LIMIT 1)""".stripMargin
      Seq("c_mktsegment", "c_nationkey").map(one).mkString("\nUNION ALL\n")
    },

    "asof_nearest" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) // 1000 AS t FROM orders),
        |e0 AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS t, max_by(value, event_id) AS value
        |       FROM events GROUP BY 1, 2)
        |SELECT o.o_orderkey, o.o_custkey, n.t AS event_t, n.value AS event_value
        |FROM o LEFT JOIN LATERAL (
        |  SELECT t, value FROM e0
        |  WHERE e0.user_id = o.o_custkey
        |  ORDER BY CASE WHEN e0.t <= o.t THEN o.t - e0.t ELSE e0.t - o.t END ASC,
        |           CASE WHEN e0.t <= o.t THEN 0 ELSE 1 END ASC
        |  LIMIT 1) n ON TRUE""".stripMargin,

    "topn_window" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        | SELECT o_orderpriority,
        |  CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn,
        |  o_orderkey, o_totalprice
        | FROM orders) t
        |WHERE rn <= 3""".stripMargin,

    "events_sessionize" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS t,
        |        CAST(floor((value * 100.0) + 0.5) AS BIGINT) AS vc
        | FROM events),
        |b AS (
        | SELECT user_id, t, vc, event_id,
        |  CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 1800
        |         OR lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
        |       THEN 1 ELSE 0 END AS brk
        | FROM e),
        |s AS (
        | SELECT user_id, t, vc,
        |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        | FROM b)
        |SELECT user_id, session_id, count(*) AS n_events,
        | max(t) - min(t) AS duration_sec,
        | CAST(SUM(vc) AS DOUBLE) / 100.0 AS session_value
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    "events_window" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS window_start, event_type,
        | count(*) AS n_events,
        | CAST(SUM(CAST(floor((value * 100.0) + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
        | CAST(SUM(CAST(floor((value * 100.0) + 0.5) AS BIGINT)) AS DOUBLE) / (100.0 * count(*)) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // --------------------------------------------------------------- imputer
    "imp_missing_indicator" ->
      s"""WITH mcv AS ($MCV)
         |SELECT c_custkey, c_acctbal IS NULL AS c_acctbal_flag,
         |       c_mktsegment IS NULL AS c_mktsegment_flag
         |FROM mcv""".stripMargin,

    "imp_missing_patterns" ->
      s"""WITH mcv AS ($MCV)
         |SELECT c_acctbal IS NULL AS acctbal_missing,
         | c_mktsegment IS NULL AS seg_missing,
         | CAST(count(*) AS BIGINT) AS n_rows
         |FROM mcv GROUP BY 1, 2""".stripMargin,

    "imp_missing_metrics" -> {
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      cols.map { c =>
        s"""SELECT '$c' AS variable, count($c) AS observed,
           | count(*) - count($c) AS missing, count(*) AS total,
           | CAST(count(*) - count($c) AS DOUBLE) / count(*) AS imputation_rate
           |FROM mcv""".stripMargin
      }.mkString(s"WITH mcv AS ($MCV)\n", "\nUNION ALL\n", "")
    },

    "imp_ffill_bfill" ->
      s"""WITH mcv AS ($MCV),
         |ff AS (
         | SELECT c_custkey,
         |  last_value(c_acctbal IGNORE NULLS) OVER w AS a1,
         |  last_value(c_mktsegment IGNORE NULLS) OVER w AS s1
         | FROM mcv
         | WINDOW w AS (ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |fb AS (
         | SELECT c_custkey,
         |  coalesce(a1, first_value(a1 IGNORE NULLS) OVER w2) AS acctbal_filled,
         |  coalesce(s1, first_value(s1 IGNORE NULLS) OVER w2) AS seg_filled
         | FROM ff
         | WINDOW w2 AS (ORDER BY c_custkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT c_custkey, acctbal_filled, seg_filled FROM fb""".stripMargin,

    "imp_hotdeck" ->
      s"""WITH mcv AS ($MCV),
         |o AS (SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment,
         |       ((c_custkey % 2147483647) * 2654435761) % 2147483647 AS hd
         |      FROM mcv),
         |ff AS (
         | SELECT c_custkey, c_nationkey,
         |  last_value(c_acctbal IGNORE NULLS) OVER w AS a1,
         |  last_value(c_mktsegment IGNORE NULLS) OVER w AS s1,
         |  hd
         | FROM o
         | WINDOW w AS (PARTITION BY c_nationkey ORDER BY hd, c_custkey
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |fb AS (
         | SELECT c_custkey, c_nationkey,
         |  coalesce(a1, first_value(a1 IGNORE NULLS) OVER w2) AS acctbal_filled,
         |  coalesce(s1, first_value(s1 IGNORE NULLS) OVER w2) AS seg_filled
         | FROM ff
         | WINDOW w2 AS (PARTITION BY c_nationkey ORDER BY hd, c_custkey
         |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT c_custkey, c_nationkey, acctbal_filled, seg_filled FROM fb""".stripMargin,

    "imp_class_threshold" -> {
      Seq("c_name", "c_mktsegment", "c_nationkey").map { c =>
        s"""SELECT '$c' AS variable, CAST(count(DISTINCT $c) AS BIGINT) AS n_classes,
           | count(DISTINCT $c) <= 30 AS keep FROM customer""".stripMargin
      }.mkString("\nUNION ALL\n")
    },

    "imp_onehot" -> {
      val segs = Q.segments
      val cases = segs.map(v =>
        s"CASE WHEN c_mktsegment = '$v' THEN 1 ELSE 0 END AS mkt_$v").mkString(",\n ")
      s"SELECT c_custkey,\n $cases\nFROM customer"
    },

    "imp_minmax_scale" ->
      """WITH s AS (SELECT min(c_acctbal) AS mn, max(c_acctbal) AS mx FROM customer)
        |SELECT c_custkey,
        | CASE WHEN mx = mn THEN 0.0 ELSE (c_acctbal - mn) / (mx - mn) END AS acctbal_scaled
        |FROM customer CROSS JOIN s""".stripMargin,

    "imp_mean" ->
      s"""WITH mcv AS ($MCV),
         |s AS (SELECT CAST(floor((CAST(SUM(${ac("c_acctbal")}) AS DOUBLE) / count(c_acctbal)) + 0.5) AS BIGINT) AS m FROM mcv)
         |SELECT c_custkey, coalesce(c_acctbal, CAST(m AS DOUBLE) / 100.0) AS acctbal_imp
         |FROM mcv CROSS JOIN s""".stripMargin,

    "imp_median" ->
      s"""WITH mcv AS ($MCV),
         |s AS (SELECT CAST(floor((quantile_cont(${ac("c_acctbal")}, 0.5)) + 0.5) AS BIGINT) AS m FROM mcv)
         |SELECT c_custkey, coalesce(c_acctbal, CAST(m AS DOUBLE) / 100.0) AS acctbal_imp
         |FROM mcv CROSS JOIN s""".stripMargin,

    // k=3 nearest-by-custkey mean. The candidate join is BANDED (±8 on
    // custkey) instead of the quadratic CROSS JOIN that blew the sf1
    // oracle budget — provably lossless here: custkeys are consecutive
    // integers and the mask NULLs exactly the keys ≡ 3 (mod 7), so any
    // ±4 window around a missing key holds ≥ 3 observed keys (≤ 2 of the
    // ≤ 9 keys are masked; edge-truncated windows still hold ≥ 5 keys of
    // which ≤ 1 masked, for any table of ≥ 12 rows) — the global top-3
    // by |ox−mx| always live inside the ±8 band, and the rank order
    // within the band is the same expression.
    "imp_knn" ->
      s"""WITH mcv AS ($MCV),
         |obs AS (SELECT c_custkey AS oid, CAST(c_custkey AS DOUBLE) AS ox,
         |               ${ac("c_acctbal")} AS yc
         |        FROM mcv WHERE c_acctbal IS NOT NULL),
         |miss AS (SELECT c_custkey AS mid, CAST(c_custkey AS DOUBLE) AS mx
         |         FROM mcv WHERE c_acctbal IS NULL),
         |r AS (SELECT mid, yc,
         |        row_number() OVER (PARTITION BY mid ORDER BY abs(ox - mx), ox, oid) AS rk
         |      FROM miss JOIN obs ON ox BETWEEN mx - 8 AND mx + 8),
         |im AS (SELECT mid, CAST(floor((CAST(sum(yc) AS DOUBLE) / count(*)) + 0.5) AS BIGINT) AS myc
         |       FROM r WHERE rk <= 3 GROUP BY mid)
         |SELECT c_custkey, coalesce(c_acctbal, CAST(myc AS DOUBLE) / 100.0) AS acctbal_imp
         |FROM mcv LEFT JOIN im ON mcv.c_custkey = im.mid""".stripMargin,

    "imp_constant" ->
      s"""WITH mcv AS ($MCV)
         |SELECT c_custkey, coalesce(c_mktsegment, 'UNKNOWN') AS seg_imp FROM mcv""".stripMargin,

    "imp_interpolate" ->
      s"""WITH mcv AS ($MCV),
         |w AS (SELECT c_custkey, c_acctbal,
         |  last_value(CASE WHEN c_acctbal IS NOT NULL THEN CAST(c_custkey AS DOUBLE) END IGNORE NULLS)
         |    OVER (ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x0,
         |  last_value(c_acctbal IGNORE NULLS)
         |    OVER (ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y0,
         |  first_value(CASE WHEN c_acctbal IS NOT NULL THEN CAST(c_custkey AS DOUBLE) END IGNORE NULLS)
         |    OVER (ORDER BY c_custkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS x1,
         |  first_value(c_acctbal IGNORE NULLS)
         |    OVER (ORDER BY c_custkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS y1
         | FROM mcv)
         |SELECT c_custkey,
         | CASE WHEN c_acctbal IS NOT NULL THEN c_acctbal
         |      WHEN y0 IS NULL THEN y1
         |      WHEN y1 IS NULL THEN y0
         |      ELSE y0 + (y1 - y0) * (CAST(c_custkey AS DOUBLE) - x0) / (x1 - x0) END AS acctbal_interp
         |FROM w""".stripMargin,

    "imp_mode" ->
      s"""WITH mcv AS ($MCV),
         |m AS (SELECT c_mktsegment AS v FROM mcv WHERE c_mktsegment IS NOT NULL
         |      GROUP BY 1 ORDER BY count(*) DESC, v ASC LIMIT 1)
         |SELECT c_custkey, coalesce(c_mktsegment, v) AS seg_imp FROM mcv CROSS JOIN m""".stripMargin,

    "imp_group_mode" ->
      s"""WITH mcv AS ($MCV),
         |cnt AS (SELECT c_nationkey, c_mktsegment AS v, count(*) AS c FROM mcv
         |        WHERE c_mktsegment IS NOT NULL GROUP BY 1, 2),
         |gm AS (SELECT c_nationkey, v AS gmode FROM (
         |        SELECT c_nationkey, v,
         |          row_number() OVER (PARTITION BY c_nationkey ORDER BY c DESC, v ASC) AS rk
         |        FROM cnt) WHERE rk = 1),
         |g AS (SELECT c_mktsegment AS gmode0 FROM mcv WHERE c_mktsegment IS NOT NULL
         |      GROUP BY 1 ORDER BY count(*) DESC, gmode0 ASC LIMIT 1)
         |SELECT c_custkey, coalesce(c_mktsegment, gmode, gmode0) AS seg_imp
         |FROM mcv LEFT JOIN gm USING (c_nationkey) CROSS JOIN g""".stripMargin,

    "imp_group_mean" ->
      s"""WITH mcv AS ($MCV),
         |gm AS (SELECT c_nationkey,
         |  CAST(floor((CAST(SUM(${ac("c_acctbal")}) AS DOUBLE) / count(c_acctbal)) + 0.5) AS BIGINT) AS gmv
         | FROM mcv GROUP BY c_nationkey),
         |g AS (SELECT CAST(floor((CAST(SUM(${ac("c_acctbal")}) AS DOUBLE) / count(c_acctbal)) + 0.5) AS BIGINT) AS gv FROM mcv)
         |SELECT c_custkey,
         | coalesce(c_acctbal, CAST(gmv AS DOUBLE) / 100.0, CAST(gv AS DOUBLE) / 100.0) AS acctbal_imp
         |FROM mcv LEFT JOIN gm USING (c_nationkey) CROSS JOIN g""".stripMargin,

    "imp_missing_corr" ->
      s"""WITH mcv AS ($MCV),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN c_acctbal IS NULL AND c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |  CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |  CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ns
         | FROM mcv)
         |SELECT 'c_acctbal~c_mktsegment' AS pair, n AS n_rows, na AS n_miss_a,
         | ns AS n_miss_b, n11 AS n_miss_both,
         | floor(((CAST(n11 AS DOUBLE) * CAST(n AS DOUBLE)
         |   - CAST(na AS DOUBLE) * CAST(ns AS DOUBLE))
         |  / sqrt(CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE)
         |    * CAST(ns AS DOUBLE) * CAST(n - ns AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS phi
         |FROM t""".stripMargin,

    "imp_group_median" ->
      s"""WITH mcv AS ($MCV),
         |gm AS (SELECT c_nationkey,
         |  CAST(floor((quantile_cont(${ac("c_acctbal")}, 0.5)) + 0.5) AS BIGINT) AS gmv
         | FROM mcv GROUP BY c_nationkey),
         |g AS (SELECT CAST(floor((quantile_cont(${ac("c_acctbal")}, 0.5)) + 0.5) AS BIGINT) AS gv FROM mcv)
         |SELECT c_custkey,
         | coalesce(c_acctbal, CAST(gmv AS DOUBLE) / 100.0, CAST(gv AS DOUBLE) / 100.0) AS acctbal_imp
         |FROM mcv LEFT JOIN gm USING (c_nationkey) CROSS JOIN g""".stripMargin,

    "orders_migration" ->
      s"""WITH o AS (SELECT o_custkey, ${ac("o_totalprice")} AS tc,
         |  epoch_ms(o_orderdate) // 86400000 AS d FROM orders),
         |mid AS (SELECT (min(d) + max(d)) // 2 AS m FROM o),
         |e AS (SELECT o_custkey, CAST(SUM(tc) AS BIGINT) AS s
         |      FROM o CROSS JOIN mid WHERE d <= m GROUP BY 1),
         |l AS (SELECT o_custkey, CAST(SUM(tc) AS BIGINT) AS s
         |      FROM o CROSS JOIN mid WHERE d > m GROUP BY 1),
         |eq AS (SELECT CAST(floor((quantile_cont(s, 0.25)) + 0.5) AS BIGINT) AS q1,
         |        CAST(floor((quantile_cont(s, 0.5)) + 0.5) AS BIGINT) AS q2,
         |        CAST(floor((quantile_cont(s, 0.75)) + 0.5) AS BIGINT) AS q3 FROM e),
         |lq AS (SELECT CAST(floor((quantile_cont(s, 0.25)) + 0.5) AS BIGINT) AS q1,
         |        CAST(floor((quantile_cont(s, 0.5)) + 0.5) AS BIGINT) AS q2,
         |        CAST(floor((quantile_cont(s, 0.75)) + 0.5) AS BIGINT) AS q3 FROM l),
         |eb AS (SELECT o_custkey,
         |        CASE WHEN s <= q1 THEN 1 WHEN s <= q2 THEN 2
         |             WHEN s <= q3 THEN 3 ELSE 4 END AS q_early
         |       FROM e CROSS JOIN eq),
         |lb AS (SELECT o_custkey,
         |        CASE WHEN s <= q1 THEN 1 WHEN s <= q2 THEN 2
         |             WHEN s <= q3 THEN 3 ELSE 4 END AS q_late
         |       FROM l CROSS JOIN lq)
         |SELECT CAST(coalesce(q_early, 0) AS BIGINT) AS q_early,
         | CAST(coalesce(q_late, 0) AS BIGINT) AS q_late,
         | CAST(count(*) AS BIGINT) AS n_customers
         |FROM eb FULL OUTER JOIN lb USING (o_custkey)
         |GROUP BY 1, 2""".stripMargin,

    "orders_cltv" ->
      s"""WITH o AS (SELECT o_custkey, ${ac("o_totalprice")} AS tc,
         |  epoch_ms(o_orderdate) // 86400000 AS d FROM orders),
         |a AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(SUM(tc) AS BIGINT) AS spend,
         |  CAST(max(d) - min(d) + 1 AS BIGINT) AS tenure_days
         | FROM o GROUP BY 1)
         |SELECT o_custkey, n_orders, CAST(spend AS DOUBLE) / 100.0 AS total_spend,
         | tenure_days,
         | floor((CAST(spend AS DOUBLE) / (100.0 * tenure_days)) * 1000000.0 + 0.5) / 1000000.0 AS spend_per_day,
         | floor((365.0 * CAST(spend AS DOUBLE) / (100.0 * tenure_days)) * 1000000.0 + 0.5) / 1000000.0 AS cltv_365
         |FROM a""".stripMargin,

    "text_lang_confusion" -> {
      val markers = graft.text.TextAnalysis.langMarkers
      val scores = markers.map { case (l, ws) =>
        val in = ws.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(t, x -> x IN ($in))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      val names = markers.map { case (l, _) => s"s_$l" }.mkString(", ")
      val cases = markers.init.map { case (l, _) =>
        s"WHEN s_$l = m THEN '$l'"
      }.mkString(" ")
      s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
         |sc AS (SELECT doc_id, lang,
         |  $scores
         | FROM d),
         |g AS (SELECT *, greatest($names) AS m FROM sc)
         |SELECT lang AS declared_lang,
         | CASE $cases ELSE '${markers.last._1}' END AS pred_lang,
         | CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(SUM(m) AS BIGINT) AS sum_score
         |FROM g GROUP BY 1, 2""".stripMargin
    },

    "imp_regression" ->
      s"""WITH mlv AS ($MLV),
         |c AS (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         |  ${ac("l_quantity")} AS xc, ${ac("l_extendedprice")} AS yc FROM mlv),
         |s AS (SELECT CAST(SUM(xc * yc) AS DOUBLE) AS sxy, CAST(SUM(xc * xc) AS DOUBLE) AS sxx,
         |  CAST(SUM(xc) AS DOUBLE) AS sx, CAST(SUM(yc) AS DOUBLE) AS sy,
         |  CAST(count(*) AS DOUBLE) AS n
         | FROM c WHERE l_extendedprice IS NOT NULL),
         |s2 AS (SELECT sy / n AS my, sx / n AS mx,
         |  (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b FROM s)
         |SELECT l_orderkey, l_linenumber,
         | coalesce(l_extendedprice, (my - b * mx + b * ${ac("l_quantity")}) / 100.0) AS price_imp
         |FROM mlv CROSS JOIN s2""".stripMargin,

    "imp_iterative" -> {
      // MICE: mean init then 2 chained OLS sweeps (y~x on y-observed rows,
      // then x~y), every fill quantized to integer cents so each sweep's
      // moments stay exact. Mirrors graft.imputer.IterativeImpute.mice2.
      val mv =
        """SELECT l_orderkey, l_linenumber,
          | CASE WHEN (l_orderkey + l_linenumber) % 17 = 2 THEN NULL ELSE l_quantity END AS x,
          | CASE WHEN (l_orderkey + l_linenumber) % 13 = 1 THEN NULL ELSE l_extendedprice END AS y
          |FROM lineitem""".stripMargin
      val sweeps = (1 to 2).flatMap(_ => Seq(("xf", "yc", "yf"), ("yf", "xc", "xf")))
      val (ctes, last) = sweeps.zipWithIndex.foldLeft((List.empty[String], "f0")) {
        case ((acc, prev), ((pred, tgt, tgtf), i)) =>
          val s = s"s${i + 1}"
          val f = s"f${i + 1}"
          val sCte =
            s"""$s AS (SELECT sy / n AS my, sx / n AS mx,
               |  (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b FROM (
               |  SELECT CAST(SUM(CAST($pred AS HUGEINT) * $tgt) AS DOUBLE) AS sxy,
               |   CAST(SUM(CAST($pred AS HUGEINT) * $pred) AS DOUBLE) AS sxx,
               |   CAST(SUM($pred) AS DOUBLE) AS sx, CAST(SUM($tgt) AS DOUBLE) AS sy,
               |   CAST(count(*) AS DOUBLE) AS n FROM $prev WHERE $tgt IS NOT NULL))""".stripMargin
          val keepF = if (tgtf == "yf") "xf" else "yf"
          val fCte =
            s"""$f AS (SELECT l_orderkey, l_linenumber, xc, yc, $keepF,
               |  CASE WHEN $tgt IS NOT NULL THEN $tgt
               |       ELSE CAST(floor((my - b * mx + b * CAST($pred AS DOUBLE)) + 0.5) AS BIGINT) END AS $tgtf
               |  FROM $prev CROSS JOIN $s)""".stripMargin
          (acc :+ sCte :+ fCte, f)
      }
      s"""WITH mv AS ($mv),
         |b AS (SELECT l_orderkey, l_linenumber, ${ac("x")} AS xc, ${ac("y")} AS yc FROM mv),
         |m0 AS (SELECT CAST(floor((CAST(SUM(xc) AS DOUBLE) / count(xc)) + 0.5) AS BIGINT) AS mxc,
         |              CAST(floor((CAST(SUM(yc) AS DOUBLE) / count(yc)) + 0.5) AS BIGINT) AS myc FROM b),
         |f0 AS (SELECT l_orderkey, l_linenumber, xc, yc,
         |        coalesce(xc, mxc) AS xf, coalesce(yc, myc) AS yf FROM b CROSS JOIN m0),
         |${ctes.mkString(",\n")}
         |SELECT l_orderkey, l_linenumber,
         | CAST(xf AS DOUBLE) / 100.0 AS l_quantity_imp,
         | CAST(yf AS DOUBLE) / 100.0 AS l_extendedprice_imp
         |FROM $last""".stripMargin
    },

    "imp_iterative_multi" -> {
      // Multi-predictor MICE: mean init, then per sweep each of (x, y, z)
      // regresses on the OTHER TWO via exact HUGEINT cross-moments and the
      // centered 2x2 Cramer solve, fills quantized to integer cents.
      // Mirrors graft.imputer.IterativeImpute.mice3 expression-for-
      // expression (same double op order, same nesting).
      val mv =
        """SELECT l_orderkey, l_linenumber,
          | CASE WHEN (l_orderkey + l_linenumber) % 17 = 2 THEN NULL ELSE l_quantity END AS x,
          | CASE WHEN (l_orderkey + l_linenumber) % 13 = 1 THEN NULL ELSE l_extendedprice END AS y,
          | CASE WHEN (l_orderkey + l_linenumber) % 19 = 3 THEN NULL ELSE l_discount END AS z
          |FROM lineitem""".stripMargin
      val updates = (1 to 2).flatMap(_ => Seq(
        ("yf", "zf", "xc", "xf"), ("xf", "zf", "yc", "yf"), ("xf", "yf", "zc", "zf")))
      val (ctes, last) = updates.zipWithIndex.foldLeft((List.empty[String], "f0")) {
        case ((acc, prev), ((p1, p2, tgt, tgtf), i)) =>
          val s = s"s${i + 1}"
          val f = s"f${i + 1}"
          val sCte =
            s"""$s AS (SELECT my, m1, m2,
               |  (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
               |  (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2
               | FROM (SELECT sy / n AS my, s1 / n AS m1, s2 / n AS m2,
               |   s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
               |   s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
               |   s2y - s2 * sy / n AS c2y
               |  FROM (SELECT
               |   CAST(SUM(CAST($p1 AS HUGEINT) * $tgt) AS DOUBLE) AS s1y,
               |   CAST(SUM(CAST($p2 AS HUGEINT) * $tgt) AS DOUBLE) AS s2y,
               |   CAST(SUM(CAST($p1 AS HUGEINT) * $p1) AS DOUBLE) AS s11,
               |   CAST(SUM(CAST($p2 AS HUGEINT) * $p2) AS DOUBLE) AS s22,
               |   CAST(SUM(CAST($p1 AS HUGEINT) * $p2) AS DOUBLE) AS s12,
               |   CAST(SUM($p1) AS DOUBLE) AS s1, CAST(SUM($p2) AS DOUBLE) AS s2,
               |   CAST(SUM($tgt) AS DOUBLE) AS sy, CAST(count(*) AS DOUBLE) AS n
               |   FROM $prev WHERE $tgt IS NOT NULL)))""".stripMargin
          val keeps = Seq("xf", "yf", "zf").filter(_ != tgtf).mkString(", ")
          val fCte =
            s"""$f AS (SELECT l_orderkey, l_linenumber, xc, yc, zc, $keeps,
               |  CASE WHEN $tgt IS NOT NULL THEN $tgt
               |       ELSE CAST(floor((my - b1 * m1 - b2 * m2 + b1 * CAST($p1 AS DOUBLE) + b2 * CAST($p2 AS DOUBLE)) + 0.5) AS BIGINT) END AS $tgtf
               |  FROM $prev CROSS JOIN $s)""".stripMargin
          (acc :+ sCte :+ fCte, f)
      }
      s"""WITH mv AS ($mv),
         |b AS (SELECT l_orderkey, l_linenumber, ${ac("x")} AS xc, ${ac("y")} AS yc, ${ac("z")} AS zc FROM mv),
         |m0 AS (SELECT CAST(floor((CAST(SUM(xc) AS DOUBLE) / count(xc)) + 0.5) AS BIGINT) AS mxc,
         |              CAST(floor((CAST(SUM(yc) AS DOUBLE) / count(yc)) + 0.5) AS BIGINT) AS myc,
         |              CAST(floor((CAST(SUM(zc) AS DOUBLE) / count(zc)) + 0.5) AS BIGINT) AS mzc FROM b),
         |f0 AS (SELECT l_orderkey, l_linenumber, xc, yc, zc,
         |        coalesce(xc, mxc) AS xf, coalesce(yc, myc) AS yf, coalesce(zc, mzc) AS zf FROM b CROSS JOIN m0),
         |${ctes.mkString(",\n")}
         |SELECT l_orderkey, l_linenumber,
         | CAST(xf AS DOUBLE) / 100.0 AS l_quantity_imp,
         | CAST(yf AS DOUBLE) / 100.0 AS l_extendedprice_imp,
         | CAST(zf AS DOUBLE) / 100.0 AS l_discount_imp
         |FROM $last""".stripMargin
    },

    "imp_simulation" ->
      s"""WITH mcv AS ($MCV),
         |obs AS (SELECT c_custkey, ${ac("c_acctbal")} AS acv FROM mcv WHERE c_acctbal IS NOT NULL),
         |m AS (SELECT CAST(floor((CAST(SUM(acv) AS DOUBLE) / count(*)) + 0.5) AS BIGINT) AS m
         |      FROM obs WHERE c_custkey % 10 <> 0),
         |mse AS (SELECT CAST(SUM((m - acv) * (m - acv)) AS DOUBLE) / (10000.0 * count(*)) AS score
         |        FROM obs CROSS JOIN m WHERE c_custkey % 10 = 0),
         |obc AS (SELECT c_custkey, c_mktsegment FROM mcv WHERE c_mktsegment IS NOT NULL),
         |md AS (SELECT c_mktsegment AS v FROM obc WHERE c_custkey % 10 <> 0
         |       GROUP BY 1 ORDER BY count(*) DESC, v ASC LIMIT 1),
         |acc AS (SELECT CAST(SUM(CASE WHEN c_mktsegment = v THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS score
         |        FROM obc CROSS JOIN md WHERE c_custkey % 10 = 0)
         |SELECT 'c_acctbal' AS variable, 'mse' AS metric, score FROM mse
         |UNION ALL
         |SELECT 'c_mktsegment' AS variable, 'accuracy' AS metric, score FROM acc""".stripMargin,

    "imp_select_model" ->
      s"""WITH mlv AS ($MLV),
         |c AS (SELECT l_suppkey, ${ac("l_quantity")} AS xc, ${ac("l_extendedprice")} AS yc,
         |  (l_orderkey + l_linenumber) % 10 AS k FROM mlv),
         |obs AS (SELECT * FROM c WHERE yc IS NOT NULL),
         |train AS (SELECT * FROM obs WHERE k <> 0),
         |test AS (SELECT * FROM obs WHERE k = 0),
         |meanstat AS (SELECT CAST(floor((CAST(SUM(yc) AS DOUBLE) / count(*)) + 0.5) AS BIGINT) AS m FROM train),
         |medstat AS (SELECT CAST(floor((quantile_cont(yc, 0.5)) + 0.5) AS BIGINT) AS m FROM train),
         |gmstat AS (SELECT l_suppkey, CAST(floor((CAST(SUM(yc) AS DOUBLE) / count(*)) + 0.5) AS BIGINT) AS gm
         |           FROM train GROUP BY l_suppkey),
         |regstat AS (SELECT sy / n AS my, sx / n AS mx,
         |   (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b
         |  FROM (SELECT CAST(SUM(xc * yc) AS DOUBLE) AS sxy, CAST(SUM(xc * xc) AS DOUBLE) AS sxx,
         |         CAST(SUM(xc) AS DOUBLE) AS sx, CAST(SUM(yc) AS DOUBLE) AS sy,
         |         CAST(count(*) AS DOUBLE) AS n FROM train) t),
         |m_mean AS (SELECT CAST(SUM((m - yc) * (m - yc)) AS DOUBLE) / (10000.0 * count(*)) AS mse
         |           FROM test CROSS JOIN meanstat),
         |m_median AS (SELECT CAST(SUM((m - yc) * (m - yc)) AS DOUBLE) / (10000.0 * count(*)) AS mse
         |             FROM test CROSS JOIN medstat),
         |m_group AS (SELECT CAST(SUM((p - yc) * (p - yc)) AS DOUBLE) / (10000.0 * count(*)) AS mse
         |            FROM (SELECT coalesce(gm, m) AS p, yc
         |                  FROM test LEFT JOIN gmstat USING (l_suppkey) CROSS JOIN meanstat) t),
         |m_reg AS (SELECT CAST(SUM((p - yc) * (p - yc)) AS DOUBLE) / (10000.0 * count(*)) AS mse
         |          FROM (SELECT CAST(floor((my - b * mx + b * xc) + 0.5) AS BIGINT) AS p, yc
         |                FROM test CROSS JOIN regstat) t),
         |allm AS (
         | SELECT 'mean' AS strategy, mse FROM m_mean
         | UNION ALL SELECT 'median', mse FROM m_median
         | UNION ALL SELECT 'group_mean', mse FROM m_group
         | UNION ALL SELECT 'regression', mse FROM m_reg)
         |SELECT strategy, mse,
         | CAST(row_number() OVER (ORDER BY mse ASC, strategy ASC) AS BIGINT) AS rank
         |FROM allm""".stripMargin,

    "imp_variance" ->
      s"""WITH mcv AS ($MCV),
         |meanstat AS (SELECT CAST(floor((CAST(SUM(${ac("c_acctbal")}) AS DOUBLE) / count(c_acctbal)) + 0.5) AS BIGINT) AS m FROM mcv),
         |medstat AS (SELECT CAST(floor((quantile_cont(${ac("c_acctbal")}, 0.5)) + 0.5) AS BIGINT) AS m FROM mcv),
         |gmstat AS (SELECT c_nationkey, CAST(floor((CAST(SUM(${ac("c_acctbal")}) AS DOUBLE) / count(c_acctbal)) + 0.5) AS BIGINT) AS gm
         |           FROM mcv GROUP BY c_nationkey),
         |d1 AS (SELECT coalesce(${ac("c_acctbal")}, m) AS ic FROM mcv CROSS JOIN meanstat),
         |d2 AS (SELECT coalesce(${ac("c_acctbal")}, m) AS ic FROM mcv CROSS JOIN medstat),
         |d3 AS (SELECT coalesce(${ac("c_acctbal")}, gm, m) AS ic
         |       FROM mcv LEFT JOIN gmstat USING (c_nationkey) CROSS JOIN meanstat),
         |ms AS (
         | SELECT floor((CAST(SUM(ic) AS DOUBLE) / (100.0 * count(*))) * 1000000.0 + 0.5) / 1000000.0 AS dm FROM d1
         | UNION ALL SELECT floor((CAST(SUM(ic) AS DOUBLE) / (100.0 * count(*))) * 1000000.0 + 0.5) / 1000000.0 FROM d2
         | UNION ALL SELECT floor((CAST(SUM(ic) AS DOUBLE) / (100.0 * count(*))) * 1000000.0 + 0.5) / 1000000.0 FROM d3),
         |contv AS (SELECT floor((var_samp(dm)) * 100000000.0 + 0.5) / 100000000.0 AS imputation_variance FROM ms),
         |modestat AS (SELECT c_mktsegment AS v FROM mcv WHERE c_mktsegment IS NOT NULL
         |             GROUP BY 1 ORDER BY count(*) DESC, v ASC LIMIT 1),
         |gmodestat AS (SELECT c_nationkey, c_mktsegment AS gv FROM (
         |   SELECT c_nationkey, c_mktsegment,
         |    row_number() OVER (PARTITION BY c_nationkey ORDER BY count(*) DESC, c_mktsegment ASC) AS rn
         |   FROM mcv WHERE c_mktsegment IS NOT NULL GROUP BY c_nationkey, c_mktsegment) t
         |  WHERE rn = 1),
         |c1 AS (SELECT coalesce(c_mktsegment, v) AS sv FROM mcv CROSS JOIN modestat),
         |c2 AS (SELECT coalesce(c_mktsegment, gv, v) AS sv
         |       FROM mcv LEFT JOIN gmodestat USING (c_nationkey) CROSS JOIN modestat),
         |sfill AS (SELECT coalesce(s1, first_value(s1 IGNORE NULLS) OVER w2) AS sv FROM (
         |   SELECT last_value(c_mktsegment IGNORE NULLS) OVER w AS s1, c_custkey FROM mcv
         |   WINDOW w AS (ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) t
         |  WINDOW w2 AS (ORDER BY c_custkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         |es AS (
         | SELECT floor((ln(CAST(SUM(c) AS DOUBLE)) - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS ent
         |  FROM (SELECT count(*) AS c FROM c1 GROUP BY sv) t
         | UNION ALL
         | SELECT floor((ln(CAST(SUM(c) AS DOUBLE)) - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         |  FROM (SELECT count(*) AS c FROM c2 GROUP BY sv) t
         | UNION ALL
         | SELECT floor((ln(CAST(SUM(c) AS DOUBLE)) - SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         |  FROM (SELECT count(*) AS c FROM sfill GROUP BY sv) t),
         |catv AS (SELECT floor((var_samp(ent)) * 100000000.0 + 0.5) / 100000000.0 AS imputation_variance FROM es)
         |SELECT 'c_acctbal' AS variable, imputation_variance FROM contv
         |UNION ALL
         |SELECT 'c_mktsegment' AS variable, imputation_variance FROM catv""".stripMargin,

    "imp_feature_matrix" -> {
      val segs = Q.segments
      val ohCases = segs.map(v =>
        s"CASE WHEN seg_f = '$v' THEN 1 ELSE 0 END AS mkt_$v").mkString(",\n  ")
      val feats = Seq("acctbal_f" -> "f_acctbal", "c_nationkey" -> "f_nationkey") ++
        segs.map(v => s"mkt_$v" -> s"f_mkt_$v") ++
        Seq("acctbal_flag" -> "f_acctbal_flag", "seg_flag" -> "f_seg_flag")
      val statSel = feats.map { case (c, _) => s"min($c) AS mn_$c, max($c) AS mx_$c" }.mkString(", ")
      val outSel = feats.map { case (c, o) =>
        s"CASE WHEN mx_$c = mn_$c THEN 0.0 ELSE ($c - mn_$c) / (mx_$c - mn_$c) END AS $o"
      }.mkString(",\n ")
      s"""WITH mcv AS ($MCV),
         |ff AS (
         | SELECT c_custkey, c_nationkey,
         |  last_value(c_acctbal IGNORE NULLS) OVER w AS a1,
         |  last_value(c_mktsegment IGNORE NULLS) OVER w AS s1
         | FROM mcv
         | WINDOW w AS (ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |fb AS (
         | SELECT c_custkey, c_nationkey,
         |  coalesce(a1, first_value(a1 IGNORE NULLS) OVER w2) AS acctbal_f,
         |  coalesce(s1, first_value(s1 IGNORE NULLS) OVER w2) AS seg_f
         | FROM ff
         | WINDOW w2 AS (ORDER BY c_custkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         |fm AS (
         | SELECT c_custkey, c_nationkey, acctbal_f,
         |  $ohCases,
         |  CASE WHEN c_custkey % 7 = 3 THEN 1 ELSE 0 END AS acctbal_flag,
         |  CASE WHEN c_custkey % 11 = 5 THEN 1 ELSE 0 END AS seg_flag
         | FROM fb),
         |st AS (SELECT $statSel FROM fm)
         |SELECT c_custkey,
         | $outSel
         |FROM fm CROSS JOIN st""".stripMargin
    },

    // ------------------------------------------------------------------ text
    "text_pack" ->
      """WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        | FROM d)
        |SELECT doc_id, n_tokens, tok_start,
        | tok_start // 512 AS pack_id,
        | CAST(((tok_start + greatest(n_tokens - 1, 0)) // 512) - (tok_start // 512) + 1 AS BIGINT) AS n_packs
        |FROM c""".stripMargin,

    "embed_quantize" ->
      """WITH e AS (SELECT vec_id, embedding,
        |             CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS scale
        |           FROM embeddings),
        |x AS (SELECT vec_id, scale, embedding AS emb,
        |        unnest(generate_series(1, len(embedding))) AS i
        |      FROM e)
        |SELECT vec_id, CAST(i - 1 AS INT) AS dim,
        | CAST(emb[i] AS DOUBLE) AS v,
        | CASE WHEN scale = 0.0 THEN 0
        |      ELSE CAST(floor(CAST(emb[i] AS DOUBLE) * 127.0 / scale + 0.5) AS INT) END AS q,
        | scale
        |FROM x""".stripMargin,

    "embed_outliers" ->
      """WITH b AS (SELECT vec_id, label,
        |  [CAST(floor((CAST(x AS DOUBLE) * 1000000.0) + 0.5) AS BIGINT) for x in embedding] AS qv
        | FROM embeddings),
        |x AS (SELECT label, qv, unnest(generate_series(1, len(qv))) AS i FROM b),
        |s AS (SELECT label, i, CAST(SUM(qv[i]) AS BIGINT) AS sm,
        |       CAST(count(*) AS BIGINT) AS n
        |      FROM x GROUP BY 1, 2),
        |c AS (SELECT label, list(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY i) AS cm
        |      FROM s GROUP BY label),
        |sc AS (SELECT vec_id, b.label,
        |  CAST(floor((list_sum([
        |    (CAST(qv[i] AS DOUBLE) - cm[i]) * (CAST(qv[i] AS DOUBLE) - cm[i])
        |    for i in range(1, len(qv) + 1)])) + 0.5) AS BIGINT) AS score_q
        | FROM b JOIN c ON b.label = c.label),
        |t AS (SELECT label, CAST(floor((quantile_cont(score_q, 0.95)) + 0.5) AS BIGINT) AS thr
        |      FROM sc GROUP BY label)
        |SELECT vec_id, sc.label, score_q, score_q > thr AS is_outlier
        |FROM sc JOIN t ON sc.label = t.label""".stripMargin,

    "layout_zorder" -> {
      // the identical generated shift/and/or interleave as Layout.morton
      val interleave = (0 until 10).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) | (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH b AS (SELECT o_custkey % 1024 AS x,
         | (epoch_ms(o_orderdate) // 86400000) % 1024 AS y FROM orders),
         |z AS (SELECT x, y, ($interleave) AS z FROM b)
         |SELECT z >> 14 AS z_bucket, CAST(count(*) AS BIGINT) AS n_orders,
         | CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
         | CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
         |FROM z GROUP BY 1""".stripMargin
    },

    "embed_drift" ->
      """WITH b AS (SELECT label, vec_id % 2 AS half,
        |  [CAST(floor((CAST(x AS DOUBLE) * 1000000.0) + 0.5) AS BIGINT) for x in embedding] AS qv
        | FROM embeddings),
        |x AS (SELECT label, half, qv, unnest(generate_series(1, len(qv))) AS i FROM b),
        |s AS (SELECT label, half, i AS dim, CAST(SUM(qv[i]) AS BIGINT) AS sm,
        |       CAST(count(*) AS BIGINT) AS n
        |      FROM x GROUP BY 1, 2, 3),
        |e AS (SELECT label, dim, sm AS se, n AS ne FROM s WHERE half = 0),
        |o AS (SELECT label, dim, sm AS so, n AS no FROM s WHERE half = 1),
        |j AS (SELECT e.label, se, ne, so, no FROM e JOIN o
        |      ON e.label = o.label AND e.dim = o.dim),
        |g AS (SELECT label,
        |       CAST(max(ne) AS BIGINT) AS n_even, CAST(max(no) AS BIGINT) AS n_odd,
        |       SUM(CAST(se AS HUGEINT) * CAST(so AS HUGEINT)) AS d,
        |       SUM(CAST(se AS HUGEINT) * CAST(se AS HUGEINT)) AS a,
        |       SUM(CAST(so AS HUGEINT) * CAST(so AS HUGEINT)) AS bb,
        |       max(abs(CAST(se AS DOUBLE) / CAST(ne AS DOUBLE)
        |               - CAST(so AS DOUBLE) / CAST(no AS DOUBLE))) AS ms
        |      FROM j GROUP BY label)
        |SELECT label, n_even, n_odd,
        | floor((CAST(d AS DOUBLE) / (sqrt(CAST(a AS DOUBLE)) * sqrt(CAST(bb AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0 AS centroid_cos,
        | floor((ms / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS max_dim_shift
        |FROM g""".stripMargin,

    "events_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_type FROM events),
        |a AS (SELECT user_id, min(t) AS ta FROM e WHERE event_type = 'view' GROUP BY user_id),
        |b AS (SELECT e.user_id, min(t) AS tb FROM e JOIN a USING (user_id)
        |      WHERE event_type = 'click' AND t > ta GROUP BY e.user_id),
        |c AS (SELECT e.user_id, min(t) AS tc FROM e JOIN b USING (user_id)
        |      WHERE event_type = 'purchase' AND t > tb GROUP BY e.user_id),
        |conv AS (SELECT (tc - ta) // 1000000000 AS secs FROM c JOIN a USING (user_id))
        |SELECT (SELECT count(DISTINCT user_id) FROM e) AS n_users,
        | (SELECT count(*) FROM a) AS n_view,
        | (SELECT count(*) FROM b) AS n_view_click,
        | (SELECT count(*) FROM c) AS n_full_funnel,
        | (SELECT CAST(floor((quantile_cont(secs, 0.5)) + 0.5) AS BIGINT) FROM conv) AS median_convert_sec""".stripMargin,

    "text_chunk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |c AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n,
        |        unnest(range(0, (len(t) + 63) // 64)) AS i
        |      FROM d)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        | array_to_string(t[i * 64 + 1 : least((i + 1) * 64, n)], ' ') AS chunk_text,
        | CAST(least((i + 1) * 64, n) - i * 64 AS BIGINT) AS n_chunk_tokens
        |FROM c""".stripMargin,

    "text_bigram_logprob" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bgs AS (SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(t) - 1),
        |                               i -> t[i] || ' ' || t[i + 1])) AS b
        |        FROM d),
        |tf AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS tf FROM bgs GROUP BY 1, 2),
        |cb AS (SELECT b, CAST(SUM(tf) AS BIGINT) AS cb FROM tf GROUP BY b),
        |cw AS (SELECT string_split(b, ' ')[1] AS w1, CAST(SUM(cb) AS BIGINT) AS cw
        |       FROM cb GROUP BY 1),
        |sc AS (SELECT doc_id, b, tf,
        |        CAST(tf AS DOUBLE) * ln(CAST(cb AS DOUBLE) / CAST(cw AS DOUBLE)) AS lp
        |       FROM tf JOIN cb USING (b) JOIN cw ON string_split(b, ' ')[1] = cw.w1),
        |ag AS (SELECT doc_id, list(lp ORDER BY b) AS lps,
        |        CAST(SUM(tf) AS BIGINT) AS n_bigrams
        |       FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        | floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lps), (a, b) -> a + b)
        |   * 1000000.0 + 0.5) / 1000000.0 AS logprob,
        | floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lps), (a, b) -> a + b)
        |   / CAST(n_bigrams AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS avg_logprob
        |FROM ag""".stripMargin,

    "text_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, t),
        |freq AS (SELECT t, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY t),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS tot FROM freq),
        |sc AS (SELECT doc_id, t, tf,
        |        CAST(tf AS DOUBLE) * ln(CAST(cnt AS DOUBLE) / tot) AS lp
        |       FROM tf JOIN freq USING (t) CROSS JOIN tot),
        |ag AS (SELECT doc_id, list(lp ORDER BY t) AS lps,
        |        CAST(SUM(tf) AS BIGINT) AS n_tokens
        |       FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        | floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lps), (a, b) -> a + b)
        |   * 1000000.0 + 0.5) / 1000000.0 AS logprob,
        | floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), lps), (a, b) -> a + b)
        |   / CAST(n_tokens AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS avg_logprob
        |FROM ag""".stripMargin,

    "clip_outliers" ->
      s"""WITH c AS (SELECT l_orderkey, l_linenumber,
         |            ${ac("l_extendedprice")} AS vc FROM lineitem),
         |b AS (SELECT CAST(floor((quantile_cont(vc, 0.05)) + 0.5) AS BIGINT) AS lo,
         |             CAST(floor((quantile_cont(vc, 0.95)) + 0.5) AS BIGINT) AS hi FROM c)
         |SELECT l_orderkey, l_linenumber,
         | CAST(least(greatest(vc, lo), hi) AS DOUBLE) / 100.0 AS price_clip
         |FROM c CROSS JOIN b""".stripMargin,

    "text_contamination" ->
      """WITH sh AS (SELECT doc_id, source,
        |    list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t) - 3)]) AS s
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents) d),
        |ev AS (SELECT DISTINCT unnest(s) AS sg FROM sh WHERE source = 'src0'),
        |tr AS (SELECT doc_id, unnest(s) AS sg FROM sh WHERE source <> 'src0'),
        |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |        CAST(SUM(CASE WHEN ev.sg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
        |       FROM tr LEFT JOIN ev USING (sg) GROUP BY doc_id)
        |SELECT d.doc_id,
        | COALESCE(n_shingles, 0) AS n_shingles,
        | COALESCE(n_contaminated, 0) AS n_contaminated,
        | CASE WHEN COALESCE(n_shingles, 0) = 0 THEN 0.0
        |      ELSE CAST(n_contaminated AS DOUBLE) / n_shingles END AS contamination_ratio
        |FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
        |LEFT JOIN st ON d.doc_id = st.doc_id""".stripMargin,

    "text_boilerplate" ->
      """WITH s AS (SELECT doc_id,
        |    list_distinct([array_to_string(t[i:i+4], ' ') for i in range(1, len(t) - 3)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d),
        |ex AS (SELECT doc_id, unnest(sh) AS sg FROM s),
        |dfq AS (SELECT sg, count(*) AS df FROM ex GROUP BY sg),
        |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |        CAST(SUM(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
        |       FROM ex JOIN dfq USING (sg) GROUP BY doc_id)
        |SELECT d.doc_id,
        | COALESCE(n_shingles, 0) AS n_shingles,
        | COALESCE(n_boiler, 0) AS n_boiler,
        | CASE WHEN COALESCE(n_shingles, 0) = 0 THEN 0.0
        |      ELSE CAST(n_boiler AS DOUBLE) / n_shingles END AS boiler_ratio
        |FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id""".stripMargin,

    "text_tfidf" ->
      """WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term),
        |dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY term),
        |s AS (SELECT doc_id, tfc.term AS term, tf,
        |        CAST(tf AS DOUBLE) * (ln((1.0 + nn) / (1.0 + CAST(df AS DOUBLE))) + 1.0) AS tfidf
        |      FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk FROM s)
        |SELECT doc_id, term, tf, tfidf FROM r WHERE rk <= 5""".stripMargin,

    "text_ngrams" ->
      """WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
        |b AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
        |      FROM d)
        |SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
        |FROM b GROUP BY bigram
        |ORDER BY cnt DESC, bigram ASC LIMIT 20""".stripMargin,

    "text_scrub" ->
      """SELECT doc_id,
        | regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}|https?://[^ ]+|[0-9]{4,}|\bspark\b', '<x>', 'g') AS scrubbed,
        | CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}|https?://[^ ]+|[0-9]{4,}|\bspark\b')) AS BIGINT) AS n_hits
        |FROM documents""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpeish
        |FROM documents""".stripMargin,

    "text_tokens_bpe" -> {
      // The merge chain is GENERATED from graft.text.Bpe.merges — the same
      // constant the native expression reads — so engine and oracle cannot
      // drift. Token-list representation: every token wrapped in its own
      // '|t|' pair ("|h||e||l||l||o|"), so one replace('|a||b|' → '|ab|')
      // is exactly one left-to-right non-overlapping merge pass: adjacent
      // occurrences never share a delimiter character (with single bars,
      // SQL replace — which resumes scanning after the consumed match —
      // would miss the second of two back-to-back pairs, diverging from
      // BPE). Applying the merges once each in rank order equals the
      // priority loop because the table is well-formed (operands of merge
      // i are chars or products of merges < i, and no two merges produce
      // the same token) — a later merge can never create an earlier pair.
      val chain = graft.text.Bpe.merges.foldLeft("w0") { case (acc, (l, r)) =>
        s"replace($acc, '|$l||$r|', '|$l$r|')"
      }
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |w AS (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS word FROM d),
         |e AS (SELECT doc_id, regexp_replace(word, '(.)', '|\\1|', 'g') AS w0 FROM w),
         |t AS (SELECT doc_id, $chain AS wf FROM e),
         |wc AS (SELECT doc_id,
         |        CAST(SUM((length(wf) - length(replace(wf, '|', ''))) // 2) AS BIGINT) AS nw
         |       FROM t GROUP BY doc_id)
         |SELECT d.doc_id,
         | COALESCE(wc.nw, 0) + CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS BIGINT) AS n_bpe,
         | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpeish
         |FROM d LEFT JOIN wc USING (doc_id)""".stripMargin
    },

    "text_quality" -> {
      val stops = graft.text.TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(", ")
      s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
         |q AS (SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars_obs,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(t, x -> x IN ($stops))) AS BIGINT) AS stop,
         |  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS alpha
         | FROM d)
         |SELECT doc_id, n_chars_obs, n_tokens,
         | CAST(stop AS DOUBLE) / n_tokens AS stop_ratio,
         | CAST(alpha AS DOUBLE) / n_chars_obs AS alpha_ratio,
         | least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.5
         |   + (1.0 - CAST(stop AS DOUBLE) / n_tokens) * 0.3
         |   + CAST(alpha AS DOUBLE) / n_chars_obs * 0.2 AS quality_score
         |FROM q""".stripMargin
    },

    "text_langid" -> {
      val markers = graft.text.TextAnalysis.langMarkers
      val scores = markers.map { case (l, ws) =>
        val in = ws.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(t, x -> x IN ($in))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      val names = markers.map { case (l, _) => s"s_$l" }.mkString(", ")
      val cases = markers.init.map { case (l, _) =>
        s"WHEN s_$l = m THEN '$l'"
      }.mkString(" ")
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |sc AS (SELECT doc_id,
         |  $scores
         | FROM d),
         |g AS (SELECT *, greatest($names) AS m FROM sc)
         |SELECT doc_id,
         | CASE $cases ELSE '${markers.last._1}' END AS pred_lang,
         | m AS lang_score
         |FROM g""".stripMargin
    },

    "pipeline_curate" -> {
      val stops = graft.text.TextAnalysis.stopwordsEn.map(w => s"'$w'").mkString(", ")
      val markers = graft.text.TextAnalysis.langMarkers
      val scores = markers.map { case (l, ws) =>
        val in = ws.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(t, x -> x IN ($in))) AS BIGINT) AS s_$l"
      }.mkString(",\n  ")
      val names = markers.map { case (l, _) => s"s_$l" }.mkString(", ")
      val cases = markers.init.map { case (l, _) =>
        s"WHEN s_$l = m THEN '$l'"
      }.mkString(" ")
      s"""WITH d AS (SELECT doc_id, source, text, string_split(text, ' ') AS t FROM documents),
         |q AS (SELECT doc_id, source, text, t,
         |  CAST(length(text) AS BIGINT) AS n_chars_obs,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(t, x -> x IN ($stops))) AS BIGINT) AS stop,
         |  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS alpha,
         |  $scores
         | FROM d),
         |g AS (SELECT *, greatest($names) AS m,
         |  least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.5
         |    + (1.0 - CAST(stop AS DOUBLE) / n_tokens) * 0.3
         |    + CAST(alpha AS DOUBLE) / n_chars_obs * 0.2 AS quality_score
         | FROM q),
         |kept AS (SELECT * FROM g
         | WHERE quality_score >= 0.5
         |   AND CASE $cases ELSE '${markers.last._1}' END = 'en'),
         |dedup AS (SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM kept)
         |SELECT doc_id, source, n_tokens, quality_score
         |FROM dedup
         |WHERE doc_id = keep_id
         |  AND ((doc_id % 10000) * 2654435761) % 10000 < 5000""".stripMargin
    },

    "text_pmi" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
        |d AS (SELECT string_split(text, ' ') AS ts FROM documents),
        |bg AS (SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
        |                                    i -> ts[i] || ' ' || ts[i + 1])) AS b
        |       FROM d),
        |bc AS (SELECT string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2,
        |        CAST(count(*) AS BIGINT) AS n_pair
        |       FROM bg GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT w1, w2, n_pair, u1.c AS n_w1, u2.c AS n_w2,
        | floor((ln((CAST(n_pair AS DOUBLE) * CAST(tot.n AS DOUBLE))
        |    / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0 AS pmi
        |FROM bc JOIN uni u1 ON w1 = u1.t
        |JOIN uni u2 ON w2 = u2.t
        |CROSS JOIN tot""".stripMargin,

    "text_winnow" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |gg AS (SELECT doc_id,
        |  CASE WHEN len(ts) >= 4 THEN
        |    list_transform(generate_series(1, len(ts) - 3), i ->
        |      list_reduce(
        |        list_prepend(CAST(0 AS BIGINT),
        |          list_transform(ts[i:i+3], x -> CAST(7 * length(x) + ascii(x) AS BIGINT))),
        |        (a, b) -> (a * 131 + b) % 1000000007))
        |  ELSE CAST([] AS BIGINT[]) END AS g
        | FROM d),
        |ff AS (SELECT doc_id, g, CASE WHEN len(g) > 0 THEN
        |   list_distinct(list_transform(
        |     generate_series(1, len(g) - least(4, len(g)) + 1), j ->
        |     (list_aggregate(g[j:j+least(4,len(g))-1], 'min') << 20)
        |      + CAST(j - 1 + list_position(g[j:j+least(4,len(g))-1],
        |               list_aggregate(g[j:j+least(4,len(g))-1], 'min')) AS BIGINT)))
        |  ELSE CAST([] AS BIGINT[]) END AS f
        | FROM gg)
        |SELECT doc_id, CAST(len(g) AS BIGINT) AS n_grams,
        | CAST(len(f) AS BIGINT) AS n_fingerprints,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(f, x -> x)),
        |   (a, b) -> (a + (b >> 20) * (b & 1048575)) % 1000000000000037) AS fp_digest
        |FROM ff""".stripMargin,

    "dedup_winnow" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |gg AS (SELECT doc_id,
        |  CASE WHEN len(ts) >= 4 THEN
        |    list_transform(generate_series(1, len(ts) - 3), i ->
        |      list_reduce(
        |        list_prepend(CAST(0 AS BIGINT),
        |          list_transform(ts[i:i+3], x -> CAST(7 * length(x) + ascii(x) AS BIGINT))),
        |        (a, b) -> (a * 131 + b) % 1000000007))
        |  ELSE CAST([] AS BIGINT[]) END AS g
        | FROM d),
        |ff AS (SELECT doc_id, CASE WHEN len(g) > 0 THEN
        |   list_distinct(list_transform(
        |     generate_series(1, len(g) - least(4, len(g)) + 1), j ->
        |     list_aggregate(g[j:j+least(4,len(g))-1], 'min')))
        |  ELSE CAST([] AS BIGINT[]) END AS hs
        | FROM gg),
        |idx0 AS (SELECT doc_id, unnest(hs) AS fp_hash FROM ff),
        |freq AS (SELECT fp_hash FROM idx0 GROUP BY 1
        |         HAVING count(*) >= 2 AND count(*) <= 100),
        |idx AS (SELECT doc_id, fp_hash FROM idx0
        |        WHERE fp_hash IN (SELECT fp_hash FROM freq)),
        |nfp AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS nf FROM ff),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |           CAST(count(*) AS BIGINT) AS n_shared
        |          FROM idx a JOIN idx b
        |            ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT id_a, id_b, n_shared, na.nf AS n_a, nb.nf AS n_b,
        | CAST(n_shared AS DOUBLE) / CAST(na.nf + nb.nf - n_shared AS DOUBLE) AS overlap
        |FROM pairs
        |JOIN nfp na ON id_a = na.doc_id
        |JOIN nfp nb ON id_b = nb.doc_id""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |     list_transform(string_split(text, ' '), x -> CAST(7 * length(x) + ascii(x) AS BIGINT))),
        |   (a, b) -> (a * 131 + b) % 1000000007) AS fingerprint
        |FROM documents""".stripMargin,

    // ----------------------------------------------------------------- dedup
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_copies, min(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "dedup_jaccard" ->
      s"""WITH $jaccardPairsCte
         |SELECT id_a, id_b, jaccard FROM p""".stripMargin,

    // Containment via the same inverted-index linearization (unigram
    // tokens; per-source df ≤ 33 at sf1, so postings joins stay linear).
    // The asymmetric candidate orientation (smaller set is a, ties by id)
    // and the containment expression mirror the all-pairs form
    // operand-for-operand; i ≥ 1 is implied by the 0.30 threshold.
    "dedup_containment" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        |sh AS MATERIALIZED (SELECT doc_id, source,
        |  unnest(list_distinct([array_to_string(t[i:i+1], ' ') for i in range(1, len(t))])) AS g
        | FROM t),
        |sz AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
        |ix AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
        | FROM sh a JOIN sh b ON a.g = b.g AND a.source = b.source AND a.doc_id <> b.doc_id
        | GROUP BY 1, 2)
        |SELECT id_a, id_b, CAST(i AS DOUBLE) / sa.n AS containment
        |FROM ix JOIN sz sa ON sa.doc_id = ix.id_a JOIN sz sb ON sb.doc_id = ix.id_b
        |WHERE (sa.n < sb.n OR (sa.n = sb.n AND id_a < id_b))
        | AND CAST(i AS DOUBLE) / sa.n >= 0.30""".stripMargin,

    "sample_split" ->
      """SELECT doc_id, source,
        | CASE WHEN ((doc_id % 10000) * 2654435761) % 10000 < 8000 THEN 'train'
        |      WHEN ((doc_id % 10000) * 2654435761) % 10000 < 9000 THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, source FROM documents
        |WHERE ((doc_id % 10000) * 2654435761) % 10000 <
        | CASE WHEN source = 'src0' THEN 5000
        |      WHEN source = 'src1' THEN 2500
        |      ELSE 1000 END""".stripMargin,

    "dedup_substring" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh0 AS (SELECT doc_id, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i, t
        |        FROM d),
        |sh AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS s FROM sh0),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb,
        |       a.pos - b.pos AS g
        |      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id),
        |isl AS (SELECT *, pa - row_number() OVER (PARTITION BY da, db, g ORDER BY pa) AS il
        |        FROM p),
        |sp AS (SELECT da AS id_a, db AS id_b, CAST(min(pa) AS BIGINT) AS start_a,
        |        CAST(min(pb) AS BIGINT) AS start_b,
        |        CAST(count(*) + 7 AS BIGINT) AS span_tokens
        |       FROM isl GROUP BY da, db, g, il)
        |SELECT id_a, id_b, start_a, start_b, span_tokens FROM sp
        |WHERE span_tokens >= 20""".stripMargin,

    "dedup_strip_spans" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh0 AS (SELECT doc_id, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i, t
        |        FROM d),
        |sh AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS s FROM sh0),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa, b.pos AS pb,
        |       a.pos - b.pos AS g
        |      FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id),
        |isl AS (SELECT *, pa - row_number() OVER (PARTITION BY da, db, g ORDER BY pa) AS il
        |        FROM p),
        |sp AS (SELECT da AS id_a, db AS id_b, CAST(min(pa) AS BIGINT) AS start_a,
        |        CAST(min(pb) AS BIGINT) AS start_b,
        |        CAST(count(*) + 7 AS BIGINT) AS span_tokens
        |       FROM isl GROUP BY da, db, g, il),
        |rm AS (SELECT DISTINCT id_b AS doc_id,
        |        unnest(generate_series(start_b, start_b + span_tokens - 1)) AS pos
        |       FROM sp WHERE span_tokens >= 20),
        |tok AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
        |        FROM (SELECT doc_id, unnest(generate_series(1, len(t))) AS i, t FROM d)),
        |kept AS (SELECT tok.doc_id, tok.pos, tok.tok FROM tok
        |         ANTI JOIN rm ON tok.doc_id = rm.doc_id AND tok.pos = rm.pos),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens_kept,
        |         array_to_string(list(tok ORDER BY pos), ' ') AS cleaned_text
        |        FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
        | coalesce(agg.n_tokens_kept, 0) AS n_tokens_kept,
        | coalesce(agg.cleaned_text, '') AS cleaned_text
        |FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,

    "dedup_substring_self" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh0 AS (SELECT doc_id, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS i, t
        |        FROM d),
        |sh AS (SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS s FROM sh0),
        |p AS (SELECT a.doc_id AS id, a.pos AS pa, b.pos AS pb, b.pos - a.pos AS g
        |      FROM sh a JOIN sh b ON a.doc_id = b.doc_id AND a.s = b.s AND a.pos < b.pos),
        |isl AS (SELECT *, pa - row_number() OVER (PARTITION BY id, g ORDER BY pa) AS il
        |        FROM p),
        |sp AS (SELECT id AS doc_id, CAST(min(pa) AS BIGINT) AS start_a,
        |        CAST(min(pb) AS BIGINT) AS start_b,
        |        CAST(count(*) + 7 AS BIGINT) AS span_tokens
        |       FROM isl GROUP BY id, g, il)
        |SELECT doc_id, start_a, start_b, span_tokens FROM sp
        |WHERE span_tokens >= 20""".stripMargin,

    "dedup_cluster" ->
      s"""WITH $jaccardPairsCte,
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
         |  UNION ALL SELECT id_b, id_a FROM p),
         |nodes AS (SELECT doc_id AS node FROM documents),
         |${ccChain(CcRounds)}
         |SELECT node AS doc_id, lab AS cluster_id FROM l$CcRounds
         |${ccSentinel(CcRounds, 2)}""".stripMargin,

    "dedup_stats" ->
      s"""WITH $jaccardPairsCte,
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
         |  UNION ALL SELECT id_b, id_a FROM p),
         |nodes AS (SELECT doc_id AS node FROM documents),
         |${ccChain(CcRounds)},
         |csz AS (SELECT lab AS cluster_id, count(*) AS cluster_size
         |        FROM l$CcRounds GROUP BY 1)
         |SELECT cluster_size, count(*) AS n_clusters FROM csz GROUP BY 1
         |${ccSentinel(CcRounds, 2)}""".stripMargin,

    // list_dot_product ≡ the list_sum comprehension bitwise (same
    // sequential double loop — verified over every within-label pair at
    // the gate scales) at a fraction of the interpreted cost; norms
    // precompute per vector. Same treatment as embed_cluster: this oracle
    // sat at ~65s at sf1, one contended lane away from the 90s budget.
    "dedup_embed" ->
      """WITH e AS (SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
        |nm AS MATERIALIZED (SELECT vec_id, label, v,
        |  sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |p AS (
        | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
        | FROM nm a JOIN nm b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cos FROM p WHERE cos > 0.35""".stripMargin,

    // list_dot_product is DuckDB's native sequential double loop —
    // bitwise-identical to the list_sum comprehension (verified over
    // every within-label pair at the gate scales) at a fraction of the
    // interpreted-comprehension cost; norms precompute per vector (the
    // same sqrt on the same self-dot bits the pair form computed).
    "embed_cluster" ->
      s"""WITH em AS (SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
         |nm AS MATERIALIZED (SELECT vec_id, label, v,
         |  sqrt(list_dot_product(v, v)) AS nrm FROM em),
         |p AS MATERIALIZED (
         | SELECT a.vec_id AS id_a, b.vec_id AS id_b
         | FROM nm a JOIN nm b ON a.label = b.label AND a.vec_id < b.vec_id
         | WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) > 0.35),
         |e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
         |  UNION ALL SELECT id_b, id_a FROM p),
         |nodes AS (SELECT vec_id AS node FROM embeddings),
         |${ccChain(CcRounds)}
         |SELECT node AS vec_id, lab AS cluster_id FROM l$CcRounds
         |${ccSentinel(CcRounds, 2)}""".stripMargin,

    // ------------------------------------------------------------ similarity
    "ann_topk" ->
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
        |sims AS (
        | SELECT query_id, c.vec_id AS neighbor_id,
        |  list_sum([qv[i] * c.v[i] for i in range(1, 65)])
        |   / (sqrt(list_sum([qv[i] * qv[i] for i in range(1, 65)]))
        |      * sqrt(list_sum([c.v[i] * c.v[i] for i in range(1, 65)]))) AS cos
        | FROM q JOIN e c ON c.vec_id <> q.query_id),
        |r AS (SELECT query_id, neighbor_id, cos,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rank
        | FROM sims)
        |SELECT query_id, neighbor_id, rank, cos FROM r WHERE rank <= 5""".stripMargin,

    // ---------------------------------------------------------- round 5
    "events_path" ->
      """WITH p AS (SELECT user_id,
        |  array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>') AS path
        | FROM events GROUP BY user_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    "events_rolling" ->
      s"""WITH b AS (SELECT min(epoch_ns(ts) // 86400000000000) AS lo,
        |                  max(epoch_ns(ts) // 86400000000000) AS hi FROM events),
        |raw AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
        |         CAST(count(*) AS BIGINT) AS n
        |        FROM events GROUP BY 1, 2),
        |days AS (SELECT unnest(generate_series(lo, hi)) AS d FROM b),
        |spine AS (SELECT t.event_type, days.d
        |          FROM days,
        |           (VALUES ${typeValues})
        |            t(event_type)),
        |daily AS (SELECT s.event_type, s.d, COALESCE(raw.n, 0) AS n_events
        |          FROM spine s LEFT JOIN raw
        |            ON s.event_type = raw.event_type AND s.d = raw.d)
        |SELECT event_type, d, n_events,
        | CAST(SUM(n_events) OVER w7 AS BIGINT) AS sum_7d,
        | floor((CAST(SUM(n_events) OVER w7 AS DOUBLE)
        |   / CAST(count(*) OVER w7 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS avg_7d,
        | CAST(SUM(n_events) OVER (PARTITION BY event_type ORDER BY d
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_total
        |FROM daily
        |WINDOW w7 AS (PARTITION BY event_type ORDER BY d
        |              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_basket" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        | CAST(count(*) AS BIGINT) AS n_orders
        |FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
        | AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, part_a ASC, part_b ASC
        |LIMIT 20""".stripMargin,

    "q_cube" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         | COALESCE(l_linestatus, 'ALL') AS linestatus,
         | CAST(SUM(${ac("l_quantity")}) AS DOUBLE) / 100.0 AS sum_qty,
         | count(*) AS n_rows
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q_rollup" ->
      s"""SELECT COALESCE(CAST(year(o_orderdate) AS BIGINT), -1) AS o_year,
         | COALESCE(CAST(month(o_orderdate) AS BIGINT), -1) AS o_month,
         | CAST(SUM(${ac("o_totalprice")}) AS DOUBLE) / 100.0 AS sum_total,
         | count(*) AS n_orders
         |FROM orders
         |GROUP BY ROLLUP (CAST(year(o_orderdate) AS BIGINT), CAST(month(o_orderdate) AS BIGINT))""".stripMargin,

    "profile_group_quantiles" ->
      s"""WITH c AS (SELECT l_returnflag, ${ac("l_extendedprice")} AS vc FROM lineitem)
         |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         | CAST(CAST(floor((quantile_cont(vc, 0.25)) + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS p25,
         | CAST(CAST(floor((quantile_cont(vc, 0.5)) + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS p50,
         | CAST(CAST(floor((quantile_cont(vc, 0.75)) + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS p75,
         | CAST(CAST(floor((quantile_cont(vc, 0.95)) + 0.5) AS BIGINT) AS DOUBLE) / 100.0 AS p95
         |FROM c GROUP BY l_returnflag""".stripMargin,

    "profile_corr" -> {
      val pairs = Seq(("q", "l_quantity"), ("e", "l_extendedprice"),
        ("d", "l_discount"), ("t", "l_tax"))
      val corrRow = (a: String, an: String, b: String, bn: String) =>
        s"""SELECT '$an' AS col_a, '$bn' AS col_b,
           | CASE WHEN CAST(n*ss_$a - s_$a*s_$a AS DOUBLE) <> 0
           |   AND CAST(n*ss_$b - s_$b*s_$b AS DOUBLE) <> 0 THEN
           | floor((CAST(n*sp_$a$b - s_$a*s_$b AS DOUBLE)
           |  / (sqrt(CAST(n*ss_$a - s_$a*s_$a AS DOUBLE))
           |     * sqrt(CAST(n*ss_$b - s_$b*s_$b AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0
           | END AS corr FROM m""".stripMargin
      val rows = pairs.combinations(2).map { case Seq((a, an), (b, bn)) =>
        corrRow(a, an, b, bn)
      }.mkString("\nUNION ALL\n")
      s"""WITH c AS (SELECT
         |  CAST(${ac("l_quantity")} AS HUGEINT) AS q,
         |  CAST(${ac("l_extendedprice")} AS HUGEINT) AS e,
         |  CAST(CAST(floor((l_discount * 10000.0) + 0.5) AS BIGINT) AS HUGEINT) AS d,
         |  CAST(CAST(floor((l_tax * 10000.0) + 0.5) AS BIGINT) AS HUGEINT) AS t
         | FROM lineitem),
         |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |  SUM(q) AS s_q, SUM(q*q) AS ss_q, SUM(e) AS s_e, SUM(e*e) AS ss_e,
         |  SUM(d) AS s_d, SUM(d*d) AS ss_d, SUM(t) AS s_t, SUM(t*t) AS ss_t,
         |  SUM(q*e) AS sp_qe, SUM(q*d) AS sp_qd, SUM(q*t) AS sp_qt,
         |  SUM(e*d) AS sp_ed, SUM(e*t) AS sp_et, SUM(d*t) AS sp_dt
         | FROM c)
         |$rows""".stripMargin
    },

    "imp_zscore" ->
      s"""WITH mc AS ($MCV),
         |c AS (SELECT c_custkey, ${ac("c_acctbal")} AS ac, c_acctbal FROM mc),
         |st AS (SELECT CAST(SUM(ac) AS DOUBLE) AS s, CAST(SUM(ac*ac) AS DOUBLE) AS ss,
         |        CAST(count(c_acctbal) AS DOUBLE) AS n FROM c),
         |p AS (SELECT s / n AS mu, sqrt((ss - s * s / n) / (n - 1.0)) AS sigma,
         |       CAST(floor((s / n) + 0.5) AS BIGINT) AS mc_imp FROM st)
         |SELECT c_custkey,
         | (CAST(COALESCE(ac, mc_imp) AS DOUBLE) - mu) / sigma AS acctbal_z
         |FROM c CROSS JOIN p""".stripMargin,

    "text_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |b AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct FROM d),
        |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |                                            i -> t[i] || ' ' || t[i + 1])) AS bigram
        |       FROM d),
        |cnt AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |m AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_cnt FROM cnt GROUP BY 1)
        |SELECT b.doc_id, n_tokens, n_distinct,
        | floor((CAST(n_tokens - n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS dup_word_frac,
        | COALESCE(top_bigram_cnt, 0) AS top_bigram_cnt,
        | CASE WHEN n_tokens > 1
        |      THEN floor((CAST(COALESCE(top_bigram_cnt, 0) AS DOUBLE)
        |             / CAST(n_tokens - 1 AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |      ELSE 0.0 END AS top_bigram_frac
        |FROM b LEFT JOIN m ON b.doc_id = m.doc_id""".stripMargin,

    "corpus_mix" -> {
      val cases = (0 until 20).map(i =>
        s"WHEN 'src$i' THEN ${Seq("1.0", "0.5", "0.25", "0.1")(i % 4)}").mkString(" ")
      s"""WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |r AS (SELECT source, (CASE source $cases ELSE 0.0 END) / n AS r FROM cnt),
         |t AS (SELECT source,
         |       CAST(floor((r / (max(r) OVER ()) * 10000.0) + 0.5) AS BIGINT) AS thresh FROM r)
         |SELECT doc_id, source FROM documents JOIN t USING (source)
         |WHERE ((doc_id % 10000) * 2654435761) % 10000 < thresh""".stripMargin
    },

    "q22_antijoin" ->
      s"""WITH a AS (SELECT CAST(floor((CAST(SUM(${ac("c_acctbal")}) AS DOUBLE)
         |                        / count(*)) + 0.5) AS BIGINT) AS avgc FROM customer)
         |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
         | CAST(SUM(${ac("c_acctbal")}) AS DOUBLE) / 100.0 AS totacctbal
         |FROM customer CROSS JOIN a
         |WHERE ${ac("c_acctbal")} > avgc
         | AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY c_nationkey""".stripMargin,

    "events_pivot" -> {
      val types = graft.Tables.eventTypes
      val cols = types.map(t =>
        s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
        .mkString(",\n ")
      s"""SELECT epoch_ns(ts) // 86400000000000 AS d,
         | $cols
         |FROM events GROUP BY 1""".stripMargin
    },

    // The q-gram count filter is LOSSLESS (FuzzyJoin scaladoc), so the
    // oracle verifies with plain all-pairs levenshtein over DISTINCT names
    // — tiny for the oracle, never what the engine runs.
    "fuzzy_join" ->
      """WITH names AS (SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n
        |  FROM part GROUP BY 1)
        |SELECT a.name AS name_a, b.name AS name_b,
        | CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        | a.n AS n_a, b.n AS n_b
        |FROM names a JOIN names b
        | ON a.name < b.name AND levenshtein(a.name, b.name) BETWEEN 1 AND 2""".stripMargin,

    "events_unpivot" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS d,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_purchases
        | FROM events GROUP BY 1)
        |SELECT d, 'n_events' AS metric, n_events AS value FROM daily
        |UNION ALL SELECT d, 'n_users', n_users FROM daily
        |UNION ALL SELECT d, 'n_purchases', n_purchases FROM daily""".stripMargin,

    "text_readability" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n_words,
        |  greatest(CAST(1 AS BIGINT),
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
        |  CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS n_syllables
        | FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        | CASE WHEN n_words > 0 THEN floor((206.835
        |  - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |  - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
        |  * 10000.0 + 0.5) / 10000.0
        | END AS flesch,
        | CASE WHEN n_words > 0 THEN floor((
        |  0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |  + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
        |  - 15.59) * 10000.0 + 0.5) / 10000.0
        | END AS fk_grade
        |FROM c""".stripMargin,

    "events_theilsen" ->
      """WITH daily AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |pairs AS (SELECT a.event_type, a.d AS da, b.d AS db,
        |  CAST(b.n - a.n AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
        | FROM daily a JOIN daily b
        |  ON a.event_type = b.event_type AND a.d < b.d),
        |r AS (SELECT event_type, slope,
        |  row_number() OVER (PARTITION BY event_type ORDER BY slope, da, db) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS m
        | FROM pairs)
        |SELECT event_type, CAST(max(m) AS BIGINT) AS n_pairs,
        | floor((avg(slope)) * 1000000.0 + 0.5) / 1000000.0 AS slope_med
        |FROM r WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        |GROUP BY 1""".stripMargin,

    "text_jsd" ->
      """WITH t AS (SELECT source AS s, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |v AS (SELECT w,
        |  CAST(SUM(CASE WHEN s = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |  CAST(SUM(CASE WHEN s = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS nb
        | FROM t WHERE length(w) > 0 GROUP BY 1),
        |tt AS (SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
        |       FROM v),
        |c AS (SELECT CAST(floor((
        |   (CASE WHEN na > 0 THEN (CAST(na AS DOUBLE) / CAST(ta AS DOUBLE))
        |     * ln((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE))
        |        / ((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)
        |            + CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)) / 2.0)) ELSE 0.0 END
        |  + CASE WHEN nb > 0 THEN (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))
        |     * ln((CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))
        |        / ((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)
        |            + CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)) / 2.0)) ELSE 0.0 END)
        |  * 0.5 * 1e12) + 0.5) AS BIGINT) AS cq
        | FROM v CROSS JOIN tt)
        |SELECT 'src0' AS src_a, 'src1' AS src_b,
        | CAST(count(*) AS BIGINT) AS n_terms,
        | floor((CAST(SUM(cq) AS DOUBLE) / 1e12) * 1000000.0 + 0.5) / 1000000.0 AS jsd_nats,
        | floor((CAST(SUM(cq) AS DOUBLE) / 1e12 / ln(2.0)) * 1000000.0 + 0.5) / 1000000.0 AS jsd_bits
        |FROM c""".stripMargin,

    "events_contribution" ->
      """WITH d AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d
        |  FROM events),
        |m AS (SELECT (min(d) + max(d) + 1) // 2 AS mid FROM d),
        |p AS (SELECT event_type,
        |  CAST(SUM(CASE WHEN d.d < mid THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        |  CAST(SUM(CASE WHEN d.d >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_second
        | FROM d CROSS JOIN m GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_second - n_first) AS BIGINT) AS total_delta FROM p)
        |SELECT event_type, n_first, n_second,
        | CAST(n_second - n_first AS BIGINT) AS delta,
        | CASE WHEN total_delta <> 0 THEN
        |  floor((CAST(n_second - n_first AS DOUBLE) / CAST(total_delta AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        | END AS share
        |FROM p CROSS JOIN t""".stripMargin,

    // Deliberately the textbook NOT EXISTS dominance formulation — a
    // structurally different derivation than the engine's banded reduction,
    // so a hash match checks the algorithm, not an echo of it.
    "orders_skyline" ->
      """WITH base AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(floor((o_totalprice * 100.0) + 0.5) AS BIGINT)) AS BIGINT) AS mc
        | FROM orders GROUP BY 1)
        |SELECT o_custkey, n_orders, CAST(mc AS DOUBLE) / 100.0 AS monetary
        |FROM base p
        |WHERE NOT EXISTS (SELECT 1 FROM base q
        |  WHERE q.n_orders >= p.n_orders AND q.mc >= p.mc
        |    AND (q.n_orders > p.n_orders OR q.mc > p.mc))""".stripMargin,

    "orders_interarrival" ->
      """WITH o AS (SELECT o_custkey,
        |  epoch_us(o_orderdate) // 86400000000 AS d, o_orderkey
        | FROM orders),
        |g AS (SELECT o_custkey, d, o_orderkey,
        |  d - lag(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap
        | FROM o),
        |r AS (SELECT o_custkey, gap,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY gap, d, o_orderkey) AS rn,
        |  count(*) OVER (PARTITION BY o_custkey) AS m
        | FROM g WHERE gap IS NOT NULL),
        |med AS (SELECT o_custkey,
        |  CAST(SUM(gap) * (CASE WHEN max(m) % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT)
        |    AS med2
        | FROM r WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        | GROUP BY 1)
        |SELECT med2 // 14 AS gap_weeks, CAST(count(*) AS BIGINT) AS n_customers
        |FROM med GROUP BY 1""".stripMargin,

    "orders_benford" ->
      """WITH v AS (SELECT CAST(floor((o_totalprice * 100.0) + 0.5) AS BIGINT) AS v
        |  FROM orders),
        |d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |  CAST(count(*) AS BIGINT) AS n_obs
        | FROM v WHERE v > 0 GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM d)
        |SELECT digit, n_obs,
        | floor((CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS obs_frac,
        | floor((log10(CAST(digit + 1 AS DOUBLE) / CAST(digit AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS exp_frac
        |FROM d CROSS JOIN t""".stripMargin,

    "profile_ks" ->
      """WITH ca AS (SELECT CAST(floor((o_totalprice * 100.0) + 0.5) AS BIGINT) // 100000 AS band,
        |  CAST(count(*) AS BIGINT) AS ca
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
        |cb AS (SELECT CAST(floor((o_totalprice * 100.0) + 0.5) AS BIGINT) // 100000 AS band,
        |  CAST(count(*) AS BIGINT) AS cb
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | WHERE c_mktsegment = 'MACHINERY' GROUP BY 1),
        |bands AS (SELECT coalesce(ca.band, cb.band) AS band,
        |  coalesce(ca, CAST(0 AS BIGINT)) AS ca, coalesce(cb, CAST(0 AS BIGINT)) AS cb
        | FROM ca FULL JOIN cb ON ca.band = cb.band),
        |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
        |      FROM bands),
        |cum AS (SELECT h.band, CAST(SUM(l.ca) AS BIGINT) AS cuma,
        |         CAST(SUM(l.cb) AS BIGINT) AS cumb
        |        FROM (SELECT band FROM bands) h JOIN bands l ON l.band <= h.band
        |        GROUP BY 1),
        |s AS (SELECT band, abs(cuma * nb - cumb * na) AS stat, na, nb
        |      FROM cum CROSS JOIN t)
        |SELECT 'BUILDING' AS seg_a, 'MACHINERY' AS seg_b,
        | max(na) AS n_a, max(nb) AS n_b,
        | floor((CAST(max(stat) AS DOUBLE) / CAST(max(na) * max(nb) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |   AS ks_stat,
        | -(max(struct_pack(s := stat, nb_ := -band)).nb_) AS peak_band
        |FROM s""".stripMargin,

    // PageRank's fixed iteration count unrolls into a non-recursive CTE
    // chain generated from the SAME constants the engine uses (Graph.Scale,
    // 5 iterations) — all-bigint fixed-point algebra, so the chain is
    // bitwise-equal to the Spark loop.
    // Power iteration as a RECURSIVE CTE with an iteration counter — the
    // working table holds one generation, so each of the 5 iterations
    // evaluates ONCE. A chained-CTE unroll re-evaluated the whole prefix
    // per level in DuckDB 1.0 (~3× per iteration, 171s at sf1 even with
    // MATERIALIZED on every link); this form + the pre-joined edge table
    // (ew = pairs ⋈ out-weights, hoisting the per-iteration join) runs
    // the sf1 corpus in ~20s, bitwise-identical ranks.
    "graph_pagerank" -> {
      val s = graft.graph.Graph.Scale
      val iters = 5
      s"""WITH RECURSIVE pairs AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v,
         |  CAST(count(*) AS BIGINT) AS w
         | FROM lineitem a JOIN lineitem b
         |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
         | GROUP BY 1, 2),
         |outw AS MATERIALIZED (SELECT u, CAST(SUM(w) AS BIGINT) AS wu FROM pairs GROUP BY 1),
         |ew AS MATERIALIZED (SELECT e.u, e.v, e.w, o.wu FROM pairs e JOIN outw o ON o.u = e.u),
         |nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM outw),
         |pr(node, rank, it) AS (
         | SELECT u AS node, $s // n AS rank, 0 AS it FROM outw CROSS JOIN nn
         | UNION ALL
         | SELECT node, (15 * $s) // (100 * (SELECT n FROM nn)) + contrib AS rank, it FROM (
         |   SELECT e.v AS node, (85 * SUM((r.rank * e.w) // e.wu)) // 100 AS contrib,
         |     r.it + 1 AS it
         |   FROM pr r JOIN ew e ON r.node = e.u
         |   WHERE r.it < $iters
         |   GROUP BY e.v, r.it) q)
         |SELECT r.node AS part, o.wu AS out_weight,
         | CAST(r.rank AS BIGINT) AS rank_scaled
         |FROM pr r JOIN outw o ON o.u = r.node WHERE r.it = $iters""".stripMargin
    },

    "events_trigrams" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |  epoch_ns(ts) // 1000000000 AS t FROM events),
        |b AS (SELECT user_id, event_id, event_type, t,
        |  CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 1800
        |         OR lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
        |       THEN 1 ELSE 0 END AS brk
        | FROM e),
        |s AS (SELECT user_id, event_id, event_type, t,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id
        | FROM b),
        |g AS (SELECT event_type,
        |  lead(event_type, 1) OVER w AS t2, lead(event_type, 2) OVER w AS t3
        | FROM s WINDOW w AS (PARTITION BY user_id, session_id ORDER BY t, event_id))
        |SELECT event_type || '>' || t2 || '>' || t3 AS trigram,
        | CAST(count(*) AS BIGINT) AS n
        |FROM g WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20""".stripMargin,

    "graph_triangles" ->
      """WITH pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v,
        |  CAST(count(*) AS BIGINT) AS w
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        | GROUP BY 1, 2),
        |und AS (SELECT u, v FROM pairs WHERE w >= 2 AND u < v),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
        | FROM und p1 JOIN und p2 ON p1.v = p2.u
        | WHERE EXISTS (SELECT 1 FROM und c WHERE c.u = p1.u AND c.v = p2.v)),
        |nodes AS (SELECT CAST(count(DISTINCT x) AS BIGINT) AS n_nodes
        | FROM (SELECT u AS x FROM und UNION ALL SELECT v FROM und) t),
        |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
        |SELECT n_nodes, n_edges, n_triangles
        |FROM nodes CROSS JOIN ne CROSS JOIN tri""".stripMargin,

    "graph_linkpred" ->
      """WITH pairs AS (SELECT a.l_partkey AS u, b.l_partkey AS v,
        |  CAST(count(*) AS BIGINT) AS w
        | FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        | GROUP BY 1, 2),
        |und AS (SELECT u, v FROM pairs WHERE w >= 2 AND u < v),
        |nbrs AS (SELECT u AS z, v AS x FROM und
        |         UNION ALL SELECT v AS z, u AS x FROM und),
        |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d FROM nbrs GROUP BY x),
        |ctr AS (SELECT n.z, n.x FROM nbrs n JOIN deg dz ON dz.x = n.z
        |        WHERE dz.d <= 1024),
        |cand AS (SELECT na.x AS a, nb.x AS b, CAST(count(*) AS BIGINT) AS cn
        |         FROM ctr na JOIN ctr nb ON na.z = nb.z AND na.x < nb.x
        |         GROUP BY 1, 2 HAVING count(*) >= 2),
        |miss AS (SELECT * FROM cand c
        |         WHERE NOT EXISTS (SELECT 1 FROM und
        |                           WHERE und.u = c.a AND und.v = c.b))
        |SELECT m.a, m.b, m.cn,
        | floor((CAST(m.cn AS DOUBLE) / CAST(da.d + db.d - m.cn AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        |FROM miss m JOIN deg da ON da.x = m.a JOIN deg db ON db.x = m.b
        |ORDER BY m.cn DESC, jaccard DESC, m.a, m.b
        |LIMIT 50""".stripMargin,

    "events_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |            epoch_ns(ts) // 1000000000 AS t FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, t FROM e
        |      WHERE event_type = 'purchase'),
        |tc AS (SELECT user_id, t, max(event_id) AS touch_id,
        |        arg_max(event_type, event_id) AS touch_type
        |       FROM e WHERE event_type IN ('view', 'click') GROUP BY 1, 2)
        |SELECT p.purchase_id, p.user_id, p.t AS purchase_t,
        | tc.t AS touch_t, tc.touch_id, tc.touch_type,
        | p.t - tc.t AS gap_sec
        |FROM p ASOF LEFT JOIN tc ON p.user_id = tc.user_id AND tc.t <= p.t""".stripMargin,

    "feat_bucketize" ->
      s"""SELECT bin, CAST(bin AS DOUBLE) * 500.0 AS bin_lo,
         | CAST(count(*) AS BIGINT) AS n_rows
         |FROM (SELECT CAST(${ac("l_extendedprice")} // 50000 AS BIGINT) AS bin
         |      FROM lineitem)
         |GROUP BY bin""".stripMargin,

    "imp_trimmed_mean" ->
      s"""WITH mc AS ($MCV),
         |c AS (SELECT c_custkey, c_acctbal, ${ac("c_acctbal")} AS ac FROM mc),
         |band AS (SELECT CAST(floor((quantile_cont(ac, 0.05)) + 0.5) AS BIGINT) AS lo,
         |                CAST(floor((quantile_cont(ac, 0.95)) + 0.5) AS BIGINT) AS hi FROM c),
         |st AS (SELECT CAST(floor((CAST(SUM(ac) AS DOUBLE) / count(*)) + 0.5) AS BIGINT) AS m
         |       FROM c CROSS JOIN band WHERE ac >= lo AND ac <= hi)
         |SELECT c_custkey,
         | COALESCE(c_acctbal, CAST(m AS DOUBLE) / 100.0) AS acctbal_imp
         |FROM c CROSS JOIN st""".stripMargin,

    "hot_keys" ->
      """WITH counts AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
        |                FROM lineitem GROUP BY 1),
        |st AS (SELECT SUM(n) AS tot, CAST(count(*) AS BIGINT) AS k FROM counts)
        |SELECT l_partkey, n FROM counts CROSS JOIN st
        |WHERE n * k > 3 * tot""".stripMargin,

    "dedup_incremental" ->
      """WITH batch AS (SELECT doc_id, sha256(text) AS digest FROM documents
        |               WHERE source = 'src0' OR (source = 'src1' AND doc_id % 3 = 0)),
        |corpus AS (SELECT sha256(text) AS digest FROM documents WHERE source <> 'src0')
        |SELECT doc_id, digest FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.digest = b.digest)""".stripMargin,

    "feat_target_encode" ->
      s"""WITH j AS (SELECT p_brand, ${ac("l_extendedprice")} AS t
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |per AS (SELECT p_brand, CAST(SUM(t) AS DOUBLE) AS s,
         |        CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1),
         |g AS (SELECT CAST(SUM(t) AS DOUBLE) AS gs,
         |      CAST(count(*) AS BIGINT) AS gn FROM j)
         |SELECT p_brand, n AS n_rows,
         | (s + 20.0 * (gs / CAST(gn AS DOUBLE))) / (CAST(n AS DOUBLE) + 20.0) / 100.0 AS price_enc
         |FROM per, g""".stripMargin,

    "feat_rank" ->
      s"""SELECT c_custkey,
         | percent_rank() OVER (ORDER BY ${ac("c_acctbal")}) AS acctbal_pctrank
         |FROM customer""".stripMargin,

    "ann_range" ->
      """WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 97 = 0),
        |sims AS (
        | SELECT query_id, c.vec_id AS neighbor_id,
        |  list_sum([qv[i] * c.v[i] for i in range(1, 65)])
        |   / (sqrt(list_sum([qv[i] * qv[i] for i in range(1, 65)]))
        |      * sqrt(list_sum([c.v[i] * c.v[i] for i in range(1, 65)]))) AS cos
        | FROM q JOIN e c ON c.vec_id <> q.query_id)
        |SELECT query_id, neighbor_id, cos FROM sims WHERE cos >= 0.30""".stripMargin,

    // ------------------------------------------------------------ multimodal
    "mm_binary" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | sha256(text) AS digest
        |FROM documents""".stripMargin,

    "mm_dedup" ->
      """SELECT sha256(text) AS digest,
        | min(doc_id) AS keep_id,
        | count(*) AS n_copies,
        | min(CAST(octet_length(encode(text)) AS BIGINT)) AS n_bytes
        |FROM documents GROUP BY 1""".stripMargin,

    // ------------------------------------------------- round 5, second wave
    "q7_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_nationkey < 13
        |  AND cn.n_nationkey >= 13
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name, c_acctbal,
        | CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,

    "q13_custdist" ->
      """WITH cnt AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |             FROM orders WHERE o_orderpriority <> '4-NOT SPECIFIED'
        |             GROUP BY 1)
        |SELECT COALESCE(n, 0) AS c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM customer LEFT JOIN cnt ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,

    "q17_smallqty" ->
      s"""WITH p AS (SELECT p_partkey FROM part
         |           WHERE p_brand = 'Brand#3' AND p_size <= 10),
         |li AS (SELECT l_partkey, ${ac("l_quantity")} AS qc,
         |        ${ac("l_extendedprice")} AS pc
         |       FROM lineitem JOIN p ON l_partkey = p_partkey),
         |st AS (SELECT l_partkey AS pk, SUM(qc) AS sq,
         |        CAST(count(*) AS BIGINT) AS nq
         |       FROM li GROUP BY 1)
         |SELECT CAST(SUM(pc) AS DOUBLE) / 700.0 AS avg_yearly,
         | CAST(count(*) AS BIGINT) AS n_lines
         |FROM li JOIN st ON l_partkey = pk
         |WHERE qc * 5 * nq < sq""".stripMargin,

    "q18_bigorders" ->
      s"""WITH big AS (SELECT l_orderkey AS ok, SUM(${ac("l_quantity")}) AS qc
         |             FROM lineitem GROUP BY 1 HAVING SUM(${ac("l_quantity")}) > 30000)
         |SELECT c_custkey, c_name, o_orderkey,
         | epoch_us(o_orderdate) // 86400000000 AS o_day,
         | o_totalprice,
         | CAST(qc AS DOUBLE) / 100.0 AS sum_qty
         |FROM orders
         |JOIN big ON o_orderkey = ok
         |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q2_mincost" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey, p_name, s_name, s_acctbal, n_name,
        |   MIN(CAST(floor((l_extendedprice * 100.0) + 0.5) AS BIGINT)) AS cost_c
        |  FROM lineitem
        |  JOIN (SELECT p_partkey, p_name FROM part
        |        WHERE p_type = 'STANDARD' AND p_size <= 10) p ON l_partkey = p_partkey
        |  JOIN (SELECT s_suppkey, s_name, s_acctbal, n_name
        |        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |        JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE') s
        |    ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4, 5, 6),
        |pc AS (SELECT cost.*, MIN(cost_c) OVER (PARTITION BY l_partkey) AS min_c
        |       FROM cost)
        |SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_name,
        | CAST(cost_c AS DOUBLE) / 100.0 AS supply_cost
        |FROM pc WHERE cost_c = min_c
        |ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
        |LIMIT 100""".stripMargin,

    "q11_importantstock" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |   SUM(CAST(floor((l_extendedprice * (1.0 - l_discount) * 10000.0) + 0.5) AS BIGINT)) AS vc
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_7', 'NATION_12')
        |  GROUP BY 1),
        |t AS (SELECT SUM(vc) AS tot, CAST(count(*) AS BIGINT) AS np FROM v)
        |SELECT l_partkey AS p_partkey, CAST(vc AS DOUBLE) / 10000.0 AS part_value
        |FROM v CROSS JOIN t WHERE vc * np > tot * 2""".stripMargin,

    "q16_suppliercnt" ->
      """SELECT p_brand, p_type, p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0) s
        |  ON l_suppkey = s_suppkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 50)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q20_excess" ->
      """WITH q AS (
        |  SELECT l_partkey, l_suppkey,
        |   SUM(CAST(floor((l_quantity * 100.0) + 0.5) AS BIGINT)) AS qc
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |  GROUP BY 1, 2),
        |w AS (SELECT l_suppkey, qc, SUM(qc) OVER (PARTITION BY l_partkey) AS tc FROM q),
        |excess AS (SELECT DISTINCT l_suppkey FROM w WHERE qc * 10 > tc * 3)
        |SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN excess ON s_suppkey = l_suppkey""".stripMargin,

    "q_groupingsets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        | COALESCE(l_linestatus, 'ALL') AS linestatus,
        | CAST(SUM(CAST(floor((l_quantity * 100.0) + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin,

    "events_autocorr" ->
      """WITH daily AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |lagged AS (SELECT event_type, g.lag, d + g.lag AS d, n AS nl
        |           FROM daily, (SELECT unnest(generate_series(CAST(1 AS BIGINT),
        |             CAST(7 AS BIGINT))) AS lag) g),
        |mm AS (SELECT a.event_type, lag, CAST(count(*) AS BIGINT) AS m,
        |  SUM(a.n) AS sx, SUM(l.nl) AS sy,
        |  SUM(a.n * a.n) AS sxx, SUM(l.nl * l.nl) AS syy,
        |  SUM(a.n * l.nl) AS sxy
        | FROM daily a JOIN lagged l ON a.event_type = l.event_type AND a.d = l.d
        | GROUP BY 1, 2)
        |SELECT event_type, lag, m AS n_pairs,
        | CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0 THEN
        |  floor((CAST(m * sxy - sx * sy AS DOUBLE)
        |   / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
        |      * sqrt(CAST(m * syy - sy * sy AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0
        | ELSE NULL END AS autocorr
        |FROM mm""".stripMargin,

    "events_changepoint" ->
      """WITH daily AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
        |        CAST(SUM(n) AS BIGINT) AS tot
        |       FROM daily GROUP BY 1),
        |cu AS (SELECT daily.event_type, d,
        |        SUM(n * nd - tot) OVER (PARTITION BY daily.event_type ORDER BY d) AS cusum,
        |        nd
        |       FROM daily JOIN st ON daily.event_type = st.event_type),
        |rk AS (SELECT event_type, d, abs(cusum) AS a, nd,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY abs(cusum) DESC, d ASC) AS rn
        |       FROM cu)
        |SELECT event_type, nd AS n_days, d AS peak_day,
        | CAST(a AS DOUBLE) / CAST(nd AS DOUBLE) AS peak_stat
        |FROM rk WHERE rn = 1""".stripMargin,

    "merge_scd2" ->
      """WITH upd AS (
        |  SELECT o_custkey AS k, o_orderstatus AS nv,
        |    epoch_us(o_orderdate) // 86400000000 AS eff
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) t
        |  WHERE rn = 1),
        |o AS (SELECT c_custkey, 'NONE' AS cur, CAST(0 AS BIGINT) AS vf FROM customer),
        |j AS (SELECT o.c_custkey AS ck, o.cur, o.vf, u.k, u.nv, u.eff
        |      FROM o FULL JOIN upd u ON o.c_custkey = u.k)
        |SELECT ck AS c_custkey, cur AS status, vf AS valid_from,
        | CAST(NULL AS BIGINT) AS valid_to, 'K' AS op
        |FROM j WHERE k IS NULL OR (ck IS NOT NULL AND cur = nv)
        |UNION ALL
        |SELECT ck, cur, vf, eff, 'C' FROM j
        |WHERE k IS NOT NULL AND ck IS NOT NULL AND cur <> nv
        |UNION ALL
        |SELECT k, nv, eff, CAST(NULL AS BIGINT), 'N' FROM j
        |WHERE k IS NOT NULL AND ck IS NOT NULL AND cur <> nv
        |UNION ALL
        |SELECT k, nv, eff, CAST(NULL AS BIGINT), 'I' FROM j
        |WHERE k IS NOT NULL AND ck IS NULL""".stripMargin,

    "profile_mi" ->
      """WITH cells AS (SELECT c_mktsegment AS x, c_nationkey AS y,
        |  CAST(count(*) AS BIGINT) AS nxy
        | FROM customer GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM cells GROUP BY 1),
        |my AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM cells),
        |mi AS (SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |        CAST(SUM(CAST(floor(((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
        |          * ln((CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE))
        |               / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))
        |          * 1e12) + 0.5) AS BIGINT)) AS BIGINT) AS mi_s
        |       FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot),
        |hx AS (SELECT CAST(SUM(CAST(floor(((CAST(nx AS DOUBLE) / CAST(n AS DOUBLE))
        |         * ln(CAST(n AS DOUBLE) / CAST(nx AS DOUBLE)) * 1e12) + 0.5) AS BIGINT))
        |        AS BIGINT) AS hx_s
        |       FROM mx CROSS JOIN tot),
        |hy AS (SELECT CAST(SUM(CAST(floor(((CAST(ny AS DOUBLE) / CAST(n AS DOUBLE))
        |         * ln(CAST(n AS DOUBLE) / CAST(ny AS DOUBLE)) * 1e12) + 0.5) AS BIGINT))
        |        AS BIGINT) AS hy_s
        |       FROM my CROSS JOIN tot)
        |SELECT n AS n_rows, n_cells,
        | CAST(mi_s AS DOUBLE) / 1e12 AS mi,
        | CAST(hx_s AS DOUBLE) / 1e12 AS h_x,
        | CAST(hy_s AS DOUBLE) / 1e12 AS h_y,
        | CASE WHEN hx_s > 0 AND hy_s > 0 THEN
        |   floor(((CAST(mi_s AS DOUBLE) / 1e12)
        |     / sqrt((CAST(hx_s AS DOUBLE) / 1e12) * (CAST(hy_s AS DOUBLE) / 1e12))) * 1000000.0 + 0.5) / 1000000.0
        | ELSE NULL END AS nmi
        |FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN tot""".stripMargin,

    "events_abtest" ->
      """WITH u AS (SELECT user_id,
        |  CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
        |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS conv
        | FROM events GROUP BY 1),
        |g AS (SELECT
        |  CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |  CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |  CAST(SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        | FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        | CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        | CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        | CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
        |  floor(((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |  / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |     * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |     * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0
        | ELSE NULL END AS z_score
        |FROM g""".stripMargin,

    "events_markov" ->
      """WITH seq AS (SELECT user_id, event_type,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000000000, event_id) AS next_type
        | FROM events),
        |pairs AS (SELECT event_type AS from_type, next_type AS to_type,
        |           CAST(count(*) AS BIGINT) AS n
        |          FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS t FROM pairs GROUP BY 1)
        |SELECT from_type, to_type, n, CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS p
        |FROM pairs JOIN tot USING (from_type)""".stripMargin,

    "events_gap_fill" ->
      s"""WITH b AS (SELECT min(epoch_ns(ts) // 86400000000000) AS lo,
        |                  max(epoch_ns(ts) // 86400000000000) AS hi FROM events),
        |daily AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
        |           CAST(count(*) AS BIGINT) AS n
        |          FROM events GROUP BY 1, 2),
        |days AS (SELECT unnest(generate_series(lo, hi)) AS d FROM b),
        |spine AS (SELECT t.event_type, days.d
        |          FROM days,
        |           (VALUES ${typeValues})
        |            t(event_type))
        |SELECT s.event_type, s.d, COALESCE(daily.n, 0) AS n_events
        |FROM spine s LEFT JOIN daily
        |  ON s.event_type = daily.event_type AND s.d = daily.d""".stripMargin,

    "events_stickiness" ->
      """WITH a AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS d
        |           FROM events),
        |dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM a GROUP BY 1),
        |w AS (SELECT DISTINCT a.user_id, a.d + g.x AS d
        |      FROM a, generate_series(0, 6) g(x)),
        |wau AS (SELECT d, CAST(count(*) AS BIGINT) AS wau FROM w GROUP BY 1)
        |SELECT dau.d AS d, dau, wau,
        | CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau ON dau.d = wau.d""".stripMargin,

    "text_entropy" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, t),
        |h AS (SELECT doc_id, t, tf,
        |       CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE)) AS hv FROM tf),
        |ag AS (SELECT doc_id, list(hv ORDER BY t) AS hs,
        |        CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |        CAST(count(*) AS BIGINT) AS n_distinct
        |       FROM h GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_distinct,
        | floor((ln(CAST(n_tokens AS DOUBLE))
        |  - list_reduce(list_prepend(CAST(0.0 AS DOUBLE), hs), (a, b) -> a + b)
        |    / CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS entropy
        |FROM ag""".stripMargin,

    "profile_drift" ->
      """WITH binned AS (
        | SELECT CAST(floor((l_extendedprice * 100.0) + 0.5) AS BIGINT) // 50000 AS bin,
        |  CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |  CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS nb
        | FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
        |        FROM binned),
        |terms AS (SELECT na, nb,
        |  CASE WHEN na > 0 AND nb > 0 THEN CAST(floor((
        |    (CAST(na AS DOUBLE) / CAST(ta AS DOUBLE) - CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))
        |     * ln((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)) / (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE)))
        |     * 1e12) + 0.5) AS BIGINT) ELSE NULL END AS term
        | FROM binned CROSS JOIN tot)
        |SELECT
        | CAST(SUM(CASE WHEN term IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_common,
        | CAST(SUM(CASE WHEN na > 0 AND nb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_a_only,
        | CAST(SUM(CASE WHEN na = 0 AND nb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins_b_only,
        | CAST(SUM(term) AS DOUBLE) / 1e12 AS psi
        |FROM terms""".stripMargin,

    "events_forecast_eval" ->
      """WITH daily AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
        |  CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2)
        |SELECT a.event_type,
        | CAST(count(*) AS BIGINT) AS n_days_eval,
        | CAST(SUM(abs(a.n - f.n)) AS DOUBLE) / count(*) AS mae,
        | CAST(SUM(a.n - f.n) AS DOUBLE) / count(*) AS bias
        |FROM daily a JOIN daily f ON a.event_type = f.event_type AND f.d = a.d - 7
        |GROUP BY 1""".stripMargin,

    "orders_seasonality" ->
      """WITH m AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(floor((o_totalprice * 100.0) + 0.5) AS BIGINT)) AS BIGINT) AS tc
        | FROM orders GROUP BY 1, 2)
        |SELECT o_year, o_month, n_orders, CAST(tc AS DOUBLE) / 100.0 AS revenue,
        | CAST(tc - lag(tc, 1) OVER (ORDER BY o_year, o_month) AS DOUBLE)
        |  / CAST(lag(tc, 1) OVER (ORDER BY o_year, o_month) AS DOUBLE) AS mom_growth,
        | CAST(tc - lag(tc, 1) OVER (PARTITION BY o_month ORDER BY o_year) AS DOUBLE)
        |  / CAST(lag(tc, 1) OVER (PARTITION BY o_month ORDER BY o_year) AS DOUBLE) AS yoy_growth
        |FROM m""".stripMargin,

    "profile_histogram" ->
      """WITH binned AS (
        | SELECT CAST(floor((l_extendedprice * 100.0) + 0.5) AS BIGINT) // 50000 AS bin,
        |  CAST(count(*) AS BIGINT) AS n_rows
        | FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM binned)
        |SELECT CAST(bin * 50000 AS DOUBLE) / 100.0 AS bin_lo, n_rows,
        | CAST(n_rows AS DOUBLE) / CAST(t AS DOUBLE) AS pct
        |FROM binned CROSS JOIN tot""".stripMargin,

    "orders_pareto" ->
      """WITH cr AS (SELECT o_custkey,
        |  CAST(SUM(CAST(floor((o_totalprice * 100.0) + 0.5) AS BIGINT)) AS BIGINT) AS rc
        | FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS t FROM cr),
        |top AS (SELECT o_custkey, rc FROM cr ORDER BY rc DESC, o_custkey ASC LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY rc DESC, o_custkey ASC) AS BIGINT) AS rank,
        | o_custkey, CAST(rc AS DOUBLE) / 100.0 AS revenue,
        | CAST(SUM(rc) OVER (ORDER BY rc DESC, o_custkey ASC) AS DOUBLE) / CAST(t AS DOUBLE) AS cum_share
        |FROM top CROSS JOIN tot""".stripMargin,

    "text_zipf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS freq,
        |        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |       FROM tok GROUP BY term),
        |top AS (SELECT term, freq, n_docs FROM tc ORDER BY freq DESC, term ASC LIMIT 40)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, term ASC) AS BIGINT) AS rank,
        | term, freq, n_docs,
        | CAST(row_number() OVER (ORDER BY freq DESC, term ASC) * freq AS BIGINT) AS rank_x_freq
        |FROM top""".stripMargin,

    "q15_topsupplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |  CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)) AS BIGINT) AS rc
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1996-04-01'
        | GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(rc AS DOUBLE) / 10000.0 AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rc = (SELECT max(rc) FROM rev)""".stripMargin,

    "text_hashfeat" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok WHERE length(t) > 0 GROUP BY doc_id, t),
        |sc AS (SELECT doc_id, tf,
        |        (ascii(t) * 31 + ascii(right(t, 1)) * 7 + length(t)) % 64 AS b
        |       FROM tf)
        |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        | CAST(SUM(tf * ((b * 2654435761) % 1000 - 500)) AS DOUBLE)
        |   / (1000.0 * CAST(SUM(tf) AS DOUBLE)) AS hash_score
        |FROM sc GROUP BY doc_id""".stripMargin,

    "q19_disjunct" ->
      """SELECT
        | CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
        | CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q8_marketshare" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(SUM(CASE WHEN sn.n_name = 'NATION_7'
        |   THEN CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)
        |   ELSE 0 END) AS DOUBLE)
        | / CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey
        |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,

    "q9_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,

    "q21_waiting" ->
      """WITH per_supp AS (
        |  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2),
        |per_order AS (
        |  SELECT l_orderkey, count(*) AS nsupp, max(smax) AS omax
        |  FROM per_supp GROUP BY 1 HAVING count(*) >= 2),
        |blamed AS (
        |  SELECT p.l_orderkey, max(p.l_suppkey) AS l_suppkey
        |  FROM per_supp p JOIN per_order o
        |    ON p.l_orderkey = o.l_orderkey AND p.smax = o.omax
        |  GROUP BY 1 HAVING count(*) = 1)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM blamed JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,

    "events_ewma" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |rd AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        |       FROM daily),
        |ew AS (
        |  SELECT event_type, d, n, rn, n * 1000000 AS e FROM rd WHERE rn = 1
        |  UNION ALL
        |  SELECT rd.event_type, rd.d, rd.n, rd.rn, (3000000 * rd.n + 7 * ew.e) // 10
        |  FROM rd JOIN ew ON rd.event_type = ew.event_type AND rd.rn = ew.rn + 1)
        |SELECT event_type, d, n AS n_events, CAST(e AS DOUBLE) / 1000000.0 AS ewma
        |FROM ew""".stripMargin,

    "events_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |rd AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
        |       FROM daily),
        |h AS (
        |  SELECT event_type, d, n, rn, n * 1000000 AS l, CAST(0 AS BIGINT) AS b
        |  FROM rd WHERE rn = 1
        |  UNION ALL
        |  SELECT rd.event_type, rd.d, rd.n, rd.rn,
        |   (3000000 * rd.n + 7 * (h.l + h.b)) // 10,
        |   (2 * ((3000000 * rd.n + 7 * (h.l + h.b)) // 10 - h.l) + 8 * h.b) // 10
        |  FROM rd JOIN h ON rd.event_type = h.event_type AND rd.rn = h.rn + 1)
        |SELECT event_type, d, n AS n_events,
        | CAST(l AS DOUBLE) / 1000000.0 AS level,
        | CAST(b AS DOUBLE) / 1000000.0 AS trend,
        | CAST(l + b AS DOUBLE) / 1000000.0 AS forecast_next
        |FROM h""".stripMargin,

    "range_join" ->
      """WITH anchor AS (SELECT min(CAST(l_shipdate AS DATE)) AS d0 FROM lineitem),
        |w AS (SELECT range AS window_id FROM range(0, 1000000)
        |      WHERE range <= (
        |        SELECT date_diff('day', d0, (SELECT max(CAST(l_shipdate AS DATE)) FROM lineitem))
        |        FROM anchor) // 100)
        |SELECT window_id, CAST(window_id * 100 AS BIGINT) AS start_offset_days,
        | CAST(SUM(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * 10000.0) + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem CROSS JOIN anchor
        |JOIN w ON date_diff('day', d0, CAST(l_shipdate AS DATE)) >= window_id * 100
        |      AND date_diff('day', d0, CAST(l_shipdate AS DATE)) < window_id * 100 + 35
        |GROUP BY 1""".stripMargin,

    "merge_upsert" ->
      """WITH ch AS (
        |  SELECT o_custkey AS k,
        |    CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op,
        |    o_totalprice AS newbal
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) t
        |  WHERE rn = 1)
        |SELECT coalesce(c.c_custkey, ch.k) AS c_custkey, c_name,
        |  coalesce(ch.newbal, c.c_acctbal) AS c_acctbal, c_nationkey, c_mktsegment,
        |  CASE WHEN ch.op IS NULL THEN 'K'
        |       WHEN c.c_custkey IS NULL THEN 'I' ELSE ch.op END AS op
        |FROM customer c FULL JOIN ch ON c.c_custkey = ch.k
        |WHERE ch.op IS NULL OR ch.op <> 'D'""".stripMargin,

    "corpus_shuffle" ->
      """SELECT doc_id, source,
        | doc_id % 8 AS shard,
        | CAST(row_number() OVER (
        |   PARTITION BY doc_id % 8
        |   ORDER BY ((doc_id % 2147483647) * 2654435761) % 2147483647, doc_id)
        |  AS BIGINT) AS pos
        |FROM documents""".stripMargin,

    "feat_lag" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000000000 AS t, value,
        |  CAST(floor((value * 10000.0) + 0.5) AS BIGINT) AS vc FROM events)
        |SELECT event_id, user_id, t, value,
        | lag(value, 1) OVER w AS lag1,
        | lag(value, 2) OVER w AS lag2,
        | value - lag(value, 1) OVER w AS delta1,
        | CAST(SUM(vc) OVER w3 AS DOUBLE)
        |   / CAST(count(*) OVER w3 * 10000 AS DOUBLE) AS ma3
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id),
        |  w3 AS (PARTITION BY user_id ORDER BY t, event_id
        |         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "dq_check" ->
      """SELECT 'lineitem_quantity_range' AS check_name,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(SUM(CASE WHEN l_quantity NOT BETWEEN 1.0 AND 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_discount_range', CAST(count(*) AS BIGINT),
        | CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_shipdate_not_null', CAST(count(*) AS BIGINT),
        | CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_totalprice_positive', CAST(count(*) AS BIGINT),
        | CAST(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'orders_status_domain', CAST(count(*) AS BIGINT),
        | CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem_fk_orders', (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        | (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
        |UNION ALL
        |SELECT 'customer_custkey_unique', CAST(SUM(k) AS BIGINT), CAST(SUM(k - 1) AS BIGINT)
        |FROM (SELECT count(*) AS k FROM customer GROUP BY c_custkey) t""".stripMargin,

    "orders_assoc" ->
      """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nt FROM d),
        |items AS (SELECT l_partkey AS part, CAST(count(*) AS BIGINT) AS ni
        |          FROM d GROUP BY 1),
        |p AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |       CAST(count(*) AS BIGINT) AS n_ab
        |      FROM d a JOIN d b
        |       ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT part_a, part_b, n_ab,
        | floor((CAST(n_ab AS DOUBLE) / CAST(nt AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS support,
        | floor((CAST(n_ab AS DOUBLE) / CAST(ia.ni AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS conf_a_b,
        | floor((CAST(n_ab AS DOUBLE) / CAST(ib.ni AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS conf_b_a,
        | floor((CAST(n_ab AS DOUBLE) * CAST(nt AS DOUBLE)
        |  / (CAST(ia.ni AS DOUBLE) * CAST(ib.ni AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS lift
        |FROM p JOIN items ia ON ia.part = part_a
        | JOIN items ib ON ib.part = part_b
        | CROSS JOIN n
        |ORDER BY lift DESC, part_a, part_b
        |LIMIT 20""".stripMargin,

    "events_convlag" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_type FROM events),
        |a AS (SELECT user_id, min(t) AS ta FROM e
        |      WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, min(t) AS tp FROM e JOIN a USING (user_id)
        |      WHERE event_type = 'purchase' AND t > ta GROUP BY 1),
        |lags AS (SELECT (tp - ta) // 1000000000 AS secs FROM p JOIN a USING (user_id))
        |SELECT CAST(count(*) AS BIGINT) AS n_conversions,
        | CAST(floor((quantile_cont(secs, 0.25)) + 0.5) AS BIGINT) AS p25_sec,
        | CAST(floor((quantile_cont(secs, 0.5)) + 0.5) AS BIGINT) AS p50_sec,
        | CAST(floor((quantile_cont(secs, 0.75)) + 0.5) AS BIGINT) AS p75_sec,
        | CAST(floor((quantile_cont(secs, 0.9)) + 0.5) AS BIGINT) AS p90_sec,
        | CAST(min(secs) AS BIGINT) AS min_sec,
        | CAST(max(secs) AS BIGINT) AS max_sec
        |FROM lags""".stripMargin,

    "events_anomaly_dow" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS d,
        |  CAST(count(*) AS BIGINT) AS n_events
        | FROM events GROUP BY 1),
        |dd AS (SELECT d, ((d + 4) % 7 + 7) % 7 AS dow, n_events FROM daily),
        |st AS (SELECT dow, CAST(SUM(n_events) AS DOUBLE) AS s,
        |        CAST(SUM(n_events * n_events) AS DOUBLE) AS ss,
        |        CAST(count(*) AS DOUBLE) AS n
        |       FROM dd GROUP BY 1),
        |mu AS (SELECT dow, s / n AS mu,
        |        CASE WHEN n > 1.0 THEN sqrt((ss - s * s / n) / (n - 1.0)) END AS sigma
        |       FROM st)
        |SELECT d, dd.dow, n_events,
        | CASE WHEN sigma > 0.0
        |      THEN floor(((CAST(n_events AS DOUBLE) - mu) / sigma) * 1000000.0 + 0.5) / 1000000.0 END AS z_dow
        |FROM dd JOIN mu ON dd.dow = mu.dow""".stripMargin,

    "embed_norm_audit" ->
      """WITH b AS (SELECT label,
        |  CAST(floor((sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
        |    for x in embedding])) * 1000000.0) + 0.5) AS BIGINT) AS nq,
        |  CAST(len(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) AS BIGINT) AS nn
        | FROM embeddings),
        |g AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(SUM(CASE WHEN nq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(SUM(nn) AS BIGINT) AS n_nan_components,
        |  CAST(min(nq) AS BIGINT) AS mn, CAST(max(nq) AS BIGINT) AS mx,
        |  CAST(SUM(nq) AS BIGINT) AS sn
        | FROM b GROUP BY label)
        |SELECT label, n_vecs, n_zero, n_nan_components,
        | CAST(mn AS DOUBLE) / 1000000.0 AS min_norm,
        | CAST(CAST(floor((CAST(sn AS DOUBLE) / n_vecs) + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS mean_norm,
        | CAST(mx AS DOUBLE) / 1000000.0 AS max_norm
        |FROM g""".stripMargin,

    "events_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
        |b AS (SELECT a.event_type AS type_a, c.event_type AS type_b,
        |       CAST(count(*) AS BIGINT) AS n_both
        |      FROM ut a JOIN ut c
        |       ON a.user_id = c.user_id AND a.event_type < c.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_both,
        | floor((CAST(n_both AS DOUBLE) / CAST(ta.n + tb.n - n_both AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        |FROM b JOIN t ta ON ta.event_type = type_a
        | JOIN t tb ON tb.event_type = type_b""".stripMargin,

    "events_gini" ->
      """WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        |            FROM events GROUP BY 1),
        |h AS (SELECT cnt, CAST(count(*) AS BIGINT) AS m FROM pu GROUP BY 1),
        |c AS (SELECT cnt, m,
        |       CAST(SUM(m) OVER (ORDER BY cnt ROWS BETWEEN UNBOUNDED PRECEDING
        |         AND CURRENT ROW) AS BIGINT) - m AS clt
        |      FROM h),
        |blocks AS (SELECT cnt * (m * clt + (m * (m + 1)) // 2) AS s1,
        |            cnt * m AS sx, m FROM c),
        |g AS (SELECT CAST(SUM(m) AS BIGINT) AS n_users,
        |       CAST(SUM(sx) AS BIGINT) AS total_events,
        |       CAST(SUM(s1) AS BIGINT) AS rs FROM blocks)
        |SELECT n_users, total_events,
        | floor(((2.0 * CAST(rs AS DOUBLE)
        |   - CAST(n_users + 1 AS DOUBLE) * CAST(total_events AS DOUBLE))
        |  / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS gini
        |FROM g""".stripMargin,

    "events_lifecycle" ->
      """WITH active AS (SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS d
        |                FROM events),
        |m AS (SELECT user_id, d,
        |       lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev,
        |       lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nxt
        |      FROM active),
        |st AS (SELECT d,
        |        CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |        CAST(SUM(CASE WHEN prev = d - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |        CAST(SUM(CASE WHEN prev IS NOT NULL AND prev < d - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |       FROM m GROUP BY d),
        |ch AS (SELECT d + 1 AS d, CAST(count(*) AS BIGINT) AS n_churned
        |       FROM m WHERE nxt IS NULL OR nxt > d + 1 GROUP BY d + 1)
        |SELECT coalesce(st.d, ch.d) AS d,
        | coalesce(n_new, 0) AS n_new,
        | coalesce(n_retained, 0) AS n_retained,
        | coalesce(n_resurrected, 0) AS n_resurrected,
        | coalesce(n_churned, 0) AS n_churned
        |FROM st FULL OUTER JOIN ch ON st.d = ch.d""".stripMargin,

    "events_bots" ->
      """WITH pm AS (SELECT user_id, epoch_ns(ts) // 60000000000 AS m,
        |             CAST(count(*) AS BIGINT) AS c
        |            FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
        | CAST(count(*) AS BIGINT) AS active_minutes,
        | CAST(max(c) AS BIGINT) AS peak_per_min,
        | floor((CAST(SUM(c) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS events_per_minute,
        | max(c) >= 2 AS bot_flag
        |FROM pm GROUP BY user_id""".stripMargin,

    "sample_reservoir" ->
      """SELECT doc_id, source, lang FROM (
        | SELECT doc_id, source, lang,
        |  row_number() OVER (PARTITION BY source
        |   ORDER BY ((doc_id % 2147483647) * 2654435761) % 2147483647, doc_id) AS rn
        | FROM documents) t
        |WHERE rn <= 10""".stripMargin,

    "corpus_scorecard" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | floor((CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_tokens,
        | floor((CAST(SUM(n_chars) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_chars,
        | floor((CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS pct_short,
        | CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents GROUP BY source""".stripMargin,

    "dq_keydups" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber, count(*) AS k,
        |  count(DISTINCT (l_partkey, l_suppkey, l_quantity, l_extendedprice,
        |    l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)) AS p
        | FROM lineitem GROUP BY 1, 2),
        |o AS (SELECT o_orderkey, count(*) AS k,
        |  count(DISTINCT (o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |    o_orderpriority)) AS p
        | FROM orders GROUP BY 1)
        |SELECT 'lineitem(l_orderkey,l_linenumber)' AS key_name,
        | CAST(coalesce(count(*), 0) AS BIGINT) AS n_keys,
        | CAST(coalesce(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_keys,
        | CAST(coalesce(SUM(k - 1), 0) AS BIGINT) AS n_extra_rows,
        | CAST(coalesce(SUM(CASE WHEN p > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_conflicting_keys
        |FROM li
        |UNION ALL
        |SELECT 'orders(o_orderkey)',
        | CAST(coalesce(count(*), 0) AS BIGINT),
        | CAST(coalesce(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0) AS BIGINT),
        | CAST(coalesce(SUM(k - 1), 0) AS BIGINT),
        | CAST(coalesce(SUM(CASE WHEN p > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |FROM o""".stripMargin,

    "dq_keys" ->
      """SELECT 'orders(o_orderkey)' AS candidate_key,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        | floor((CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS uniqueness
        |FROM orders
        |UNION ALL
        |SELECT 'orders(o_custkey)', CAST(count(*) AS BIGINT),
        | CAST(count(DISTINCT o_custkey) AS BIGINT),
        | floor((CAST(count(DISTINCT o_custkey) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0
        |FROM orders
        |UNION ALL
        |SELECT 'orders(o_custkey,o_orderdate)', CAST(count(*) AS BIGINT),
        | CAST(count(DISTINCT (o_custkey, o_orderdate)) AS BIGINT),
        | floor((CAST(count(DISTINCT (o_custkey, o_orderdate)) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0
        |FROM orders
        |UNION ALL
        |SELECT 'lineitem(l_orderkey,l_linenumber)', CAST(count(*) AS BIGINT),
        | CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
        | floor((CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem(l_partkey,l_suppkey)', CAST(count(*) AS BIGINT),
        | CAST(count(DISTINCT (l_partkey, l_suppkey)) AS BIGINT),
        | floor((CAST(count(DISTINCT (l_partkey, l_suppkey)) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0
        |FROM lineitem""".stripMargin,

    "dq_fd" ->
      """WITH f1 AS (SELECT count(DISTINCT o_orderpriority) AS k, count(*) AS c
        |            FROM orders GROUP BY o_custkey),
        |f2 AS (SELECT count(DISTINCT l_returnflag) AS k, count(*) AS c
        |       FROM lineitem GROUP BY l_orderkey),
        |f3 AS (SELECT count(DISTINCT l_linestatus) AS k, count(*) AS c
        |       FROM lineitem GROUP BY l_returnflag)
        |SELECT 'o_custkey->o_orderpriority' AS fd,
        | CAST(coalesce(count(*), 0) AS BIGINT) AS n_groups,
        | CAST(coalesce(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violating_groups,
        | CAST(coalesce(SUM(CASE WHEN k > 1 THEN c ELSE 0 END), 0) AS BIGINT) AS n_violating_rows
        |FROM f1
        |UNION ALL
        |SELECT 'l_orderkey->l_returnflag', CAST(coalesce(count(*), 0) AS BIGINT),
        | CAST(coalesce(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0) AS BIGINT),
        | CAST(coalesce(SUM(CASE WHEN k > 1 THEN c ELSE 0 END), 0) AS BIGINT)
        |FROM f2
        |UNION ALL
        |SELECT 'l_returnflag->l_linestatus', CAST(coalesce(count(*), 0) AS BIGINT),
        | CAST(coalesce(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END), 0) AS BIGINT),
        | CAST(coalesce(SUM(CASE WHEN k > 1 THEN c ELSE 0 END), 0) AS BIGINT)
        |FROM f3""".stripMargin,

    "agg_incremental" ->
      """WITH e AS (SELECT event_type, epoch_ns(ts) // 86400000000000 AS d,
        |   CAST(floor((value * 10000.0) + 0.5) AS BIGINT) AS vc FROM events),
        |se AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n, CAST(SUM(vc) AS BIGINT) AS sc
        |       FROM e WHERE d % 2 = 0 GROUP BY 1, 2),
        |so AS (SELECT event_type, d, CAST(count(*) AS BIGINT) AS n, CAST(SUM(vc) AS BIGINT) AS sc
        |       FROM e WHERE d % 2 = 1 GROUP BY 1, 2),
        |u AS (SELECT * FROM se UNION ALL SELECT * FROM so)
        |SELECT event_type, d, CAST(SUM(n) AS BIGINT) AS n_events,
        | CAST(CAST(SUM(sc) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_value
        |FROM u GROUP BY 1, 2""".stripMargin,

    "imp_pool" -> {
      val ic1 = s"coalesce(${ac("c_acctbal")}, m)"
      s"""WITH mcv AS ($MCV),
         |meanstat AS (SELECT CAST(floor((CAST(SUM(${ac("c_acctbal")}) AS DOUBLE) / count(c_acctbal)) + 0.5) AS BIGINT) AS m FROM mcv),
         |medstat AS (SELECT CAST(floor((quantile_cont(${ac("c_acctbal")}, 0.5)) + 0.5) AS BIGINT) AS m FROM mcv),
         |gmstat AS (SELECT c_nationkey, CAST(floor((CAST(SUM(${ac("c_acctbal")}) AS DOUBLE) / count(c_acctbal)) + 0.5) AS BIGINT) AS gm
         |           FROM mcv GROUP BY c_nationkey),
         |m1 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(ic) AS BIGINT) AS sc, CAST(SUM(ic*ic) AS BIGINT) AS sc2
         |       FROM (SELECT $ic1 AS ic FROM mcv CROSS JOIN meanstat) t),
         |m2 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(ic) AS BIGINT) AS sc, CAST(SUM(ic*ic) AS BIGINT) AS sc2
         |       FROM (SELECT $ic1 AS ic FROM mcv CROSS JOIN medstat) t),
         |m3 AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(ic) AS BIGINT) AS sc, CAST(SUM(ic*ic) AS BIGINT) AS sc2
         |       FROM (SELECT coalesce(${ac("c_acctbal")}, gm, m) AS ic
         |             FROM mcv LEFT JOIN gmstat USING (c_nationkey) CROSS JOIN meanstat) t),
         |j AS (SELECT m1.n AS n1, m1.sc AS sc1, m1.sc2 AS sc21,
         |             m2.n AS n2, m2.sc AS sc2_, m2.sc2 AS sc22,
         |             m3.n AS n3, m3.sc AS sc3, m3.sc2 AS sc23
         |      FROM m1 CROSS JOIN m2 CROSS JOIN m3),
         |f AS (SELECT
         |  CAST(sc1 AS DOUBLE) / (100.0 * CAST(n1 AS DOUBLE)) AS q1,
         |  CAST(sc2_ AS DOUBLE) / (100.0 * CAST(n2 AS DOUBLE)) AS q2,
         |  CAST(sc3 AS DOUBLE) / (100.0 * CAST(n3 AS DOUBLE)) AS q3,
         |  ((CAST(sc21 AS DOUBLE) / 10000.0 - (CAST(sc1 AS DOUBLE) / 100.0) * (CAST(sc1 AS DOUBLE) / 100.0) / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE) AS u1,
         |  ((CAST(sc22 AS DOUBLE) / 10000.0 - (CAST(sc2_ AS DOUBLE) / 100.0) * (CAST(sc2_ AS DOUBLE) / 100.0) / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE) AS u2,
         |  ((CAST(sc23 AS DOUBLE) / 10000.0 - (CAST(sc3 AS DOUBLE) / 100.0) * (CAST(sc3 AS DOUBLE) / 100.0) / CAST(n3 AS DOUBLE)) / (CAST(n3 AS DOUBLE) - 1.0)) / CAST(n3 AS DOUBLE) AS u3
         | FROM j),
         |g AS (SELECT q1, q2, q3, u1, u2, u3,
         |  ((q1 + q2) + q3) / 3.0 AS qbar FROM f)
         |SELECT 'c_acctbal' AS variable, CAST(3 AS BIGINT) AS m,
         | floor((qbar) * 100000000.0 + 0.5) / 100000000.0 AS qbar,
         | floor((((u1 + u2) + u3) / 3.0) * 100000000.0 + 0.5) / 100000000.0 AS within_var,
         | floor(((((q1 - qbar) * (q1 - qbar) + (q2 - qbar) * (q2 - qbar)) + (q3 - qbar) * (q3 - qbar)) / 2.0) * 100000000.0 + 0.5) / 100000000.0 AS between_var,
         | floor((((u1 + u2) + u3) / 3.0 + (1.0 + 1.0 / 3.0) * ((((q1 - qbar) * (q1 - qbar) + (q2 - qbar) * (q2 - qbar)) + (q3 - qbar) * (q3 - qbar)) / 2.0)) * 100000000.0 + 0.5) / 100000000.0 AS total_var
         |FROM g""".stripMargin
    }
  )
}
