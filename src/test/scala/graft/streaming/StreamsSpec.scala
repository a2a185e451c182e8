package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class Ev(ts: Timestamp, event_type: String, value: Double, event_id: Long)
case class Doc(ts: Timestamp, doc_id: Long, text: String)

class StreamsSpec extends SparkSpec {

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("streaming windowed agg matches the batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = Seq(
      Ev(t(0), "click", 1.0, 1), Ev(t(5), "click", 2.0, 2),
      Ev(t(10), "view", 3.0, 3), Ev(t(65), "click", 4.0, 4),
      Ev(t(70), "view", 5.0, 5))

    val out = Streams.windowedAgg(input.toDF(), "ts", "event_type", "value")
    val query = out.writeStream.format("memory").queryName("agg_out")
      .outputMode("complete").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      val got = spark.table("agg_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = events.toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
        .select(col("window.start"), col("event_type"), col("n"), col("s"))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == batch)
    } finally query.stop()
  }

  test("streaming windowed top-k users: chained stateful aggs, append on window close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // event_id stands in for user_id. Window 0: user 1×3, user 2×2, user
    // 3×1; window 1: user 7×2, user 8×1. The flush event (far future)
    // advances the watermark past both windows so append mode emits them.
    val w0 = Seq(1L, 1L, 1L, 2L, 2L, 3L).zipWithIndex.map { case (u, i) =>
      Ev(t(i), "click", 1.0, u)
    }
    val w1 = Seq(7L, 7L, 8L).zipWithIndex.map { case (u, i) =>
      Ev(t(60 + i), "click", 1.0, u)
    }
    val out = Streams.windowedTopUsers(input.toDF(), "ts", "event_id", k = 2)
    val query = out.writeStream.format("memory").queryName("topu_out")
      .outputMode("append").start()
    try {
      input.addData(w0 ++ w1: _*)
      query.processAllAvailable()
      input.addData(Ev(t(600), "click", 1.0, 99L))
      query.processAllAvailable()
      val got = spark.table("topu_out")
        .select("window_start", "user_id", "rank", "n_events")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val h0 = t(0).getTime / 3600000L * 3600000L
      val h1 = h0 + 3600000L
      // k=2 per window, ranked by (count desc, user asc); user 3 and user 8
      // fall outside/inside k per window respectively
      assert(got == Set(
        (h0, 1L, 1L, 3L), (h0, 2L, 2L, 2L),
        (h1, 7L, 1L, 2L), (h1, 8L, 2L, 1L)), s"got $got")
    } finally query.stop()
  }

  test("streaming bot gate alerts once on a single-minute burst, never on normal traffic") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // event_id stands in for user_id: user 42 bursts 5 events in one
    // minute; user 7 spreads 3 events over 3 minutes (peak 1/min)
    val base = 1700000000000L
    def at(sec: Int) = new Timestamp(base + sec * 1000L)
    val burst = (1 to 5).map(i => Ev(at(10 + i), "click", 1.0, 42L))
    val calm = Seq(Ev(at(5), "view", 1.0, 7L), Ev(at(70), "view", 1.0, 7L),
      Ev(at(130), "view", 1.0, 7L))
    val out = Streams.botAlerts(input.toDF(), "ts", "event_id", threshold = 5L)
    val query = out.writeStream.format("memory").queryName("bots_out")
      .outputMode("append").start()
    try {
      input.addData(burst ++ calm: _*)
      query.processAllAvailable()
      // advance the watermark far past every open window to force emission
      input.addData(Ev(at(1200), "click", 1.0, 99L))
      query.processAllAvailable()
      val got = spark.table("bots_out")
        .select("window_start", "user_id", "n_events")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2)))
        .toSet
      val w = (base + 11000L) / 60000L * 60000L
      assert(got == Set((w, 42L, 5L)), s"got $got")
    } finally query.stop()
  }

  test("streaming Holt emits closed days bitwise-equal to the batch recursion; late days drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TypedDayEvent]
    val out = Streams.holtSmoothed(input.toDS())
    val query = out.writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    try {
      // day counts: d0=3, d1=2, d2=2 (split across batches), d3 opens
      input.addData(Seq(0L, 0L, 0L, 1L, 1L, 2L).map(TypedDayEvent("click", _)): _*)
      query.processAllAvailable()
      input.addData(Seq(2L, 3L, 0L).map(TypedDayEvent("click", _)): _*)
      query.processAllAvailable()
      val got = spark.table("holt_out")
        .as[HoltPoint].collect().sortBy(_.d).toSeq
      // driver-side reference over the closed days (0, 1, 2); the late
      // day-0 event in batch 2 must NOT change day 0's already-emitted
      // count, and day 2's count must include BOTH batches' events
      var l = -1L; var b = 0L
      val want = Seq((0L, 3L), (1L, 2L), (2L, 2L)).map { case (d, n) =>
        if (l < 0) { l = n * 1000000L; b = 0L }
        else {
          val nl = (3000000L * n + 7L * (l + b)) / 10L
          b = (2L * (nl - l) + 8L * b) / 10L
          l = nl
        }
        HoltPoint("click", d, n, l / 1e6, b / 1e6, (l + b) / 1e6)
      }
      assert(got == want, s"got $got")
    } finally query.stop()
  }

  test("streaming windowed HLL distinct matches exact counts on small cardinalities") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // event_id stands in for user_id; duplicates within a window must
    // collapse — ids 1,1,2 in window 0 and 3,3,3 in window 1
    val events = Seq(
      Ev(t(0), "click", 1.0, 1), Ev(t(5), "click", 1.0, 1), Ev(t(10), "click", 1.0, 2),
      Ev(t(65), "click", 1.0, 3), Ev(t(70), "click", 1.0, 3), Ev(t(75), "click", 1.0, 3))
    val out = Streams.windowedDistinct(input.toDF(), "ts", "event_type", "event_id")
    val query = out.writeStream.format("memory").queryName("dist_out")
      .outputMode("complete").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      val got = spark.table("dist_out")
        .select("window_start", "approx_distinct", "n_events")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2)))
        .toSet
      // HLL is exact at tiny cardinality; windows align to epoch hours
      val h0 = t(0).getTime / 3600000L * 3600000L
      assert(got == Set((h0, 2L, 3L), (h0 + 3600000L, 1L, 3L)))
    } finally query.stop()
  }

  test("streaming KLL window sketches re-merge downstream into exact-rank quantiles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // values 1..100 in window 0, 101..200 in window 1: the per-window p95s
    // (~95, ~195) CANNOT be combined into the true merged p95 (~190) by
    // any arithmetic on the estimates — only the sketch union can
    val h0 = 1700000000000L / 3600000L * 3600000L // epoch-hour aligned
    val events = (1 to 100).map(i =>
        Ev(new Timestamp(h0 + i * 30000L), "click", i.toDouble, i)) ++
      (101 to 200).map(i =>
        Ev(new Timestamp(h0 + 3600000L + (i - 100) * 30000L), "click", i.toDouble, i))
    val out = Streams.windowedQuantiles(input.toDF(), "ts", "event_type", "value")
    val query = out.writeStream.format("memory").queryName("kll_out")
      .outputMode("complete").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      val landed = spark.table("kll_out")
      assert(landed.schema("quantile_sketch").dataType ==
        org.apache.spark.sql.types.BinaryType)
      assert(landed.count() == 2)
      // per-window medians sit in their own ranges (sketch exact at n=100)
      val p50s = landed.select("p50").as[Double].collect().sorted
      assert(p50s(0) > 40 && p50s(0) < 61 && p50s(1) > 140 && p50s(1) < 161,
        s"per-window p50s: ${p50s.toSeq}")
      // downstream re-merge from the landed sketches — the batch rollup
      // shape; no raw events rescanned. True merged p95 over 1..200 = 190.
      val merged = landed.groupBy("event_type")
        .agg(expr("kll_sketch_get_quantile_double(kll_merge_agg_double(quantile_sketch), 0.95D)")
          .as("p95"))
        .as[(String, Double)].collect().toMap
      assert(math.abs(merged("click") - 190.0) <= 6.0,
        s"union-merged p95: $merged (naive mean of window p95s would be ~145)")
    } finally query.stop()
  }

  test("streaming window sketches union-merge downstream: lambda rollup matches exact distinct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // ids OVERLAP across windows (window 0 sees {1,2}, window 1 sees {2,3}):
    // per-window estimates sum to 4, the true merged distinct is 3 — only a
    // register-level sketch union can get this right downstream
    val events = Seq(
      Ev(t(0), "click", 1.0, 1), Ev(t(5), "click", 1.0, 2),
      Ev(t(65), "click", 1.0, 2), Ev(t(70), "click", 1.0, 3))
    val out = Streams.windowedDistinct(input.toDF(), "ts", "event_type", "event_id")
    val query = out.writeStream.format("memory").queryName("sketch_out")
      .outputMode("complete").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      val landed = spark.table("sketch_out")
      // the persisted table carries the sketch binary per window
      assert(landed.schema("distinct_sketch").dataType ==
        org.apache.spark.sql.types.BinaryType)
      assert(landed.count() == 2)
      // batch-side rollup over the landed sketches — the same merge the
      // events_distinct_rollup face runs; no raw events rescanned
      val merged = landed.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("distinct_sketch")))
          .as("approx_users"))
        .as[(String, Long)].collect().toMap
      assert(merged == Map("click" -> 3L), s"union-merged estimate: $merged")
      // and the naive sum of per-window estimates is WRONG (4), which is
      // exactly why the sketch column must be emitted
      val summed = landed.agg(sum("approx_distinct")).as[Long].head()
      assert(summed == 4L)
    } finally query.stop()
  }

  test("streaming anomaly alert emits only windows beyond the baseline z") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val baseline = Seq(("click", 2.0, 1.0), ("view", 2.0, 1.0))
      .toDF("event_type", "mu", "sigma")
    val out = Streams.anomalyAlert(input.toDF(), "ts", "event_type",
      baseline, zThreshold = 3.0)
    val query = out.writeStream.format("memory").queryName("alert_out")
      .outputMode("complete").start()
    try {
      // window 0: 2 clicks (z = 0, quiet); window 1: 8 clicks (z = 6, alert)
      val quiet = Seq(Ev(t(0), "click", 1.0, 1), Ev(t(5), "click", 1.0, 2))
      val burst = (1 to 8).map(i => Ev(t(60 + i), "click", 1.0, 10 + i))
      input.addData(quiet ++ burst: _*)
      query.processAllAvailable()
      val got = spark.table("alert_out")
        .select("event_type", "n_events", "z")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq == Seq(("click", 8L, 6.0)))
    } finally query.stop()
  }

  test("stateful sessionization closes a session on gap, keeps open ones in state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = Streams.sessionize(input.toDS(), gapSec = 1800)
    val query = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one open session), then a 2h gap
      // event that closes it; user 2: single event stays in state
      input.addData(
        SessionEvent(1L, 1000L, 1.0), SessionEvent(1L, 1600L, 2.0),
        SessionEvent(2L, 5000L, 9.0))
      query.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // everything still open
      input.addData(SessionEvent(1L, 1600L + 7200L, 4.0))
      query.processAllAvailable()
      val closed = spark.table("sess_out").as[Session].collect()
      assert(closed.toSeq == Seq(Session(1L, 1000L, 1600L, 2L, 3.0)))
    } finally query.stop()
  }

  test("streaming curation gates quality+language and dedups content") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val good = ("the of and to is " * 10).trim // english, long, high quality
    val out = Streams.curate(input.toDF(), "ts", "text")
    val query = out.writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(t(0), 1L, good),
        Doc(t(1), 2L, good),            // exact duplicate content → dropped
        Doc(t(2), 3L, ("der und das nicht ein " * 8).trim), // german → gated
        Doc(t(3), 4L, "x"))             // too short → low quality → gated
      query.processAllAvailable()
      val kept = spark.table("curate_out").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L))
    } finally query.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = Streams.dedup(input.toDF(), "ts", Seq("event_id"))
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(Ev(t(0), "click", 1.0, 1), Ev(t(0), "click", 1.0, 1),
        Ev(t(1), "view", 2.0, 2))
      query.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally query.stop()
  }

  test("stream-static broadcast enrichment joins a dimension into the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (20L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[Ev]
    // static side broadcasts; each micro-batch joins without stream state
    val out = input.toDF().withColumnRenamed("event_id", "user_id")
      .join(broadcast(dim), Seq("user_id"), "left")
    val query = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData(Ev(t(0), "click", 1.0, 10), Ev(t(1), "view", 2.0, 30))
      query.processAllAvailable()
      val rows = spark.table("enrich_out").select("user_id", "tier")
        .as[(Long, Option[String])].collect().toMap
      assert(rows(10L).contains("gold") && rows(30L).isEmpty)
    } finally query.stop()
  }

  test("stateful streaming funnel ratchets stages across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = Streams.funnel(input.toDS())
    val query = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("update").start()
    def stages(): Map[Long, (Int, Long)] =
      spark.table("funnel_out").as[FunnelProgress].collect()
        .groupBy(_.user_id).view.mapValues { rs =>
          val last = rs.last; (last.stage, last.convert_sec)
        }.toMap
    try {
      // batch 1: user 1 views+clicks; user 2 clicks BEFORE viewing
      input.addData(FunnelEvent(1L, 10, "view"), FunnelEvent(1L, 20, "click"),
        FunnelEvent(2L, 5, "click"), FunnelEvent(2L, 8, "view"))
      query.processAllAvailable()
      val s1 = stages()
      assert(s1(1L)._1 == 2 && s1(2L)._1 == 1)
      // batch 2: user 1 purchases (full funnel, 30s convert); user 2 clicks post-view
      input.addData(FunnelEvent(1L, 40, "purchase"), FunnelEvent(2L, 12, "click"))
      query.processAllAvailable()
      val s2 = stages()
      assert(s2(1L) == ((3, 30L)))
      assert(s2(2L)._1 == 2)
    } finally query.stop()
  }

  test("stateless text operators (scrub, quality, logprob-free) run on streams unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    // scrub + quality are pure column expressions: the same code path as
    // batch compiles into the streaming plan with zero state
    val out = graft.text.TextAnalysis.withScrub(
      graft.text.TextAnalysis.withQuality(input.toDF(), "text"), "text")
      .select("doc_id", "scrubbed", "n_hits", "quality_score")
    val query = out.writeStream.format("memory").queryName("scrub_out")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(t(0), 1L, "mail bob@x.example now the a of and to in is on for"),
        Doc(t(1), 2L, "spark and sparkly words"))
      query.processAllAvailable()
      val rows = spark.table("scrub_out").orderBy("doc_id")
        .select("scrubbed").as[String].collect()
      assert(rows(0).startsWith("mail <x> now"))
      assert(rows(1) == "<x> and sparkly words")
    } finally query.stop()
  }

  test("streaming attribution credits each purchase to the latest prior touch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TouchEvent]
    val out = Streams.attribution(input.toDS())
    val query = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // batch 1: view then purchase → attributed to the view; a purchase
      // with no prior touch emits nothing
      input.addData(
        TouchEvent(1L, 100L, "view", 10L),
        TouchEvent(1L, 160L, "purchase", 11L),
        TouchEvent(2L, 100L, "purchase", 20L))
      query.processAllAvailable()
      val b1 = spark.table("attr_out")
        .as[AttributionHit].collect()
      assert(b1.toSeq == Seq(AttributionHit(1L, 11L, 160L, 10L, 100L, "view", 60L)))
      // batch 2: the touch state survives batches; a newer click wins over
      // the older view; same-time tie resolves to the higher event_id
      input.addData(
        TouchEvent(1L, 200L, "click", 12L),
        TouchEvent(1L, 200L, "view", 13L),
        TouchEvent(1L, 260L, "purchase", 14L),
        TouchEvent(2L, 300L, "purchase", 21L))
      query.processAllAvailable()
      val b2 = spark.table("attr_out").as[AttributionHit].collect()
        .filter(_.purchase_id == 14L)
      assert(b2.toSeq == Seq(AttributionHit(1L, 14L, 260L, 13L, 200L, "view", 60L)))
      // user 2 still has no touch → its purchase never emits
      assert(!spark.table("attr_out").as[AttributionHit].collect()
        .exists(_.user_id == 2L))
      // batch 3: a touch and a purchase at the SAME timestamp in the same
      // batch — batch semantics (tc.t <= p.t) credit the same-t touch, so
      // the purchase must see the touch even though its event_id is lower
      input.addData(
        TouchEvent(2L, 400L, "purchase", 23L),
        TouchEvent(2L, 400L, "view", 22L))
      query.processAllAvailable()
      val b3 = spark.table("attr_out").as[AttributionHit].collect()
        .filter(_.purchase_id == 23L)
      assert(b3.toSeq == Seq(AttributionHit(2L, 23L, 400L, 22L, 400L, "view", 0L)))
    } finally query.stop()
  }

  test("stream-stream interval join pairs purchases with in-horizon clicks only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class UEv(ts: Timestamp, user_id: Long, event_id: Long)
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    def df(m: MemoryStream[(Timestamp, Long, Long)]) =
      m.toDF().toDF("ts", "user_id", "event_id")
    val out = Streams.intervalJoin(df(clicks), df(purchases), horizonSec = 3600)
    val query = out.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      clicks.addData(
        (t(0), 1L, 100L),   // in horizon for the t(30) purchase
        (t(29), 1L, 101L),  // in horizon
        (t(31), 1L, 102L),  // AFTER the purchase — excluded
        (t(0), 2L, 200L))   // wrong user — excluded
      purchases.addData((t(30), 1L, 900L))
      query.processAllAvailable()
      val got = spark.table("ij_out")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got == Set((900L, 100L), (900L, 101L)))
      // clicks older than the horizon never join: t(31) is 64 min before
      // t(95), so only the fresh t(90) click pairs with the second purchase
      clicks.addData((t(90), 1L, 103L))
      purchases.addData((t(95), 1L, 901L))
      query.processAllAvailable()
      val got2 = spark.table("ij_out").filter(col("purchase_id") === 901L)
        .select("click_id").as[Long].collect().toSet
      assert(got2 == Set(103L))
    } finally query.stop()
  }

  test("streaming near-dup alerts flag hamming-close docs across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    // one changed word in a 12-token doc moves 4 simhash bits here
    val out = Streams.nearDupAlerts(docs, "ts", "doc_id", "text", maxHamming = 4)
    val query = out.writeStream.format("memory").queryName("ndup_out")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      input.addData(
        (1L, 10L, base),
        (2L, 11L, "completely unrelated text about spark plans and shuffles"))
      query.processAllAvailable()
      assert(spark.table("ndup_out").count() == 0) // nothing matches yet
      // batch 2: a near-identical doc (one word changed) must alert
      // against doc 10 even though it arrived in an earlier batch
      input.addData((3L, 12L, base.replace("lazy", "sleepy")))
      query.processAllAvailable()
      val alerts = spark.table("ndup_out").as[NearDupAlert].collect()
        .map(a => (a.doc_id, a.matched_id)).distinct
      assert(alerts.toSeq == Seq((12L, 10L)))
    } finally query.stop()
  }

  test("near-dup alerts with a state TTL still flag near-identical docs") {
    // idleTimeoutMs > 0 switches on ProcessingTimeTimeout, which makes the
    // engine self-trigger batches — processAllAvailable would never see the
    // stream idle, so this path polls the sink with a deadline instead.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val out = Streams.nearDupAlerts(docs, "ts", "doc_id", "text",
      maxHamming = 4, idleTimeoutMs = 60 * 60 * 1000L)
    val query = out.writeStream.format("memory").queryName("ndup_ttl_out")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      input.addData(
        (1L, 10L, base),
        (2L, 12L, base.replace("lazy", "sleepy")))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def alerts() = spark.table("ndup_ttl_out").as[NearDupAlert].collect()
        .map(a => (a.doc_id, a.matched_id)).distinct.toSeq
      while (alerts().isEmpty && System.nanoTime() < deadline) Thread.sleep(200)
      assert(alerts() == Seq((12L, 10L)))
    } finally query.stop()
  }

  test("indexed streaming near-dup probes the band index, then folds each batch in") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ndix").toString
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    def edited(pos: Int, repl: String) =
      (1 to 40).map(i => if (i == pos) repl else s"w$i").mkString(" ")
    val corpus = Seq((100L, base),
      (101L, "unrelated corpus filler text about exchange reuse and codegen stages")
    ).toDF("doc_id", "text")
    graft.dedup.MinHash.writeBandIndex(corpus, "doc_id", "text", s"$dir/index",
      n = 3, k = 32, bands = 8, threshold = 0.3)
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val query = Streams.nearDupIndexed(docs, "doc_id", "text",
        s"$dir/index", s"$dir/alerts")
      .option("checkpointLocation", s"$dir/ckpt").start()
    def alerts() = spark.read.parquet(s"$dir/alerts")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    try {
      input.addData((1L, edited(5, "aa")))
      query.processAllAvailable()
      assert(alerts() == Set((1L, 100L))) // probe against the corpus index
      // the second micro-batch must ALSO match batch 1's doc — only
      // possible if the first batch was folded into the index
      input.addData((2L, edited(5, "aa")),
        (3L, "novel streamed content matching nothing indexed or streamed before"))
      query.processAllAvailable()
      assert(alerts() == Set((1L, 100L), (1L, 2L), (2L, 100L)))
    } finally query.stop()
    // the index on disk now covers corpus + both batches: a fresh batch
    // probe (the batch API, no stream) sees streamed docs as corpus
    val probe = graft.dedup.MinHash.pairsIncremental(spark, s"$dir/index",
        Seq((7L, edited(5, "aa"))).toDF("doc_id", "text"), "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(probe == Set((1L, 7L), (2L, 7L), (7L, 100L)))
  }

  test("indexed streaming hamming dedup probes the fingerprint index, then folds each batch in") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_fpix").toString
    val fp0 = 0x0123456789ABCDEFL
    def flip(fp: Long, bits: Int*): Long =
      bits.foldLeft(fp)((f, b) => f ^ (1L << b))
    val corpus = Seq((100L, fp0),
      (101L, 0x7EADBEEFCAFE1234L) // far from everything
    ).toDF("doc_id", "fp")
    graft.dedup.FingerprintIndex.write(corpus, "doc_id", "fp", s"$dir/index")
    val input = MemoryStream[(Long, Long)]
    val docs = input.toDF().toDF("doc_id", "fp")
    val query = Streams.fpIndexed(docs, "doc_id", "fp",
        s"$dir/index", s"$dir/alerts")
      .option("checkpointLocation", s"$dir/ckpt").start()
    def alerts() = spark.read.parquet(s"$dir/alerts")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    try {
      input.addData((1L, flip(fp0, 5))) // hamming 1 of the corpus doc
      query.processAllAvailable()
      assert(alerts() == Set((1L, 100L))) // probe against the corpus index
      // the second micro-batch must ALSO match batch 1's doc (hamming 2)
      // — only possible if the first batch was folded into the index
      input.addData((2L, flip(fp0, 5, 9)),
        (3L, 0x5A5A5A5A5A5A5A5AL)) // novel, matches nothing
      query.processAllAvailable()
      assert(alerts() == Set((1L, 100L), (1L, 2L), (2L, 100L)))
    } finally query.stop()
    // the index on disk now covers corpus + both batches; replaying a
    // micro-batch (failure recovery) leaves ONE copy of its alert rows
    val before = spark.read.parquet(s"$dir/alerts").count()
    Streams.fpIndexedBatch(Seq((2L, flip(fp0, 5, 9))).toDF("doc_id", "fp"),
      1L, "doc_id", "fp", s"$dir/index", s"$dir/alerts")
    assert(spark.read.parquet(s"$dir/alerts").count() == before,
      "replayed micro-batch duplicated alert or index rows")
    // and a fresh batch probe (the batch API, no stream) sees streamed
    // docs as corpus
    val probe = graft.dedup.FingerprintIndex.pairsIncremental(spark,
        s"$dir/index", Seq((7L, flip(fp0, 9))).toDF("doc_id", "fp"),
        "doc_id", "fp")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(probe == Set((1L, 7L), (2L, 7L), (7L, 100L)))
  }

  test("indexed streaming embedding dedup probes the IVF index, then folds each batch in") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_embix").toString
    def axis(d: Int, eps: Float): Array[Float] =
      Array.tabulate(8)(i => if (i == d) 1f else if (i == (d + 1) % 8) eps else 0f)
    // corpus: two near-axis families; lists = the axis label
    val corpus = Seq(
      (100L, axis(0, 0.01f), 0), (101L, axis(0, 0.02f), 0),
      (110L, axis(3, 0.01f), 1)).toDF("vec_id", "embedding", "label")
    graft.similarity.AnnIndex.writeIvf(corpus, "vec_id", "embedding", "label",
      s"$dir/index")
    val input = MemoryStream[(Long, Array[Float])]
    val docs = input.toDF().toDF("vec_id", "embedding")
    val query = Streams.embedIndexed(docs, "vec_id", "embedding",
        s"$dir/index", s"$dir/alerts", minCos = 0.9, nProbe = 1)
      .option("checkpointLocation", s"$dir/ckpt").start()
    def alerts() = spark.read.parquet(s"$dir/alerts")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    try {
      input.addData((1L, axis(0, 0.03f)))
      query.processAllAvailable()
      assert(alerts() == Set((1L, 100L), (1L, 101L))) // probe vs the corpus index
      // the second micro-batch must ALSO match batch 1's doc — only
      // possible if the first batch was folded into the index
      input.addData((2L, axis(0, 0.04f)),
        (3L, Array.tabulate(8)(i => if (i < 4) 0.5f else -0.5f))) // far: matches nothing
      query.processAllAvailable()
      assert(alerts() == Set((1L, 100L), (1L, 101L),
        (1L, 2L), (2L, 100L), (2L, 101L)))
    } finally query.stop()
    // replaying a micro-batch (failure recovery) leaves ONE copy of its
    // alert rows, and the id-guarded fold appends nothing
    val before = spark.read.parquet(s"$dir/alerts").count()
    val nVecs = spark.read.parquet(s"$dir/index/vectors").count()
    Streams.embedIndexedBatch(Seq((2L, axis(0, 0.04f))).toDF("vec_id", "embedding"),
      1L, "vec_id", "embedding", s"$dir/index", s"$dir/alerts",
      minCos = 0.9, nProbe = 1)
    assert(spark.read.parquet(s"$dir/alerts").count() == before,
      "replayed micro-batch duplicated alert rows")
    assert(spark.read.parquet(s"$dir/index/vectors").count() == nVecs,
      "replayed micro-batch duplicated index rows")
    // a fresh batch probe (the batch API, no stream) sees streamed docs
    // as corpus
    val probe = graft.similarity.AnnIndex.pairsIncremental(spark, s"$dir/index",
        Seq((7L, axis(0, 0.05f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", minCos = 0.9, nProbe = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(probe == Set((1L, 7L), (2L, 7L), (7L, 100L), (7L, 101L)))
  }

  test("indexed streaming exact dedup: novel rows land, dups are caught across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sdix").toString
    val corpus = Seq((100L, "seed corpus document")).toDF("doc_id", "text")
    graft.dedup.Dedup.writeDigestIndex(corpus, "text", s"$dir/index",
      expectedKeys = 100L)
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val query = Streams.dedupIndexed(docs, "doc_id", "text",
        s"$dir/index", s"$dir/novel")
      .option("checkpointLocation", s"$dir/ckpt").start()
    def novelIds() = spark.read.parquet(s"$dir/novel")
      .select("doc_id").as[Long].collect().sorted.toSeq
    try {
      input.addData((1L, "first streamed doc"), (2L, "seed corpus document"))
      query.processAllAvailable()
      assert(novelIds() == Seq(1L)) // corpus dup dropped
      // second batch: dup of batch 1 plus a fresh doc — only the fresh
      // doc is novel, proving batch 1 was folded into the index
      input.addData((3L, "first streamed doc"), (4L, "second streamed doc"))
      query.processAllAvailable()
      assert(novelIds() == Seq(1L, 4L))
    } finally query.stop()
    // the on-disk index now covers corpus + both batches for batch callers
    val probe = graft.dedup.Dedup.incrementalIndexed(spark, s"$dir/index",
        Seq((9L, "second streamed doc"), (10L, "still unseen content"))
          .toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(probe == Seq(10L))
  }

  test("streaming CDC apply folds change batches into the snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val snapshot0 = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "bal")
    val changes = MemoryStream[(Long, Long, String, Double)]
    val (state, writer) = Streams.cdcApply(
      changes.toDF().toDF("id", "seq", "op", "bal"), snapshot0, "id", "seq")
    val query = writer.start()
    try {
      // one batch holds TWO changes for key 2 — compaction must keep only
      // the highest-seq one, not fan the snapshot row out to both
      changes.addData((2L, 1L, "U", 50.0), (2L, 2L, "U", 99.0), (4L, 3L, "U", 44.0))
      query.processAllAvailable()
      val s1 = state.get().orderBy("id").as[(Long, Double)].collect().toSeq
      assert(s1 == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 44.0)))
      // update-then-delete for one key inside one batch resolves to delete
      changes.addData((1L, 4L, "D", 0.0), (4L, 5L, "U", 45.0), (4L, 6L, "D", 0.0))
      query.processAllAvailable()
      val s2 = state.get().orderBy("id").as[(Long, Double)].collect().toSeq
      assert(s2 == Seq((2L, 99.0), (3L, 30.0)))
    } finally query.stop()
  }

  test("streaming SCD-2 apply closes versions and keeps the full history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim0 = Seq(
      (1L, "A", 0L, Option.empty[Long]),
      (2L, "A", 0L, Option.empty[Long])
    ).toDF("id", "status", "valid_from", "valid_to")
    val changes = MemoryStream[(Long, String, Long)]
    val (state, writer) = Streams.scd2Apply(
      changes.toDF().toDF("id", "status", "eff"), dim0, "id", "status", "eff")
    val query = writer.start()
    try {
      // batch 1: key 1 changes A→B at 10 (two same-batch changes compact to
      // the latest), key 3 inserts
      changes.addData((1L, "X", 5L), (1L, "B", 10L), (3L, "C", 7L))
      query.processAllAvailable()
      val s1 = state.get().as[(Long, String, Long, Option[Long])]
        .collect().toSet
      assert(s1 == Set(
        (1L, "A", 0L, Some(10L)), (1L, "B", 10L, None),
        (2L, "A", 0L, None), (3L, "C", 7L, None)))
      // batch 2: key 1 changes again B→D at 20 — history chains A→B→D;
      // key 2 gets a no-op update (stays a single open row)
      changes.addData((1L, "D", 20L), (2L, "A", 25L))
      query.processAllAvailable()
      val s2 = state.get().as[(Long, String, Long, Option[Long])]
        .collect().toSet
      assert(s2 == Set(
        (1L, "A", 0L, Some(10L)), (1L, "B", 10L, Some(20L)),
        (1L, "D", 20L, None),
        (2L, "A", 0L, None), (3L, "C", 7L, None)))
    } finally query.stop()
  }

  test("indexed-face alert sinks are idempotent: replaying a micro-batch emits once") {
    import spark.implicits._
    // near-dup face: replay the SAME (batch, batchId) — what streaming
    // failure-recovery does — and the alert partition must hold ONE copy
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val corpus = Seq((100L, (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    graft.dedup.MinHash.writeBandIndex(corpus, "doc_id", "text",
      s"$dir/nidx", threshold = 0.10)
    val batch = Seq(
      (1L, ((1 to 40).map(i => s"w$i") :+ "tail").mkString(" ")),
      (2L, "wholly novel streamed content nothing matches"))
      .toDF("doc_id", "text")
    Streams.nearDupIndexedBatch(batch, 5L, "doc_id", "text",
      s"$dir/nidx", s"$dir/alerts")
    val once = spark.read.parquet(s"$dir/alerts")
      .select("id_a", "id_b", "batch_id").collect().toSeq
    assert(once.nonEmpty)
    Streams.nearDupIndexedBatch(batch, 5L, "doc_id", "text",
      s"$dir/nidx", s"$dir/alerts")
    val twice = spark.read.parquet(s"$dir/alerts")
      .select("id_a", "id_b", "batch_id").collect().toSeq
    assert(twice.size == once.size,
      s"replayed micro-batch duplicated alert rows: $twice")
    // a DIFFERENT batch id appends alongside, untouched by the replay
    Streams.nearDupIndexedBatch(
      Seq((7L, ((1 to 40).map(i => s"w$i") :+ "othertail").mkString(" ")))
        .toDF("doc_id", "text"),
      6L, "doc_id", "text", s"$dir/nidx", s"$dir/alerts")
    val both = spark.read.parquet(s"$dir/alerts")
    assert(both.filter(col("batch_id") === 5L).count() == once.size.toLong)
    assert(both.filter(col("batch_id") === 6L).count() > 0)

    // exact-dedup face: same replay contract on the novel sink; a replay
    // AFTER the fold probes all-dup (no novel rows) and the first write
    // stands
    graft.dedup.Dedup.writeDigestIndex(corpus, "text", s"$dir/didx",
      expectedKeys = 100L)
    val eb = Seq((1L, "first streamed doc"), (2L, "first streamed doc"))
      .toDF("doc_id", "text")
    Streams.dedupIndexedBatch(eb, 3L, "doc_id", "text", s"$dir/didx", s"$dir/novel")
    def novelRows() = spark.read.parquet(s"$dir/novel")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(novelRows() == Seq(1L, 2L)) // both rows novel to the CALLER
    Streams.dedupIndexedBatch(eb, 3L, "doc_id", "text", s"$dir/didx", s"$dir/novel")
    assert(novelRows() == Seq(1L, 2L),
      "replayed micro-batch changed the novel sink")
  }

  test("dedupIndexedBatch replay after a PARTIAL index fold keeps every novel row") {
    import spark.implicits._
    // the crash this pins: first attempt writes its novel partition, then
    // dies mid-fold with only SOME of the batch's digests committed to the
    // index. The replay probes those as duplicates — the recomputed novel
    // set is a strict subset — and an overwrite with the subset alone
    // would delete genuinely-novel rows from the sink (zero copies left).
    val dir = java.nio.file.Files.createTempDirectory("graft_partial").toString
    val corpus = Seq((100L, "seed corpus document")).toDF("doc_id", "text")
    graft.dedup.Dedup.writeDigestIndex(corpus, "text", s"$dir/didx",
      expectedKeys = 100L)
    val batch = Seq((11L, "alpha streamed doc"), (12L, "beta streamed doc"))
      .toDF("doc_id", "text")
    // first attempt, reconstructed state: full novel partition on the
    // sink, but only doc 11's digest folded before the crash
    val novel = graft.dedup.Dedup.incrementalIndexed(
      spark, s"$dir/didx", batch, "doc_id", "text").localCheckpoint()
    assert(novel.count() == 2)
    novel.withColumn("batch_id", lit(9L))
      .write.partitionBy("batch_id").parquet(s"$dir/novel")
    graft.dedup.Dedup.appendNovelToDigestIndex(spark, s"$dir/didx",
      novel.filter(col("doc_id") === 11L).localCheckpoint())
    // engine failure-recovery replays the SAME (batch, batchId)
    Streams.dedupIndexedBatch(batch, 9L, "doc_id", "text",
      s"$dir/didx", s"$dir/novel")
    val after = spark.read.parquet(s"$dir/novel")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after == Seq(11L, 12L),
      s"partial-fold replay lost novel rows: $after")
    // and the replay completed the fold: a fresh probe sees both as dups
    assert(graft.dedup.Dedup.incrementalIndexed(
      spark, s"$dir/didx", batch, "doc_id", "text").count() == 0)
    // a further replay stays idempotent
    Streams.dedupIndexedBatch(batch, 9L, "doc_id", "text",
      s"$dir/didx", s"$dir/novel")
    val again = spark.read.parquet(s"$dir/novel")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == Seq(11L, 12L))
  }
}
