package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event record for stateful sessionization. */
case class SessionEvent(user_id: Long, t: Long, value: Double)

/** Closed session emitted by [[Streams.sessionize]]. */
case class Session(user_id: Long, session_start: Long, session_end: Long,
                   n_events: Long, session_value: Double)

/** Mutable per-user session state. */
case class SessionState(start: Long, last: Long, n: Long, value: Double)

/** Event record for the streaming funnel; `t` in any integer tick unit
  * (pass the matching `ticksPerSec` to [[Streams.funnel]] — 1e9 for the
  * nanosecond event streams used elsewhere in this repo). */
case class FunnelEvent(user_id: Long, t: Long, event_type: String)

/** Per-user funnel stage timestamps (−1 = stage not reached). */
case class FunnelState(tA: Long, tB: Long, tC: Long)

/** Funnel progress emitted per user per batch: highest stage reached
  * (0..3) and seconds from stage-1 to stage-3 once complete (−1 before).
  * Seconds presume the caller told [[Streams.funnel]] the tick unit of
  * `FunnelEvent.t` via `ticksPerSec`. */
case class FunnelProgress(user_id: Long, stage: Int, convert_sec: Long)

/** One fingerprinted document occurrence routed to a simhash chunk group
  * (see [[Streams.nearDupAlerts]]). */
case class ChunkedDoc(chunk: Int, ckey: Long, t: Long, doc_id: Long, fp: Long)

/** A detected streaming near-duplicate: `doc_id` matched an earlier
  * `matched_id` within the hamming budget. */
case class NearDupAlert(doc_id: Long, matched_id: Long, hamming: Int)

/** Bounded per-chunk-group memory of recent fingerprints. */
case class ChunkMemory(entries: List[(Long, Long)]) // (doc_id, fp), newest first

/** One typed event pre-bucketed to its epoch day (see
  * [[Streams.holtSmoothed]]). */
case class TypedDayEvent(event_type: String, d: Long)

/** Per-type streaming Holt model state: the open day's partial count, the
  * integer fixed-point (level, trend) recursion state, and the last
  * closed day (the late-event fence). */
case class HoltModelState(curD: Long, curN: Long, l: Long, b: Long,
                          lastClosed: Long)

/** One CLOSED day's smoothed point emitted by [[Streams.holtSmoothed]] —
  * bitwise the batch [[graft.analytics.Analytics.eventsHolt]] row for the
  * same day sequence. */
case class HoltPoint(event_type: String, d: Long, n_events: Long,
                     level: Double, trend: Double, forecast_next: Double)

/** Event record for streaming attribution: any event type; view/click
  * update the per-user touch state, purchase emits. */
case class TouchEvent(user_id: Long, t: Long, event_type: String, event_id: Long)

/** Latest view/click per user (−1 t = no touch yet). */
case class TouchState(t: Long, touch_id: Long, touch_type: String)

/** One attributed purchase emitted by [[Streams.attribution]]. */
case class AttributionHit(user_id: Long, purchase_id: Long, purchase_t: Long,
                          touch_id: Long, touch_t: Long, touch_type: String,
                          gap_sec: Long)

/** Structured Streaming faces of the batch operators: the same logical
  * transforms applied to a streaming DataFrame (`readStream` source), with
  * watermarks bounding state.
  *
  * The batch equivalents in [[graft.analytics.Analytics]] are the oracle-
  * checked faces; these are verified with MemoryStream specs.
  */
object Streams {

  /** Streaming exact dedup on a content hash with bounded state: duplicates
    * arriving within the watermark horizon are dropped. */
  def dedup(events: DataFrame, tsCol: String, keyCols: Seq[String],
            watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Stateful gap-based sessionization with
    * `flatMapGroupsWithState` — the streaming face of the batch
    * `Analytics.sessionize`. Per-user state holds the open session; a
    * processing-time timeout (or an event beyond the gap) closes it and
    * emits a [[Session]] row. State is one small record per active user —
    * bounded by the active-user cardinality, not the event volume. */
  def sessionize(events: Dataset[SessionEvent], gapSec: Long = 1800,
                 timeout: Option[String] = None): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    val timeoutConf =
      if (timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur = state.getOption
          // events within a micro-batch arrive unordered: sort the group
          batch.toSeq.sortBy(e => e.t).foreach { e =>
            cur match {
              case Some(s) if e.t - s.last <= gapSec =>
                cur = Some(SessionState(s.start, e.t, s.n + 1, s.value + e.value))
              case Some(s) =>
                out += Session(userId, s.start, s.last, s.n, s.value)
                cur = Some(SessionState(e.t, e.t, 1, e.value))
              case None =>
                cur = Some(SessionState(e.t, e.t, 1, e.value))
            }
          }
          if (state.hasTimedOut) {
            // production path: idle users flush their open session
            cur.foreach(s => out += Session(userId, s.start, s.last, s.n, s.value))
            state.remove()
          } else {
            cur.foreach { s =>
              state.update(s)
              timeout.foreach(state.setTimeoutDuration)
            }
          }
          out.iterator
      }
  }

  /** Streaming corpus curation — the streaming face of the batch
    * `Q.pipelineCurate`: score each arriving document (quality + language
    * ID are pure column expressions, so they run unchanged on a stream),
    * gate on both, then drop content-hash duplicates within the watermark
    * horizon. State is one hash per kept doc inside the horizon — bounded
    * by arrival rate × watermark, never corpus size. */
  def curate(docs: DataFrame, tsCol: String, textCol: String,
             minQuality: Double = 0.5, lang: String = "en",
             watermark: String = "1 hour"): DataFrame = {
    import graft.text.TextAnalysis
    val scored = TextAnalysis.withLangId(
      TextAnalysis.withQuality(docs, textCol), textCol)
    scored.filter(col("quality_score") >= minQuality && col("pred_lang") === lang)
      .withColumn("_content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      // dropDuplicatesWithinWatermark (not plain dropDuplicates): the key
      // excludes the event-time column, so only the watermark variant
      // evicts state as time advances
      .dropDuplicatesWithinWatermark(Seq("_content_hash"))
      .drop("_content_hash")
  }

  /** Stateful streaming funnel — the streaming face of the batch
    * `Analytics.eventsFunnel`: per-user stage machine (A then B then C with
    * strictly increasing event times) held in `mapGroupsWithState`. Events
    * within a batch are applied in event-time order; the state ratchets
    * forward monotonically (the first qualifying time per stage sticks, so
    * replays/duplicates are idempotent). State is three longs per user —
    * bounded by user cardinality, never event volume. Update output mode:
    * each batch re-emits the user's current stage. */
  def funnel(events: Dataset[FunnelEvent],
             stages: (String, String, String) = ("view", "click", "purchase"),
             ticksPerSec: Long = 1L): Dataset[FunnelProgress] = {
    require(ticksPerSec > 0, s"ticksPerSec must be positive, got $ticksPerSec")
    implicit val progressEnc = Encoders.product[FunnelProgress]
    implicit val stateEnc = Encoders.product[FunnelState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[FunnelState, FunnelProgress](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          evs.toSeq.sortBy(e => (e.t, e.event_type)).foreach { e =>
            if (e.event_type == stages._1 && st.tA < 0)
              st = st.copy(tA = e.t)
            else if (e.event_type == stages._2 && st.tA >= 0 && st.tB < 0 && e.t > st.tA)
              st = st.copy(tB = e.t)
            else if (e.event_type == stages._3 && st.tB >= 0 && st.tC < 0 && e.t > st.tB)
              st = st.copy(tC = e.t)
          }
          state.update(st)
          val stage = if (st.tC >= 0) 3 else if (st.tB >= 0) 2 else if (st.tA >= 0) 1 else 0
          FunnelProgress(uid, stage,
            if (st.tC >= 0) (st.tC - st.tA) / ticksPerSec else -1L)
      }
  }

  /** Stateful streaming last-touch attribution — the streaming face of the
    * batch `Q.eventsAttribution`: per-user state holds the latest
    * view/click seen so far ((t, eventId)-max, so replays are idempotent);
    * each purchase emits one attribution row against that state. State is
    * three fields per user — bounded by user cardinality. Events within a
    * batch apply in (t, eventId) order; cross-batch ordering is the
    * producer's contract (same as [[funnel]]). */
  def attribution(events: Dataset[TouchEvent]): Dataset[AttributionHit] = {
    implicit val hitEnc = Encoders.product[AttributionHit]
    implicit val stEnc = Encoders.product[TouchState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[TouchState, AttributionHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[TouchEvent], state: GroupState[TouchState]) =>
          var st = state.getOption.getOrElse(TouchState(-1L, -1L, ""))
          val out = scala.collection.mutable.ArrayBuffer.empty[AttributionHit]
          // batch semantics credit a SAME-timestamp touch (tc.t <= p.t with
          // the (user, t) tie pre-collapse), so within each timestamp every
          // touch must update the state BEFORE any purchase at that
          // timestamp is attributed — sorting purchases after touches at
          // equal t reproduces the batch result. (A same-t touch arriving
          // in a LATER micro-batch than the purchase is inherently beyond
          // a streaming operator — documented divergence.)
          val isTouch = (e: TouchEvent) =>
            e.event_type == "view" || e.event_type == "click"
          evs.toSeq.sortBy(e => (e.t, if (isTouch(e)) 0 else 1, e.event_id))
            .foreach { e =>
              if (isTouch(e)) {
                if (e.t > st.t || (e.t == st.t && e.event_id > st.touch_id))
                  st = TouchState(e.t, e.event_id, e.event_type)
              } else if (e.event_type == "purchase" && st.t >= 0)
                out += AttributionHit(uid, e.event_id, e.t,
                  st.touch_id, st.t, st.touch_type, e.t - st.t)
            }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming volume-anomaly alerting — the streaming face of the batch
    * `Analytics.eventsAnomaly`: tumbling-window counts per type, z-scored
    * against a STATIC baseline frame (per-type μ/σ, typically produced by a
    * batch profiling run) via a stream-static broadcast join; only windows
    * beyond the z threshold emit. The baseline never shuffles the stream —
    * it broadcasts into each micro-batch — and window state is evicted by
    * the watermark like any windowed aggregate. */
  def anomalyAlert(events: DataFrame, tsCol: String, typeCol: String,
                   baseline: DataFrame, zThreshold: Double = 3.0,
                   windowLen: String = "1 hour",
                   watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n_events"))
      .join(broadcast(baseline), typeCol)
      .withColumn("z",
        (col("n_events").cast("double") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) >= zThreshold)
      .select(col("window.start").as("window_start"), col(typeCol),
        col("n_events"), col("z"))

  /** Streaming tumbling-window count/sum per event type. Late data beyond
    * the watermark is dropped; state is evicted as the watermark advances. */
  def windowedAgg(events: DataFrame, tsCol: String, typeCol: String,
                  valueCol: String, windowLen: String = "1 hour",
                  watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"), col(typeCol),
        col("n_events"), col("sum_value"))

  /** Streaming distinct-user estimates per (window, type) via datasketches
    * HLL — exact streaming COUNT DISTINCT needs per-key value state that
    * grows with cardinality; the sketch caps each group's state at the
    * sketch size (2^lgK registers) no matter how many distinct users flow
    * through. Watermark-evicted windowed state, mergeable partials.
    *
    * The output carries the sketch BINARY (`distinct_sketch`), not just the
    * estimate: `hll_union_agg` is max-per-register, so persisted window
    * sketches union-merge exactly downstream — the lambda shape where a
    * streaming job lands per-window sketches and the batch
    * events_distinct_rollup face merges them into longer horizons without
    * rescanning raw events (estimates alone cannot be merged: distinct
    * counts don't add across windows that share users). `lgK` must match
    * the batch side's (default 12 on both) for a same-precision union.
    * Typed `functions.hll_sketch_agg` on `col(idCol)` — caller column
    * names are never spliced into SQL text. */
  def windowedDistinct(events: DataFrame, tsCol: String, typeCol: String,
                       idCol: String, windowLen: String = "1 hour",
                       watermark: String = "30 minutes",
                       lgK: Int = 12): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(hll_sketch_agg(col(idCol), lgK).as("distinct_sketch"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col(typeCol),
        hll_sketch_estimate(col("distinct_sketch")).as("approx_distinct"),
        col("n_events"), col("distinct_sketch"))

  /** Streaming per-(window, type) value QUANTILES via datasketches KLL —
    * the percentile twin of [[windowedDistinct]]: exact streaming
    * percentiles need every value in state, the sketch caps each group's
    * state at the k-bounded KLL size no matter how many values flow
    * through. Watermark-evicted windowed state, mergeable partials.
    *
    * Like windowedDistinct, the output carries the sketch BINARY
    * (`quantile_sketch`), not just the estimates: `kll_merge_agg_double`
    * is a true sketch union, so persisted window sketches re-merge into
    * longer horizons downstream (the events_quantile_rollup batch face,
    * same k) without rescanning raw events — per-window percentile
    * ESTIMATES cannot be merged at all (a p95 of p95s is not the p95).
    * Caller column names are never spliced into SQL text: the value is
    * pre-projected to a fixed internal name, and only the Int `k` is
    * interpolated. */
  def windowedQuantiles(events: DataFrame, tsCol: String, typeCol: String,
                        valueCol: String, windowLen: String = "1 hour",
                        watermark: String = "30 minutes",
                        k: Int = 200): DataFrame =
    events.withColumn("_v", col(valueCol).cast("double"))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(typeCol))
      .agg(expr(s"kll_sketch_agg_double(_v, $k)").as("quantile_sketch"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col(typeCol),
        expr("kll_sketch_get_quantile_double(quantile_sketch, 0.5D)").as("p50"),
        expr("kll_sketch_get_quantile_double(quantile_sketch, 0.95D)").as("p95"),
        col("n_events"), col("quantile_sketch"))

  /** Streaming per-window heavy hitters: the top-k user ids by event count
    * in each tumbling window — the hot-key/abuse monitor a stream pipeline
    * runs next to its windowed totals. TWO chained stateful aggregations
    * (Spark's multiple-stateful-operator support, append mode): the first
    * holds (window, user) counts with watermark-evicted state; the second
    * reduces each window to ONE bounded graft_topk heap — per-window
    * emitted state is k entries no matter how many users flow through,
    * and the heap's map-side partials mean the second shuffle carries
    * ≤ k·P rows per window, never the full user list. Ranks are
    * deterministic: (count desc, user_id asc), the bruteTopK order.
    * Append mode: a window's top-k emits once the watermark passes its
    * end — exactly-once per window downstream. */
  def windowedTopUsers(events: DataFrame, tsCol: String, idCol: String,
                       k: Int = 5, windowLen: String = "1 hour",
                       watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("window"))
      .agg(call_function("graft_topk", col("n").cast("double"), col(idCol), lit(k)).as("_tk"))
      .select(col("window.start").as("window_start"),
        posexplode(col("_tk")).as(Seq("_i", "_s")))
      .select(col("window_start"), col("_s.id").as("user_id"),
        (col("_i") + 1).cast("bigint").as("rank"),
        col("_s.score").cast("bigint").as("n_events"))

  /** Streaming bot gate — the real-time face of the batch events_bots
    * query: per-user event counts inside tumbling minute windows, emitting
    * an alert row when a user's single-window burst reaches `threshold`.
    * State is the open (window, user) count pairs only (watermark-evicted
    * on window close), so memory is O(rate × watermark horizon), never
    * corpus-sized; emission is append-mode on window close — each alert
    * fires exactly once. Map-side partial counts mean the shuffle carries
    * one row per (window, user, partition), not per event. */
  def botAlerts(events: DataFrame, tsCol: String, idCol: String,
                threshold: Long, windowLen: String = "1 minute",
                watermark: String = "5 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(idCol))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= threshold)
      .select(col("window.start").as("window_start"),
        col(idCol).as("user_id"), col("n_events"))

  /** Streaming Holt smoothing — LIVE MODEL STATE in the state store: the
    * real-time face of the batch `Analytics.eventsHolt`. Per event type,
    * state carries the open day's partial count plus the integer
    * fixed-point (level, trend) recursion (α=0.3, β=0.2 — the IDENTICAL
    * algebra, so an emitted point is bitwise the batch row for the same
    * day sequence, which the spec pins). A day CLOSES when a later day's
    * first event arrives for that type; the closed day folds into the
    * model and emits one [[HoltPoint]] — exactly-once per (type, day).
    * State is one small record per event type (enum-sized), never
    * event- or day-volume. Late policy (two faces, both drops): events
    * for already-CLOSED days are dropped, and so is an event for a
    * never-opened day that sits strictly between the last closed day and
    * the currently open one (a skipped day arriving in a LATER batch —
    * cross-batch disorder; within a batch the group is sorted). Align the
    * upstream watermark with the day grain to bound both. */
  def holtSmoothed(events: Dataset[TypedDayEvent]): Dataset[HoltPoint] = {
    implicit val outEnc = Encoders.product[HoltPoint]
    implicit val stEnc = Encoders.product[HoltModelState]
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState[HoltModelState, HoltPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (t: String, batch: Iterator[TypedDayEvent], state: GroupState[HoltModelState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[HoltPoint]
          var st = state.getOption.getOrElse(
            HoltModelState(-1L, 0L, -1L, 0L, Long.MinValue))
          def close(): Unit = if (st.curD >= 0) {
            val (nl, nb) =
              if (st.l < 0) (st.curN * 1000000L, 0L)
              else {
                val nl0 = (3000000L * st.curN + 7L * (st.l + st.b)) / 10L
                (nl0, (2L * (nl0 - st.l) + 8L * st.b) / 10L)
              }
            out += HoltPoint(t, st.curD, st.curN,
              nl / 1e6, nb / 1e6, (nl + nb) / 1e6)
            st = HoltModelState(-1L, 0L, nl, nb, st.curD)
          }
          // events within a micro-batch arrive unordered: sort the group
          batch.toSeq.sortBy(_.d).foreach { e =>
            if (e.d <= st.lastClosed) () // late for a closed day: dropped
            else if (st.curD < 0) st = st.copy(curD = e.d, curN = 1L)
            else if (e.d == st.curD) st = st.copy(curN = st.curN + 1L)
            else if (e.d < st.curD) () // skipped day arriving after a newer
              // day already opened (cross-batch disorder): dropped — the
              // same late policy as closed days, made explicit
            else { close(); st = st.copy(curD = e.d, curN = 1L) }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Stream-stream interval join: pair each purchase with every click by
    * the same user in the preceding `horizonSec` seconds. Both sides carry
    * watermarks and the join condition bounds the time skew, so each side's
    * buffered state is evicted once the other side's watermark passes the
    * interval — state is O(rate × horizon), never unbounded. The equality
    * key (user) keeps it a hash join; the interval is a residual filter. */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame,
                   horizonSec: Long = 3600,
                   watermark: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizonSec SECONDS"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }

  /** Streaming NEAR-dup detection (the in-stream face of SimHash dedup):
    * every arriving doc fingerprints with the native `graft_simhash64`,
    * routes to `maxHamming + 1` pigeonhole chunk groups (two fingerprints
    * within the budget MUST agree on ≥1 chunk), and each group checks the
    * newcomer against its bounded memory of recent fingerprints — state is
    * O(groups × perKeyMemory), never corpus-sized, which is the honest
    * trade of streaming dedup: it flags near-dups within a recency
    * horizon. Emits an ALERT stream (doc, matched, hamming); the same pair
    * may alert from several chunk groups (at-least-once semantics —
    * downstream dedup or any-hit filters are one `dropDuplicates` away).
    */
  def nearDupAlerts(docs: DataFrame, tsCol: String, idCol: String,
                    textCol: String, maxHamming: Int = 3,
                    perKeyMemory: Int = 64,
                    seed: Long = 42L,
                    idleTimeoutMs: Long = 0L): Dataset[NearDupAlert] = {
    import graft.dedup.SimHash
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming")
    require(idleTimeoutMs >= 0, s"idleTimeoutMs must be >= 0, got $idleTimeoutMs")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    // 1L << 64 wraps to 1 (shift counts are mod 64): the single-chunk case
    // must mask ALL bits, or every doc would key to ckey=0 and the whole
    // stream would funnel through one state group
    val chunkMask = if (bitsPer >= 64) -1L else (1L << bitsPer) - 1
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.register(spark)
    implicit val chunkEnc = Encoders.product[ChunkedDoc]
    implicit val alertEnc = Encoders.product[NearDupAlert]
    implicit val memEnc = Encoders.product[ChunkMemory]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    val chunked = docs
      .select(col(tsCol).cast("long").as("t"), col(idCol).as("doc_id"),
        SimHash.simhash64(split(col(textCol), " "), seed).as("fp"))
      .select(col("t"), col("doc_id"), col("fp"),
        explode(sequence(lit(0), lit(chunks - 1))).as("chunk"))
      .withColumn("ckey",
        expr(s"shiftright(fp, chunk * $bitsPer)").bitwiseAND(lit(chunkMask)))
      .select(col("chunk"), col("ckey"), col("t"), col("doc_id"), col("fp"))
      .as[ChunkedDoc]
    // State bound: per-group memory is capped by perKeyMemory, but the
    // NUMBER of groups grows with distinct chunk keys. With maxHamming >= 1
    // the keyspace per chunk is <= 2^(64/(maxHamming+1)) and small in
    // practice; at maxHamming = 0 the key is the FULL 64-bit fingerprint,
    // so total state grows with the corpus unless idle groups age out. Set
    // idleTimeoutMs > 0 in long-running deployments to evict idle groups
    // via ProcessingTimeTimeout (eviction only narrows the dedup horizon's
    // edge — consistent with the at-least-once, bounded-horizon
    // semantics). The default keeps NoTimeout because processing-time
    // timeouts make the engine self-trigger batches, which busy-loops
    // drain-style tests/pipelines that wait on processAllAvailable().
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    chunked.groupByKey(c => (c.chunk, c.ckey))
      .flatMapGroupsWithState[ChunkMemory, NearDupAlert](
        OutputMode.Append, timeoutConf) {
        (_: (Int, Long), batch: Iterator[ChunkedDoc], state: GroupState[ChunkMemory]) =>
          if (idleTimeoutMs > 0 && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var mem = state.getOption.getOrElse(ChunkMemory(Nil))
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupAlert]
            batch.toSeq.sortBy(c => (c.t, c.doc_id)).foreach { c =>
              mem.entries.find { case (other, ofp) =>
                other != c.doc_id &&
                  java.lang.Long.bitCount(ofp ^ c.fp) <= maxHamming
              }.foreach { case (other, ofp) =>
                out += NearDupAlert(c.doc_id, other,
                  java.lang.Long.bitCount(ofp ^ c.fp))
              }
              mem = ChunkMemory(((c.doc_id, c.fp) :: mem.entries).take(perKeyMemory))
            }
            state.update(mem)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            out.iterator
          }
      }
  }

  /** Streaming ingest loop over the persisted MinHash band index — the
    * durable-memory sibling of [[nearDupAlerts]]: each micro-batch first
    * PROBES the index ([[graft.dedup.MinHash.pairsIncremental]] — every
    * verified near-dup pair touching the batch, batch-internal pairs
    * included) and then FOLDS the batch into the index
    * ([[graft.dedup.MinHash.appendToBandIndex]]) so later micro-batches
    * see it. Where nearDupAlerts trades recall for bounded executor-memory
    * state (a recency horizon per chunk group), this face keeps corpus
    * memory COMPLETE and on disk: per-batch cost is batch_rows × bands
    * against the clustered bucket table, state is the index itself, and
    * executor memory holds nothing between batches. Alerts append to
    * `alertPath` as (id_a, id_b, jaccard) parquet partitioned by
    * `batch_id`. The alert sink is IDEMPOTENT under failure-retry: each
    * micro-batch dynamically overwrites ONLY its own `batch_id=N`
    * partition (the canonical foreachBatch exactly-once-sink recipe), so
    * a replayed batch replaces its previous alert rows instead of
    * appending duplicates; the index append itself is id-guarded, so a
    * replay never duplicates verify rows either. Probe strictly BEFORE
    * append — the order is what keeps a doc from matching itself. */
  def nearDupIndexed(docs: DataFrame, idCol: String, textCol: String,
                     indexPath: String, alertPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDupIndexedBatch(batch, batchId, idCol, textCol, indexPath, alertPath)
      }

  /** One [[nearDupIndexed]] micro-batch — factored out so the replay
    * contract is spec-testable without re-running a stream: calling this
    * twice with the SAME batchId (what engine failure-recovery does)
    * leaves exactly one copy of the batch's alert rows and index rows. */
  def nearDupIndexedBatch(batch: DataFrame, batchId: Long, idCol: String,
                          textCol: String, indexPath: String,
                          alertPath: String): Unit = {
    val spark = batch.sparkSession
    // the batch feeds the probe AND the append — pin it once (eager:
    // foreachBatch frames re-execute per action otherwise, and the
    // append must see exactly the probed rows)
    val b = batch.localCheckpoint()
    graft.dedup.MinHash.pairsIncremental(spark, indexPath, b, idCol, textCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(alertPath)
    graft.dedup.MinHash.appendToBandIndex(spark, indexPath, b, idCol, textCol)
  }

  /** Streaming ingest loop over the persisted HAMMING fingerprint index
    * ([[graft.dedup.FingerprintIndex]]) — [[nearDupIndexed]] for the
    * simhash/phash family: each micro-batch of PRE-FINGERPRINTED rows
    * (a 64-bit `fpCol` — text simhash or media perceptual hash, the
    * decode/hash stage runs upstream) first PROBES the index
    * (every verified hamming-radius pair touching the batch, batch-
    * internal pairs included, at the index's PINNED banding geometry) and
    * then FOLDS the batch in so later micro-batches see it. Corpus memory
    * is complete and on disk; executor memory holds nothing between
    * batches; per-batch cost is batch keys against the clustered keys
    * table — never a corpus rescan (the media re-encode case: a
    * re-encoded image must match an original indexed months ago, far
    * past any recency horizon). Alerts append to `alertPath` as
    * (id_a, id_b, hamming) parquet partitioned by `batch_id`; the sink is
    * IDEMPOTENT under failure-retry (dynamic overwrite of the batch's own
    * partition), and the index fold is id-guarded, so replays duplicate
    * nothing. Probe strictly BEFORE append — the order is what keeps a
    * doc from matching itself. */
  def fpIndexed(docs: DataFrame, idCol: String, fpCol: String,
                indexPath: String, alertPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fpIndexedBatch(batch, batchId, idCol, fpCol, indexPath, alertPath)
      }

  /** One [[fpIndexed]] micro-batch — factored out so the replay contract
    * is spec-testable without re-running a stream: calling this twice
    * with the SAME batchId (what engine failure-recovery does) leaves
    * exactly one copy of the batch's alert rows and index rows. */
  def fpIndexedBatch(batch: DataFrame, batchId: Long, idCol: String,
                     fpCol: String, indexPath: String,
                     alertPath: String): Unit = {
    val spark = batch.sparkSession
    // the batch feeds the probe AND the append — pin it once (eager: the
    // append must see exactly the probed rows)
    val b = batch.localCheckpoint()
    graft.dedup.FingerprintIndex.pairsIncremental(spark, indexPath, b, idCol, fpCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(alertPath)
    graft.dedup.FingerprintIndex.append(spark, indexPath, b, idCol, fpCol)
  }

  /** Streaming ingest loop over the persisted IVF EMBEDDING index
    * ([[graft.similarity.AnnIndex]]) — [[fpIndexed]] for the embedding
    * near-dup family, completing the incremental triple (batch face /
    * persisted-index probe / streaming loop) that the digest, band and
    * fingerprint families already carry: each micro-batch of
    * (id, embedding) rows first PROBES the index
    * ([[graft.similarity.AnnIndex.pairsIncremental]] — every
    * cosine ≥ minCos pair touching the batch, batch-internal pairs
    * included, corpus side a partition-pruned scan of the probed lists)
    * and then FOLDS the batch in ([[graft.similarity.AnnIndex.append]],
    * id-guarded) so later micro-batches see it. Alerts append to
    * `alertPath` as (id_a, id_b, cos) parquet partitioned by `batch_id`;
    * the sink is IDEMPOTENT under failure-retry (dynamic overwrite of
    * the batch's own partition) and the fold is id-guarded, so replays
    * duplicate nothing. Probe strictly BEFORE append. Precision is
    * exact (cosine verify); recall is the measured IVF multi-assign
    * recall (GEOMETRY_RECALL floors). */
  def embedIndexed(docs: DataFrame, idCol: String, vecCol: String,
                   indexPath: String, alertPath: String, minCos: Double,
                   nProbe: Int = graft.similarity.AnnIndex.dedupNProbe)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        embedIndexedBatch(batch, batchId, idCol, vecCol, indexPath,
          alertPath, minCos, nProbe)
      }

  /** One [[embedIndexed]] micro-batch — factored out so the replay
    * contract is spec-testable without re-running a stream: calling this
    * twice with the SAME batchId (what engine failure-recovery does)
    * leaves exactly one copy of the batch's alert rows and index rows. */
  def embedIndexedBatch(batch: DataFrame, batchId: Long, idCol: String,
                        vecCol: String, indexPath: String, alertPath: String,
                        minCos: Double,
                        nProbe: Int = graft.similarity.AnnIndex.dedupNProbe): Unit = {
    val spark = batch.sparkSession
    // the batch feeds the probe AND the append — pin it once (eager: the
    // append must see exactly the probed rows)
    val b = batch.localCheckpoint()
    graft.similarity.AnnIndex.pairsIncremental(spark, indexPath, b,
        idCol, vecCol, minCos, nProbe)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(alertPath)
    graft.similarity.AnnIndex.append(spark, indexPath, b, idCol, vecCol)
  }

  /** Streaming EXACT-dedup ingest over the persisted digest index — the
    * exact-dup sibling of [[nearDupIndexed]] and the durable-memory
    * sibling of the bounded-state streaming dedup: each micro-batch
    * probes the index ([[graft.dedup.Dedup.incrementalIndexed]] — zero
    * corpus jobs, the sketch loads driver-side), appends the NOVEL rows'
    * (id, digest) to `novelPath`, and folds the batch into the index
    * ([[graft.dedup.Dedup.appendToDigestIndex]], sketch-first crash
    * ordering) so later micro-batches dedup against it. The novel sink —
    * parquet partitioned by `batch_id` — is IDEMPOTENT under
    * failure-retry: each micro-batch dynamically overwrites only its own
    * `batch_id=N` partition, so a replay replaces its rows instead of
    * duplicating them (a replay AFTER a successful fold probes everything
    * as duplicate — zero novel rows — and touches no partition, so the
    * first successful write stands: those rows WERE novel when the batch
    * first landed); the index fold itself is novelty-guarded and
    * idempotent. */
  def dedupIndexed(docs: DataFrame, idCol: String, textCol: String,
                   indexPath: String, novelPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupIndexedBatch(batch, batchId, idCol, textCol, indexPath, novelPath)
      }

  /** One [[dedupIndexed]] micro-batch — factored out so the replay
    * contract is spec-testable without re-running a stream: re-running
    * the same batchId (what engine failure-recovery does) leaves exactly
    * one copy of the batch's novel rows.
    *
    * The replay overwrite UNIONS with the partition's previous attempt:
    * a first attempt that wrote its novel rows and then crashed MID-FOLD
    * (some of the batch's digests committed to the index, some not)
    * replays with those digests probing as duplicates — the recomputed
    * novel set is a strict SUBSET of the first attempt's, and overwriting
    * with it alone would DELETE genuinely-novel rows from the sink (zero
    * copies anywhere). Rows in the existing partition were novel when the
    * batch FIRST landed — that verdict is final; the union (id-deduped,
    * first attempt wins ties) restores exactly-once semantics across the
    * partial-fold crash while staying idempotent for the clean-replay
    * cases (no partition → plain write; fully-folded replay → recomputed
    * set is empty, union re-lands the first attempt unchanged). */
  def dedupIndexedBatch(batch: DataFrame, batchId: Long, idCol: String,
                        textCol: String, indexPath: String,
                        novelPath: String): Unit = {
    val spark = batch.sparkSession
    // probe ONCE; the checkpointed novel frame serves the sink write
    // AND the index fold (appendNovelToDigestIndex), so the batch is
    // digested and verified a single time per micro-batch
    val novel = graft.dedup.Dedup.incrementalIndexed(
        spark, indexPath, batch, idCol, textCol)
      .localCheckpoint()
    val partition = new org.apache.hadoop.fs.Path(s"$novelPath/batch_id=$batchId")
    val fs = partition.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val toWrite =
      if (!fs.exists(partition)) novel
      else novel.unionByName(
          spark.read.parquet(partition.toString).select(novel.columns.map(col): _*))
        .dropDuplicates(idCol)
        .localCheckpoint() // pin: the write below overwrites its own input
    toWrite.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(novelPath)
    graft.dedup.Dedup.appendNovelToDigestIndex(spark, indexPath, novel)
  }

  /** Streaming CDC apply: fold each micro-batch of keyed changes into the
    * running snapshot with [[graft.operators.MergeUpsert.merge]] — one
    * full-outer join per batch, exactly the batch operator's semantics
    * (U/D/I/K). `foreachBatch` is the standard Spark bridge from a stream
    * to a transactional sink; on a cluster the fold target is a
    * Delta/Iceberg `MERGE INTO`-style table, here an in-memory snapshot
    * handle that `current()` exposes to the caller.
    *
    * A micro-batch may carry SEVERAL changes for one key (merge assumes
    * key-unique batches — duplicate keys would fan the snapshot row out),
    * so each batch first compacts to the key's latest change by `seqCol`
    * (the CDC sequence: LSN, commit ts, offset). Ties and the fold order
    * across batches are deterministic: struct-max over (seq, op, values).
    */
  def cdcApply(changes: DataFrame, snapshot0: DataFrame, key: String,
               seqCol: String)
      : (java.util.concurrent.atomic.AtomicReference[DataFrame],
         org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]) = {
    val state = new java.util.concurrent.atomic.AtomicReference[DataFrame](snapshot0)
    val writer = changes.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val others = batch.columns.filter(c => c != key && c != seqCol).toSeq
        val compacted = batch
          .groupBy(col(key))
          .agg(max(struct((seqCol +: others).map(col): _*)).as("_m"))
          .select(col(key) +: others.map(c => col(s"_m.$c").as(c)): _*)
        // drop the op column the merge re-derives, keep batch deterministic
        state.set(graft.operators.MergeUpsert.merge(
          state.get(), compacted, key).drop("op").localCheckpoint())
      }
    (state, writer)
  }

  /** Streaming SCD-2 apply — the history-keeping sibling of [[cdcApply]]:
    * each micro-batch of attribute changes folds into the dimension-history
    * table through `Scd2.merge`, so a change CLOSES the key's open version
    * at its effective time and opens a new one; the closed history only
    * ever grows. On a cluster the fold target is a transactional
    * Delta/Iceberg table; here an in-memory handle.
    *
    * A micro-batch may carry several changes for one key; Scd2.merge
    * requires key-unique batches, so each batch compacts to the key's
    * LATEST change by effective time first (struct-max, attr tie-break) —
    * intermediate same-batch versions collapse, the standard CDC-compaction
    * trade. localCheckpoint truncates the per-batch lineage (the state
    * would otherwise accrete one join per batch forever). */
  def scd2Apply(changes: DataFrame, dim0: DataFrame, key: String,
                attr: String, eff: String)
      : (java.util.concurrent.atomic.AtomicReference[DataFrame],
         org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]) = {
    val state = new java.util.concurrent.atomic.AtomicReference[DataFrame](dim0)
    val writer = changes.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val compacted = batch
          .groupBy(col(key))
          .agg(max(struct(col(eff), col(attr))).as("_m"))
          .select(col(key), col(s"_m.$attr").as(attr), col(s"_m.$eff").as(eff))
        state.set(graft.operators.Scd2.merge(
          state.get(), compacted, key, attr, eff).drop("op").localCheckpoint())
      }
    (state, writer)
  }

  /** Streaming half of the distribution-drift monitor (the online face of
    * `Profile.ks` / profile_drift): the watermarked stream folds values
    * into the SAME fixed cent-bands the batch profiler uses and emits
    * per-(window, band) counts in append mode. State is bounded by
    * open-windows × bands (the band grid is value-range / bandCents —
    * never row count); eviction rides the watermark. Scoring happens
    * batch-side in [[driftScore]] over the landed band table — the same
    * lambda split as the HLL distinct rollup: the stream lands mergeable
    * per-window distribution state, batch derives the judgment without
    * rescanning events. */
  def driftBands(events: DataFrame, tsCol: String, valueCol: String,
                 bandCents: Long, windowLen: String = "1 hour",
                 watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .select(col(tsCol),
        (floor((col(valueCol) * 100.0) + lit(0.5)).cast("bigint") / lit(bandCents))
          .cast("bigint").as("band"))
      .groupBy(window(col(tsCol), windowLen), col("band"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("band"), col("n"))

  /** Batch finalizer for [[driftBands]]: per-window Population Stability
    * Index against a reference band distribution `(band, ref_n)` (e.g.
    * yesterday's profile) — PSI = Σ (p−q)·ln(p/q) with add-one smoothing
    * over the union band grid, so empty bands never divide by zero.
    * Pure batch aggregation over the tiny landed band table: one full
    * outer join per window against the broadcast reference, one
    * window-keyed rollup. PSI ≳ 0.2 is the conventional act threshold. */
  def driftScore(bands: DataFrame, reference: DataFrame): DataFrame = {
    // the grid derives FROM `bands`, so rename its columns before joining
    // back (self-join lineage would otherwise conflict attribute-for-
    // attribute)
    val windows = bands.select(col("window_start").as("_ws")).distinct()
    val grid = windows.crossJoin(broadcast(
      bands.select(col("band").as("_b"))
        .union(reference.select(col("band").as("_b"))).distinct()))
    val obs = grid.join(bands,
        grid("_ws") === bands("window_start") && grid("_b") === bands("band"),
        "left_outer")
      .select(col("_ws").as("window_start"), col("_b").as("band"),
        coalesce(col("n"), lit(0L)).as("n"))
      .join(broadcast(reference), Seq("band"), "left_outer")
      .select(col("window_start"), col("band"), col("n"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"))
    val tot = obs.groupBy("window_start")
      .agg(sum(col("n")).as("nw"), sum(col("ref_n")).as("nr"),
        count(lit(1)).as("b"))
    obs.join(tot, "window_start")
      .select(col("window_start"),
        ((col("n") + 1L).cast("double") / (col("nw") + col("b")).cast("double"))
          .as("p"),
        ((col("ref_n") + 1L).cast("double") / (col("nr") + col("b")).cast("double"))
          .as("q"))
      .groupBy("window_start")
      .agg((floor((sum((col("p") - col("q")) * log(col("p") / col("q")))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("psi"))
  }
}
