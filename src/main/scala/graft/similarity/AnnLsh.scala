package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate nearest-neighbor search over embedding columns.
  *
  * Two paths, same interface:
  *   - [[bruteTopK]]: exact cosine top-k — the small-query baseline. Queries
  *     are BROADCAST (the small side); candidates stream once; per-partition
  *     top-k happens inside the window's partial sort before the merge.
  *   - [[lshTopK]]: the 100-TB path — random-hyperplane LSH. Each vector gets
  *     a `planes`-bit signature (sign of dot with deterministic pseudo-random
  *     hyperplanes); candidates are the bucket collisions across `tables`
  *     independent hash tables; only candidates are reranked by exact cosine.
  *     Shuffles only on (table, bucket) keys.
  */
object AnnLsh {

  /** Deterministic splitmix-style mix of (table, plane, dim) — identical on
    * every executor, no RNG state to ship. */
  private def mix(table: Int, plane: Int, dim: Int): Long = {
    var z = table.toLong * 0x9E3779B97F4A7C15L + plane.toLong * 0xBF58476D1CE4E5B9L +
      dim.toLong * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** `planes`-bit signature of a double-array column for one hash table:
    * sign bits of dot products with deterministic ±1 hyperplanes. Each
    * plane is a LITERAL array evaluated by the native graft_dot loop.
    * Kept as the single-table reference form; the hot paths use
    * [[signatures]] — at production geometry (16 tables × ~10+ planes)
    * the composed form's thousands of literal constants push the stage
    * off whole-stage codegen onto the interpreted path (measured 12.3s
    * to sign 20k vectors that the native expression does in <1s). */
  def signature(v: Column, dim: Int, planes: Int, table: Int): Column = {
    val bits = (0 until planes).map { p =>
      val plane = (0 until dim).map(d => if ((mix(table, p, d) & 1L) == 0L) 1.0 else -1.0).toArray
      val dotp = call_function("graft_dot", v, lit(plane))
      when(dotp >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ALL `tables` signatures at once via the native
    * [[graft.functions.LshSignaturesExpr]] — one generated triple loop per
    * row, bitwise-identical to `array(signature(v, dim, planes, 0), …)`
    * (spec-pinned). `dim` is ENFORCED per row inside the expression: a
    * mixed/corrupt vector column fails loudly (graft_dot's contract)
    * instead of silently signing into a wrong bucket. */
  def signatures(v: Column, dim: Int, planes: Int, tables: Int): Column =
    call_function("graft_lsh_sigs", v, lit(dim), lit(planes), lit(tables))

  /** Primary + `probes` margin-aware probe buckets per table via the
    * native [[graft.functions.LshProbesExpr]] (array<array<bigint>>,
    * element 0 of each inner array is the primary signature — bitwise
    * [[signatures]] — and elements 1..probes flip the lowest-|margin|
    * bits in margin order). See [[adaptiveProbes]] for the recall law. */
  def probedSignatures(v: Column, dim: Int, planes: Int, tables: Int,
                       probes: Int): Column =
    call_function("graft_lsh_probes", v, lit(dim), lit(planes), lit(tables), lit(probes))

  /** Corpus-adaptive signature width: `planes = max(floor,
    * ceil(log2(n / targetOccupancy)))`, capped. Buckets per table are
    * 2^planes, so holding EXPECTED OCCUPANCY at `targetOccupancy` means
    * one extra plane per corpus doubling — the knob docs/SCALE_BOUNDS.md
    * prescribes for [[selfPairs]]/[[lshTopK]], derived instead of
    * hand-set. The scale law: the bucket-collision join is
    * tables × Σ_bucket occupancy², so FIXED planes (e.g. the old 4-plane
    * face: 16 buckets forever) grow occupancy linearly with rows and the
    * join quadratically (the measured 11.7×/decade bend at p8, worse at
    * p4); adaptive planes hold the per-bucket work flat and the join
    * ~linear. The trade is recall — per true pair 1−(1−p^planes)^tables
    * with p = 1−acos(cos)/π falls as planes grow — measured per decade
    * in docs/GEOMETRY_RECALL.json against an exact sampled ground truth,
    * never silent. Takes `n` as a parameter (no eager count inside
    * library plan-builders); faces pass a metadata-cheap parquet count.
    * Cap 24 bounds signature cost; floor 4 keeps tiny corpora at the
    * legacy geometry (bitwise-identical pairs there). */
  def adaptivePlanes(n: Long, targetOccupancy: Long = 64L,
                     floor: Int = 4, cap: Int = 24): Int = {
    require(targetOccupancy >= 1 && floor >= 1 && cap >= floor)
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOccupancy)) / math.log(2.0)).toInt
    math.min(cap, math.max(floor, needed))
  }

  /** The multi-probe budget that HOLDS RECALL as [[adaptivePlanes]] grows:
    * recall per true pair is 1−(1−P)^tables, and each added plane
    * multiplies the single-bucket P = p^planes by p — with tables frozen,
    * recall falls monotonically toward 0 (the measured 0.76 → 0.196 cliff
    * between the third and fourth decade at 16 tables). Probing the
    * `probes` lowest-margin buckets on one side of the candidate join
    * lifts P to ≈ p^planes + h·probes·p^(planes−1)(1−p), where h is the
    * probability the disagreeing bit ranks inside the probe budget — and
    * MARGIN selection makes h high at small budgets (a wrong bit is
    * precisely one whose projection landed near the hyperplane), which is
    * the Lv et al. result: a few margin-ordered probes buy what many
    * extra tables would. Candidate-join cost scales with (1+probes)
    * (one side of the join fans out), so the budget is the recall/cost
    * dial: cap=4 holds measured fourth-decade recall ~3.5× above the
    * frozen-geometry 0.196 at half the full-probe-ring cost. At the
    * geometry floor there is nothing to recover (small corpora keep the
    * legacy wide-recall buckets bitwise), so the budget is 0 there.
    * Cap 4 is MEASURED, not arbitrary (tools/ProbeSweep, sf1): probes
    * 4→8 buys +0.05 recall at ~2× candidate cost — margin flips only
    * reach near-boundary bits — while [[adaptiveTables]] compounds
    * independently (+0.125 at 1.34×); past the probe cap, tables are
    * the recall dial. */
  def adaptiveProbes(planes: Int, floor: Int = 4, cap: Int = 4): Int =
    if (planes <= floor) 0 else math.min(cap, planes)

  /** The compounding-law table demand, FITTED to the ProbeSweep curve
    * instead of the superseded linear +8/plane heuristic. Measured at sf1
    * (tools/ProbeSweep, planes 9, probes 4, 20k+planted vectors, exact
    * cos≥0.35 ground truth): tables 16/24/32/48/64 → recall
    * 0.737/0.862/0.925/0.979/(~0.99), which the law recall = 1−(1−P)^t
    * fits at effective per-table P = 0.08 to within ±0.006 at EVERY
    * measured point — so the dial extrapolates from the law, not from a
    * slope guess. Per added plane P decays by the worst-pair retention
    * p = 1−acos(0.35)/π ≈ 0.614, hence
    * t(planes) = ⌈ln(1−R)/ln(1−0.08·0.614^(planes−9))⌉ with R = 0.862,
    * the sf1-measured level the dial holds: 24 tables at planes 9
    * (bitwise the shipped sf1 geometry), 40 at 10, 64 at 11 — then 105+
    * at 12: the demand is EXPONENTIAL in corpus doublings, which is the
    * whole reason a routed past-cap tier exists. Probes stay capped at 4
    * throughout (ProbeSweep: probes past 4 are dominated — +0.05 recall
    * at ~2× candidate cost). */
  def tablesNeeded(planes: Int, measuredPlanes: Int = 9,
                   measuredP: Double = 0.08, pMin: Double = 0.614,
                   targetRecall: Double = 0.862): Long = {
    val pp = math.min(0.999999,
      measuredP * math.pow(pMin, (planes - measuredPlanes).toDouble))
    math.max(1L, math.ceil(math.log(1.0 - targetRecall) / math.log(1.0 - pp)).toLong)
  }

  /** The TABLE count that holds recall as [[adaptivePlanes]] grows past
    * the probe budget's reach: [[tablesNeeded]]'s fitted compounding law,
    * floored at the legacy 16 and capped at 64. Below the pivot the
    * legacy 16 tables stay (small corpora keep wide-recall buckets — and
    * the sf≤0.1 bench geometry — bitwise; planes 9 derives 24, bitwise
    * the shipped sf1 geometry). Cap 64 bounds signature and join cost;
    * WHERE THE LAW'S DEMAND EXCEEDS IT the capped geometry's predicted
    * recall decays (0.70 at planes 12, 0.52 at 13, 0.25 at 15 — the
    * measured forced-saturation row in docs/GEOMETRY_RECALL.json agrees
    * at 0.32) and [[tablesExhausted]] routes the faces out. */
  def adaptiveTables(planes: Int, base: Int = 16, pivot: Int = 8,
                     cap: Int = 64): Int =
    if (planes <= pivot) base
    else math.min(cap.toLong, math.max(base.toLong, tablesNeeded(planes))).toInt

  /** Predicted overall recall of the CAPPED table budget at this plane
    * count, from the fitted law — the number [[tablesExhausted]] compares
    * against the routed tier's measurement. */
  def cappedRecall(planes: Int, cap: Int = 64, measuredPlanes: Int = 9,
                   measuredP: Double = 0.08, pMin: Double = 0.614): Double = {
    val pp = math.min(0.999999,
      measuredP * math.pow(pMin, (planes - measuredPlanes).toDouble))
    1.0 - math.pow(1.0 - pp, cap.toDouble)
  }

  /** The table dial's EXHAUSTION gate — true when even the FULL cap-64
    * budget's predicted recall ([[cappedRecall]], fitted law) falls below
    * what the routed IVF tier MEASURES at production shape (0.58 overall
    * at sf1's ~1024 effective occupancy, tools/IvfSweep) — i.e. planes ≥
    * 13, ~262k vectors at occupancy 64. Past it every extra plane loses
    * recall no affordable table count buys back (demand ∝ (1/p)^planes,
    * exponential in corpus doublings), and narrowing planes-per-table
    * instead gives occupancy back quadratically (candidates ∝
    * tables·n²/2^planes). So this regime has no in-family rescue — the
    * analog of simhash's [[graft.dedup.SimHash.blockedSaturated]], and
    * the routing point where [[graft.queries.Q.embedClusterLsh]] switches
    * the pair generator to [[AnnIvf.selfPairs]] (coarse partition + exact
    * within-list pairing, linear in n at fixed list size, recall
    * measured per decade in docs/GEOMETRY_RECALL.json with its own
    * floor). The dedup regime never needed the rescue: cos≥0.7 recall
    * measures 1.0 even at the forced saturated geometry — the routing
    * buys back the LOW-COS tier and the linear cost law. Below the gate
    * the LSH geometry is untouched — every current testdata decade keeps
    * its pairs bitwise. */
  def tablesExhausted(planes: Int, cap: Int = 64,
                      ivfMeasuredRecall: Double = 0.58): Boolean =
    cappedRecall(planes, cap) < ivfMeasuredRecall

  /** Per-query top-k of a scored candidate frame (query_id, neighbor_id,
    * cos) via the native bounded-heap aggregate `graft_topk`
    * ([[graft.functions.TopKAgg]]). Map-side partial aggregation reduces
    * each input partition to ≤k entries per query BEFORE the shuffle, so the
    * exchange carries k·P rows per query and no task ever sorts a query's
    * full scored corpus — the scale-safe replacement for
    * `row_number() OVER (PARTITION BY query_id)` + filter, which funnels
    * all of a query's scored rows into one window task. Output order and
    * ranks are identical: (cos desc, neighbor_id asc). */
  def topK(sims: DataFrame, k: Int): DataFrame =
    sims.groupBy("query_id")
      .agg(call_function("graft_topk", col("cos"), col("neighbor_id"), lit(k)).as("_tk"))
      .select(col("query_id"), posexplode(col("_tk")).as(Seq("_i", "_s")))
      .select(col("query_id"), col("_s.id").as("neighbor_id"),
        (col("_i") + 1).cast("bigint").as("rank"), col("_s.score").as("cos"))

  /** Exact brute-force cosine top-k for a (small) query set.
    *
    * Norms are computed ONCE PER VECTOR in the projections below the join
    * (a pair-level `cosine(qv, v)` would redo both `sqrt(dot(x,x))` for
    * every one of the |Q|×|C| pairs — at dim 64 that triples the dot-loop
    * work). `dot/(nq·nv)` keeps the exact expression values and order of
    * the fused form, so results are bitwise-unchanged. */
  def bruteTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    val c = candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("_nv", norm(col("v")))
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("_nq", norm(col("qv")))
    val sims = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("_nq") * col("_nv"))).as("cos"))
    topK(sims, k)
  }

  /** Range search: every candidate within `minCos` of each query — the
    * radius-based face of similarity search (retrieval dedup, semantic
    * blocklists). Queries broadcast, candidates stream ONCE, and the
    * threshold is a pure filter — no window, no sort, no shuffle at all
    * downstream of the scan, so the plan is embarrassingly parallel at any
    * scale. */
  def rangeSearch(candidates: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, minCos: Double): DataFrame = {
    // per-vector norms below the join — see bruteTopK; bitwise-unchanged
    val c = candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("_nv", norm(col("v")))
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("_nq", norm(col("qv")))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("_nq") * col("_nv"))).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** IVF-style approximate top-k with a precomputed coarse assignment
    * (`listCol`, e.g. a cluster/label id): centroids are the per-list
    * element-wise mean (native graft_vec_avg aggregate, map-side partial);
    * each query probes its `nProbe` nearest centroids (tiny frame,
    * broadcast) and exact-reranks only those lists' vectors. The scan is
    * list-pruned exactly like an IVF index at 100 TB. */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, listCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = candidates.select(col(idCol).as("neighbor_id"), col(listCol).as("list"),
      toDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
    val centroids = c.groupBy("list")
      .agg(call_function("graft_vec_avg", col("v")).as("cv"))
    // nProbe nearest lists per query (centroid frame is tiny → broadcast)
    val probes = q.join(broadcast(centroids), lit(true))
      .select(col("query_id"), col("qv"), col("list"), cosine(col("qv"), col("cv")).as("_cs"))
      .withColumn("_pr", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("_cs"), asc("list"))))
      .filter(col("_pr") <= nProbe)
      .select("query_id", "qv", "list")
    // per-vector norms below the join — see bruteTopK; bitwise-unchanged.
    // The candidate norm rides the pruned list scan; the query norm rides
    // the (tiny) probe frame so it broadcasts precomputed.
    val cands = c.withColumn("_nv", norm(col("v")))
      .join(broadcast(probes.withColumn("_nq", norm(col("qv")))), Seq("list"))
      .filter(col("neighbor_id") =!= col("query_id"))
    topK(cands.select(col("query_id"), col("neighbor_id"),
      (dot(col("qv"), col("v")) / (col("_nq") * col("_nv"))).as("cos")), k)
  }

  /** Exact label-blocked cosine pair generation — the oracle-checkable
    * face of embedding dedup. QUADRATIC WITHIN EACH BLOCK by construction
    * (a block of n vectors scores n²/2 pairs, and block cardinality is
    * data-independent, so 100× data is 10,000× pairs): correct for
    * bounded blocks, a non-starter on unbounded ones. The guard is part
    * of the PLAN, not an eager count at build time: block sizes ride a
    * map-side-partial aggregate, and `assert_true` fails the job with an
    * actionable message the moment any block exceeds `maxBlockRows`,
    * pointing at [[selfPairs]] — the LSH-bucketed generator that is the
    * scale path for exactly this shape. */
  def blockedSelfPairs(df: DataFrame, idCol: String, vecCol: String, blockCol: String,
                       minCos: Double, maxBlockRows: Long = 10000): DataFrame = {
    val base = df.select(col(blockCol).as("_blk"), col(idCol).as("id"),
      toDouble(col(vecCol)).as("v"))
    val sizes = base.groupBy("_blk").agg(count(lit(1)).as("_blk_n"))
    // assert_true returns NULL when the predicate holds, so the filter
    // keeps every row — but unlike an unused projected column it cannot be
    // pruned away by the optimizer, and it raises before any pair is built.
    val guarded = base.join(sizes, Seq("_blk"))
      .filter(assert_true(col("_blk_n") <= maxBlockRows,
        concat(lit(s"embedding block (column '$blockCol'=" ), col("_blk"),
          lit(s") exceeds maxBlockRows=$maxBlockRows for the exact blocked self-join; " +
            "use AnnLsh.selfPairs (LSH-bucketed, never all-pairs) for large blocks"))).isNull)
    // per-vector norms below the block join: this face is n²/2 pairs per
    // block by construction, so pair-level norm recompute is the worst
    // offender here; identical factors/order ⇒ cos bitwise-unchanged
    val a = guarded.select(col("_blk"), col("id").as("id_a"), col("v").as("va"),
      norm(col("v")).as("_na"))
    val b = guarded.select(col("_blk"), col("id").as("id_b"), col("v").as("vb"),
      norm(col("v")).as("_nb"))
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("_na") * col("_nb")))
      .filter(col("cos") > minCos)
      .select("id_a", "id_b", "cos")
  }

  /** LSH-bucketed near-dup pair generation over a corpus — the 100 TB
    * replacement for any blocked/label-scoped exact self-join (which is
    * quadratic within each block): every vector signs into `tables`
    * independent (table, bucket) cells, candidate pairs are bucket
    * collisions with `id_a < id_b`, pairs dedupe across tables BEFORE the
    * exact-cosine verify, and only verified pairs ≥ `minCos` emit. All
    * shuffles are keyed on (table, bucket); nothing is ever all-pairs.
    *
    * Regime note: recall per true pair is 1−(1−p^planes)^tables with
    * p = 1−acos(cos)/π, so the generator is sharp for REAL near-dups
    * (cos ≥ ~0.7 — the duplicated-content regime dedup cares about) and
    * degrades toward scanning most pairs as `minCos` drops toward
    * uncorrelated vectors; for low-threshold semantic grouping use the
    * IVF/label-blocked generators instead. */
  def selfPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                minCos: Double, planes: Int = 8, tables: Int = 8,
                broadcastVectors: Boolean = false, probes: Int = 0): DataFrame = {
    val base = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    // candidate generation and pair-dedup run on NARROW (table, bucket, id)
    // rows — a row here is ~24 bytes. Carrying the vectors through the
    // bucket join instead would ship each ~0.5 KB vector once per table ×
    // bucket collision (measured 16× more shuffle bytes and a double-digit
    // seconds regression at 16 tables); the exact-cosine verify re-joins
    // them AFTER dedup, one row per unique pair.
    // Both bucket joins below carry a SHUFFLE-HASH hint on the primary
    // side: bucket keys are duplicate-heavy by construction (occupancy is
    // the whole point), and sort-merge's buffered per-key-group iteration
    // pays ~300ns per enumerated candidate where the per-partition
    // hashmap streams them through codegen (measured 13× on the simhash
    // sibling join, same shape). Build side is the narrow 24-byte keyed
    // frame, per-task hashmap = build_rows/partitions.
    val collided = if (probes <= 0) {
      val signed = base.select(col("id"),
          signatures(col("v"), dim, planes, tables).as("_sigs"))
        .select(col("id"), posexplode(col("_sigs")).as(Seq("table", "bucket")))
      val a = signed.select(col("table"), col("bucket"), col("id").as("id_a"))
      val b = signed.select(col("table"), col("bucket"), col("id").as("id_b"))
      a.join(b.hint("shuffle_hash"), Seq("table", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    } else {
      // MULTI-PROBE candidate join ([[adaptiveProbes]]): the LEFT side
      // expands to primary + lowest-margin probe buckets, the RIGHT side
      // keys on the primary only — a pair collides when either member
      // probes into the other's primary bucket, so the fan-out is
      // (1+probes)× on one side instead of both (probing both sides buys
      // nothing: margin-flip is how a near-dup's differing bit is reached,
      // and one direction suffices to meet in a bucket). Margin-selected
      // probe sets are per-vector, hence ASYMMETRIC — both orderings are
      // kept and canonicalized by id, where the single-probe path's
      // id_a < id_b filter would drop pairs only one direction finds.
      val sigd = base.select(col("id"),
          probedSignatures(col("v"), dim, planes, tables, probes).as("_ps"))
        .select(col("id"), posexplode(col("_ps")).as(Seq("table", "buckets")))
      val a = sigd.select(col("table"), col("id").as("_pa"),
        explode(col("buckets")).as("bucket"))
      val b = sigd.select(col("table"), col("id").as("_pb"),
        element_at(col("buckets"), 1).as("bucket"))
      a.join(b.hint("shuffle_hash"), Seq("table", "bucket"))
        .filter(col("_pa") =!= col("_pb"))
        .select(least(col("_pa"), col("_pb")).as("id_a"),
          greatest(col("_pa"), col("_pb")).as("id_b"))
    }
    // Pair-dedup placement depends on the verify-join strategy. Broadcast
    // verify: collisions verify IN PLACE (no shuffle at all between the
    // bucket join and the cos filter), so deduping the raw collisions
    // first would ADD a corpus-collision-sized exchange to save re-scoring
    // the ~few-% multi-table duplicates — measured 6s of pure loss at 16
    // tables × 9 planes; the dedup runs AFTER the filter, on output-sized
    // rows. Shuffle verify (unbounded corpora): candidates shuffle on id
    // anyway, so deduping first keeps duplicate pairs from shipping
    // vector-width rows twice — there it pays.
    val cand = if (broadcastVectors) collided
      else collided.dropDuplicates("id_a", "id_b")
    // The vector re-join is UNHINTED by default: AQE downgrades it to a
    // broadcast at runtime whenever the vector table is small, and a hard
    // broadcast() would OOM on a billion-vector corpus. Sizing it
    // ourselves would need an eager count() — a full job over the
    // caller's arbitrary lineage as a plan-building side effect, which a
    // library operator must not do. BUT the AQE estimate sits on a size
    // cliff: a vector table a hair over the broadcast threshold (64-dim
    // doubles cross it near ~20k rows) silently flips both verify joins
    // to sort-merge, shuffling candidate_pairs × vector_width bytes —
    // measured 3GB/28s where the broadcast plan is seconds. Callers that
    // KNOW the corpus is model-sized (e.g. a face that already counted it
    // for adaptivePlanes) pass broadcastVectors=true — the explicit
    // bounded-side contract, same pattern as pairsIncremental's
    // smallBatch.
    // per-vector norms below the re-join (once per vector, not once per
    // candidate pair — the pair volume is the big number here); identical
    // factors and order as the fused cosine, so cos is bitwise-unchanged
    def side(n: String) = {
      val s = base.select(col("id").as(n), col("v").as(n.replace("id_", "v")),
        norm(col("v")).as("_n" + n.stripPrefix("id_")))
      if (broadcastVectors) broadcast(s) else s
    }
    val verified = cand
      .join(side("id_a"), Seq("id_a"))
      .join(side("id_b"), Seq("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("_na") * col("_nb")))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
    // broadcast path deduped nothing yet — dedup the OUTPUT-sized rows
    if (broadcastVectors) verified.dropDuplicates("id_a", "id_b") else verified
  }

  /** LSH-bucketed approximate top-k: join query/candidate signatures per
    * table, rerank collisions with exact cosine, keep the best k. */
  def lshTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int,
              planes: Int = 12, tables: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // One scan per side: all table signatures in a single projection, then
    // posexplode into (table, bucket) rows — no repeated source scans.
    def signed(df: DataFrame, id: String, vec: String): DataFrame = {
      val base = df.select(col(idCol).as(id), toDouble(col(vecCol)).as(vec))
      base.select(col(id), col(vec),
          signatures(col(vec), dim, planes, tables).as("_sigs"))
        .select(col(id), col(vec), posexplode(col("_sigs")).as(Seq("table", "bucket")))
    }
    val c = signed(candidates, "neighbor_id", "v")
    val q = signed(queries, "query_id", "qv")
    // same narrow-pair discipline as selfPairs: collision detection and
    // pair dedup ship ids only; the candidate vector re-joins once per
    // unique pair, and the (small) query vectors broadcast back in
    val cands = c.select(col("table"), col("bucket"), col("neighbor_id"))
      .join(broadcast(q.select(col("table"), col("bucket"), col("query_id"))),
        Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    // per-vector norms below the re-join — see selfPairs; bitwise-unchanged
    val cVec = candidates.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("v"))
      .withColumn("_nv", norm(col("v")))
    val qVec = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("_nq", norm(col("qv")))
    val scored = cands
      .join(cVec, Seq("neighbor_id"))
      .join(broadcast(qVec), Seq("query_id"))
    topK(scored.select(col("query_id"), col("neighbor_id"),
      (dot(col("qv"), col("v")) / (col("_nq") * col("_nv"))).as("cos")), k)
  }
}
