package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** IVF-routed near-dup pair generation — the PAST-CAP tier of the LSH
  * table dial ([[AnnLsh.adaptiveTables]]).
  *
  * WHY IT EXISTS: random-hyperplane LSH holds recall as
  * [[AnnLsh.adaptivePlanes]] grows only by compounding tables —
  * recall = 1−(1−p^planes)^tables with p = 1−acos(cos)/π, so holding a
  * fixed recall needs tables ∝ (1/p)^planes, EXPONENTIAL in corpus
  * doublings. The +8-tables-per-plane law tracks the measured range and
  * caps at 64; past cap-exhaustion ([[AnnLsh.tablesExhausted]], planes >
  * 14 ≈ 1M vectors at occupancy 64) every extra plane loses recall that
  * no affordable table count buys back — the exact analog of the simhash
  * pigeonhole's saturation, with no permuted-mask rescue (narrowing
  * planes-per-table gives occupancy back QUADRATICALLY: candidate volume
  * is tables·n²/2^planes, so the recall-feasible 6-plane/42-table
  * geometry at minCos 0.35 scans ~n²/1.5 pairs — measured in
  * docs/GEOMETRY_RECALL.json's forced row as the cliff this tier routes
  * around).
  *
  * THE ROUTED DESIGN — inverted-file (IVF) coarse partition + exact
  * within-list pairing:
  *   1. Normalize vectors to the unit sphere (cosine ⇒ angular, so the
  *      L2 Lloyd objective clusters by angle, not magnitude — a planted
  *      near-dup with 2× magnitude must share its original's list).
  *   2. Train `nLists` centroids with the deterministic [[KMeans]] Lloyd
  *      core (driver state = nLists·dim doubles).
  *   3. Assign every vector to its `assign` NEAREST lists (multi-assign
  *      is the recall mechanism: a true pair split by one Voronoi
  *      boundary still co-occurs in a second-nearest list). Assignment
  *      is ONE data-driven codegen projection
  *      ([[graft.functions.TopListsExpr]] — the centroid matrix rides
  *      the plan as a reference object): downstream of the scan there
  *      are only n·assign exploded list ids, no cross join, no
  *      aggregation, no shuffle.
  *   4. Candidate pairs are within-list collisions (shuffle-hash join on
  *      the list key, id_a < id_b, deduped across assignments), verified
  *      by EXACT cosine on the original vectors — precision is exact,
  *      only recall is probabilistic, measured per decade in
  *      docs/GEOMETRY_RECALL.json with its own floor.
  *
  * SCALE LAW: candidate volume ≈ assign²·n·listSize (balanced lists) —
  * LINEAR in n at fixed target list size, where the capped LSH tier is
  * quadratic past exhaustion. Bounds: centroid training/assignment is
  * n·nLists dot products and nLists·dim driver doubles, so `nLists` caps
  * at [[maxLists]] (65536 ⇒ ≤32 MB of model, ≤16.7M vectors at flat
  * occupancy 256).
  *
  * PAST THE CAP — MEASURED, not prose (GEOMETRY_RECALL ivf_overload,
  * the family discipline applied one rung up: lists pinned at the
  * at-cap shape, corpus doubled twice, exact sampled truth recomputed
  * per corpus): occupancy 255 → 511 → 1023 measures overall recall
  * 0.5812 → 0.5718 → 0.5569 and cos≥0.7 recall 0.990 → 0.985 → 0.990 —
  * FLAT, floored at 0.5/0.98 — while generator wall time grows
  * 67.9 → 159.3 → 423.9s (~2.3-2.7× per doubling, tracking the
  * candidate law assign²·n·occupancy). The frozen-geometry argument
  * holds: a pair's split probability depends on its angle vs the fixed
  * cell size, not on how many vectors share the cell. So past-cap IVF
  * pays COST, never a recall cliff — the OPPOSITE failure mode from
  * saturated LSH — and the routing answer is: stay on IVF and budget
  * the linear occupancy term, or shard the corpus; a two-level coarse
  * quantizer would be a cost optimization, not a recall rescue.
  */
object AnnIvf {

  /** List-count cap: model stays driver/broadcast-sized (65536·dim·8B =
    * 32 MB at dim 64) and centroid assignment stays one broadcast pass. */
  val maxLists = 65536

  /** Overall-recall preset for [[ivfLists]]' `targetListSize` — the
    * SEMANTIC tier: bigger cells at the same assign=4, the IvfSweep-swept
    * doubled-cell point (overall 0.734 / cos70 0.985 at sf1, 2× the
    * default's candidate volume; GEOMETRY_RECALL's ivf_overall_* rows
    * floor it per decade). The default 256 optimizes cos70-per-second
    * because the routed face's primary contract is dedup; callers doing
    * semantic grouping — where the low-cos tail matters more than cost —
    * pass `ivfLists(n, overallRecallListSize)` instead. */
  val overallRecallListSize = 512L

  /** Derived list count: n / targetListSize, floored at 8, capped at
    * [[maxLists]] — occupancy holds flat at targetListSize until the cap,
    * then gives way linearly (the documented trade). */
  def ivfLists(n: Long, targetListSize: Long = 256L): Int = {
    require(targetListSize >= 1)
    math.min(maxLists.toLong,
      math.max(8L, (n + targetListSize - 1) / targetListSize)).toInt
  }

  /** Derived multi-assign width — MEASURED, not guessed (tools/IvfSweep,
    * sf1 corpus at the production-shaped ~1024 effective occupancy,
    * exact cos≥0.35 ground truth, cos≥0.7 dedup-regime tier):
    *   assign 2 → recall 0.250 / cos70 0.876   (21s)
    *   assign 3 → recall 0.420 / cos70 0.970   (29s)
    *   assign 4 → recall 0.581 / cos70 0.990   (46s)
    * and halving the list count instead (same candidate budget as +1
    * assign) buys LESS cos70 per second (l40a3: 0.980 at 43s). So the
    * dial is assign=4 — the first width whose dedup-regime recall clears
    * the 0.98 floor — shrunk only when the list count itself is small
    * (assign ≥ lists/4 degenerates toward all-pairs; tiny corpora keep
    * assign 2, which their GEOMETRY_RECALL rows measure at 1.0 cos70
    * anyway). For the routed production regime (n > ~262k ⇒ the gate's
    * planes ≥ 13) this is always 4. OVERALL-recall-priority callers
    * (semantic grouping where the low-cos tail matters more than cost)
    * double `targetListSize` instead: the swept l40a4 point — bigger
    * cells, same assign — measures overall 0.734 / cos70 0.985 at 2×
    * the default's candidate volume; the default optimizes cos70 per
    * second because the routed face's primary contract is dedup. */
  def ivfAssign(nLists: Int): Int =
    math.max(1, math.min(4, nLists / 4))

  /** Exact-cosine near-dup pairs via IVF coarse partition — the routed
    * tier [[graft.queries.Q.embedClusterLsh]] switches to when
    * [[AnnLsh.tablesExhausted]] fires. Emits (id_a, id_b, cos) with
    * cos ≥ minCos, id_a < id_b, exact precision. */
  def selfPairs(df: DataFrame, idCol: String, vecCol: String, minCos: Double,
                nLists: Int, assign: Int = 2, iters: Int = 2): DataFrame = {
    require(nLists >= 1 && nLists <= maxLists, s"nLists in [1, $maxLists], got $nLists")
    require(assign >= 1 && assign <= nLists, s"assign in [1, nLists], got $assign")
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    // unit-sphere projection: angular clustering for a cosine objective.
    // Guarded against zero vectors (norm 0 ⇒ keep the zero vector; it has
    // no cosine neighbors anyway, the verify filter drops its pairs).
    val unit = base.select(col("id"),
        when(norm(col("v")) > 0.0,
          transform(col("v"), x => x / norm(col("v"))))
          .otherwise(col("v")).as("u"))
      // Lloyd passes + the assignment pass re-read this frame
      .localCheckpoint()
    val centroids = KMeans.fitCentroids(unit, "id", "u", nLists, iters)
    // top-`assign` nearest lists per vector by L2 on the unit sphere
    // (= the training metric) as ONE data-driven projection
    // ([[graft.functions.TopListsExpr]] — the centroid matrix is a
    // reference object): nothing downstream of the scan but n×assign
    // exploded longs. The old formulation cross-joined the broadcast
    // centroid frame (n×nLists materialized rows, each carrying the
    // dim-64 vector) and paid a hash aggregation to keep `assign` of
    // them; scores, ranks and ties (score desc, list asc) are
    // bitwise-identical.
    val listed = unit.select(col("id"),
      explode(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.TopListsExpr(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("u")),
          centroids, assign, cosineScore = false))).as("list"))
    // within-list collisions: same narrow-pair + shuffle-hash discipline
    // as AnnLsh.selfPairs (duplicate-heavy list keys stream through the
    // per-partition hashmap; rows are ~24 bytes — vectors re-join AFTER
    // the pair dedup, once per unique pair)
    val a = listed.select(col("list"), col("id").as("id_a"))
    val b = listed.select(col("list"), col("id").as("id_b"))
    val cand = a.join(b.hint("shuffle_hash"), Seq("list"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    // exact-cosine verify on the ORIGINAL vectors; per-vector norms below
    // the re-join (once per vector, not per pair) — see AnnLsh.selfPairs
    def side(n: String) = base.select(col("id").as(n),
      col("v").as(n.replace("id_", "v")),
      norm(col("v")).as("_n" + n.stripPrefix("id_")))
    cand
      .join(side("id_a"), Seq("id_a"))
      .join(side("id_b"), Seq("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("_na") * col("_nb")))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }
}
