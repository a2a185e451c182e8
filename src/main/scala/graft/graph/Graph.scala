package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relational co-occurrence graphs, in the
  * vertex-centric-as-dataflow form (Pregel expressed as join + groupBy —
  * the shape GraphX/Pregel lower to anyway, kept declarative so Catalyst
  * plans the shuffles): each PageRank iteration is ONE source-keyed join
  * of the rank frame against the edge list plus ONE target-keyed
  * aggregation; triangle counting enumerates wedges in the DEGREE-ORIENTED
  * graph (every undirected edge directed from its lower-(degree, id)
  * endpoint to the higher) and semi-joins them against the oriented
  * closing edge.
  *
  * Why degree orientation: with edges oriented low→high degree, every
  * out-degree is O(√E) (a node of degree d > √E has all but √E of its
  * edges pointing AT it), so the wedge join's total fan-out is
  * Σ outdeg² = O(E^1.5) — and, crucially for a 1000-executor cluster, no
  * single join key carries more than O(E) pairs even when one hub node
  * holds a constant fraction of all edges. Id-ordering (the naive plan)
  * leaves a low-id hub contributing deg² pairs on one key.
  *
  * Determinism discipline: ranks are FIXED-POINT BIGINTs (units of 1e-12)
  * — every contribution is integer multiply/floor-divide, every fold an
  * order-free integer sum, so a DuckDB oracle replaying the same algebra
  * as a chained-CTE unrolled loop is bitwise identical. No doubles exist
  * anywhere in the operator. Triangle/link-pred outputs are order-free
  * counts, so the orientation change is plan-only: results are bitwise
  * identical to the id-ordered plan.
  */
object Graph {

  /** Fixed-point scale: ranks live in units of 1e-12. */
  val Scale = 1000000000000L

  // Lineage policy (r17 A/B, 5 fresh JVMs × 3 runs per variant, sf0.1,
  // quiet sentinel-checked window — settles the r15/r16 conflict the
  // driver flagged): the RE-JOINED FRAMES (edges/out-weights, und/oriented,
  // nbrs) are lazily checkpointed — every consumer after the first then
  // reads a materialized RDD instead of re-analyzing/re-planning the whole
  // upstream tree per execution — but per-iteration rank checkpoints are
  // NOT (r15's form measured 8.9s warm vs 6.1-6.5 without: five extra
  // materialization barriers of node-sized frames for nothing). pageRank
  // additionally truncates lineage every 3rd iteration, which both won the
  // A/B at iters=5 (warm 6.08 vs 6.51 frames-only, cold 13.9 vs 20.7 —
  // analysis cost of the unrolled tail) and bounds plan growth to ≤3
  // unrolled iterations for ANY caller-supplied iters (the unbounded-plan
  // liability flagged in r16's review). Full numbers: OPTIMIZATION_r17.md.
  private def pinned(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = false)

  /** Directed, weighted part co-occurrence edges from lineitem: (u, v, w)
    * where w counts orders containing both parts (both directions emitted;
    * self-pairs excluded). ONE orderkey-keyed self-join (never parts²) +
    * one (u,v) rollup. */
  def coOccurrenceEdges(li: DataFrame): DataFrame = {
    val a = li.select(col("l_orderkey").as("k"), col("l_partkey").as("u"))
    val b = li.select(col("l_orderkey").as("k"), col("l_partkey").as("v"))
    // co-occurrence is symmetric: roll up only the u < v half (halves the
    // pair-instance shuffle) and mirror the aggregated edge frame after
    val half = a.join(b, Seq("k")).filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
    half.union(half.select(col("v").as("u"), col("u").as("v"), col("w")))
  }

  /** Weighted PageRank, `iters` synchronous iterations, damping 0.85, over
    * a directed edge list (u, v, w). Nodes are the edge sources; an edge
    * TARGET with no out-edges would silently lose rank mass, so the plan
    * carries an `assert_true` guard that fails the job on the first
    * dangling target (one left-anti count riding the already-checkpointed
    * frames — symmetric co-occurrence input never trips it). Returns
    * (part, out_weight, rank_scaled) with rank in fixed-point 1e-12 units.
    * Each iteration shuffles ONLY on node id; the edge and out-weight
    * frames are checkpointed once and re-joined per iteration; the node
    * count rides a broadcast scalar frame. Floor-division mass loss is
    * deliberate (exactness over mass conservation) and identical in the
    * oracle's unrolled CTE chain. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val e = pinned(edges)
    val outw = pinned(e.groupBy("u").agg(sum(col("w")).as("wu")))
    val nRow = outw.agg(count(lit(1)).as("n"))
    // dangling-mass guard: every target must appear as a source
    val dangRow = e.select(col("v"))
      .join(outw.select(col("u")), col("v") === col("u"), "left_anti")
      .agg(count(lit(1)).as("n_dangling"))
    var r = outw.crossJoin(broadcast(nRow)).crossJoin(broadcast(dangRow))
      .filter(assert_true(col("n_dangling") === 0,
        lit("pageRank: edge targets with no out-edges would lose rank mass;" +
          " symmetrize the input or drop sink edges")).isNull)
      .select(col("u").as("node"), expr(s"${Scale}L div n").as("rank"))
    for (i <- 1 to iters) {
      // AQE picks broadcast vs shuffle for the node-sized rank/outw
      // frames per iteration. Two measured non-wins, for the record: an
      // explicit broadcast(r) hint serializes each iteration on a
      // driver-side collect barrier (+20%), and pre-folding outw into
      // the edge frame widens the 2M-row frame for a smaller saving than
      // the fold costs (+15%). A third measured non-win this round:
      // folding outw into the NODE-side rank frame before the edge join
      // (one edge-side join instead of two) re-measured SLOWER (warm
      // floor 7.4s vs 5.0s) — the fold join breaks the canonical-subtree
      // reuse AQE's stage cache gets from the repeated r⋈e shape.
      r = r.join(e, col("node") === e("u"))
        .join(outw.select(col("u").as("ou"), col("wu")), col("ou") === col("node"))
        .crossJoin(broadcast(nRow))
        .groupBy(col("v"), col("n"))
        .agg(sum(expr("(rank * w) div wu")).as("contrib"))
        .select(col("v").as("node"),
          (expr(s"(15 * ${Scale}L) div (100 * n)") +
            expr("(85 * contrib) div 100")).as("rank"))
      if (i % 3 == 0) r = pinned(r) // bound plan depth to 3 unrolled iters
    }
    r.join(outw, col("node") === outw("u"))
      .select(col("node").as("part"), col("wu").as("out_weight"),
        col("rank").as("rank_scaled"))
  }

  /** Degree-orient the canonical (u < v) undirected edge frame: each edge
    * becomes (s, t, dt) directed from its lower-(degree, id) endpoint s to
    * the higher t, with dt = deg(t) carried so wedge pairs can be ordered
    * by the same total order without a further degree join. Degrees are
    * counted in the thresholded graph itself. */
  private[graph] def orient(und: DataFrame): DataFrame = {
    val deg = und.select(col("u").as("x")).union(und.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    und.join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("s"),
        when(uFirst, col("v")).otherwise(col("u")).as("t"),
        when(uFirst, col("dv")).otherwise(col("du")).as("dt"))
  }

  /** Out-neighbor pairs of each oriented source: (s, a, b) with
    * (deg(a), a) ≺ (deg(b), b). Total row count is Σ outdeg(s)² =
    * O(E^1.5); the per-key (per-s) fan-out is outdeg(s)² = O(E). */
  private[graph] def orientedWedges(o: DataFrame): DataFrame =
    o.select(col("s"), col("t").as("a"), col("dt").as("da"))
      .join(o.select(col("s"), col("t").as("b"), col("dt").as("db")), "s")
      .filter(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select("s", "a", "b")

  /** Triangle and edge census of the thresholded undirected co-occurrence
    * graph (edges with weight >= minW, canonical u < v). Wedges are
    * enumerated from the low end of the degree orientation — every
    * triangle x ≺ y ≺ z (in the (deg, id) total order) appears exactly
    * once as the out-pair (y, z) of its minimum vertex x — then
    * semi-joined against the oriented closing edge y→z, which is the only
    * direction the edge {y, z} can carry. The count is identical to the
    * id-ordered plan's; only the join fan-out bound changes (O(E^1.5)
    * total, O(E) per key, vs deg² on one key for a low-id hub). */
  def triangleStats(edges: DataFrame, minW: Long): DataFrame = {
    val und = pinned(
      edges.filter(col("w") >= minW && col("u") < col("v")).select("u", "v"))
    val nodes = und.select(col("u").as("x"))
      .union(und.select(col("v").as("x")))
      .agg(count_distinct(col("x")).as("n_nodes"))
    val o = pinned(orient(und))
    val tri = orientedWedges(o)
      .join(o.select(col("s").as("a"), col("t").as("b")), Seq("a", "b"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val ne = und.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  /** Common-neighbor link prediction over the thresholded undirected graph:
    * every NON-adjacent pair sharing ≥ `minCommon` neighbors, scored by
    * common-neighbor count and neighborhood Jaccard
    * |N(a)∩N(b)| / |N(a)∪N(b)| — the classic graph-completion baselines
    * (Liben-Nowell & Kleinberg 2003). Unlike the triangle census, exact
    * common-neighbor counting must enumerate EVERY wedge a–z–b (the count
    * itself is Σ deg(z)²), so degree orientation cannot shrink it; the
    * scale control is `maxCenterDeg`: wedge centers with degree above the
    * cap are EXCLUDED from cn before the self-join (filter pushed below
    * the pair fan-out), bounding the blowup at maxCenterDeg × 2E pairs
    * with no single join key above maxCenterDeg². The bias is deliberate
    * and standard — a super-hub mediating everything is uninformative as
    * a common neighbor (the Adamic-Adar 1/log deg insight taken to its
    * limit) — and the DuckDB oracle applies the identical cap, so results
    * hash-match at every scale, not just while no hub trips it. Jaccard
    * denominators use FULL degrees. cn and degrees are exact integers;
    * Jaccard is one double division (6dp round). Top-k is
    * TakeOrderedAndProject under a total order. */
  def linkPrediction(edges: DataFrame, minW: Long, minCommon: Long,
                     topK: Int, maxCenterDeg: Long = Long.MaxValue): DataFrame = {
    val und = pinned(
      edges.filter(col("w") >= minW && col("u") < col("v")).select("u", "v"))
    val nbrs = pinned(
      und.select(col("u").as("z"), col("v").as("x"))
        .union(und.select(col("v").as("z"), col("u").as("x"))))
    val deg = nbrs.groupBy("x").agg(count(lit(1)).as("d"))
    val centered = nbrs.join(
      deg.filter(col("d") <= maxCenterDeg).select(col("x").as("z")),
      Seq("z"), "left_semi")
    val cand = centered.select(col("z"), col("x").as("a"))
      .join(centered.select(col("z"), col("x").as("b")), "z")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
      .join(und, col("a") === col("u") && col("b") === col("v"), "left_anti")
    cand.join(deg.select(col("x").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("x").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"), col("cn"),
        (floor((col("cn").cast("double") /
          (col("da") + col("db") - col("cn")).cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("jaccard"))
      .orderBy(col("cn").desc, col("jaccard").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Candidate wedge frame linkPrediction aggregates, pre-groupBy — exposed
    * for the planted-hub fan-out specs (count rows, don't re-derive). */
  private[graph] def linkCandidates(edges: DataFrame, minW: Long,
                                    maxCenterDeg: Long): DataFrame = {
    val und = edges.filter(col("w") >= minW && col("u") < col("v"))
      .select("u", "v")
    val nbrs = und.select(col("u").as("z"), col("v").as("x"))
      .union(und.select(col("v").as("z"), col("u").as("x")))
    val deg = nbrs.groupBy("x").agg(count(lit(1)).as("d"))
    val centered = nbrs.join(
      deg.filter(col("d") <= maxCenterDeg).select(col("x").as("z")),
      Seq("z"), "left_semi")
    centered.select(col("z"), col("x").as("a"))
      .join(centered.select(col("z"), col("x").as("b")), "z")
      .filter(col("a") < col("b"))
  }

  // ---------------------------------------------------------------- faces

  /** Default wedge-center degree cap for the link-pred face. Far above any
    * degree the co-occurrence graph reaches at test SFs (max observed 15
    * at sf0.1), mirrored verbatim in the DuckDB oracle; at 100 TB it is
    * the knob that keeps one hub part from generating deg² pairs. */
  val LinkPredMaxCenterDeg = 1024L

  /** PageRank face: 5 iterations over the full weighted co-order graph. */
  def partPageRank(spark: SparkSession, dir: String): DataFrame =
    pageRank(coOccurrenceEdges(Tables(spark, dir, "lineitem")), iters = 5)

  /** Triangle face: weight-≥2 thresholded graph census. */
  def partTriangles(spark: SparkSession, dir: String): DataFrame =
    triangleStats(coOccurrenceEdges(Tables(spark, dir, "lineitem")), minW = 2L)

  /** Link-prediction face: top 50 missing edges of the same weight-≥2
    * graph the triangle census reads, ≥2 common neighbors, hub centers
    * capped at [[LinkPredMaxCenterDeg]]. */
  def partLinkPred(spark: SparkSession, dir: String): DataFrame =
    linkPrediction(coOccurrenceEdges(Tables(spark, dir, "lineitem")),
      minW = 2L, minCommon = 2L, topK = 50,
      maxCenterDeg = LinkPredMaxCenterDeg)
}
