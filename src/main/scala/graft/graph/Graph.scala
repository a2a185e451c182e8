package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relational co-occurrence graphs, in the
  * vertex-centric-as-dataflow form (Pregel expressed as join + groupBy —
  * the shape GraphX/Pregel lower to anyway, kept declarative so Catalyst
  * plans the shuffles): each PageRank iteration is ONE source-keyed join
  * of the rank frame against the edge list plus ONE target-keyed
  * aggregation; triangle counting is the ordered two-path join semi-joined
  * against the closing edge.
  *
  * Determinism discipline: ranks are FIXED-POINT BIGINTs (units of 1e-12)
  * — every contribution is integer multiply/floor-divide, every fold an
  * order-free integer sum, so a DuckDB oracle replaying the same algebra
  * as a chained-CTE unrolled loop is bitwise identical. No doubles exist
  * anywhere in the operator.
  */
object Graph {

  /** Fixed-point scale: ranks live in units of 1e-12. */
  val Scale = 1000000000000L

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
    * a directed edge list (u, v, w). Nodes are the edge sources (symmetric
    * input ⇒ no dangling mass). Returns (part, out_weight, rank_scaled)
    * with rank in fixed-point 1e-12 units. Each iteration shuffles ONLY on
    * node id; the edge and out-weight frames are checkpointed once and
    * re-joined per iteration; the node count rides a broadcast scalar
    * frame. Floor-division mass loss is deliberate (exactness over mass
    * conservation) and identical in the oracle's unrolled CTE chain. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.localCheckpoint(eager = false)
    val outw = e.groupBy("u").agg(sum(col("w")).as("wu"))
      .localCheckpoint(eager = false)
    val nRow = outw.agg(count(lit(1)).as("n"))
    var r = outw.crossJoin(broadcast(nRow))
      .select(col("u").as("node"), expr(s"${Scale}L div n").as("rank"))
    for (_ <- 1 to iters) {
      // AQE picks broadcast vs shuffle for the node-sized rank/outw
      // frames per iteration. Two measured non-wins, for the record: an
      // explicit broadcast(r) hint serializes each iteration on a
      // driver-side collect barrier (+20%), and pre-folding outw into
      // the edge frame widens the checkpointed 2M-row frame for a
      // smaller saving than the fold costs (+15%).
      r = r.join(e, col("node") === e("u"))
        .join(outw.select(col("u").as("ou"), col("wu")), col("ou") === col("node"))
        .crossJoin(broadcast(nRow))
        .groupBy(col("v"), col("n"))
        .agg(sum(expr("(rank * w) div wu")).as("contrib"))
        .select(col("v").as("node"),
          (expr(s"(15 * ${Scale}L) div (100 * n)") +
            expr("(85 * contrib) div 100")).as("rank"))
        .localCheckpoint(eager = false)
    }
    r.join(outw, col("node") === outw("u"))
      .select(col("node").as("part"), col("wu").as("out_weight"),
        col("rank").as("rank_scaled"))
  }

  /** Triangle and edge census of the thresholded undirected co-occurrence
    * graph (edges with weight >= minW, canonical u < v). The count joins
    * the ordered two-path e1(u,v)·e2(v,w) [u<v<w] against the closing edge
    * (u,w) — each triangle counted exactly once. Ordering by node id
    * bounds the join; the scale refinement is degree-ordering (orient
    * edges low-degree→high-degree) which caps two-path fan-out at
    * O(E^1.5) — same plan shape, different sort key. */
  def triangleStats(edges: DataFrame, minW: Long): DataFrame = {
    val und = edges.filter(col("w") >= minW && col("u") < col("v"))
      .select("u", "v").localCheckpoint(eager = false)
    val nodes = und.select(col("u").as("x"))
      .union(und.select(col("v").as("x")))
      .agg(count_distinct(col("x")).as("n_nodes"))
    val e2 = und.select(col("u").as("v"), col("v").as("t"))
    val closing = und.select(col("u").as("cu"), col("v").as("ct"))
    val tri = und.join(e2, "v")
      .join(closing, col("u") === col("cu") && col("t") === col("ct"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val ne = und.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(broadcast(ne)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  /** Common-neighbor link prediction over the thresholded undirected graph:
    * every NON-adjacent pair sharing ≥ `minCommon` neighbors, scored by
    * common-neighbor count and neighborhood Jaccard
    * |N(a)∩N(b)| / |N(a)∪N(b)| — the classic graph-completion baselines
    * (Liben-Nowell & Kleinberg 2003). The candidate generator is the SAME
    * ordered two-path join the triangle census runs (pairs of neighbors of
    * each z, a<b — never nodes²), so its fan-out carries the identical
    * Σ deg(z)² bound with `minW` as the control knob; existing edges drop
    * via one left-anti join on the canonical edge. cn and degrees are
    * exact integers; Jaccard is one double division (6dp round). Top-k is
    * TakeOrderedAndProject under a total order. */
  def linkPrediction(edges: DataFrame, minW: Long, minCommon: Long,
                     topK: Int): DataFrame = {
    val und = edges.filter(col("w") >= minW && col("u") < col("v"))
      .select("u", "v").localCheckpoint(eager = false)
    val nbrs = und.select(col("u").as("z"), col("v").as("x"))
      .union(und.select(col("v").as("z"), col("u").as("x")))
      .localCheckpoint(eager = false)
    val deg = nbrs.groupBy("x").agg(count(lit(1)).as("d"))
    val cand = nbrs.select(col("z"), col("x").as("a"))
      .join(nbrs.select(col("z"), col("x").as("b")), "z")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
      .join(und, col("a") === col("u") && col("b") === col("v"), "left_anti")
    cand.join(deg.select(col("x").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("x").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"), col("cn"),
        round(col("cn").cast("double") /
          (col("da") + col("db") - col("cn")).cast("double"), 6).as("jaccard"))
      .orderBy(col("cn").desc, col("jaccard").desc, col("a"), col("b"))
      .limit(topK)
  }

  // ---------------------------------------------------------------- faces

  /** PageRank face: 5 iterations over the full weighted co-order graph. */
  def partPageRank(spark: SparkSession, dir: String): DataFrame =
    pageRank(coOccurrenceEdges(Tables(spark, dir, "lineitem")), iters = 5)

  /** Triangle face: weight-≥2 thresholded graph census. */
  def partTriangles(spark: SparkSession, dir: String): DataFrame =
    triangleStats(coOccurrenceEdges(Tables(spark, dir, "lineitem")), minW = 2L)

  /** Link-prediction face: top 50 missing edges of the same weight-≥2
    * graph the triangle census reads, ≥2 common neighbors. */
  def partLinkPred(spark: SparkSession, dir: String): DataFrame =
    linkPrediction(coOccurrenceEdges(Tables(spark, dir, "lineitem")),
      minW = 2L, minCommon = 2L, topK = 50)
}
