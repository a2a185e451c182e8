package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph.pageRank / triangleStats vs driver-side reference iterations. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDF(es: Seq[(Long, Long, Long)]) = es.toDF("u", "v", "w")

  /** Reference fixed-point PageRank with the exact integer algebra. */
  private def refRank(es: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val outw = es.groupBy(_._1).map { case (u, g) => u -> g.map(_._3).sum }
    val n = outw.size.toLong
    var r: Map[Long, Long] = outw.map { case (u, _) => u -> Graph.Scale / n }
    for (_ <- 1 to iters) {
      val contrib = es.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _, w) => (r(u) * w) / outw(u) }.sum
      }
      r = contrib.map { case (v, c) =>
        v -> ((15L * Graph.Scale) / (100L * n) + (85L * c) / 100L)
      }
    }
    r
  }

  test("pageRank matches the reference integer iteration on a hand graph") {
    // star: hub 1 <-> leaves 2,3,4 (symmetric, weighted)
    val es = Seq((1L, 2L, 2L), (2L, 1L, 2L), (1L, 3L, 1L), (3L, 1L, 1L),
      (1L, 4L, 1L), (4L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L))
    val got = Graph.pageRank(edgesDF(es), iters = 5)
      .select("part", "rank_scaled").as[(Long, Long)].collect().toMap
    val expect = refRank(es, 5)
    assert(got == expect)
    // the hub outranks every leaf
    assert(got(1L) > got(3L) && got(1L) > got(4L))
    // fixed-point mass stays within floor-loss of the full scale
    val total = got.values.sum
    assert(total <= Graph.Scale && total > Graph.Scale - 1000L)
  }

  test("triangleStats counts a planted K4 as 4 triangles and respects the weight threshold") {
    // K4 over 1..4 with weight 2, plus a weight-1 edge to node 5 that the
    // threshold must drop, duplicated in both directions like co-occurrence
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b, 2L)
    val weak = Seq((4L, 5L, 1L), (5L, 4L, 1L))
    val r = Graph.triangleStats(edgesDF(k4 ++ weak), minW = 2L)
      .select("n_nodes", "n_edges", "n_triangles").as[(Long, Long, Long)]
      .collect()(0)
    assert(r == ((4L, 6L, 4L)))
  }

  test("linkPrediction scores the square's diagonals and excludes real edges") {
    // 4-cycle 1-2-3-4: the two diagonals (1,3) and (2,4) each share both
    // off-diagonal nodes; every real edge pair shares exactly one neighbor
    // and must be excluded by the anti-join anyway
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .flatMap { case (a, b) => Seq((a, b, 5L), (b, a, 5L)) }
    val got = Graph.linkPrediction(edgesDF(sq), minW = 1L, minCommon = 2L, topK = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
  }

  test("linkPrediction never proposes an existing edge and respects minCommon") {
    // K4 minus edge (1,4): the only missing pair shares neighbors {2,3}
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b, 5L), (b, a, 5L)) }
    val got = Graph.linkPrediction(edgesDF(es), 1L, 1L, 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // deg(1)=2, deg(4)=2, cn=2 → jaccard 2/(2+2-2)=1.0
    assert(got == Seq((1L, 4L, 2L, 1.0)))
    assert(Graph.linkPrediction(edgesDF(es), 1L, 3L, 10).count() == 0L)
  }

  test("pageRank fails loudly on a directed graph with a sink (dangling mass)") {
    // 1 -> 2, 2 has no out-edge: rank flowing into 2 would vanish
    val ex = intercept[Exception] {
      Graph.pageRank(edgesDF(Seq((1L, 2L, 1L), (3L, 1L, 1L))), iters = 2).collect()
    }
    assert(ex.getMessage.contains("lose rank mass") ||
      Option(ex.getCause).exists(_.getMessage.contains("lose rank mass")))
  }

  test("degree orientation: a planted hub generates ZERO triangle wedges, not deg²") {
    // hub-and-spokes: hub 1 (LOW id — the id-ordered plan's worst case)
    // with 40 degree-1 spokes. Orientation points every edge spoke→hub,
    // so the hub's out-degree is 0 and the wedge join emits nothing; the
    // id-ordered two-path would have fanned out ~deg²/2 pairs from key 1.
    val n = 40L
    val und = (2L to n + 1L).map(s => (1L, s)).toDF("u", "v")
    val wedges = Graph.orientedWedges(Graph.orient(und))
    assert(wedges.count() == 0L)
    // full face agrees: no triangles, hub+spokes node/edge census intact
    val es = (2L to n + 1L).flatMap(s => Seq((1L, s, 5L), (s, 1L, 5L)))
    val r = Graph.triangleStats(edgesDF(es), minW = 1L)
      .select("n_nodes", "n_edges", "n_triangles").as[(Long, Long, Long)]
      .collect()(0)
    assert(r == ((n + 1L, n, 0L)))
  }

  test("degree orientation wedge total is Σ outdeg² = O(E^1.5) on hub+clique") {
    // K5 over 10..14 (every node degree 4) plus hub 1 of degree 30: clique
    // wedges survive, hub wedges vanish. Oriented K5 by id gives outdegs
    // 4,3,2,1,0 → C(4,2)+C(3,2)+C(2,2)+0+0 = 6+3+1 = 10 wedges.
    val clique = for { a <- 10L to 14L; b <- 10L to 14L if a < b } yield (a, b)
    val spokes = (100L to 129L).map(s => (1L, s))
    val und = (clique ++ spokes).toDF("u", "v")
    assert(Graph.orientedWedges(Graph.orient(und)).count() == 10L)
    // and all 10 K5 triangles close
    val es = (clique ++ spokes).flatMap { case (a, b) => Seq((a, b, 5L), (b, a, 5L)) }
    assert(Graph.triangleStats(edgesDF(es), 1L)
      .select("n_triangles").as[Long].collect()(0) == 10L)
  }

  test("linkPrediction maxCenterDeg caps hub wedge fan-out in-plan") {
    // hub-and-spokes, 40 spokes: uncapped, the hub center generates all
    // C(40,2)=780 spoke pairs; capped below 40, the hub is excluded BEFORE
    // the self-join and the candidate frame is empty (spoke centers have
    // one neighbor each — no pairs).
    val n = 40L
    val es = (2L to n + 1L).flatMap(s => Seq((1L, s, 5L), (s, 1L, 5L)))
    val df = edgesDF(es)
    assert(Graph.linkCandidates(df, 1L, maxCenterDeg = Long.MaxValue).count() == 780L)
    assert(Graph.linkCandidates(df, 1L, maxCenterDeg = 39L).count() == 0L)
    // the face-level result follows the same cap
    assert(Graph.linkPrediction(df, 1L, 1L, 1000, maxCenterDeg = Long.MaxValue)
      .count() == 780L)
    assert(Graph.linkPrediction(df, 1L, 1L, 1000, maxCenterDeg = 39L).count() == 0L)
  }

  test("triangle-free graph yields zero; single triangle yields one") {
    val path = Seq((1L, 2L, 5L), (2L, 1L, 5L), (2L, 3L, 5L), (3L, 2L, 5L))
    assert(Graph.triangleStats(edgesDF(path), 1L)
      .select("n_triangles").as[Long].collect()(0) == 0L)
    val tri = Seq((1L, 2L, 5L), (2L, 1L, 5L), (2L, 3L, 5L), (3L, 2L, 5L),
      (1L, 3L, 5L), (3L, 1L, 5L))
    assert(Graph.triangleStats(edgesDF(tri), 1L)
      .select("n_triangles").as[Long].collect()(0) == 1L)
  }
}
