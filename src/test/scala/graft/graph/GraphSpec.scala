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
