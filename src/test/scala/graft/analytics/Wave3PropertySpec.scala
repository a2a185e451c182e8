package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Brute-force property pins for the wave-3 relational operators: random
  * inputs, driver-side exhaustive reference, exact comparison — the
  * adversarial shapes (hubs, ties, skewed baskets) the corpus oracle
  * can't produce. Seeded scala.util.Random keeps every run identical. */
class Wave3PropertySpec extends SparkSpec {
  import spark.implicits._

  test("linkPrediction equals brute-force common-neighbor enumeration on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 12 + rnd.nextInt(8)
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val df = edges.flatMap { case (a, b) => Seq((a, b, 5L), (b, a, 5L)) }
          .toDF("u", "v", "w")
        val got = graft.graph.Graph.linkPrediction(df, 1L, 1L, 10000)
          .as[(Long, Long, Long, Double)].collect().toSet
        // driver-side reference: adjacency sets, all non-adjacent pairs
        val adj = (0L until n).map { x =>
          x -> edges.collect {
            case (a, b) if a == x => b
            case (a, b) if b == x => a
          }.toSet
        }.toMap
        val want = (for {
          a <- 0L until n; b <- (a + 1) until n
          if !adj(a).contains(b)
          cn = (adj(a) & adj(b)).size if cn >= 1
        } yield {
          val un = (adj(a).size + adj(b).size - cn).toDouble
          (a, b, cn.toLong,
            BigDecimal(cn / un).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }).toSet
        assert(got == want, s"trial $trial: got ${got.size} want ${want.size}")
      }
    }
  }

  test("associationRules equals brute-force counting on random baskets") {
    val rnd = new scala.util.Random(7)
    val baskets = (1L to 40L).map { id =>
      val items = (0 until 2 + rnd.nextInt(4)).map(_ => rnd.nextInt(8).toLong)
        .distinct.sorted
      (id, items)
    }
    val df = baskets.toDF("l_orderkey", "_ps")
    val got = Analytics.associationRules(df, minSupport = 2L, topK = 10000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    val nB = baskets.length.toDouble
    val itemCount = baskets.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.size.toDouble).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = baskets.flatMap { case (_, items) =>
      for { a <- items; b <- items if a < b } yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2L)
      .map { case ((a, b), nAb) =>
        (a, b) -> ((nAb, r6(nAb / nB), r6(nAb / itemCount(a)), r6(nAb / itemCount(b)),
          r6(nAb * nB / (itemCount(a) * itemCount(b)))))
      }
    assert(got == want)
  }

  test("giniOf equals the classic sorted formula on random count vectors") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val xs = (1 to 30 + rnd.nextInt(50)).map(_ => 1L + rnd.nextInt(20).toLong)
      val got = Analytics.giniOf(
          xs.zipWithIndex.map { case (c, i) => (i.toLong, c) }.toDF("k", "cnt"))
        .as[(Long, Long, Double)].collect().head
      val s = xs.sorted
      val n = s.length.toLong
      val sx = s.sum
      val s1 = s.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
      val want = (2.0 * s1 - (n + 1).toDouble * sx) / (n.toDouble * sx)
      assert(got._1 == n && got._2 == sx)
      assert(math.abs(got._3 - want) < 1e-6, s"trial $trial")
    }
  }
}
