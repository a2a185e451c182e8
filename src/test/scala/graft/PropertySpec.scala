package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Randomized cross-checks of the distributed algorithms against
  * sequential Scala references. Iteration counts stay small — every case
  * runs real Spark jobs — but the generators roam sizes, partition counts,
  * and missingness patterns that hand-written cases miss. */
class PropertySpec extends SparkSpec {

  private def passes(label: String, prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, s"$label: $res")
  }

  test("packing offsets equal the sequential cumsum for arbitrary corpora") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.choose(0L, 50L))
      parts <- Gen.choose(1, 9)
      budget <- Gen.choose(1, 64)
    } yield (toks, parts, budget)
    val prop = Prop.forAllNoShrink(gen) { case (toks, parts, budget) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "n")
      val got = graft.text.Packing.packWindows(df, "doc_id", col("n"), budget, parts)
        .orderBy("doc_id").select("tok_start").as[Long].collect().toSeq
      val expect = toks.scanLeft(0L)(_ + _).init
      got == expect
    }
    passes("packing", prop, 8)
  }

  test("knn impute equals brute force for random frames") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(5, 40)
      xs <- Gen.listOfN(n, Gen.choose(0, 20))            // duplicate-heavy xs
      miss <- Gen.listOfN(n, Gen.prob(0.3))
      k <- Gen.choose(1, 4)
      parts <- Gen.choose(1, 7)
    } yield (xs, miss, k, parts)
    val prop = Prop.forAllNoShrink(gen) { case (xs, miss, k, parts) =>
      val rows = xs.zip(miss).zipWithIndex.map { case ((x, m), i) =>
        (i.toLong, x.toDouble, if (m) None else Some((x * 13 % 7).toDouble + 0.25))
      }
      if (rows.forall(_._3.isEmpty)) true
      else {
        val obs = rows.collect { case (id, x, Some(y)) => (id, x, math.round(y * 100)) }
        val expect = rows.collect { case (mid, mx, None) =>
          val nn = obs.sortBy { case (oid, ox, _) => (math.abs(ox - mx), ox, oid) }.take(k)
          mid -> math.round(nn.map(_._3).sum.toDouble / nn.size).toDouble / 100.0
        }.toMap
        val got = graft.imputer.KnnImpute.impute1d(
            rows.toDF("id", "x", "y"), "id", col("x"), "y", "y_imp", k,
            numPartitions = parts)
          .filter(col("y_imp").isNotNull).as[(Long, Double)].collect().toMap
        expect.forall { case (id, v) => got(id) == v }
      }
    }
    passes("knn", prop, 6)
  }

  test("chunking reassembles every document losslessly") {
    import spark.implicits._
    val word = Gen.choose('a', 'e').map(_.toString)
    val gen = for {
      n <- Gen.choose(1, 60)
      ws <- Gen.listOfN(n, word)
      size <- Gen.choose(1, 17)
    } yield (ws.mkString(" "), size)
    val prop = Prop.forAllNoShrink(gen) { case (text, size) =>
      val df = Seq((0L, text)).toDF("doc_id", "text")
      val chunks = graft.text.TextAnalysis.chunk(df, "doc_id", "text", size)
        .orderBy("chunk_id").select("chunk_text").as[String].collect()
      chunks.mkString(" ") == text
    }
    passes("chunk", prop, 10)
  }
}
