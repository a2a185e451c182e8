package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** 6 well-separated families × 8 members with tiny perturbations —
    * same-family distances ≈ 0, cross-family ≈ far. */
  private def corpus = {
    def unit(seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed * 7 + 1)
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n * 10.0).toFloat)
    }
    (for (fam <- 0 until 6; m <- 0 until 8) yield {
      val base = unit(fam)
      val d = base.zipWithIndex.map { case (x, i) => x + (if (i == m % dim) 0.05f else 0f) }
      ((fam * 8 + m).toLong, d.toSeq)
    }).toDF("vec_id", "embedding")
  }

  test("fit learns codebooks; encode maps every vector to m in-range codes") {
    val model = Pq.fit(corpus, "vec_id", "embedding", dim, m = 4, k = 8, iters = 2)
    assert(model.centroids.length == 4)
    assert(model.centroids.forall(_.length == 8))
    assert(model.centroids.forall(_.forall(_.length == dim / 4)))
    val codes = Pq.encode(corpus, "vec_id", "embedding", model)
      .select("codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    // same-family members agree on far more subspace codes than
    // cross-family pairs (perturbation << family separation)
    val byId = Pq.encode(corpus, "vec_id", "embedding", model)
      .as[(Long, Seq[Int])].collect().toMap
    def agree(a: Long, b: Long): Int =
      byId(a).zip(byId(b)).count { case (x, y) => x == y }
    val within = (for (f <- 0 until 6; i <- 0 until 8; j <- i + 1 until 8)
      yield agree(f * 8L + i, f * 8L + j)).sum.toDouble
    val withinAvg = within / (6 * 28)
    val crossAvg = (for (f <- 0 until 5) yield agree(f * 8L, (f + 1) * 8L))
      .sum.toDouble / 5
    assert(withinAvg > crossAvg + 1.0,
      s"within-family code agreement $withinAvg not above cross-family $crossAvg")
  }

  test("adc top-k recovers same-family neighbors") {
    val model = Pq.fit(corpus, "vec_id", "embedding", dim, m = 4, k = 8, iters = 2)
    val encoded = Pq.encode(corpus, "vec_id", "embedding", model)
    val queries = corpus.filter(col("vec_id") % 8 === 0) // one per family
    val top = Pq.adcTopK(encoded, queries, "vec_id", "embedding", model, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.nonEmpty)
    top.foreach { case (q, n, _, _) =>
      assert(q / 8 == n / 8, s"query $q matched cross-family neighbor $n")
    }
    // every query gets exactly 5 neighbors (7 same-family candidates exist)
    assert(top.groupBy(_._1).forall(_._2.length == 5))
  }

  test("ivf-pq: coarse prune + residual codes still recover the family") {
    // list = family (a perfect coarse index); probing 2 lists must keep
    // every true neighbor reachable and ADC must rank them first
    val listed = corpus.withColumn("list", (col("vec_id") / 8).cast("int"))
    val queries = corpus.filter(col("vec_id") % 8 === 3)
    val top = Pq.ivfPqTopK(listed, queries, "vec_id", "embedding", "list",
        dim, m = 4, kCode = 8, iters = 2, nProbe = 2, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.nonEmpty)
    top.foreach { case (q, n, _, _) =>
      assert(q / 8 == n / 8, s"query $q matched cross-family neighbor $n")
    }
    assert(top.groupBy(_._1).forall(_._2.length == 5))
  }

  test("ivf-pq list key is type-agnostic: long and string keys match the int results") {
    val queries = corpus.filter(col("vec_id") % 8 === 3)
    def run(listCol: org.apache.spark.sql.Column): Seq[(Long, Long, Long)] =
      Pq.ivfPqTopK(corpus.withColumn("list", listCol), queries, "vec_id",
          "embedding", "list", dim, m = 4, kCode = 8, iters = 2, nProbe = 2, k = 5)
        .orderBy("query_id", "rank")
        .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)]
        .collect().toSeq
    val asInt = run((col("vec_id") / 8).cast("int"))
    val asLong = run((col("vec_id") / 8).cast("long")) // bigint — the 100 TB hash-derived shape
    val asString = run(concat(lit("fam_"), (col("vec_id") / 8).cast("long").cast("string")))
    assert(asLong == asInt)
    assert(asInt.length == 30)
    assert(asString == asInt)
  }

  test("maxQueries bound trips loudly on an oversized query set") {
    val model = Pq.fit(corpus, "vec_id", "embedding", dim, m = 4, k = 8, iters = 1)
    val encoded = Pq.encode(corpus, "vec_id", "embedding", model)
    // 48-row corpus as the "query set" against maxQueries = 10: the
    // limit(+1)-capped collect must fail the require, naming the knob
    val eAdc = intercept[IllegalArgumentException] {
      Pq.adcTopK(encoded, corpus, "vec_id", "embedding", model, k = 3,
        maxQueries = 10)
    }
    assert(eAdc.getMessage.contains("maxQueries=10"))
    val listed = corpus.withColumn("list", (col("vec_id") / 8).cast("int"))
    val eIvf = intercept[IllegalArgumentException] {
      Pq.ivfPqTopK(listed, corpus, "vec_id", "embedding", "list", dim,
        m = 4, kCode = 8, iters = 1, nProbe = 2, k = 3, maxQueries = 10)
    }
    assert(eIvf.getMessage.contains("maxQueries=10"))
  }

  test("fit and search are deterministic across invocations") {
    def run(): Seq[(Long, Long)] = {
      val model = Pq.fit(corpus, "vec_id", "embedding", dim, m = 4, k = 8, iters = 2)
      val enc = Pq.encode(corpus, "vec_id", "embedding", model)
      Pq.adcTopK(enc, corpus.filter(col("vec_id") === 0), "vec_id", "embedding",
          model, k = 3)
        .orderBy("rank").select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().toSeq
    }
    assert(run() == run())
  }
}
