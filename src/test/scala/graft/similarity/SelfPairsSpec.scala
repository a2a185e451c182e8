package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SelfPairsSpec extends SparkSpec {
  import spark.implicits._

  test("selfPairs: exact precision, near-total recall on tight near-dups") {
    // 40 "documents": 10 base directions, each duplicated 4× with a tiny
    // deterministic perturbation — pairwise cos within a family ≈ 0.999,
    // across families ≈ 0 (orthogonal-ish random directions)
    val dim = 16
    def unit(seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = for (fam <- 0 until 10; c <- 0 until 4) yield {
      val base = unit(fam + 1)
      val d = base.zipWithIndex.map { case (x, i) =>
        x + (if (i == c) 0.01f else 0.0f)
      }
      ((fam * 4 + c).toLong, d)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = AnnLsh.selfPairs(df, "vec_id", "embedding", dim, minCos = 0.9)
      .as[(Long, Long, Double)].collect()
    // precision is exact by construction: every emitted pair verified
    assert(got.forall(_._3 >= 0.9))
    // brute-force truth: all within-family pairs (cos ≈ 0.999)
    val truth = (for (f <- 0 until 10; a <- 0 until 4; b <- a + 1 until 4)
      yield (f * 4 + a.toLong, f * 4 + b.toLong)).toSet
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    assert(gotPairs.subsetOf(truth))
    // 8 planes × 8 tables at cos≈0.999 ⇒ recall indistinguishable from 1
    assert(gotPairs.size >= truth.size * 95 / 100)
  }

  test("embed_cluster_lsh clusters refine the unblocked brute-force truth") {
    val sf = "/root/testdata/sf0.001"
    val lsh = graft.queries.Q.embedClusterLsh(spark, sf)
      .as[(Long, Long)].collect().toMap
    // Ground truth: connected components over ALL pairs with cos >= 0.35,
    // no label blocking (the label-blocked embedCluster misses cross-label
    // edges that selfPairs legitimately finds, so it is NOT a valid truth).
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); parent(x) = r; r }
    for (i <- vecs.indices; j <- i + 1 until vecs.length
         if cos(vecs(i)._2, vecs(j)._2) >= 0.35)
      parent(find(vecs(i)._1)) = find(vecs(j)._1)
    val truth = vecs.map(v => v._1 -> find(v._1)).toMap
    assert(lsh.size == truth.size)
    val sameLabelPairs = (m: Map[Long, Long]) =>
      m.groupBy(_._2).values.flatMap { g =>
        val ids = g.keys.toSeq.sorted
        for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
      }.toSet
    val pl = sameLabelPairs(lsh)
    val pt = sameLabelPairs(truth)
    // LSH edges are exact-cosine-verified, hence a subset of the truth
    // edges; CC over a subgraph can only refine the truth clusters.
    assert(pl.subsetOf(pt))
    assert(pl.size >= pt.size * 60 / 100)
  }
}
