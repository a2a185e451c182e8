package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnnLshSpec extends SparkSpec {

  private def vectors = {
    import spark.implicits._
    // two tight clusters + noise, deterministic
    val dim = 8
    (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array.fill(dim)(1.0f) else Array.fill(dim)(-1.0f)
      val v = base.zipWithIndex.map { case (b, d) => b + 0.01f * ((i * 7 + d * 3) % 5) }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("brute top-k returns k neighbors per query, ranked by cosine") {
    val q = vectors.filter(col("vec_id") < 2)
    val out = AnnLsh.bruteTopK(vectors, q, "vec_id", "embedding", k = 3)
    val by = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(by.keySet == Set(0L, 1L))
    by.values.foreach { rows =>
      assert(rows.length == 3)
      val sims = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("brute top-k finds same-cluster neighbors (cosine ≈ 1)") {
    val q = vectors.filter(col("vec_id") === 0)
    val out = AnnLsh.bruteTopK(vectors, q, "vec_id", "embedding", k = 5).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") % 2 == 0) // same cluster
      assert(r.getAs[Double]("cos") > 0.99)
    }
  }

  test("lsh top-k recovers the brute-force neighbors on separable clusters") {
    val q = vectors.filter(col("vec_id") < 2)
    val brute = AnnLsh.bruteTopK(vectors, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = AnnLsh.lshTopK(vectors, q, "vec_id", "embedding", dim = 8, k = 3,
      planes = 6, tables = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    // with well-separated clusters LSH recall should be total
    assert(lsh == brute)
  }

  test("lsh signature is deterministic across invocations") {
    val s1 = vectors.select(AnnLsh.signature(
      graft.functions.VectorFunctions.toDouble(col("embedding")), 8, 6, 0)).collect()
    val s2 = vectors.select(AnnLsh.signature(
      graft.functions.VectorFunctions.toDouble(col("embedding")), 8, 6, 0)).collect()
    assert(s1.toSeq == s2.toSeq)
  }
}
