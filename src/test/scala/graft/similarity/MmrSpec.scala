package graft.similarity

import graft.SparkSpec

/** MMR must trade redundancy against relevance: a near-duplicate of the
  * top pick loses to a diverse lower-relevance candidate. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Array[Double])]) =
    rows.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("vec_id", "embedding")

  test("diversified pick beats the near-duplicate runner-up") {
    val q = Array(1.0, 0.0)
    val cands = Seq(
      1L -> Array(1.0, 0.02),     // most relevant
      2L -> Array(1.0, -0.02),    // near-dup of 1 (cos ≈ 0.999)
      3L -> Array(0.5, -0.866)    // rel 0.5 but only ~0.48-similar to 1
    )
    val got = Mmr.select(spark, df(cands), "vec_id", "embedding", q,
        pool = 3, k = 2, lambda = 0.5)
      .select("rank", "vec_id").as[(Int, Long)].collect().toSeq
    // pure relevance top-2 would be (1, 2); MMR swaps in the diverse 3:
    // 0.5·0.5 − 0.5·0.48 ≈ 0.009 beats 0.5·0.9998 − 0.5·0.9992 ≈ 0.0003
    assert(got == Seq((1, 1L), (2, 3L)))
  }

  test("lambda=1 reduces to pure relevance order with id tie-breaks") {
    val q = Array(1.0, 0.0)
    val cands = Seq(1L -> Array(1.0, 0.02), 2L -> Array(1.0, -0.02),
      3L -> Array(0.7, 0.7))
    val got = Mmr.select(spark, df(cands), "vec_id", "embedding", q,
        pool = 3, k = 3, lambda = 1.0)
      .select("rank", "vec_id").as[(Int, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 2L, 3L))
  }

  test("zero-norm and NaN candidates never crowd the pool (NaN sorts above every real)") {
    val q = Array(1.0, 0.0)
    val cands = Seq(
      1L -> Array(1.0, 0.02),
      2L -> Array(0.0, 0.0),                 // zero norm → rel = NaN
      3L -> Array(Double.NaN, 1.0),          // NaN component → rel = NaN
      4L -> Array(0.5, -0.866)
    )
    val got = Mmr.select(spark, df(cands), "vec_id", "embedding", q,
        pool = 4, k = 4, lambda = 0.5)
      .select("vec_id", "mmr_score").as[(Long, Double)].collect().toSeq
    assert(got.map(_._1).toSet == Set(1L, 4L), s"broken vectors leaked: $got")
    assert(got.forall(r => !r._2.isNaN))
  }

  test("pool smaller than candidate set bounds the driver state; k caps output") {
    val q = Array(1.0, 0.0)
    val cands = (1L to 100L).map(i => i -> Array(1.0 / i, 1.0 - 1.0 / i))
    val out = Mmr.select(spark, df(cands), "vec_id", "embedding", q,
      pool = 10, k = 5, lambda = 0.7).collect()
    assert(out.length == 5)
    // selected ids must come from the relevance top-10 pool (smallest ids
    // here, since relevance decreases with i)
    assert(out.map(_.getLong(1)).forall(_ <= 10L))
  }
}
