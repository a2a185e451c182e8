package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998) diversified
  * retrieval — the standard fix for near-duplicate-saturated top-k: pick
  * items greedily by `λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s)`, so each pick
  * trades relevance against redundancy with what's already selected.
  *
  * The greedy loop is inherently sequential, so the production shape (and
  * this implementation) is TWO-STAGE: a distributed relevance stage streams
  * ALL candidates once and keeps only the top-`pool` by query cosine
  * (TakeOrderedAndProject — per-partition heaps, never a global sort), then
  * the greedy re-rank runs driver-side over that BOUNDED pool (pool ≈ 10·k,
  * a few KB — the same bounded-collect contract as the PQ/IVF model state).
  * Everything is deterministic: cosine is the fixed-order graft_dot fold,
  * ties break on the smaller id, no RNG.
  */
object Mmr {

  /** Greedy MMR over `candidates` for one query vector. Returns
    * (rank, id, relevance, mmr_score) for the `k` selected items. */
  def select(spark: SparkSession, candidates: DataFrame, idCol: String,
             vecCol: String, queryVec: Array[Double], pool: Int, k: Int,
             lambda: Double): DataFrame = {
    require(k >= 1 && pool >= k, s"need pool >= k >= 1, got pool=$pool k=$k")
    require(lambda >= 0 && lambda <= 1, s"lambda must be in [0,1], got $lambda")
    val qn = math.sqrt(queryVec.map(x => x * x).sum)
    require(qn > 0 && !qn.isNaN, "query vector must have a positive finite norm")
    val q = typedLit(queryVec)
    // stage 1 (distributed): relevance top-pool, one pass over candidates.
    // A zero-norm vector would divide by zero (ANSI: error); a
    // NaN-component vector yields a NaN cosine, and NaN sorts ABOVE every
    // real value in a descending order — broken vectors would crowd the
    // pool and poison mmr_score. The when() guard skips the division for
    // non-positive/NaN norms (NaN > 0 is false) and the between() keeps
    // only valid cosines in [-1, 1] (NaN fails any comparison), so callers
    // needn't pre-run embed_norm_audit.
    val rel = candidates
      .select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("_nv", norm(col("v")))
      .withColumn("rel", when(col("_nv") > 0.0,
        dot(col("v"), q) / (col("_nv") * lit(qn))))
      .filter(col("rel").between(-1.000001, 1.000001))
      .orderBy(col("rel").desc, col("id"))
      .limit(pool)
    val poolRows = rel.select("id", "rel", "v").collect().map { r =>
      (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray)
    }
    // stage 2 (driver, bounded): greedy MMR over ≤ pool rows
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    val remaining = scala.collection.mutable.ArrayBuffer(poolRows: _*)
    while (selected.length < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, r, v) =>
        val redundancy =
          if (selected.isEmpty) 0.0
          else selected.map(s => cos(v, poolRows.find(_._1 == s._2).get._3)).max
        (id, r, lambda * r - (1 - lambda) * redundancy)
      }
      val best = scored.minBy { case (id, _, score) => (-score, id) }
      selected += ((selected.length + 1, best._1, best._2, best._3))
      remaining.remove(remaining.indexWhere(_._1 == best._1))
    }
    import spark.implicits._
    selected.toSeq.toDF("rank", "vec_id", "relevance", "mmr_score")
      .select(col("rank"), col("vec_id"),
        (floor((col("relevance")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("relevance"),
        (floor((col("mmr_score")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("mmr_score"))
  }
}
