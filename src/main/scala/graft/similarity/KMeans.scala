package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.toDouble

/** Deterministic full-vector k-means (Lloyd), the clustering face of the
  * embedding toolkit — corpus partitioning, semantic sharding, coarse-index
  * training all reduce to this primitive. Same discipline as [[Pq]]'s
  * per-subspace codebooks:
  *
  *   - init: the k vectors with the lowest `xxhash64(id)` (no RNG —
  *     reproducible across runs and partitionings; hash order rather than
  *     id order because adjacent ids are often near-duplicates, and an
  *     id-ordered seed would start Lloyd with k copies of the same
  *     neighborhood — the same diversity argument as [[Pq]]'s codebook
  *     seeding);
  *   - assign: argmin over k centroids as ONE data-driven codegen loop
  *     ([[graft.functions.ArgminSqDistExpr]] — the matrix is a reference
  *     object, so generated code is constant-size at any k) — a pure
  *     whole-stage-codegen projection, no shuffle, no broadcast join;
  *   - update: per-cluster mean via the mergeable `graft_vec_avg`
  *     aggregate — map-side partials, shuffle carries executors × k tiny
  *     rows; centroids are k·dim doubles of driver state (KBs).
  *
  * Each iteration is ONE distributed pass; empty clusters keep their
  * previous centroid. 100 TB shape: iterations scale with data scan cost
  * only — driver state and shuffle volume are model-sized.
  */
object KMeans {

  /** 0-based id of the nearest centroid (first index achieving the min —
    * deterministic under distance ties). One data-driven codegen loop
    * ([[graft.functions.ArgminSqDistExpr]] — the centroid matrix is a
    * reference object, so generated code stays constant-size at ANY k;
    * the old k-literal expression tree blew the JVM 64 KB method limit
    * near k ≈ 250 × dim 64 and silently fell back to interpreted eval).
    * Bitwise-identical assignments to that tree — same left-to-right
    * sums, same first-min tie-break. `private[similarity]` so
    * [[AnnIndex.retrain]] can assign with the SAME centroids it just
    * fitted (assign() refits internally, which would double the Lloyd
    * passes and could drift from the persisted model). */
  private[similarity] def assignCol(v: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.ArgminSqDistExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(v), centroids))

  /** Lloyd passes over a pre-built (id, v) frame — the shared core of
    * [[assign]] and [[fitCentroids]]. The caller owns the checkpoint. */
  private def fitOn(base: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    // deterministic, diversity-preserving seed: the k lowest-HASH vectors
    // (TakeOrderedAndProject — scale-safe, no global sort materializes)
    var centroids: Array[Array[Double]] = base
      .orderBy(xxhash64(col("id")), col("id")).limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    require(centroids.length == k,
      s"need at least k=$k rows to seed k-means, got ${centroids.length}")
    for (_ <- 0 until iters) {
      val updated = base
        .groupBy(assignCol(col("v"), centroids).as("c"))
        .agg(call_function("graft_vec_avg", col("v")).as("cv"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty clusters keep their previous centroid
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** Train centroids only (k·dim doubles of driver state) — the coarse-
    * quantizer entry for operators that need the MODEL rather than the
    * assignment (e.g. [[AnnIvf.selfPairs]]'s list structure). Identical
    * seeding/update schedule to [[assign]]. */
  def fitCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
                   iters: Int = 3): Array[Array[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val base = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .localCheckpoint()
    fitOn(base, k, iters)
  }

  /** Cluster `df` into `k` groups; returns (idCol, cluster) for every row.
    * `iters` full Lloyd passes over the data. */
  def assign(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val base = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      // several Lloyd passes + the final assignment re-read this frame;
      // localCheckpoint materializes it once instead of re-running the
      // caller's arbitrary upstream lineage every iteration
      .localCheckpoint()
    val centroids = fitOn(base, k, iters)
    base.select(col("id").as(idCol), assignCol(col("v"), centroids).as("cluster"))
  }
}
