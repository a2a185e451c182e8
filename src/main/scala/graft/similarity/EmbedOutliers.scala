package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-quality outlier gate: distance-to-label-centroid scoring —
  * the screen a training pipeline runs to drop mis-embedded vectors
  * (encoder failures, wrong-modality rows, corrupted floats) before they
  * poison ANN indexes or dedup thresholds.
  *
  * Bitwise-reproducibility discipline (SURVEY.md §4), applied to float
  * vectors: components quantize to exact integer 1e-6 units first, so the
  * per-(label, dim) centroid sums are order-independent integers; the
  * per-vector score is then a FIXED-ORDER fold over dims of squared
  * diffs against the integer-derived means (doubles, but every operand
  * and the operation order are deterministic), rounded to an integer
  * score. The outlier threshold is the per-label p-quantile of those
  * integer scores rounded to an integer — so the final comparison is
  * exact, the clip_outliers pattern.
  *
  * Scale shape: one posexplode shuffle at (label, dim) cardinality for
  * the centroid sums (map-side partials), centroids collapse to ONE row
  * per label (labels × dim doubles — broadcast), scoring is a pure
  * projection, and the threshold aggregates at label cardinality. No
  * per-label vector collection, no window over the corpus. */
object EmbedOutliers {

  /** @param exactThreshold `true` (default, the oracle-checked face) uses
    *   exact `percentile` for the per-label threshold — its sort-based
    *   buffer grows with the DISTINCT scores per label, fine while any one
    *   label's score set fits an executor. `false` switches to
    *   `approx_percentile` (bounded GK sketch, mergeable partials) — the
    *   100 TB path when single labels carry millions of vectors. The exact
    *   face interpolates between order statistics; the sketch returns an
    *   observed score, so thresholds can differ by at most the gap between
    *   adjacent scores at p.
    * @param maxCentroidCells bounds the BROADCAST centroid frame at
    *   labels × dim doubles (default 12.8M cells ≈ 100 MB boxed — the
    *   200k-label default at the testdata's 64 dims). Unlike `maxLabels`
    *   alone, this cap scales with the embedding dimension: 2k-dim
    *   embeddings trip it at ~6.4k labels. */
  def score(df: DataFrame, idCol: String, vecCol: String, labelCol: String,
            p: Double = 0.95, maxLabels: Long = 200000,
            exactThreshold: Boolean = true,
            maxCentroidCells: Long = 200000L * 64): DataFrame = {
    val base = df.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
      transform(col(vecCol), x => floor((x.cast("double") * 1e6) + lit(0.5)).cast("bigint"))
        .as("qv"))
    // exact integer per-(label, dim) sums — order-independent
    val sums = base.select(col("label"), posexplode(col("qv")).as(Seq("dim", "q")))
      .groupBy("label", "dim").agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
    // one mean array per label, dims in order (label-cardinality agg; the
    // collect_list is made deterministic by the array_sort on dim)
    // The centroid and threshold frames BROADCAST (labels × dim doubles —
    // the ivfPqTopK maxLists shape), so label cardinality is bounded
    // IN-PLAN: a 1-row label count rides a broadcast onto the centroid
    // frame and assert_true fails the job with the knob named before an
    // oversized broadcast is ever built (the blockedSelfPairs guard style —
    // no eager count at plan-build time).
    val nLabels = sums.select(col("label")).distinct()
      .agg(count(lit(1)).as("_nl"))
    val centroids = sums.groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"),
        (col("s").cast("double") / col("n").cast("double")).as("m")))).as("_cm"))
      .select(col("label"), expr("transform(_cm, x -> x.m)").as("cm"))
      .crossJoin(broadcast(nLabels))
      // the cap is labels × dim CELLS, not labels alone (ADVICE r8): a
      // 2k-dim embedding blows the broadcast budget at a label count far
      // under the flat maxLabels default
      .filter(assert_true(
        col("_nl") <= maxLabels && col("_nl") * size(col("cm")) <= maxCentroidCells,
        concat(lit("embed_outliers: "), col("_nl"), lit(" labels × "),
          size(col("cm")),
          lit(s" dims exceed maxLabels=$maxLabels or maxCentroidCells=" +
            s"$maxCentroidCells — the per-label centroid/threshold frames " +
            "broadcast (labels × dim doubles); coarsen the label column or " +
            "raise the caps alongside the broadcast budget"))).isNull)
      .select("label", "cm")
    val scored = base.join(broadcast(centroids), Seq("label"))
      .withColumn("score_q", floor((expr(
        """aggregate(
          |  zip_with(qv, cm, (q, m) -> (CAST(q AS DOUBLE) - m) * (CAST(q AS DOUBLE) - m)),
          |  CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)) + lit(0.5)).cast("bigint"))
      .select("vec_id", "label", "score_q")
    val thrExpr =
      if (exactThreshold) floor((expr(s"percentile(score_q, ${p}D)")) + lit(0.5)).cast("bigint")
      else expr(s"approx_percentile(score_q, ${p}D, 10000)").cast("bigint")
    val thr = scored.groupBy("label").agg(thrExpr.as("_thr"))
    scored.join(broadcast(thr), Seq("label"))
      .select(col("vec_id"), col("label"), col("score_q"),
        (col("score_q") > col("_thr")).as("is_outlier"))
  }
}
