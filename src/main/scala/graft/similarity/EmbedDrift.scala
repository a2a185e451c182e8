package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-distribution drift: did the encoder (or the corpus) move
  * between two populations? Per label, the cosine between the two
  * populations' centroids plus the largest per-dimension mean shift — the
  * monitor a pipeline runs across encoder versions, ingest batches, or
  * time slices before trusting stored ANN indexes and dedup thresholds
  * against freshly embedded vectors.
  *
  * Determinism: components quantize to integer 1e-6 units (the
  * embed_outliers discipline); the centroid cosine then needs NO per-dim
  * means at all — the 1/n factors cancel, so it is a ratio of exact
  * decimal(38) sums of integer products (order-free, the profile_corr
  * single-pass pattern), cast to double only for the final division. The
  * max per-dim shift uses max (order-free) over per-dim deterministic
  * doubles. 6dp rounds close it out.
  *
  * Scale shape: one (label, half, dim) shuffle with map-side partial sums
  * (dims × labels × 2 rows), one label-keyed rollup. No broadcast, no
  * window, no vector re-join — the corpus streams once. */
object EmbedDrift {

  /** Drift between the even and odd `idCol` halves of `df` (swap in any
    * deterministic population split — batch id, encoder version column). */
  def halfDrift(df: DataFrame, idCol: String, vecCol: String,
                labelCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df.select(col(labelCol).as("label"),
      pmod(col(idCol), lit(2L)).as("half"),
      transform(col(vecCol), x => floor((x.cast("double") * 1e6) + lit(0.5)).cast("bigint"))
        .as("qv"))
    val sums = base
      .select(col("label"), col("half"), posexplode(col("qv")).as(Seq("dim", "q")))
      .groupBy("label", "half", "dim")
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
    val even = sums.filter(col("half") === 0)
      .select(col("label"), col("dim"), col("s").as("se"), col("n").as("ne"))
    val odd = sums.filter(col("half") === 1)
      .select(col("label"), col("dim"), col("s").as("so"), col("n").as("no"))
    // labels observed in only one half have no drift to measure — inner join
    even.join(odd, Seq("label", "dim"))
      .groupBy("label").agg(
        max(col("ne")).as("n_even"), max(col("no")).as("n_odd"),
        sum(dec(col("se")) * dec(col("so"))).as("_d"),
        sum(dec(col("se")) * dec(col("se"))).as("_a"),
        sum(dec(col("so")) * dec(col("so"))).as("_b"),
        max(abs(col("se").cast("double") / col("ne").cast("double")
          - col("so").cast("double") / col("no").cast("double"))).as("_ms"))
      .select(col("label"), col("n_even"), col("n_odd"),
        (floor((col("_d").cast("double")
          / (sqrt(col("_a").cast("double")) * sqrt(col("_b").cast("double")))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("centroid_cos"),
        (floor((col("_ms") / 1e6) * lit(1e6) + lit(0.5)) / lit(1e6)).as("max_dim_shift"))
  }
}
