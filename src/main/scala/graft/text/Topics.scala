package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus topic mining — the "what IS in this 100 TB crawl" exploratory
  * face: hashed bag-of-words features (the hashing trick: fixed `dim`
  * buckets, no vocabulary collection, no second scan) → deterministic
  * k-means ([[graft.similarity.KMeans]] — scrambled-hash seeds, Lloyd
  * passes with the mergeable native `graft_vec_avg`) → per-cluster top
  * terms as human-readable labels.
  *
  * Scale shape: the token explode is linear and map-side; the feature
  * vector builds in ONE doc-keyed aggregation (bucket counts → map →
  * dense array, order-free); clustering touches only the dim-sized
  * vectors; the labeling pass shuffles (cluster, token) counts with the
  * top-k inside a cluster-partitioned window. The token frame is lazily
  * checkpointed once for its two consumers (features, labels).
  * Deterministic end to end — no RNG, ties break on token order. */
object Topics {

  def mine(df: DataFrame, idCol: String, textCol: String, dim: Int = 64,
           k: Int = 8, iters: Int = 3, topTerms: Int = 5): DataFrame = {
    require(dim >= 2 && k >= 2 && topTerms >= 1, "need dim/k >= 2, topTerms >= 1")
    import org.apache.spark.sql.expressions.Window
    val tokens = df
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .localCheckpoint(eager = false)
    val feats = tokens
      .withColumn("b", pmod(xxhash64(col("tok")), lit(dim.toLong)))
      .groupBy("id", "b").agg(count(lit(1)).as("n"))
      .groupBy("id")
      .agg(map_from_arrays(collect_list(col("b")), collect_list(col("n"))).as("_m"))
      .select(col("id"), expr(
        s"transform(sequence(0L, ${dim - 1}L), i -> " +
          "cast(coalesce(element_at(_m, i), 0L) as double))").as("v"))
    val assigned = graft.similarity.KMeans.assign(feats, "id", "v", k, iters)
      .localCheckpoint(eager = false)
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("cluster").orderBy(col("_n").desc, col("tok"))
    val labels = tokens.join(assigned, "id")
      .groupBy("cluster", "tok").agg(count(lit(1)).as("_n"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topTerms)
      .groupBy("cluster")
      .agg(array_join(expr("transform(array_sort(collect_list(struct(_rn, tok))), " +
        "x -> x.tok)"), " ").as("top_terms"))
    sizes.join(labels, "cluster")
      .select(col("cluster"), col("n_docs"), col("top_terms"))
  }
}
