package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators.
  *
  * Exact dedup is a hash-groupBy (one shuffle on the content hash, map-side
  * partial aggregation). Near-dup variants never do an unblocked cross join:
  * candidate pairs come from equality joins on blocking keys (source, LSH
  * band buckets, …) so the shuffle is on the blocking key and each join is
  * bucket-local — the only shape that survives 100 TB.
  */
object Dedup {

  /** Exact duplicate groups keyed by md5(text): group hash, group size, and
    * the kept (minimum) id. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** Word n-gram shingles of `text` (distinct, SORTED), as an array column.
    * Documents shorter than n tokens yield an empty array. Sorting once per
    * document lets every pairwise comparison use the allocation-free sorted
    * merge instead of a hash-set intersect. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      sort_array(array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))))
  }

  /** Jaccard similarity of two SORTED distinct-element string arrays:
    * |A∩B| / (|A| + |B| − |A∩B|) with the intersection counted by the
    * native sorted-merge expression ([[graft.functions.SortedIntersectSizeExpr]]).
    * Requires GraftFunctions.register on the session (graft.Tables does). */
  def jaccard(a: Column, b: Column): Column = {
    val i = call_function("graft_sorted_intersect_size", a, b).cast("bigint")
    i.cast("double") / (size(a).cast("bigint") + size(b).cast("bigint") - i)
  }

  /** Shingles as SORTED distinct xxhash64 values (array<bigint>). 8 bytes
    * per shingle instead of a ~20-byte string — pair joins shuffle 60%
    * less and the merge compares longs. Set sizes (and thus Jaccard) equal
    * the string-shingle version up to a ~2⁻⁶⁴ collision probability.
    * Computed by the native [[graft.functions.ShingleHashesExpr]] — one
    * zero-allocation byte scan per document, bitwise-identical to the
    * composed split/slice/concat_ws/xxhash64 form it replaced but ~20×
    * faster (the composed lambda ran interpreted and allocated a token
    * array, n-token slices, and a joined string per window). */
  def shingleHashes(text: Column, n: Int): Column =
    call_function("graft_shingle_hashes", text, lit(n))

  /** Jaccard over sorted hashed-shingle arrays (array<bigint>). */
  def jaccardHashed(a: Column, b: Column): Column = {
    val i = call_function("graft_sorted_intersect_size_l", a, b).cast("bigint")
    i.cast("double") / (size(a).cast("bigint") + size(b).cast("bigint") - i)
  }

  /** N-gram Jaccard near-dup pairs, blocked by `blockCol` (pairs are only
    * compared within a block — the shuffle key is the block, never a global
    * cross join). Emits id pairs (a < b) with similarity ≥ `threshold`. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, blockCol: String,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      shingleHashes(col(textCol), n).as("sh"))
    val a = sh.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardHashed(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
