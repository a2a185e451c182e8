package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH-banding near-duplicate detection.
  *
  * Pipeline (all codegen'd column expressions, no UDFs):
  *   1. shingle the text (word n-grams, distinct);
  *   2. k universal hashes h_i(x) = (a_i·x + b_i) mod p over the shingles'
  *      xxhash64 values; signature_i = min over shingles;
  *   3. group the signature into b bands of r rows; band bucket key =
  *      hash(band values);
  *   4. candidate pairs = equality join on (band, bucket) — the ONLY shuffle
  *      is on bucket keys, never a cross join;
  *   5. verify candidates with exact Jaccard over the shingle sets.
  *
  * All hash constants derive deterministically from the seed, so results are
  * stable across runs and cluster layouts.
  */
object MinHash {

  /** MinHash signature column (array<bigint> of length k) over a
    * hashed-shingle array column: h_i = min over shingles of a keyed
    * splitmix remix of the shingle hash — one native pass over the array
    * ([[graft.functions.MinHashSigExpr]]) instead of k transform+array_min
    * expressions. */
  def signature(shingles: Column, k: Int, seed: Long): Column =
    call_function("graft_minhash", shingles, lit(k), lit(seed))

  /** Near-dup pairs: (id_a, id_b, jaccard) for verified candidates. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            n: Int = 3, k: Int = 32, bands: Int = 8,
            threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val sh = df.select(col(idCol).as("id"), Dedup.shingleHashes(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sigs = sh.withColumn("sig", signature(col("sh"), k, seed))

    // explode into b band buckets: (band, hash(sig slice)) — shuffle key.
    // Only (id, band, bucket) travels through the candidate join; shingle
    // arrays join back AFTER pair dedup so band collisions never replicate
    // the heavy arrays.
    val banded = sigs.select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", hash(col("band"),
        slice(col("sig"), col("band") * r + 1, lit(r))))
      .select("id", "band", "bucket")
    val left = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val right = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val cands = left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    cands
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", Dedup.jaccardHashed(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
