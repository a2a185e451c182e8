package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection.
  *
  * 64-bit SimHash: for each bit j, sum +1/−1 over the tokens' xxhash64 bit j;
  * the sign of the sum is bit j of the fingerprint. Documents within hamming
  * distance `maxHamming` are near-dups.
  *
  * Candidate generation uses the pigeonhole trick: split the 64-bit
  * fingerprint into `maxHamming + 1` chunks — two fingerprints within the
  * hamming budget must agree on at least one chunk, so an equality join per
  * chunk finds every candidate with shuffles only on chunk keys.
  */
object SimHash {

  /** 64-bit simhash over a column of PRE-HASHED tokens (array<bigint>),
    * via the native [[graft.functions.SimHash64Expr]] — one generated
    * bit-vote loop per row, no per-bit fold expressions. */
  def simhashFromHashes(hashed: Column): Column =
    call_function("graft_simhash64", hashed)

  /** 64-bit simhash of a token array column. */
  def simhash64(tokens: Column, seed: Long): Column =
    simhashFromHashes(transform(tokens, t => xxhash64(lit(seed), t)))

  /** Near-dup pairs (id_a, id_b, hamming ≤ maxHamming). */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            maxHamming: Int = 3, seed: Long = 42L): DataFrame = {
    val fp = df
      .select(col(idCol).as("id"),
        transform(split(col(textCol), " "), t => xxhash64(lit(seed), t)).as("_th"))
      .select(col("id"), simhashFromHashes(col("_th")).as("fp"))
    pairsFromFingerprints(fp, "id", "fp", maxHamming)
  }

  /** The pigeonhole candidate join over an EXISTING 64-bit fingerprint
    * column — shared by the text simhash face and any other 64-bit
    * locality hash (e.g. the multimodal perceptual hash): fingerprints
    * within the hamming budget must agree on one of maxHamming+1 chunks,
    * so equality joins on chunk keys find every candidate. */
  def pairsFromFingerprints(df: DataFrame, idCol: String, fpCol: String,
                            maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    // 1L << 64 wraps to 1: the maxHamming=0 single-chunk case must key on
    // the WHOLE fingerprint, not collapse every doc into bucket 0 (results
    // would still verify, but through one all-pairs bucket)
    val chunkMask = if (bitsPer >= 64) -1L else (1L << bitsPer) - 1
    val fp = df.select(col(idCol).as("id"), col(fpCol).as("fp"))

    val chunked = fp.select(col("id"), col("fp"),
        explode(sequence(lit(0), lit(chunks - 1))).as("chunk"))
      .withColumn("ckey",
        expr(s"shiftright(fp, chunk * $bitsPer)").bitwiseAND(chunkMask))
    val left = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("fp").as("fp_a"))
    val right = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("fp").as("fp_b"))
    left.join(right, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      // hamming filter BEFORE the pair-dedup shuffle: far fewer rows travel
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }
}
