package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The (id, sorted-hashed-shingles) frame every MinHash face starts
    * from. Package-visible for the PushdownSpec plan tripwires. */
  private[graft] def shingleFrame(df: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame =
    df.select(col(idCol).as("id"), Dedup.shingleHashes(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Explode a (id, sh) frame into its b band-bucket rows (id, band,
    * bucket) — the ONLY columns that travel through any candidate join. */
  private def bandBuckets(sh: DataFrame, k: Int, bands: Int,
                          seed: Long): DataFrame = {
    val r = k / bands
    sh.withColumn("sig", signature(col("sh"), k, seed))
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bucket", hash(col("band"),
        slice(col("sig"), col("band") * r + 1, lit(r))))
      .select("id", "band", "bucket")
  }

  /** Near-dup pairs: (id_a, id_b, jaccard) for verified candidates. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            n: Int = 3, k: Int = 32, bands: Int = 8,
            threshold: Double = 0.5, seed: Long = 42L): DataFrame =
    // lazy-checkpoint: the shingle frame feeds the band buckets AND both
    // verify joins (the jaccardPairs rule) — tokenize the corpus once
    pairsFromShingles(shingleFrame(df, idCol, textCol, n)
      .localCheckpoint(eager = false), k, bands, threshold, seed)

  /** [[pairs]] over a PRE-BUILT (id, sh) shingle frame — lets a face that
    * runs several shingle-based generators (dedup_recall: this AND the
    * exact prefix-filter) share ONE tokenize+hash scan. The caller owns
    * the checkpoint. */
  def pairsFromShingles(sh: DataFrame, k: Int = 32, bands: Int = 8,
                        threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    // candidate pairs = equality join on (band, bucket); shingle arrays
    // join back AFTER pair dedup so band collisions never replicate the
    // heavy arrays
    val banded = bandBuckets(sh, k, bands, seed)
    val left = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val right = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    // shuffle_hash: band buckets are duplicate-heavy keys (occupancy is
    // the point) — sort-merge pays ~300ns per enumerated candidate there
    // (the SimHash.pairsFromFingerprintsBlocked measurement); the build
    // side is the narrow banded frame
    val cands = left.join(right.hint("shuffle_hash"), Seq("band", "bucket"))
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

  /** Persist the corpus-side MinHash index ONCE so batch ingest never
    * rescans the corpus — the near-dup analogue of [[Dedup.incremental]]
    * (which is exact-digest only) and the dedup_labels / ann_index
    * persist-once pattern applied to LSH banding. Three tables under
    * `path`:
    *   - `buckets/` (id, band, bucket) — corpus_rows × bands narrow rows,
    *     range-clustered on (band, bucket) so a batch probe's equality
    *     join scans tight row groups;
    *   - `shingles/` (id, sh) — one sorted-hash array per doc for the
    *     exact Jaccard verify (the text itself never persists);
    *   - `params/` — one row (n, k, bands, threshold, seed). The probe
    *     side reads its parameters FROM the index, so batch signatures
    *     can never drift from the corpus signatures they join against.
    * Index size: corpus_rows × (bands + 1) rows + shingle arrays — see
    * docs/SCALE_BOUNDS.md. */
  def writeBandIndex(corpus: DataFrame, idCol: String, textCol: String,
                     path: String, n: Int = 3, k: Int = 32, bands: Int = 8,
                     threshold: Double = 0.5, seed: Long = 42L): Unit = {
    require(k % bands == 0, "k must be divisible by bands")
    // lazy-checkpoint: the shingle scan feeds both the bucket write and
    // the shingle write; without the pin the corpus tokenizes twice
    val sh = shingleFrame(corpus, idCol, textCol, n).localCheckpoint(eager = false)
    graft.sources.Sources.writeClusteredAdaptive(
      bandBuckets(sh, k, bands, seed), s"$path/buckets",
      Seq("band", "bucket"))
    sh.write.mode("overwrite").parquet(s"$path/shingles")
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((n, k, bands, threshold, seed))
      .toDF("n", "k", "bands", "threshold", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** NON-MUTATING reader-side swap resolution for an index table: the
    * path to read now — the live table, or its `_old` backup while a
    * [[compactBandIndex]] publish is in flight (or crashed mid-swap).
    * Probes call this instead of restoring: a probe-issued restore could
    * re-occupy the live path inside a concurrent publisher's rename
    * window and corrupt the publish (cheap namenode existence checks). */
  private def resolvedTable(spark: SparkSession, path: String,
                            sub: String): String = {
    val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
    graft.sources.Sources.resolveSwap(
      live.getFileSystem(spark.sparkContext.hadoopConfiguration), live,
      new org.apache.hadoop.fs.Path(s"$path/_${sub}_old")).toString
  }

  /** One maintenance lease per index root
    * ([[graft.sources.Sources.withSwapLock]]): held by the appender across
    * its buckets+shingles writes and by the compactor across each table's
    * snapshot and publish windows — real mutual exclusion instead of the
    * old grace-period guess. */
  private def maintenanceLock(path: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$path/_maintenance_lock")

  /** APPENDER-side guard — call only while HOLDING the maintenance lease:
    * a missing live table with a backup present can only be a crashed
    * compact publish (no publisher can be mid-window under the lease), so
    * restore immediately. */
  private def restoreIndexUnderLock(spark: SparkSession, path: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    for (sub <- Seq("buckets", "shingles")) {
      val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
      graft.sources.Sources.restoreUnderLock(live.getFileSystem(hconf), live,
        new org.apache.hadoop.fs.Path(s"$path/_${sub}_old"))
    }
  }

  /** Fold an ingested batch INTO the persisted band index so the NEXT
    * batch's probe sees it — the second half of the ingest loop whose
    * first half is [[pairsIncremental]] (probe, then append: the
    * ann_refresh append-in-place pattern applied to the LSH band index).
    * Batch signatures are computed with the index's OWN params row, so
    * appended rows can never drift from the corpus rows later probes join
    * them against. Ids already indexed are dropped by an anti-join guard
    * keyed on the shingles table, and buckets write BEFORE shingles: a
    * crash between the two writes leaves at worst duplicate bucket rows on
    * retry, which the probe's candidate `dropDuplicates` absorbs — never a
    * doc that is verifiable but unfindable (the shingles-first failure
    * mode). A fully completed re-append of the same batch is a no-op on
    * both tables. Appended bucket rows are range-clustered WITHIN each
    * batch's files; (band, bucket) clustering across the whole index
    * degrades as batches accumulate, so run [[compactBandIndex]] on the
    * ordinary parquet-compaction cadence. Cost: batch_rows × bands bucket
    * rows + batch shingle arrays + one id anti-join against the index —
    * never a corpus rescan. */
  def appendToBandIndex(spark: SparkSession, indexPath: String,
                        batch: DataFrame, idCol: String,
                        textCol: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.Sources.withSwapLock(fs, maintenanceLock(indexPath)) {
      restoreIndexUnderLock(spark, indexPath)
      val p = graft.sources.Sources.parquetCached(spark, s"$indexPath/params")
        .collect()(0)
      val (n, k, bands) = (p.getAs[Int]("n"), p.getAs[Int]("k"), p.getAs[Int]("bands"))
      val seed = p.getAs[Long]("seed")
      val indexed = graft.sources.Sources
        .parquetCached(spark, s"$indexPath/shingles").select("id")
      val bsh = shingleFrame(batch, idCol, textCol, n)
        .localCheckpoint(eager = false)
      // novel batch docs only. Corpus ids are scanned, never shuffled: the
      // batch id set broadcasts into a semi join that reduces the index
      // side to `hits` (≤ batch rows), and the anti join against hits
      // broadcasts too — a direct left_anti against the index would
      // shuffle corpus_rows ids on every batch. Pin once — novel feeds
      // both appends.
      val hits = indexed.join(broadcast(bsh.select("id")), Seq("id"), "left_semi")
      // dropDuplicates: an intra-batch repeated id must land ONCE (the
      // anti-join only guards against ids already indexed)
      val novel = bsh.join(broadcast(hits), Seq("id"), "left_anti")
        .dropDuplicates("id")
        .localCheckpoint(eager = false)
      graft.sources.Sources.writeClusteredAdaptive(
        bandBuckets(novel, k, bands, seed), s"$indexPath/buckets",
        Seq("band", "bucket"), mode = "append")
      novel.write.mode("append").parquet(s"$indexPath/shingles")
    }
  }

  /** Re-cluster an appended-to band index: after many [[appendToBandIndex]]
    * batches the bucket table is a pile of per-batch file sets, each
    * clustered only within itself, so a probe's (band, bucket) equality
    * join touches every batch's files. Compaction rewrites the EXISTING
    * rows — no re-shingling, no re-hashing, params untouched —
    * range-clustered on (band, bucket) across the whole index again, and
    * compacts the shingle files to the same partition target. Each table
    * rewrites into a sibling temp dir and publishes through the
    * backed-up rename swap ([[graft.sources.Sources.publishSwap]] after
    * its `recoverSwap` — atomic renames on HDFS/local; on S3-style
    * stores run the swap under a Delta/Iceberg transaction): any single
    * crash leaves AT WORST the old clustering live and the next compact
    * recovers and redoes it — never a window with no live copy. Run on
    * the ordinary parquet-compaction cadence (docs/SCALE_BOUNDS.md). */
  def compactBandIndex(spark: SparkSession, path: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    // each table rewrites a FILE-LIST SNAPSHOT and publishes through the
    // reconciling swap: a streaming appendToBandIndex micro-batch landing
    // mid-rewrite is copied across the swap instead of silently deleted
    // (concurrent APPENDERS tolerated; concurrent compactors excluded —
    // single-compactor contract)
    def swap(sub: String)(write: (Seq[String], String) => Unit): Unit = {
      val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
      val tmp = new org.apache.hadoop.fs.Path(s"$path/_${sub}_compacting")
      val old = new org.apache.hadoop.fs.Path(s"$path/_${sub}_old")
      val fs = live.getFileSystem(hconf)
      val lock = maintenanceLock(path)
      // lease scope 1: recovery + snapshot; released during the rewrite
      // so appends flow (they become reconciled late files); scope 2: the
      // publish window — no append can recreate the table mid-rename
      val snapshot = graft.sources.Sources.withSwapLock(fs, lock) {
        graft.sources.Sources.recoverSwap(fs, live, tmp, old)
        graft.sources.Sources.dataFiles(fs, live)
      }
      if (snapshot.isEmpty) return // empty table: nothing to compact
      write(snapshot.toSeq.map(f => s"$live/$f"), tmp.toString)
      graft.sources.Sources.withSwapLock(fs, lock) {
        graft.sources.Sources.publishSwapReconcile(fs, live, tmp, old, snapshot)
      }
    }
    swap("buckets") { (files, out) =>
      graft.sources.Sources.writeClusteredAdaptive(
        spark.read.parquet(files: _*), out, Seq("band", "bucket"))
    }
    swap("shingles") { (files, out) =>
      // id-range clustering sizes the files adaptively AND lets the
      // probe's candidate-id semi join prune row groups
      spark.read.parquet(files: _*)
        .repartitionByRange(col("id")).write.parquet(out)
    }
  }

  /** Re-derive `buckets/` from the persisted `shingles/` for a NEW banding
    * dial — the [[FingerprintIndex.rekey]] / AnnIndex.retrain analogue for
    * the LSH band index: a user moving the near-dup recall target (more
    * bands ⇒ lower effective Jaccard knee s* ≈ (1/b)^(1/r)) re-bands
    * WITHOUT re-shingling the corpus. Pure hash math over the persisted
    * (id, sh) arrays — the signature, banding and bucket keys all derive
    * from `sh`, so k, bands, seed AND the verify threshold can all change;
    * the shingle width `n` CANNOT (that needs the text, which never
    * persists — rebuild with [[writeBandIndex]]). A threshold-only change
    * skips the bucket rewrite entirely (threshold is verify-time; buckets
    * don't depend on it) and rewrites just the params row. Runs under the
    * maintenance lease across snapshot, publish and params rewrite
    * (appenders blocked for the duration); lock-free probes racing the
    * window may band a batch with mixed geometry — a RECALL-only race (the
    * Jaccard verify is exact), the [[FingerprintIndex.rekey]] contract. A
    * crash after the buckets publish but before the params rewrite leaves
    * probes in that same recall-only state; re-running with the same dial
    * converges (params still read as the old dial, so the rebuild redoes
    * and the params rewrite completes). No-op when the dial equals the
    * pinned one. */
  def rebandIndex(spark: SparkSession, path: String, k: Int = 32,
                  bands: Int = 8, threshold: Double = 0.5,
                  seed: Long = 42L): Unit = {
    require(k % bands == 0, "k must be divisible by bands")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.Sources.withSwapLock(fs, maintenanceLock(path)) {
      restoreIndexUnderLock(spark, path)
      val p = spark.read.parquet(s"$path/params").collect()(0)
      val sameBanding = p.getAs[Int]("k") == k &&
        p.getAs[Int]("bands") == bands && p.getAs[Long]("seed") == seed
      if (!(sameBanding && p.getAs[Double]("threshold") == threshold)) {
        if (!sameBanding) {
          val live = new org.apache.hadoop.fs.Path(s"$path/buckets")
          val tmp = new org.apache.hadoop.fs.Path(s"$path/_buckets_rebanding")
          val old = new org.apache.hadoop.fs.Path(s"$path/_buckets_old")
          graft.sources.Sources.recoverSwap(fs, live, tmp, old)
          graft.sources.Sources.writeClusteredAdaptive(
            bandBuckets(spark.read.parquet(s"$path/shingles"), k, bands, seed),
            tmp.toString, Seq("band", "bucket"))
          graft.sources.Sources.publishSwap(fs, live, tmp, old)
        }
        import spark.implicits._
        Seq((p.getAs[Int]("n"), k, bands, threshold, seed))
          .toDF("n", "k", "bands", "threshold", "seed")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
      }
    }
  }

  /** Candidate (id_a, id_b) pairs for [[pairsIncremental]], BEFORE its
    * checkpoint pin — factored out so the plan tripwire can assert the
    * bucket probe's scan/join properties, which the checkpoint hides from
    * the final plan. Batch-vs-corpus candidates are an equality join on
    * (band, bucket) against the persisted narrow table; batch-internal
    * candidates the usual banded self-join; canonicalized and deduped
    * BEFORE the heavy verify — a batch pair whose ids are also indexed
    * would otherwise verify twice. The batch banding (batch_rows × bands
    * narrow rows) broadcasts EXPLICITLY: pre-materialization Catalyst has
    * no size estimate for the checkpointed batch and would default the
    * probe to a sort-merge join that shuffles the corpus bucket table —
    * the hint pins the corpus side to a pure scan. Batch × bands must
    * therefore fit the broadcast budget; that IS the operator's sizing
    * contract (split oversized ingest batches). */
  private[graft] def incrementalCandidates(spark: SparkSession,
      indexPath: String, bsh: DataFrame, k: Int, bands: Int,
      seed: Long, smallBatch: Boolean = true): DataFrame = {
    val bban = bandBuckets(bsh, k, bands, seed)
    val cban = graft.sources.Sources.parquetCached(spark,
      resolvedTable(spark, indexPath, "buckets"))
    val bside = bban.select(col("band"), col("bucket"), col("id").as("_x"))
    val bc = (if (smallBatch) broadcast(bside) else bside)
      .join(cban.select(col("band"), col("bucket"), col("id").as("_y")),
        Seq("band", "bucket"))
      .filter(col("_x") =!= col("_y"))
      .select(least(col("_x"), col("_y")).as("id_a"),
        greatest(col("_x"), col("_y")).as("id_b"))
    val bb = bban.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(bban.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    bc.union(bb).dropDuplicates("id_a", "id_b")
  }

  /** Incremental NEAR-dup: every verified near-duplicate pair TOUCHING the
    * batch — batch-vs-corpus pairs straight off the persisted band index
    * (no corpus rescan: the corpus side of the candidate join is the
    * buckets table, the verify side the shingles table) plus batch-internal
    * pairs from the same banding. With disjoint batch/corpus ids the
    * result is exactly [[pairs]] over (corpus ∪ batch) restricted to pairs
    * with at least one batch id (spec-pinned); overlapping ids are treated
    * as the same document (self-pairs drop). Emits (id_a, id_b, jaccard),
    * id_a < id_b. With `smallBatch=true` (the ingest contract — batch ×
    * bands and the candidate-id set must fit the broadcast budget), every
    * shuffle and broadcast in the plan is batch- or candidate-sized: the
    * corpus bucket and shingle tables are only ever SCANNED (buckets:
    * narrow clustered rows against the broadcast batch banding; shingles:
    * semi-join-reduced to candidate ids by a broadcast before the verify
    * join touches them). Pass `smallBatch=false` for a CORPUS-PROPORTIONAL
    * batch (e.g. re-probing a whole source): the hints drop and Catalyst
    * falls back to shuffle joins that degrade gracefully instead of
    * overflowing a forced broadcast. */
  def pairsIncremental(spark: SparkSession, indexPath: String,
                       batch: DataFrame, idCol: String,
                       textCol: String,
                       smallBatch: Boolean = true): DataFrame = {
    val p = graft.sources.Sources.parquetCached(spark, s"$indexPath/params")
      .collect()(0)
    val (n, k, bands) = (p.getAs[Int]("n"), p.getAs[Int]("k"), p.getAs[Int]("bands"))
    val (threshold, seed) = (p.getAs[Double]("threshold"), p.getAs[Long]("seed"))
    // batch shingles feed the banding AND both verify sides — pin once
    val bsh = shingleFrame(batch, idCol, textCol, n).localCheckpoint(eager = false)
    val csh = graft.sources.Sources.parquetCached(spark,
      resolvedTable(spark, indexPath, "shingles"))
    // cands feeds the verify joins AND the lookup restriction — pin once
    // (the checkpoint hides the bucket probe from the final plan, so the
    // PushdownSpec tripwire asserts on incrementalCandidates directly)
    val cands = incrementalCandidates(spark, indexPath, bsh, k, bands, seed,
        smallBatch)
      .localCheckpoint(eager = false)
    // verify lookup: on id overlap either copy serves (same text, same
    // hash family ⇒ identical arrays). The corpus shingle table is
    // semi-join-REDUCED to candidate ids before anything touches it:
    // candIds is candidate-sized (every candidate touches the batch), so
    // the semi join broadcasts it and the corpus side is scanned, never
    // shuffled — the naive `bsh ∪ csh dropDuplicates` would shuffle
    // corpus_rows shingle arrays on every batch.
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val lookup = bsh
      .unionByName(csh.join(
        if (smallBatch) broadcast(candIds) else candIds, Seq("id"), "left_semi"))
      .dropDuplicates("id")
    cands
      .join(lookup.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(lookup.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", Dedup.jaccardHashed(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
