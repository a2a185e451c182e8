package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted fingerprint index for the HAMMING near-dup family
  * (simhash text dedup, perceptual-hash media dedup) — the
  * [[MinHash.writeBandIndex]] incremental-ingest pattern applied to
  * 64-bit fingerprints, closing the family's one missing member: exact
  * dedup has the digest index, Jaccard near-dup the band index, and the
  * hamming family until now only had the recency-horizon stream face —
  * every batch ingest re-scanned the corpus. Media re-encode dedup is
  * exactly where incremental ingest matters (a re-encoded image lands
  * hamming-≤7 of its original, months after the original was indexed).
  *
  * Layout under `path`:
  *   - `keys/` (comb, ckey, fp) — the banding rows of the corpus's
  *     DISTINCT fingerprints under the index's pinned
  *     [[SimHash.FpGeometry]], range-clustered on (comb, ckey) so a
  *     batch probe's equality join scans tight row groups;
  *   - `fps/` (id, fp) — fingerprint membership, the verify/expansion
  *     side AND the regeneration source (keys rebuild from fps by pure
  *     bit math — no text/media rescan, ever);
  *   - `params/` — one row pinning the geometry (regime, maxHamming,
  *     d | maskBits+tables, seed, nAtBuild). The probe keys batches FROM
  *     the index's params, so batch rows can never band differently from
  *     the corpus rows they join against — the band-index params rule.
  *
  * GEOMETRY LIFECYCLE: the regime switch ([[SimHash.adaptiveGeometry]])
  * derives the banding from corpus cardinality, which appends grow.
  * Appends KEEP the pinned geometry (probe correctness requires identical
  * keying); [[rekey]] — run on the compaction cadence — re-derives it
  * from the current count and rebuilds `keys/` from `fps/` when the
  * regime switch would now pick differently. Occupancy between rekeys
  * drifts at most by the append fraction, the same bound the band
  * index's clustering degradation carries between compacts.
  *
  * Concurrency: identical contract to the band index — appenders and
  * maintenance hold the token-fenced heartbeat lease
  * ([[graft.sources.Sources.withSwapLock]]); probes are LOCK-FREE and
  * resolve a mid-publish swap through
  * [[graft.sources.Sources.resolveSwap]]. One caveat is honestly
  * narrower here: a probe racing a [[rekey]] publish may key its batch
  * with the OLD params against the NEW keys table (or vice versa) —
  * that loses candidate RECALL for that one probe, never precision
  * (the hamming verify is exact); callers that need exact-recall probes
  * during maintenance hold the lease around the probe. */
object FingerprintIndex {

  private def maintenanceLock(path: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$path/_maintenance_lock")

  private def resolvedTable(spark: SparkSession, path: String,
                            sub: String): String = {
    val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
    graft.sources.Sources.resolveSwap(
      live.getFileSystem(spark.sparkContext.hadoopConfiguration), live,
      new org.apache.hadoop.fs.Path(s"$path/_${sub}_old")).toString
  }

  private def restoreUnderLock(spark: SparkSession, path: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    for (sub <- Seq("keys", "fps")) {
      val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
      graft.sources.Sources.restoreUnderLock(live.getFileSystem(hconf), live,
        new org.apache.hadoop.fs.Path(s"$path/_${sub}_old"))
    }
  }

  private def writeParams(spark: SparkSession, path: String,
                          g: SimHash.FpGeometry, nAtBuild: Long): Unit = {
    import spark.implicits._
    Seq((g.regime, g.maxHamming, g.d, g.maskBits, g.tables, g.seed, nAtBuild))
      .toDF("regime", "max_hamming", "d", "mask_bits", "tables", "seed", "n_at_build")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  private def readParams(spark: SparkSession, path: String): (SimHash.FpGeometry, Long) = {
    val p = graft.sources.Sources.parquetCached(spark, s"$path/params").collect()(0)
    (SimHash.FpGeometry(p.getAs[String]("regime"), p.getAs[Int]("max_hamming"),
      p.getAs[Int]("d"), p.getAs[Int]("mask_bits"), p.getAs[Int]("tables"),
      p.getAs[Long]("seed")),
      p.getAs[Long]("n_at_build"))
  }

  /** Banding rows (comb, ckey, fp) of a frame's DISTINCT fingerprints
    * under geometry `g` — pure bit math, one narrow projection. */
  private def keyRows(fps: DataFrame, g: SimHash.FpGeometry): DataFrame =
    fps.select("fp").distinct()
      .select(col("fp"), explode(array(g.keyStructs: _*)).as("_ck"))
      .select(col("_ck.comb").as("comb"), col("_ck.ckey").as("ckey"), col("fp"))

  /** Build the index from a corpus of (id, 64-bit fingerprint) rows. The
    * geometry pins to what [[SimHash.adaptiveGeometry]] derives at the
    * CURRENT corpus size (pass `targetOccupancy`/`maxD`/`targetRecall`
    * to match the registered faces' knobs). */
  def write(corpus: DataFrame, idCol: String, fpCol: String, path: String,
            maxHamming: Int = 7, targetOccupancy: Long = 32L, maxD: Int = 3,
            targetRecall: Double = 0.9, seed: Long = 0x517EC0DEL): Unit = {
    val spark = corpus.sparkSession
    // the fp frame feeds the count, the key rows, and the fps write —
    // pin once (the fingerprint computation upstream is often a full
    // tokenize/decode scan)
    val fps = corpus.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .dropDuplicates("id")
      .localCheckpoint(eager = false)
    val n = fps.count()
    val g = SimHash.adaptiveGeometry(n, maxHamming, targetOccupancy, maxD,
      targetRecall, seed)
    graft.sources.Sources.writeClusteredAdaptive(
      keyRows(fps, g), s"$path/keys", Seq("comb", "ckey"))
    fps.write.mode("overwrite").parquet(s"$path/fps")
    // params LAST: a half-built index has no params row, so probes fail
    // loudly on the missing path instead of joining against partial keys
    writeParams(spark, path, g, n)
  }

  /** Fold an ingested batch INTO the index so the NEXT batch's probe sees
    * it. Ids already indexed are dropped (id-guarded, the band-index
    * anti-join discipline: corpus ids are SCANNED and semi-join-reduced
    * by the broadcast batch id set, never shuffled). Only fingerprints
    * NOT yet in the index get new key rows — an appended verbatim copy of
    * an indexed doc adds one fps row and zero keys rows. Write order:
    * keys BEFORE fps — a crash between the two leaves at worst duplicate
    * key rows on retry (absorbed by the probe's candidate dedup), never
    * a fingerprint that is verifiable but unfindable. */
  def append(spark: SparkSession, indexPath: String, batch: DataFrame,
             idCol: String, fpCol: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.Sources.withSwapLock(fs, maintenanceLock(indexPath)) {
      restoreUnderLock(spark, indexPath)
      val (g, _) = readParams(spark, indexPath)
      val bfp = batch.select(col(idCol).as("id"), col(fpCol).as("fp"))
        .dropDuplicates("id")
        .localCheckpoint(eager = false)
      val indexed = graft.sources.Sources.parquetCached(spark, s"$indexPath/fps")
      // novel ids: index side reduced to ≤ batch rows by the broadcast
      // semi join, then the anti join broadcasts too (band-index rule)
      val idHits = indexed.select("id")
        .join(broadcast(bfp.select("id")), Seq("id"), "left_semi")
      val novel = bfp.join(broadcast(idHits), Seq("id"), "left_anti")
        .localCheckpoint(eager = false)
      // novel FINGERPRINTS: only fps absent from the index need key rows
      val fpHits = indexed.select("fp")
        .join(broadcast(novel.select("fp").distinct()), Seq("fp"), "left_semi")
        .distinct()
      val novelFps = novel.select("fp").distinct()
        .join(broadcast(fpHits), Seq("fp"), "left_anti")
      graft.sources.Sources.writeClusteredAdaptive(
        keyRows(novelFps, g), s"$indexPath/keys", Seq("comb", "ckey"),
        mode = "append")
      novel.write.mode("append").parquet(s"$indexPath/fps")
    }
  }

  /** Every near-dup pair TOUCHING the batch — batch-vs-corpus candidates
    * straight off the persisted keys table (the corpus is never
    * re-fingerprinted: its side of the candidate join is the narrow
    * clustered keys scan, its verify side the fps table reduced to
    * candidate fingerprints) plus batch-internal pairs from the same
    * banding. With disjoint batch/corpus ids the result is EXACTLY
    * [[SimHash.pairsFromFingerprintsAdaptive]] at the index's pinned
    * geometry over (corpus ∪ batch), restricted to pairs with at least
    * one batch id (spec-pinned); overlapping ids are the same document
    * (self-pairs drop). Emits (id_a, id_b, hamming), id_a < id_b.
    * `smallBatch` is the band-index ingest contract: batch × keys and
    * the candidate fp set must fit the broadcast budget; pass false for
    * corpus-proportional batches and the hints drop to shuffle joins. */
  /** Verified fingerprint pairs of [[pairsIncremental]], BEFORE its
    * checkpoint pin — factored out (the MinHash.incrementalCandidates
    * pattern) so the plan tripwire can assert the keys probe's scan/join
    * properties, which the checkpoint hides from the final plan. */
  private[graft] def incrementalFpPairs(spark: SparkSession, indexPath: String,
      bkeys: DataFrame, maxHamming: Int, smallBatch: Boolean): DataFrame = {
    val ckeys = graft.sources.Sources.parquetCached(spark,
      resolvedTable(spark, indexPath, "keys"))
    // batch-vs-corpus fingerprint candidates: broadcast batch banding
    // against the clustered corpus keys scan; hamming-filter INSIDE the
    // join stage, BEFORE the pair dedup (the pairsViaGroupKeys rule —
    // the dedup shuffle carries true-radius pairs only)
    val bside = bkeys.select(col("comb"), col("ckey"), col("fp").as("_x"))
    val bc = (if (smallBatch) broadcast(bside) else bside)
      .join(ckeys.select(col("comb"), col("ckey"), col("fp").as("_y")),
        Seq("comb", "ckey"))
      .filter(col("_x") =!= col("_y"))
      .select(least(col("_x"), col("_y")).as("fp_a"),
        greatest(col("_x"), col("_y")).as("fp_b"))
    // batch-internal candidates from the same banding
    val bb = bkeys.select(col("comb"), col("ckey"), col("fp").as("fp_a"))
      .join(bkeys.select(col("comb"), col("ckey"), col("fp").as("fp_b")),
        Seq("comb", "ckey"))
      .filter(col("fp_a") < col("fp_b"))
      .select("fp_a", "fp_b")
    bc.unionByName(bb)
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("fp_a", "fp_b")
  }

  def pairsIncremental(spark: SparkSession, indexPath: String,
                       batch: DataFrame, idCol: String, fpCol: String,
                       smallBatch: Boolean = true): DataFrame = {
    val (g, _) = readParams(spark, indexPath)
    val bfp = batch.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .dropDuplicates("id")
      .localCheckpoint(eager = false)
    val bkeys = keyRows(bfp, g).localCheckpoint(eager = false)
    // fpPairs feeds the expansion joins AND the membership restriction —
    // pin once (the checkpoint hides the keys probe from the final plan,
    // so the PushdownSpec tripwire asserts on incrementalFpPairs directly)
    val fpPairs = incrementalFpPairs(spark, indexPath, bkeys, g.maxHamming,
        smallBatch)
      .localCheckpoint(eager = false)
    // membership lookup, reduced to candidate fps BEFORE the corpus fps
    // table is touched (candidate-sized broadcast semi join — the corpus
    // is scanned, never shuffled). On id overlap either copy serves
    // (same id ⇒ same document); the batch flag is derived from the
    // batch ID SET after the dedup rather than riding the union, so
    // "touches the batch" is deterministic regardless of which copy
    // dropDuplicates kept.
    // batch fps union in unconditionally: a corpus doc sharing a batch
    // doc's EXACT fingerprint has no cross-fp candidate row, yet its
    // membership is what the hamming-0 `within` branch pairs against —
    // without it, a verbatim corpus copy with no hamming-[1,d] neighbor
    // would be unfindable despite being indexed
    val candFps = fpPairs
      .select(explode(array(col("fp_a"), col("fp_b"))).as("fp"))
      .unionByName(bfp.select("fp"))
      .distinct()
    val cfps = graft.sources.Sources.parquetCached(spark,
      resolvedTable(spark, indexPath, "fps"))
    // batch copies tagged _b=true, corpus copies false, then ONE id-keyed
    // aggregation (max(_b), any fp — same id ⇒ same document ⇒ same fp)
    // replaces the old dropDuplicates + batch-id join: one exchange and
    // one stage fewer per probe, and "touches the batch" stays
    // deterministic however the duplicate-id tie used to break.
    val members = bfp.withColumn("_b", lit(true))
      .unionByName(
        cfps.join(if (smallBatch) broadcast(candFps) else candFps,
            Seq("fp"), "left_semi")
          .withColumn("_b", lit(false)))
      .groupBy("id").agg(first(col("fp")).as("fp"), max(col("_b")).as("_b"))
    // cross-fingerprint expansion, restricted to batch-touching pairs
    val cross = fpPairs
      .join(members.select(col("fp").as("fp_a"), col("id").as("_ia"),
        col("_b").as("_ba")), Seq("fp_a"))
      .join(members.select(col("fp").as("fp_b"), col("id").as("_ib"),
        col("_b").as("_bb")), Seq("fp_b"))
      .filter(col("_ba") || col("_bb"))
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"), col("hamming"))
    // within-fingerprint pairs (hamming 0): batch member × any member of
    // the same fingerprint — batch-batch pairs ordered, batch-corpus
    // pairs canonicalized (corpus-corpus pairs are NOT batch-touching)
    val sameFpMembers = members
      .join(if (smallBatch) broadcast(bfp.select("fp").distinct())
            else bfp.select("fp").distinct(), Seq("fp"), "left_semi")
    val within = sameFpMembers.filter(col("_b"))
      .select(col("fp"), col("id").as("_ia"))
      .join(sameFpMembers.select(col("fp"), col("id").as("_ib"),
        col("_b").as("_bb")), Seq("fp"))
      // batch-batch once (ordered); batch-corpus both orders canonicalize
      .filter((col("_bb") && col("_ia") < col("_ib")) || !col("_bb"))
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"),
        lit(0).cast("integer").as("hamming"))
    cross.unionByName(within).dropDuplicates("id_a", "id_b")
  }

  /** Re-cluster the appended-to keys table and compact the fps files —
    * the band-index compaction applied here: per-batch file sets each
    * clustered only within themselves degrade the probe's (comb, ckey)
    * scan, so rewrite through the reconciling backed-up rename swap
    * (concurrent appenders tolerated — their mid-rewrite files are copied
    * across the swap; single-compactor contract). Geometry untouched;
    * run [[rekey]] instead when the corpus has outgrown it. */
  def compact(spark: SparkSession, path: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def swap(sub: String)(write: (Seq[String], String) => Unit): Unit = {
      val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
      val tmp = new org.apache.hadoop.fs.Path(s"$path/_${sub}_compacting")
      val old = new org.apache.hadoop.fs.Path(s"$path/_${sub}_old")
      val fs = live.getFileSystem(hconf)
      val lock = maintenanceLock(path)
      val snapshot = graft.sources.Sources.withSwapLock(fs, lock) {
        graft.sources.Sources.recoverSwap(fs, live, tmp, old)
        graft.sources.Sources.dataFiles(fs, live)
      }
      if (snapshot.isEmpty) return
      write(snapshot.toSeq.map(f => s"$live/$f"), tmp.toString)
      graft.sources.Sources.withSwapLock(fs, lock) {
        graft.sources.Sources.publishSwapReconcile(fs, live, tmp, old, snapshot)
      }
    }
    swap("keys") { (files, out) =>
      graft.sources.Sources.writeClusteredAdaptive(
        spark.read.parquet(files: _*), out, Seq("comb", "ckey"))
    }
    swap("fps") { (files, out) =>
      // id-range clustering sizes the files adaptively AND lets the
      // append path's id anti-join prune row groups
      spark.read.parquet(files: _*)
        .repartitionByRange(col("id")).write.parquet(out)
    }
  }

  /** Re-derive the geometry from the CURRENT corpus size and rebuild
    * `keys/` from `fps/` when the regime switch would now pick a
    * different banding — pure bit math over the persisted fingerprints,
    * no text/media rescan. Runs under the maintenance lease across the
    * keys publish and the params rewrite; lock-free probes racing that
    * window may band with mixed geometry — a RECALL-only race (the
    * hamming verify is exact), documented in the object contract. No-op
    * when the derived geometry equals the pinned one. */
  def rekey(spark: SparkSession, path: String,
            targetOccupancy: Long = 32L, maxD: Int = 3,
            targetRecall: Double = 0.9): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.Sources.withSwapLock(fs, maintenanceLock(path)) {
      restoreUnderLock(spark, path)
      val (g0, _) = readParams(spark, path)
      val fps = spark.read.parquet(s"$path/fps")
      val n = fps.count()
      val g = SimHash.adaptiveGeometry(n, g0.maxHamming, targetOccupancy,
        maxD, targetRecall, g0.seed)
      if (g != g0) {
        val live = new org.apache.hadoop.fs.Path(s"$path/keys")
        val tmp = new org.apache.hadoop.fs.Path(s"$path/_keys_rekeying")
        val old = new org.apache.hadoop.fs.Path(s"$path/_keys_old")
        graft.sources.Sources.recoverSwap(fs, live, tmp, old)
        graft.sources.Sources.writeClusteredAdaptive(
          keyRows(fps, g), tmp.toString, Seq("comb", "ckey"))
        graft.sources.Sources.publishSwap(fs, live, tmp, old)
        writeParams(spark, path, g, n)
      } else writeParams(spark, path, g0, n) // refresh nAtBuild only
    }
  }
}
