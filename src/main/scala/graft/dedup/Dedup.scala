package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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

  /** Incremental ingest dedup: keep only the batch rows whose content is
    * NOT already in the corpus. A Bloom sketch of the corpus digests
    * short-circuits the overwhelmingly-novel majority before any shuffle;
    * only sketch hits — true duplicates plus the fpp sliver — pay the
    * exact digest anti-join. The corpus side ships only digests
    * (32 B/doc), never payloads. `expectedCorpusKeys` sizes the sketch;
    * overshooting costs memory, undershooting only raises the
    * false-positive (= needless-verify) rate, never correctness.
    *
    * `smallBatch` is an EXPLICIT opt-in to the small-ingest contract
    * ([[graft.operators.BloomPrune.antiJoinSmallProbe]]: the batch's
    * sketch-hit keys BROADCAST and the corpus digest column is scanned
    * into the sketch and the semi-reduction, never shuffled) — the
    * fastest plan for the per-batch ingest loop, but a forced broadcast
    * that overflows on a corpus-proportional batch. The DEFAULT is the
    * gracefully-degrading shuffle anti-join
    * ([[graft.operators.BloomPrune.antiJoin]]): callers that satisfy the
    * bounded-batch contract opt in, instead of every caller silently
    * inheriting a driver-OOM risk. */
  def incremental(batch: DataFrame, corpus: DataFrame, idCol: String,
                  textCol: String, expectedCorpusKeys: Long = 1000000L,
                  smallBatch: Boolean = false): DataFrame = {
    val b = batch.select(col(idCol), sha2(col(textCol), 256).as("digest"))
    val c = corpus.select(sha2(col(textCol), 256).as("digest"))
    (if (smallBatch)
      graft.operators.BloomPrune.antiJoinSmallProbe(
        b, "digest", c, "digest", expectedCorpusKeys)
    else
      graft.operators.BloomPrune.antiJoin(
        b, "digest", c, "digest", expectedCorpusKeys))
      .select(col(idCol), col("digest"))
  }

  /** Persist the exact-digest corpus index ONCE so [[incremental]]'s
    * per-batch work drops its corpus scans entirely — the exact-dup
    * member of the persisted-ingest-index family (band index for
    * near-dup, IVF layout for ANN). Two tables + one binary under `path`:
    *   - `digests/` — the corpus's DISTINCT sha-256 digests (32 B/doc),
    *     the exact-verify side; document payloads never persist;
    *   - `bloom/sketch` — a serialized Bloom sketch of those digests,
    *     loaded driver-side (MBs) and broadcast per probe;
    *   - `params/` — one row (expected_keys, fpp), so appends keep
    *     building sketch-compatible batch blooms.
    * INVARIANT maintained by [[appendToDigestIndex]]: the sketch is
    * always a SUPERSET of the digest table (supersets only cost needless
    * verifies; a missing key would be a silent false "novel"). */
  def writeDigestIndex(corpus: DataFrame, textCol: String, path: String,
                       expectedKeys: Long = 1000000L,
                       fpp: Double = 0.01): Unit = {
    val spark = corpus.sparkSession
    // the one corpus-sized job, paid once at build (like writeBandIndex)
    val d = corpus.select(sha2(col(textCol), 256).as("digest")).distinct()
      .localCheckpoint(eager = false)
    d.write.mode("overwrite").parquet(s"$path/digests")
    writeBloom(spark, s"$path/bloom",
      d.stat.bloomFilter("digest", expectedKeys, fpp))
    import spark.implicits._
    Seq((expectedKeys, fpp)).toDF("expected_keys", "fpp")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** [[incremental]] against the PERSISTED digest index: per batch, the
    * sketch loads driver-side (MBs — no corpus job at all), certainly-novel
    * rows short-circuit, and only sketch hits verify against the digest
    * table via the broadcast-reduced anti join
    * ([[graft.operators.BloomPrune.antiJoinSmallProbe]] — the digest scan
    * is semi-reduced by the broadcast hit keys, never shuffled). Emits the
    * batch's novel (id, digest) rows, exactly [[incremental]]'s contract. */
  def incrementalIndexed(spark: SparkSession, indexPath: String,
                         batch: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    // NON-MUTATING reader-side swap resolution: if a compact is mid-swap
    // (or crashed mid-swap), read the _old backup in place — a
    // reader-issued restore could re-occupy `digests` inside a live
    // publisher's rename window and corrupt the publish
    val live = new org.apache.hadoop.fs.Path(s"$indexPath/digests")
    val digPath = graft.sources.Sources.resolveSwap(
      live.getFileSystem(spark.sparkContext.hadoopConfiguration), live,
      new org.apache.hadoop.fs.Path(s"$indexPath/_digests_old"))
    val b = batch.select(col(idCol), sha2(col(textCol), 256).as("digest"))
    val corpus = spark.read.parquet(digPath.toString)
    graft.operators.BloomPrune.antiJoinSmallProbe(
        b, "digest", corpus, "digest", readBloom(spark, s"$indexPath/bloom"))
      .select(col(idCol), col("digest"))
  }

  /** Fold a probed batch INTO the digest index so the next batch sees it.
    * Write order maintains the superset invariant under a mid-append
    * crash: the MERGED sketch (old ∪ batch digests, built with the
    * index's own params so the merge is size-compatible) lands FIRST via
    * a temp-file + rename swap, then the batch's novel digests append to
    * the table. A crash between the two leaves a sketch with keys the
    * table lacks — those cost one needless verify each and the retried
    * append re-lands them; the reverse order could leave table keys the
    * sketch misses, i.e. silent false "novel"s. Re-appending a completed
    * batch is a no-op on the table (novelty filter) and idempotent on the
    * sketch (bloom insertion is). */
  def appendToDigestIndex(spark: SparkSession, indexPath: String,
                          batch: DataFrame, idCol: String,
                          textCol: String): Unit =
    // EAGER checkpoint: the probe must materialize NOW, not lazily inside
    // the later digests-append action, which reads the same path it
    // writes (self-read-write) and would run after the sketch swap
    appendNovelToDigestIndex(spark, indexPath,
      incrementalIndexed(spark, indexPath, batch, idCol, textCol)
        .localCheckpoint())

  /** Fold an ALREADY-PROBED batch into the index: `novel` must be
    * [[incrementalIndexed]]'s output for the batch, MATERIALIZED (pass a
    * checkpointed frame — it is read twice here, and the table append
    * reads the path the probe scanned). The streaming face probes once
    * and hands the frame straight here instead of re-probing. Merging
    * only the NOVEL digests into the sketch preserves the superset
    * invariant — a batch digest that was a dup is already in the table,
    * hence already in the sketch. The digest append is `distinct()`-ed:
    * an intra-batch repeated text yields several novel ROWS (correct for
    * the caller) but must land ONE table digest. */
  def appendNovelToDigestIndex(spark: SparkSession, indexPath: String,
                               novel: DataFrame): Unit = {
    // all-dup batch (e.g. a re-append): nothing to fold — and Spark's
    // bloomFilter aggregate NPEs on zero rows, so the guard is required
    if (novel.isEmpty) return
    val p = spark.read.parquet(s"$indexPath/params").collect()(0)
    val (expectedKeys, fpp) = (p.getAs[Long]("expected_keys"), p.getAs[Double]("fpp"))
    val merged = readBloom(spark, s"$indexPath/bloom")
    merged.mergeInPlace(
      novel.select("digest").stat.bloomFilter("digest", expectedKeys, fpp))
    writeBloom(spark, s"$indexPath/bloom", merged)
    // MUTUAL EXCLUSION with the compactor's publish window: the append
    // holds the index's maintenance lease for the duration of its write,
    // so it can never recreate `digests` between the compactor's two
    // renames (and a slow reconcile can never make the appender restore
    // the backup mid-publish — the old grace-period failure pair). A
    // missing live table under the lease is a CRASHED publish: restore
    // immediately, no timeout guessing.
    val live = new org.apache.hadoop.fs.Path(s"$indexPath/digests")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.Sources.withSwapLock(fs, maintenanceLock(indexPath)) {
      graft.sources.Sources.restoreUnderLock(fs, live,
        new org.apache.hadoop.fs.Path(s"$indexPath/_digests_old"))
      novel.select("digest").distinct()
        .write.mode("append").parquet(s"$indexPath/digests")
    }
  }

  /** One lease per index root ([[graft.sources.Sources.withSwapLock]]):
    * held by appenders across their table writes and by the compactor
    * across its snapshot and publish windows — never across the long
    * rewrite itself, so appends flow while the compactor rewrites. */
  private def maintenanceLock(indexPath: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$indexPath/_maintenance_lock")

  /** Compact the appended-to digest table (the digest-index sibling of
    * [[MinHash.compactBandIndex]]): rewrite the accumulated per-batch
    * files — deduped, since a crash-retried append can land a digest
    * twice — to the shuffle-partition target behind the temp-dir +
    * `FileSystem.rename` swap (atomic on HDFS/local; table-format
    * transaction on object stores). Sketch and params are untouched: the
    * sketch stays a superset through the row dedup. SAFE AGAINST
    * CONCURRENT APPENDERS: the rewrite reads a file-list snapshot and the
    * publish goes through [[graft.sources.Sources.publishSwapReconcile]],
    * which copies any file appended after the snapshot into the new
    * layout before the swap — a streaming `dedupIndexed` micro-batch that
    * lands mid-compact is preserved, not silently deleted (late files may
    * briefly duplicate a digest row; the next compact's distinct removes
    * it, and duplicates never change probe results). Only concurrent
    * COMPACTORS are excluded (single-compactor contract). Run on the
    * ordinary parquet-compaction cadence. */
  def compactDigestIndex(spark: SparkSession, path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$path/digests")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_digests_compacting")
    val old = new org.apache.hadoop.fs.Path(s"$path/_digests_old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = maintenanceLock(path)
    // lease scope 1: recovery + snapshot (appends must not interleave
    // with a restore). Released for the long rewrite — appends landing
    // then are "late files" the reconcile copies across the swap.
    val snapshot = graft.sources.Sources.withSwapLock(fs, lock) {
      graft.sources.Sources.recoverSwap(fs, live, tmp, old)
      graft.sources.Sources.dataFiles(fs, live)
    }
    if (snapshot.isEmpty) return // empty table: nothing to compact
    // distinct() already lands on the shuffle-partition target — no
    // extra repartition pass. Read the SNAPSHOT files, not the live dir:
    // a file appended mid-rewrite must not be both rewritten and
    // reconciled (lazy parquet reads race the listing otherwise)
    spark.read.parquet(snapshot.toSeq.map(f => s"$live/$f"): _*)
      .distinct().write.parquet(tmp.toString)
    // lease scope 2: the publish window — no append can start a write
    // into `digests` while the table is between its two renames
    graft.sources.Sources.withSwapLock(fs, lock) {
      graft.sources.Sources.publishSwapReconcile(fs, live, tmp, old, snapshot)
    }
  }

  private def bloomPaths(dir: String) = (
    new org.apache.hadoop.fs.Path(s"$dir/sketch"),
    new org.apache.hadoop.fs.Path(s"$dir/_sketch_tmp"),
    new org.apache.hadoop.fs.Path(s"$dir/_sketch_old"))

  /** Publish a sketch through the backed-up rename swap
    * ([[graft.sources.Sources.publishSwap]]): any single crash leaves at
    * worst the OLD sketch live (still a superset of the table, since the
    * digest append runs strictly after the sketch swap) — never a window
    * with no sketch at all. */
  private def writeBloom(spark: SparkSession, dir: String,
                         bf: org.apache.spark.util.sketch.BloomFilter): Unit = {
    val (live, tmp, old) = bloomPaths(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.Sources.recoverSwap(fs, live, tmp, old)
    val out = fs.create(tmp, true)
    try bf.writeTo(out) finally out.close()
    graft.sources.Sources.publishSwap(fs, live, tmp, old)
  }

  private def readBloom(spark: SparkSession,
                        dir: String): org.apache.spark.util.sketch.BloomFilter = {
    val (live, _, old) = bloomPaths(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // non-mutating: read whichever copy exists — a reader-issued restore
    // could collide with a concurrent writeBloom's publish window
    val p = graft.sources.Sources.resolveSwap(fs, live, old)
    val in = fs.open(p)
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
  }

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

  /** Duplicate-cluster assignment: connected components over a near-dup
    * pair list, so "drop all but one copy per cluster" becomes a groupBy.
    *
    * HashMin label propagation with PATH HALVING: every vertex starts as
    * its own label (its id); each round takes the min label among itself
    * and its neighbors, then follows its label's label (pointer jumping).
    * The halving step collapses chains exponentially, so convergence is
    * O(log diameter) rounds — a 10⁶-node path needs ~20 rounds, not 10⁶ —
    * and every round is two id-keyed equality joins + one groupBy, all
    * shuffling on the vertex id only. Labels localCheckpoint each round to
    * truncate the iterative lineage (cluster path: checkpoint to reliable
    * storage).
    *
    * Small graphs short-circuit: after the one edge materialization, if the
    * edge list is under `smallGraphEdges` (and ids are integral) the
    * components come from a driver-side union-find and broadcast back —
    * near-dup graphs are usually tiny relative to the corpus, and ~6
    * distributed rounds of fixed scheduling cost would dwarf the actual
    * work. Bigger graphs run the full distributed loop unchanged.
    *
    * Returns (id, cluster_id) for EVERY vertex; cluster_id is the minimum
    * vertex id of its component (singletons keep their own id). */
  def connectedComponents(vertices: DataFrame, idCol: String, edges: DataFrame,
                          srcCol: String, dstCol: String, maxIter: Int = 50,
                          smallGraphEdges: Long = 500000L): DataFrame = {
    // default threshold sized for a MODEST driver: 500k edges collect as
    // ~1M two-long rows (~100 MB with boxing) — raise it only alongside
    // spark.driver.memory
    // materialize the edge list ONCE: `edges` may carry an arbitrarily
    // expensive lineage (e.g. the whole prefix-filter Jaccard join) that
    // would otherwise re-execute inside every convergence round
    val sym = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"))
      .union(edges.select(col(dstCol).as("_src"), col(srcCol).as("_dst")))
      .localCheckpoint()

    val integralIds = vertices.schema(idCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    // DELIBERATE eager count: the gate between driver union-find and
    // distributed HashMin needs the edge cardinality, and the
    // localCheckpoint above has already materialized the edges, so this
    // count is a metadata-cheap job — not the repeated-lineage side effect
    // the "no eager counts in library operators" rule guards against.
    if (integralIds && sym.count() <= 2L * smallGraphEdges) {
      // driver union-find (path compression; min id becomes the root so the
      // output labeling is identical to the distributed HashMin result)
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) { parent.put(r, parent.get(parent.get(r))); r = parent.get(r) }
        r
      }
      sym.select(col("_src").cast("long"), col("_dst").cast("long"))
        .collect().foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
        }
      val labels = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
      parent.keySet().forEach(k => labels += ((k, find(k))))
      val spark = vertices.sparkSession
      import spark.implicits._
      val labelDf = labels.toSeq.toDF("_lid", "_lcluster")
      return vertices.select(col(idCol).as("id"))
        .join(broadcast(labelDf), col("id") === col("_lid"), "left")
        .select(col("id"),
          coalesce(col("_lcluster").cast(vertices.schema(idCol).dataType),
            col("id")).as("cluster_id"))
    }
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("cluster_id"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // neighbor-min step (HashMin)
      val nbrMin = sym.join(labels, sym("_dst") === labels("id"))
        .groupBy(col("_src")).agg(min(col("cluster_id")).as("_nl"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("_src"), "left")
        .select(labels("id"),
          least(col("cluster_id"), coalesce(col("_nl"), col("cluster_id"))).as("cluster_id"),
          labels("cluster_id").as("_prev"))
      // path-halving step: label ← label(label). Labels are always vertex
      // ids (mins of ids), so the lookup join always hits.
      // carry the pre-step label through the halving join so convergence is
      // a filter over the frame we materialize anyway — no extra join job
      val next = stepped.join(
          stepped.select(col("id").as("cluster_id"), col("cluster_id").as("_ll")),
          Seq("cluster_id"))
        .select(col("id"), least(col("cluster_id"), col("_ll")).as("cluster_id"),
          col("_prev"))
        .localCheckpoint()
      changed = next.filter(col("cluster_id") =!= col("_prev")).count()
      labels = next.select("id", "cluster_id")
      it += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Persist the (id, cluster_id) label table once — the workflow a real
    * pipeline runs instead of re-deriving the pair-join + connected-
    * components lineage for every downstream consumer (the dedup_stats
    * driver query re-executes it by harness contract; a production corpus
    * pays that cost exactly once, here). Labels land range-clustered on
    * cluster_id so per-cluster reads prune files. */
  def writeClusterLabels(labels: DataFrame, path: String,
                         targetPartitions: Int = 0): Unit = {
    if (targetPartitions > 0)
      graft.sources.Sources.writeClustered(labels, path, Seq("cluster_id"),
        targetPartitions)
    else // default: file count sized by data via AQE, not by core count
      graft.sources.Sources.writeClusteredAdaptive(labels, path,
        Seq("cluster_id"))
  }

  /** Duplication report from a PERSISTED label table: identical output to
    * composing the stats aggregation over the live CC lineage (spec-pinned),
    * at the cost of two tiny aggregations over (id, cluster_id) rows. */
  def statsFromLabels(labels: DataFrame): DataFrame =
    labels.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))

  /** Keep-one-per-cluster from a persisted label table: cluster_id is the
    * component's MIN member id, so the keeper is a pure filter after an
    * id-keyed equality join — no window, no re-derivation. */
  def keepOnePerCluster(df: DataFrame, idCol: String, labels: DataFrame): DataFrame =
    df.join(labels.select(col("id").as(idCol), col("cluster_id")), Seq(idCol))
      .filter(col(idCol) === col("cluster_id"))
      .drop("cluster_id")

  /** Self-repetition REMOVAL: cut every repeated span's LATER occurrence
    * out of its own document (keep-first policy), leaving the first copy
    * in place — the within-doc counterpart of [[removeSpans]]. Overlapping
    * spans (periodic stutter reports one span per harmonic) merge through
    * the same any-range-covers filter, so a period-p ×m block collapses to
    * its first period plus whatever tail no range covers. */
  def removeSelfSpans(df: DataFrame, spans: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val ranges = spans
      .groupBy(col("doc_id").as("_vid"))
      .agg(sort_array(collect_list(struct(col("start_b").as("s"),
        (col("start_b") + col("span_tokens")).as("e")))).as("_rs"))
    df.join(ranges, col(idCol) === col("_vid"), "left")
      .withColumn("_t", split(col(textCol), " "))
      .withColumn(textCol,
        when(col("_rs").isNull, col(textCol)).otherwise(
          concat_ws(" ", tokensOutsideRanges(col("_t"), col("_rs")))))
      .drop("_vid", "_rs", "_t")
  }

  /** N-gram Jaccard near-dup pairs within `blockCol` blocks, EXACT (same
    * result set as the all-pairs comparison) but never an all-pairs block
    * join: candidate generation is the prefix-filter set-similarity join of
    * AllPairs/PPJoin (Bayardo et al., WWW'07; Xiao et al., WWW'08).
    *
    * For Jaccard ≥ t, a qualifying pair (a,b) shares ≥ ceil(t·|x|) shingles
    * with each side x, so under ANY global shingle order the first
    * |x| − ceil(t·|x|) + 1 shingles of BOTH sides must intersect — pairs are
    * found by an EQUALITY join on (block, prefix-shingle), shuffling on the
    * shingle key instead of exploding O(block²) pairs. Shingles are ordered
    * rarest-first (ascending within-block document frequency) so prefixes
    * hold the rarest shingles and candidate fan-out stays near the true pair
    * count; a length filter (t·|a| ≤ |b| ∧ t·|b| ≤ |a|) prunes size-skewed
    * candidates before the exact merge-intersect verify. At 100 TB the
    * block-quadratic version explodes with block size; this one scales with
    * Σ_shingle freq² of the PREFIX shingles — bounded by construction. */
  /** The narrow (id, block, sorted-hashed-shingles) frame the pair
    * operators build straight off the scan — factored out so PushdownSpec
    * can pin that the underlying parquet scan reads ONLY (id, block, text):
    * the checkpoint the operators wrap around it hides the scan from the
    * final plan, and a silent pruning regression here would multiply
    * 100 TB of I/O invisibly. */
  def shingleFrame(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), col(blockCol).as("block"),
        shingleHashes(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Candidate (id_a, id_b) frame of [[jaccardPairs]], pre-verify —
    * factored so the planted-skew specs can COUNT candidate fan-out
    * in-plan rather than trust the docstring. `maxDocFreq > 0` drops
    * shingles above that within-block document frequency from the PREFIX
    * ranking (never from the verify arrays): fan-out is Σ prefixFreq², so
    * a boilerplate shingle at 100× median frequency contributes zero
    * candidate pairs instead of freq². The trade (shared with
    * [[substringSpans]]'s cap): a pair whose entire prefix overlap rode
    * the dropped shingle is missed — 0 keeps the operator EXACT. */
  private[graft] def jaccardCandidates(sh: DataFrame, threshold: Double,
                                       maxDocFreq: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = sh.select(col("id"), col("block"), size(col("sh")).cast("int").as("sz"),
      explode(col("sh")).as("t"))
    // within-block document frequency — the canonical rare-first prefix order
    val dfreq = tokens.groupBy("block", "t").agg(count(lit(1)).as("_df"))
    // ε guards the float ceil/compares: at worst the prefix grows by one
    // element (more candidates, still exact); without it a t·sz that lands
    // a hair above an integer could shorten the prefix and MISS a pair
    // sitting exactly at the threshold.
    val eps = 1e-9
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz") - lit(eps)) + 1).cast("int")
    val ranked = tokens.join(dfreq, Seq("block", "t"))
    val eligible = if (maxDocFreq > 0) ranked.filter(col("_df") <= maxDocFreq)
      else ranked
    val prefix = eligible
      .withColumn("_rn", row_number().over(
        Window.partitionBy("block", "id").orderBy(asc("_df"), asc("t"))))
      .filter(col("_rn") <= prefixLen)
      .select("block", "t", "id", "sz")
    val a = prefix.select(col("block"), col("t"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = prefix.select(col("block"), col("t"), col("id").as("id_b"), col("sz").as("sz_b"))
    // shuffle_hash: inverted-index keys are duplicate-heavy by design and
    // sort-merge pays ~300ns per enumerated candidate on such keys (the
    // measured SimHash.pairsFromFingerprintsBlocked law); the build side
    // is the narrow prefix frame
    a.join(b.hint("shuffle_hash"), Seq("block", "t"))
      .filter(col("id_a") < col("id_b"))
      // J ≥ t ⇒ t·max(|a|,|b|) ≤ |a∩b| ≤ min(|a|,|b|)
      .filter(col("sz_b") >= lit(threshold) * col("sz_a") - lit(eps) &&
        col("sz_a") >= lit(threshold) * col("sz_b") - lit(eps))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }

  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, blockCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxDocFreq: Long = 0L): DataFrame = {
    // The shingle frame feeds THREE branches of one plan (the token
    // explode and both sides of the pair verify) and Catalyst cannot
    // collapse them (different downstream join keys ⇒ different
    // exchanges), so an un-pinned lineage tokenizes and hashes every
    // document three times. LAZY localCheckpoint (no job at plan-build
    // time — the library-operator rule): the shared RDD materializes
    // inside the first stage that computes it and the other two branches
    // read the persisted blocks. At sf0.1 this is time-neutral (the
    // native shingle hash is cheap against shuffle+schedule cost); at
    // cluster scale it trades ONE executor-local write of (id, block,
    // hashes) for two extra full tokenize+hash scans of the corpus.
    jaccardPairsFromShingles(
      shingleFrame(df, idCol, textCol, blockCol, n).localCheckpoint(eager = false),
      threshold, maxDocFreq)
  }

  /** [[jaccardPairs]] over a PRE-BUILT (id, block, sh) shingle frame — the
    * entry for faces that run several shingle-based generators over one
    * corpus (dedup_recall runs this AND the MinHash finder): pass one
    * lazily-checkpointed [[shingleFrame]] and the corpus tokenizes ONCE
    * for all of them. The caller owns the checkpoint. */
  def jaccardPairsFromShingles(sh: DataFrame, threshold: Double = 0.5,
                               maxDocFreq: Long = 0L): DataFrame = {
    jaccardCandidates(sh, threshold, maxDocFreq)
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccardHashed(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Duplicated-SPAN detection between documents — the suffix-array family
    * of Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"), re-expressed as relational dataflow: two otherwise-distinct
    * documents sharing a verbatim run of ≥ `minSpanTokens` tokens are
    * reported with EXACT token offsets, the duplication neither Jaccard
    * (global overlap too small) nor containment (neither doc inside the
    * other) can see.
    *
    * Dataflow instead of a suffix array: (1) POSITIONAL k-token shingles —
    * (doc, pos, shingle) — one narrow projection per document; (2) prune to
    * shingles seen in ≥ 2 documents (a left-semi join — the overwhelming
    * majority of shingles are unique and never shuffle again); (3) equality
    * self-join on the shingle STRING yields co-occurrences (da, db, pa, pb);
    * (4) consecutive co-occurrences on one diagonal g = pa − pb are one
    * shared run — the gaps-and-islands trick (pa − row_number over (da, db,
    * g) is constant within a run) turns run-merging into a groupBy; a run of
    * r shingles is a span of r + k − 1 tokens. Every shuffle keys on the
    * shingle or on (da, db, g) — never an all-pairs join; the window
    * partition is bounded by document length. Fan-out is Σ_shingle
    * freqA·freqB over REPEATED shingles only; `maxDocFreq` (0 = off, the
    * oracle-exact face) drops boilerplate shingles above a document
    * frequency cap — the standard mitigation when a hot shingle (license
    * headers, navigation chrome) would dominate the join, at the cost of
    * splitting runs that cross a dropped shingle.
    *
    * Spans are maximal per diagonal; a pair with internal periodicity can
    * report overlapping spans on different diagonals (each is a true
    * verbatim match). Emits (id_a, id_b, start_a, start_b, span_tokens)
    * with id_a < id_b and 0-based token offsets. */
  /** The (id, pos, shingle-hash) positional index the span operators build
    * straight off the scan — factored out so PushdownSpec can pin the
    * parquet scan at (id, text) only (the operator's checkpoint hides the
    * scan from the final plan). The index carries the native
    * `graft_shingle_hashes_pos` xxhash64 of each k-token window, not the
    * window string: 8 bytes per row through every downstream shuffle
    * instead of a ~6k-char shingle, equal up to the usual ~2⁻⁶⁴ collision
    * odds (the dedup_jaccard trade; the DuckDB oracle joins literal
    * strings, so a collision would surface at the hash gate). */
  def positionalShingles(df: DataFrame, idCol: String, textCol: String,
                         k: Int): DataFrame =
    df.select(col(idCol).as("_id"),
        call_function("graft_shingle_hashes_pos", col(textCol), lit(k)).as("_hs"))
      .filter(size(col("_hs")) > 0)
      .select(col("_id"), posexplode(col("_hs")).as(Seq("pos", "s")))

  def substringSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minSpanTokens: Int = 20,
                     maxDocFreq: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && minSpanTokens >= k,
      s"substringSpans: need k >= 1 and minSpanTokens >= k, got k=$k minSpanTokens=$minSpanTokens")
    val sh = positionalShingles(df, idCol, textCol, k)
    val freq = sh.groupBy("s").agg(countDistinct(col("_id")).as("_nd"))
    val live = {
      val f = freq.filter(col("_nd") >= 2)
      if (maxDocFreq > 0) f.filter(col("_nd") <= maxDocFreq) else f
    }
    // the pruned positional index feeds both sides of the pair join —
    // lazy-checkpoint it (the jaccardPairs rule) so the corpus tokenizes once
    val idx = sh.join(live.select("s"), Seq("s"), "left_semi")
      .localCheckpoint(eager = false)
    val hits = idx.select(col("s"), col("_id").as("id_a"), col("pos").as("pa"))
      .join(idx.select(col("s"), col("_id").as("id_b"), col("pos").as("pb")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("pa"), col("pb"),
        (col("pa") - col("pb")).as("g"))
    hits
      .withColumn("_rn", row_number().over(
        Window.partitionBy("id_a", "id_b", "g").orderBy("pa")))
      .groupBy(col("id_a"), col("id_b"), col("g"), (col("pa") - col("_rn")).as("_isl"))
      .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
        (count(lit(1)) + lit(k - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpanTokens)
      .select(col("id_a"), col("id_b"), col("start_a").cast("bigint").as("start_a"),
        col("start_b").cast("bigint").as("start_b"), col("span_tokens"))
  }

  /** WITHIN-document duplicated spans — the self-repetition face of
    * [[substringSpans]] (Lee et al. 2022 dedup also removes repeats inside
    * one document: boilerplate blocks pasted twice, template stutter,
    * generation loops). Same relational suffix-array shape, joined within
    * the document: positional k-shingles → shingles repeated ≥2× in their
    * OWN doc (groupBy prune — for self-repeats the prune key is (doc,
    * shingle), so a shingle common across docs but unique within each
    * never joins) → same-doc pair join with pa < pb → gaps-and-islands
    * run-merge per (doc, offset g = pb − pa). A period-p repetition shows
    * up as a long run on diagonal g = p (overlapping occurrences are true
    * repeats and are reported as such). Emits (doc_id, start_a, start_b,
    * span_tokens) with start_a < start_b, 0-based offsets. */
  /** The shared range-strip kernel of [[removeSpans]] /
    * [[removeSelfSpans]] / [[stripSpans]]: tokens of `tokensCol` whose
    * index falls inside no (s, e) range of `rangesCol` — a pure
    * higher-order codegen filter, O(tokens × ranges-per-doc) with NO
    * corpus-token shuffle (ranges per doc are few, bounded by
    * doc length / minSpanTokens; overlapping ranges merge through the
    * any-range-covers predicate, so a span reported by several pairs or
    * harmonics strips once). */
  private def tokensOutsideRanges(tokensCol: Column, rangesCol: Column): Column =
    filter(tokensCol, (_, i) =>
      !exists(rangesCol, r =>
        i.cast("long") >= r.getField("s") && i.cast("long") < r.getField("e")))

  /** APPLY span dedup end-to-end — the ACTION half of the Lee et al.
    * 2022 family: [[substringSpans]] FINDS verbatim ≥ minSpanTokens runs
    * shared between documents; this strips each found span from the
    * HIGHER doc id (keep-first-copy, the paper's dedup policy: exactly
    * one copy of every duplicated span survives, in the lowest id that
    * carries it) and emits the cleaned corpus WITH removal stats —
    * [[removeSpans]] is the span-frame-driven in-place rewrite for
    * callers that already hold a span list; this face derives the spans
    * and accounts for what it cut.
    *
    * Plan shape: the only shuffle beyond the span finder is the per-doc
    * range-list groupBy (output-span-sized); the strip itself is the
    * [[tokensOutsideRanges]] codegen filter riding a left join of the
    * range lists onto the corpus scan — corpus tokens never shuffle.
    * Documents stripped to nothing keep a row (0 kept, empty text);
    * token order and whitespace reconstruct exactly (split preserves
    * empty tokens from repeated spaces, the join re-lands them). Emits
    * (id, n_tokens, n_tokens_kept, cleaned_text). */
  def stripSpans(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 8, minSpanTokens: Int = 20,
                 maxDocFreq: Long = 0L): DataFrame = {
    val spans = substringSpans(df, idCol, textCol, k, minSpanTokens, maxDocFreq)
    val ranges = spans
      .groupBy(col("id_b").as("_vid"))
      .agg(sort_array(collect_list(struct(col("start_b").as("s"),
        (col("start_b") + col("span_tokens")).as("e")))).as("_rs"))
    df.select(col(idCol), col(textCol))
      .join(ranges, col(idCol) === col("_vid"), "left")
      .withColumn("_t", split(col(textCol), " "))
      .withColumn("_kept", when(col("_rs").isNull, col("_t"))
        .otherwise(tokensOutsideRanges(col("_t"), col("_rs"))))
      .select(col(idCol),
        size(col("_t")).cast("bigint").as("n_tokens"),
        size(col("_kept")).cast("bigint").as("n_tokens_kept"),
        array_join(col("_kept"), " ").as("cleaned_text"))
  }

  def selfSpans(df: DataFrame, idCol: String, textCol: String,
                k: Int = 8, minSpanTokens: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && minSpanTokens >= k,
      s"selfSpans: need k >= 1 and minSpanTokens >= k, got k=$k minSpanTokens=$minSpanTokens")
    val sh = positionalShingles(df, idCol, textCol, k)
    val rep = sh.groupBy("_id", "s").agg(count(lit(1)).as("_c")).filter(col("_c") >= 2)
    // the pruned index feeds both sides of the pair join — the
    // jaccardPairs lazy-checkpoint rule
    val idx = sh.join(rep.select("_id", "s"), Seq("_id", "s"), "left_semi")
      .localCheckpoint(eager = false)
    idx.select(col("_id"), col("s"), col("pos").as("pa"))
      .join(idx.select(col("_id"), col("s"), col("pos").as("pb")), Seq("_id", "s"))
      .filter(col("pa") < col("pb"))
      .select(col("_id").as("doc_id"), col("pa"), col("pb"),
        (col("pb") - col("pa")).as("g"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy("doc_id", "g").orderBy("pa")))
      .groupBy(col("doc_id"), col("g"), (col("pa") - col("_rn")).as("_isl"))
      .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
        (count(lit(1)) + lit(k - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpanTokens)
      .select(col("doc_id"), col("start_a").cast("bigint").as("start_a"),
        col("start_b").cast("bigint").as("start_b"), col("span_tokens"))
  }

  /** Span REMOVAL — the second half of the Lee et al. pipeline: cut the
    * duplicated tokens out of the HIGHER-id document of every span pair
    * (keep-first policy; the lower id keeps its copy). Joins the span list
    * back to the corpus on the victim id only, merges overlapping token
    * ranges per document driver-free with a fold over the collected span
    * list (spans per doc are few — bounded by doc length / minSpanTokens),
    * and rebuilds the text with the flagged token ranges dropped. Documents
    * with no spans pass through untouched. */
  def removeSpans(df: DataFrame, spans: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    // one (start, end) struct list per victim document
    val ranges = spans
      .groupBy(col("id_b").as("_vid"))
      .agg(sort_array(collect_list(struct(col("start_b").as("s"),
        (col("start_b") + col("span_tokens")).as("e")))).as("_rs"))
    df.join(ranges, col(idCol) === col("_vid"), "left")
      .withColumn("_t", split(col(textCol), " "))
      .withColumn(textCol,
        when(col("_rs").isNull, col(textCol)).otherwise(
          // keep token i unless some [s, e) range covers it
          concat_ws(" ", tokensOutsideRanges(col("_t"), col("_rs")))))
      .drop("_vid", "_rs", "_t")
  }

  /** Shingle-CONTAINMENT near-dup pairs within `blockCol` blocks — the
    * asymmetric face of [[jaccardPairs]]: C(a,b) = |A∩B| / |A| with A the
    * smaller shingle set, so a short document quoted or embedded inside a
    * much longer one scores ~1 even though its Jaccard is tiny (the
    * subset/quotation duplication Jaccard structurally cannot see).
    * EXACT, and never an all-pairs block join: a qualifying pair shares
    * ≥ ceil(t·|A|) shingles, so the first |A| − ceil(t·|A|) + 1 rarest
    * shingles of the SMALLER side must hit the larger side — candidates
    * come from an EQUALITY join of the smaller side's prefix against the
    * larger side's FULL shingle index (the asymmetric prefix-filter bound:
    * only the side whose size appears in the threshold can prune to a
    * prefix; the other side must stay fully indexed or pairs are lost).
    * Shuffles key on (block, shingle) and (id) only; fan-out is
    * Σ_shingle prefixFreq·fullFreq, bounded by the rare-first prefix
    * order exactly as in [[jaccardPairs]].
    *
    * Emits (id_a, id_b, containment) with id_a the SMALLER document
    * (lower id on equal sizes) — the one to drop in a keep-longest
    * dedup policy. */
  /** Candidate frame of [[containmentPairs]], pre-verify — same factoring
    * and `maxDocFreq` semantics as [[jaccardCandidates]]. The cap applies
    * to the PREFIX side only: fan-out is Σ prefixFreq·fullFreq, so zeroing
    * a hot shingle's prefix frequency removes its contribution while the
    * full index stays intact for every other shingle's probes. */
  private[dedup] def containmentCandidates(sh: DataFrame, threshold: Double,
                                           maxDocFreq: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = sh.select(col("id"), col("block"), size(col("sh")).cast("int").as("sz"),
      explode(col("sh")).as("t"))
    val dfreq = tokens.groupBy("block", "t").agg(count(lit(1)).as("_df"))
    // ε as in jaccardPairs: worst case the prefix grows one element (more
    // candidates, still exact); without it a t·sz a hair above an integer
    // could shorten the prefix and MISS a threshold-boundary pair
    val eps = 1e-9
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz") - lit(eps)) + 1).cast("int")
    val ranked = tokens.join(dfreq, Seq("block", "t"))
    val eligible = if (maxDocFreq > 0) ranked.filter(col("_df") <= maxDocFreq)
      else ranked
    val prefix = eligible
      .withColumn("_rn", row_number().over(
        Window.partitionBy("block", "id").orderBy(asc("_df"), asc("t"))))
      .filter(col("_rn") <= prefixLen)
      .select("block", "t", "id", "sz")
    val a = prefix.select(col("block"), col("t"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = tokens.select(col("block"), col("t"), col("id").as("id_b"), col("sz").as("sz_b"))
    // NO shuffle_hash here (unlike jaccardCandidates): the prefix×tokens
    // join's enumeration volume is small relative to its inputs, and the
    // hint measured ~6% SLOWER at the fourth decade — sort-merge + AQE
    // keep the flexibility
    a.join(b, Seq("block", "t"))
      // orient every pair small→large (ids break exact-size ties) so each
      // unordered pair is generated once, from the side the bound covers
      .filter(col("sz_a") < col("sz_b") ||
        (col("sz_a") === col("sz_b") && col("id_a") < col("id_b")))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }

  def containmentPairs(df: DataFrame, idCol: String, textCol: String, blockCol: String,
                       n: Int = 3, threshold: Double = 0.5,
                       maxDocFreq: Long = 0L): DataFrame = {
    // lazy-checkpointed for the same three-branch reuse as jaccardPairs
    val sh = shingleFrame(df, idCol, textCol, blockCol, n)
      .localCheckpoint(eager = false)
    containmentCandidates(sh, threshold, maxDocFreq)
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("containment",
        call_function("graft_sorted_intersect_size_l", col("sh_a"), col("sh_b"))
          .cast("bigint").cast("double") / size(col("sh_a")).cast("bigint"))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
  }
}
