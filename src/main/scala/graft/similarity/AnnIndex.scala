package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Persisted IVF index — the workflow face of [[AnnLsh.ivfTopK]]: a real
  * pipeline trains the index ONCE, persists it, and serves many query
  * batches from the persisted layout; recomputing centroids per query
  * (the registered in-query face, kept for the driver's independent-query
  * contract) is the harness shape, not the production one. The
  * dedup_labels pattern applied to ANN.
  *
  * The layout IS the index: the vector table is written
  * `partitionBy(list)`, so a query batch's probed lists turn into a
  * PARTITION-PRUNED scan — at 100 TB the executor reads only
  * nProbe/nLists of the corpus, exactly an IVF inverted file. The probed
  * list ids are collected to drive static pruning (bounded by
  * queries × nProbe — the Pq.maxQueries collect contract), so the filter
  * is pushed at plan time, no dynamic-partition-pruning dependence.
  */
object AnnIndex {

  /** Default probe width for the near-dup INGEST path
    * ([[pairsIncremental]] / the embed_dedup_incremental and
    * stream_embed_indexed faces) — MEASURED, not guessed
    * (tools/IncProbeSweep, sf1 decade at 78 Lloyd lists, exact sampled
    * cos≥0.35 ground truth, cos≥0.7 dedup-regime tier):
    *   nProbe 1 → recall 0.084 / cos70 0.448
    *   nProbe 2 → recall 0.148 / cos70 0.776   (the r15-shipped value)
    *   nProbe 3 → recall 0.202 / cos70 0.930
    *   nProbe 4 → recall 0.247 / cos70 0.980
    *   nProbe 6 → recall 0.323 / cos70 1.000
    * at FLAT wall time (~33-35s incl index build — the probe's pruned
    * scan is nProbe/lists of the corpus, small either way). The
    * incremental geometry is structurally weaker than selfPairs'
    * assign=4 (the persisted corpus is SINGLE-assigned, so a pair is
    * found only when the partner's one list lands among the batch
    * vector's probes — nProbe×1 chances vs 4×4), so the dial needs 4
    * probes to clear the same 0.98 cos70 floor the batch tier clears at
    * assign=4 — the identical first-width-over-the-floor rule as
    * [[AnnIvf.ivfAssign]]. GEOMETRY_RECALL floors the shipped value per
    * decade AND at the overload points. */
  val dedupNProbe = 4

  /** Train and persist: per-list centroids (tiny) + vectors repartitioned
    * into one layout partition per list. The vectors land hash-clustered
    * on `list` (one shuffle at build time), so every `list=` partition is
    * exactly ONE sized file — the layout [[compact]] rewrites appended
    * indexes into, produced directly at build. Without it each list
    * collected one file per upstream task, and every pruned probe paid
    * nProbe × upstream-parallelism file opens instead of nProbe (guide §6:
    * output file sizing; invisible at test SFs, real at 100 TB). */
  def writeIvf(df: DataFrame, idCol: String, vecCol: String, listCol: String,
               path: String): Unit = {
    val c = df.select(col(idCol).as("vec_id"), col(listCol).as("list"),
      toDouble(col(vecCol)).as("v"))
    c.groupBy("list").agg(call_function("graft_vec_avg", col("v")).as("cv"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    c.repartition(col("list"))
      .write.mode("overwrite").partitionBy("list").parquet(s"$path/vectors")
  }

  /** One maintenance lease per index root — held by [[append]] across its
    * write and by [[compact]]/[[retrain]] across their snapshot/publish
    * windows (the band/fingerprint index family contract,
    * [[graft.sources.Sources.withSwapLock]]). Probes stay lock-free. */
  private def maintenanceLock(path: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$path/_maintenance_lock")

  /** NON-MUTATING reader-side swap resolution: the table path to read now
    * — live, or the `_old` backup while a [[compact]]/[[retrain]] publish
    * is in flight (or crashed mid-swap). Partition discovery works under
    * an explicitly-given `_`-prefixed root, so the pruned probe reads the
    * backup's `list=` layout identically. */
  private def resolvedTable(spark: SparkSession, path: String,
                            sub: String): String = {
    val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
    graft.sources.Sources.resolveSwap(
      live.getFileSystem(spark.sparkContext.hadoopConfiguration), live,
      new org.apache.hadoop.fs.Path(s"$path/_${sub}_old")).toString
  }

  /** APPENDER-side restore — call only while HOLDING the maintenance
    * lease: a missing live table with a backup present can only be a
    * crashed [[compact]]/[[retrain]] publish. */
  private def restoreIndexUnderLock(spark: SparkSession, path: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    for (sub <- Seq("vectors", "centroids")) {
      val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
      graft.sources.Sources.restoreUnderLock(live.getFileSystem(hconf), live,
        new org.apache.hadoop.fs.Path(s"$path/_${sub}_old"))
    }
  }

  /** Collected centroid model + the (matrix index → list value) mapping
    * frame — the probe-side driver state, bounded by the list count (the
    * Pq/centroid collect contract). Rows sort by `list`, so matrix index
    * order ≡ `asc(list)` and [[graft.functions.TopListsExpr]]'s
    * lower-index tie-break reproduces the old `orderBy(desc(_cs),
    * asc(list))` window rule exactly; the mapping join stays
    * TYPE-AGNOSTIC on the list key (int/long/string layouts all work —
    * the PqSpec contract) and is a broadcast equality join on rows×nProbe
    * exploded indices, replacing a rows×nLists cross join plus a
    * rows×nLists window SHUFFLE. */
  private def centroidModel(spark: SparkSession, path: String)
      : (Array[Array[Double]], DataFrame) = {
    val cDf = graft.sources.Sources.parquetCached(spark,
      resolvedTable(spark, path, "centroids"))
    // ONE bounded collect feeds BOTH the matrix and the mapping frame: the
    // previous window-ranked idxMap plan re-scanned the centroids parquet
    // inside every probe's broadcast build (one extra job + exchange per
    // ivfTopK/assign call); a local relation built from the same collected
    // rows broadcasts identically and keeps the type-agnostic list key.
    val rows = cDf.orderBy("list").select("list", "cv").collect()
    val matrix = rows.map(_.getSeq[Double](1).toArray)
    val idxMap = spark.createDataFrame(
      java.util.Arrays.asList(rows.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(r.get(0), i.toLong) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        cDf.schema("list"),
        org.apache.spark.sql.types.StructField("_li",
          org.apache.spark.sql.types.LongType, nullable = false))))
    (matrix, idxMap)
  }

  /** `explode`-ready top-`k` probed matrix indices of a vector column
    * (cosine ranking — the probe-path score). */
  private def topProbes(v: org.apache.spark.sql.Column,
                        matrix: Array[Array[Double]], k: Int) =
    explode(org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TopListsExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(v),
        matrix, math.min(k, matrix.length), cosineScore = true)))

  /** Assign each batch vector to its nearest persisted centroid (cosine,
    * ties to the lower list id — the ivfTopK probe rule at nProbe=1).
    * One data-driven projection + the tiny mapping join; the batch
    * streams once. */
  private def assignLists(spark: SparkSession, path: String, batch: DataFrame,
                          idCol: String, vecCol: String): DataFrame = {
    val (matrix, idxMap) = centroidModel(spark, path)
    batch.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("v"))
      .select(col("vec_id"), col("v"), topProbes(col("v"), matrix, 1).as("_li"))
      .join(broadcast(idxMap), Seq("_li"))
      .select(col("vec_id"), col("list"), col("v"))
  }

  /** Index-health gate for an ingest batch — embed_drift applied to the
    * PERSISTED centroids: per probed list, the cosine between the batch's
    * own centroid and the trained one, with `retrain=true` below `minCos`.
    * A drifted batch means the trained partitioning no longer matches the
    * data (new encoder version, new domain) and appending would degrade
    * recall silently; a passing batch is safe to [[append]]. One
    * assignment pass + one list-keyed rollup; centroids broadcast. */
  def driftGate(spark: SparkSession, path: String, batch: DataFrame,
                idCol: String, vecCol: String, minCos: Double = 0.9): DataFrame = {
    val assigned = assignLists(spark, path, batch, idCol, vecCol)
    val bc = assigned.groupBy("list")
      .agg(call_function("graft_vec_avg", col("v")).as("bv"),
        count(lit(1)).as("n_batch"))
    val trained = graft.sources.Sources.parquetCached(spark,
      resolvedTable(spark, path, "centroids"))
    bc.join(broadcast(trained), Seq("list"))
      .select(col("list"), col("n_batch"),
        (floor((cosine(col("bv"), col("cv"))) * lit(1e6) + lit(0.5)) / lit(1e6)).as("centroid_cos"))
      .withColumn("retrain", col("centroid_cos") < minCos)
  }

  /** Append an ingest batch into the persisted layout: vectors land in
    * their nearest list's PARTITION (mode=append writes new files into the
    * existing list=... directories), so [[ivfTopK]]'s static partition
    * pruning serves them with no re-train and no index rewrite —
    * spec-pinned. Run [[driftGate]] first (or use [[refresh]]).
    *
    * IDEMPOTENT under retry/replay: ids already in the persisted vectors
    * table are dropped by an anti-join guard (the appendToBandIndex
    * pattern — the batch id set broadcasts into a semi join that reduces
    * the corpus side to ≤ batch rows, so the vectors table is only ever
    * SCANNED, never shuffled), so a replayed micro-batch or crash-retried
    * append never double-serves a vec_id from [[ivfTopK]], and a
    * PARTIALLY-landed append (parquet append is not transactional)
    * converges: the retry appends exactly the missing ids. The guard
    * treats vec_id as an immutable content key — re-appending a CHANGED
    * vector under an old id is a no-op by design (re-train for encoder
    * migrations).
    *
    * Holds the index's maintenance lease across the write (the
    * appendToBandIndex contract): a concurrent [[compact]] then cannot
    * rename the table out from under the append's output committer, and
    * the reconciling publish copies any batch that landed during its
    * rewrite across the swap. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
             idCol: String, vecCol: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.sources.Sources.withSwapLock(fs, maintenanceLock(path)) {
      restoreIndexUnderLock(spark, path)
      // assigned feeds the guard AND the write — pin once (lazy: no job at
      // plan-build time; materializes inside the first action)
      val assigned = assignLists(spark, path, batch, idCol, vecCol)
        .localCheckpoint(eager = false)
      val indexed = graft.sources.Sources.parquetCached(spark, s"$path/vectors")
        .select("vec_id")
      val hits = indexed.join(broadcast(assigned.select("vec_id")),
        Seq("vec_id"), "left_semi")
      assigned.join(broadcast(hits), Seq("vec_id"), "left_anti")
        .write.mode("append").partitionBy("list").parquet(s"$path/vectors")
    }
  }

  /** Compact the appended-to vectors layout — the one index family member
    * that was missing it (digest/band/fingerprint indexes all compact):
    * every [[append]]/micro-batch lands one-plus parquet files into each
    * touched `list=` partition, so months of [[graft.streaming.Streams
    * .embedIndexed]] ingest accumulate thousands of tiny files per list
    * and every pruned probe pays per-file open cost. Rewrites the layout
    * to ONE sized file per list (rows per list are bounded by the
    * occupancy contract — targetListSize at build, linear overload past
    * the cap, at which point [[retrain]]/sharding is the answer anyway)
    * behind the reconciling backed-up rename swap: snapshot the file list
    * under the lease, rewrite OUTSIDE it (appenders flow; their
    * mid-rewrite batches are copied across the swap into the right
    * partition), publish under the lease. Any single crash leaves at
    * worst the old layout live; probes racing the publish window resolve
    * to the backup ([[resolvedTable]]). Geometry and content untouched —
    * probe/serve results are bitwise-invariant (spec-pinned). Centroids
    * are one tiny file already and never append — nothing to compact.
    * Run on the ordinary parquet-compaction cadence. */
  def compact(spark: SparkSession, path: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(s"$path/vectors")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_vectors_compacting")
    val old = new org.apache.hadoop.fs.Path(s"$path/_vectors_old")
    val fs = live.getFileSystem(hconf)
    val lock = maintenanceLock(path)
    // lease scope 1: recovery + snapshot (released during the rewrite)
    val snapshot = graft.sources.Sources.withSwapLock(fs, lock) {
      graft.sources.Sources.recoverSwap(fs, live, tmp, old)
      graft.sources.Sources.dataFilesRecursive(fs, live)
    }
    if (snapshot.isEmpty) return
    // rewrite the SNAPSHOT (basePath keeps the list partition column):
    // one shuffle hash-keyed on list → each list's rows coalesce into one
    // task → exactly one file per list partition
    spark.read.option("basePath", live.toString)
      .parquet(snapshot.toSeq.sorted.map(f => s"$live/$f"): _*)
      .repartition(col("list"))
      .write.partitionBy("list").parquet(tmp.toString)
    // lease scope 2: the publish window
    graft.sources.Sources.withSwapLock(fs, lock) {
      graft.sources.Sources.publishSwapReconcileRecursive(fs, live, tmp, old,
        snapshot)
    }
  }

  /** Re-train a DRIFTED index from its own persisted vectors — the rekey
    * analogue ([[graft.dedup.FingerprintIndex.rekey]] is the family
    * precedent): when [[driftGate]] flags `retrain=true` (new encoder
    * version, new domain force-appended), the trained partitioning no
    * longer matches the data and probes lose recall. Deterministic
    * angular Lloyd ([[KMeans]] — unit-sphere projection, the
    * [[AnnIvf.selfPairs]] discipline) over the persisted vectors derives
    * `AnnIvf.ivfLists(n, targetListSize)` fresh centroids, every vector
    * re-assigns to its nearest new centroid (one codegen argmin pass, no
    * join), and BOTH tables re-publish behind the backed-up rename swap —
    * vectors first, then centroids, under ONE maintenance lease (appends
    * block for the duration; the lease heartbeat keeps it alive across
    * the Lloyd passes). The persisted centroids stay writeIvf-semantics:
    * per-list mean of the RAW member vectors (magnitude is irrelevant to
    * the cosine probes). Lock-free probes racing the inter-publish window
    * can pair new vectors with old centroids — a RECALL-only race (the
    * cosine verify is exact), same documented contract as rekey. A crash
    * BETWEEN the two publishes leaves a mismatched layout/model pair —
    * also recall-only, and re-running retrain converges: everything is
    * re-derived from the vectors table alone.
    * No content is dropped or re-encoded: ids and vectors are exactly the
    * persisted set, only `list` changes. */
  def retrain(spark: SparkSession, path: String,
              targetListSize: Long = 256L, iters: Int = 3): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    graft.sources.Sources.withSwapLock(fs, maintenanceLock(path)) {
      restoreIndexUnderLock(spark, path)
      // drop the stale list column; pin once — Lloyd passes, the argmin
      // assignment, the vectors write and the centroid rollup all re-read
      val vecs = spark.read.parquet(s"$path/vectors")
        .select(col("vec_id"), col("v")).localCheckpoint()
      val n = vecs.count()
      val k = AnnIvf.ivfLists(n, targetListSize)
      // angular objective: unit-sphere projection (zero vectors kept as-is
      // — no cosine neighbors, any list serves them); v rides along so the
      // assignment is a pure projection, no re-join against the corpus
      val unit = vecs.select(col("vec_id"), col("v"),
        when(norm(col("v")) > 0.0,
          transform(col("v"), x => x / norm(col("v"))))
          .otherwise(col("v")).as("u"))
      val model = KMeans.fitCentroids(unit, "vec_id", "u", k, iters)
      val relaid = unit.select(col("vec_id"), col("v"),
          KMeans.assignCol(col("u"), model).as("list"))
        .localCheckpoint(eager = false) // feeds the write + the rollup
      val vTmp = new org.apache.hadoop.fs.Path(s"$path/_vectors_retraining")
      val vLive = new org.apache.hadoop.fs.Path(s"$path/vectors")
      val vOld = new org.apache.hadoop.fs.Path(s"$path/_vectors_old")
      graft.sources.Sources.recoverSwap(fs, vLive, vTmp, vOld)
      relaid.repartition(col("list"))
        .write.partitionBy("list").parquet(vTmp.toString)
      val newCentroids = relaid.groupBy("list")
        .agg(call_function("graft_vec_avg", col("v")).as("cv"))
      val cTmp = new org.apache.hadoop.fs.Path(s"$path/_centroids_retraining")
      val cLive = new org.apache.hadoop.fs.Path(s"$path/centroids")
      val cOld = new org.apache.hadoop.fs.Path(s"$path/_centroids_old")
      graft.sources.Sources.recoverSwap(fs, cLive, cTmp, cOld)
      newCentroids.coalesce(1).write.parquet(cTmp.toString)
      graft.sources.Sources.publishSwap(fs, vLive, vTmp, vOld)
      graft.sources.Sources.publishSwap(fs, cLive, cTmp, cOld)
    }
  }

  /** The refresh policy in one call: gate the batch, APPEND if every
    * probed list passes, otherwise touch nothing and hand back the gate
    * report flagging re-train. Returns (appended, gate frame). Retry-safe:
    * the append is id-guarded (see [[append]]), so replaying a refresh
    * whose append partially landed converges instead of duplicating. */
  def refresh(spark: SparkSession, path: String, batch: DataFrame,
              idCol: String, vecCol: String,
              minCos: Double = 0.9): (Boolean, DataFrame) = {
    // two consumers (the any-drift check + the returned report): pin once
    val gate = driftGate(spark, path, batch, idCol, vecCol, minCos)
      .localCheckpoint()
    val drifted = gate.filter(col("retrain")).limit(1).count() > 0
    if (!drifted) append(spark, path, batch, idCol, vecCol)
    (!drifted, gate)
  }

  /** Every cosine ≥ `minCos` near-dup pair TOUCHING the batch, served
    * from the persisted layout — the EMBEDDING member of the
    * incremental-ingest family (the digest, band and fingerprint indexes
    * each have one; until now the similarity family only had batch
    * self-pairs and the top-k serve). Each batch vector probes its
    * `nProbe` nearest persisted centroids; corpus candidates are the
    * PARTITION-PRUNED scan of exactly those lists (the corpus is never
    * re-encoded or fully scanned), batch-internal candidates share a
    * probed list (the same multi-assign geometry). Precision is EXACT —
    * every emitted pair is cosine-verified on the raw vectors; recall is
    * the IVF multi-assign recall the GEOMETRY_RECALL rows measure and
    * floor (cos ≥ 0.7 ≥ 0.98 at the swept assign). Emits
    * (id_a, id_b, cos), id_a < id_b; an id present on both sides is the
    * same document (self-pairs drop). Probe strictly BEFORE [[append]] —
    * the fpIndexed ordering rule that keeps a doc from matching itself.
    * `smallBatch` is the ingest contract: batch probes broadcast; pass
    * false for corpus-proportional batches. */
  def pairsIncremental(spark: SparkSession, path: String, batch: DataFrame,
                       idCol: String, vecCol: String, minCos: Double,
                       nProbe: Int = dedupNProbe,
                       smallBatch: Boolean = true): DataFrame = {
    val (matrix, idxMap) = centroidModel(spark, path)
    val b = batch.select(col(idCol).as("vec_id"), toDouble(col(vecCol)).as("v"))
      .dropDuplicates("vec_id")
    val probes = b
      .select(col("vec_id"), col("v"), topProbes(col("v"), matrix, nProbe).as("_li"))
      .join(broadcast(idxMap), Seq("_li"))
      .select(col("list"), col("vec_id"), col("v"))
      // three consumers: list collect + two candidate joins. LAZY: the
      // collect below materializes it in its own job anyway — an eager
      // checkpoint just ran that job twice.
      .localCheckpoint(eager = false)
    // bounded collect (≤ batch × nProbe): drives STATIC partition pruning
    val probedLists = probes.select("list").distinct().collect().map(_.get(0))
    val bq = probes.withColumn("_nq", norm(col("v")))
    val bside = if (smallBatch) broadcast(bq) else bq
    // batch vs corpus: pruned scan of the probed lists only; hamming
    // discipline — verify INSIDE the join projection, pair-dedup after
    val corpus = graft.sources.Sources.parquetCached(spark,
        resolvedTable(spark, path, "vectors"))
      .filter(col("list").isin(probedLists: _*))
      .withColumn("_nv", norm(col("v")))
    val bc = corpus.select(col("list"), col("vec_id").as("_cid"),
        col("v").as("_cv"), col("_nv"))
      .join(bside.select(col("list"), col("vec_id").as("_bid"),
        col("v").as("_bv"), col("_nq")), Seq("list"))
      .filter(col("_bid") =!= col("_cid"))
      .withColumn("cos", dot(col("_bv"), col("_cv")) / (col("_nq") * col("_nv")))
      .filter(col("cos") >= minCos)
      .select(least(col("_bid"), col("_cid")).as("id_a"),
        greatest(col("_bid"), col("_cid")).as("id_b"), col("cos"))
    // batch-internal pairs from the shared-probed-list geometry
    val bb = bq.select(col("list"), col("vec_id").as("_ba"),
        col("v").as("_va"), col("_nq").as("_na"))
      .join(bq.select(col("list"), col("vec_id").as("_bb"),
        col("v").as("_vb"), col("_nq").as("_nb")), Seq("list"))
      .filter(col("_ba") < col("_bb"))
      .withColumn("cos", dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")))
      .filter(col("cos") >= minCos)
      .select(col("_ba").as("id_a"), col("_bb").as("id_b"), col("cos"))
    bc.unionByName(bb).dropDuplicates("id_a", "id_b")
  }

  /** Serve a query batch from the persisted index. Identical algebra to
    * [[AnnLsh.ivfTopK]] (same probes, same norm placement, same heap
    * top-k), different data source — the spec pins result equality. */
  def ivfTopK(spark: SparkSession, path: String, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    val (matrix, idxMap) = centroidModel(spark, path)
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
    val probes = q
      .select(col("query_id"), col("qv"), topProbes(col("qv"), matrix, nProbe).as("_li"))
      .join(broadcast(idxMap), Seq("_li"))
      .select("query_id", "qv", "list")
      // two consumers: the list collect + the rerank join (lazy — the
      // collect materializes it)
      .localCheckpoint(eager = false)
    // bounded collect: ≤ queries × nProbe ids — drives STATIC partition
    // pruning on the persisted layout (the whole point of the index)
    val probedLists = probes.select("list").distinct().collect().map(_.get(0))
    val vectors = graft.sources.Sources.parquetCached(spark,
        resolvedTable(spark, path, "vectors"))
      .filter(col("list").isin(probedLists: _*))
      .withColumn("_nv", norm(col("v")))
    val cands = vectors
      .join(broadcast(probes.withColumn("_nq", norm(col("qv")))), Seq("list"))
      .filter(col("vec_id") =!= col("query_id"))
    AnnLsh.topK(cands.select(col("query_id"), col("vec_id").as("neighbor_id"),
      (dot(col("qv"), col("v")) / (col("_nq") * col("_nv"))).as("cos")), k)
  }
}
