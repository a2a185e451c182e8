package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** A [[Sources.withSwapLock]] holder finished its critical section but no
  * longer owned the lease (stolen as stale during a pause/stall): the
  * section was NOT exclusive and its writes may have interleaved with the
  * new holder's — the caller must reconcile, not proceed. */
class SwapLeaseLostException(msg: String) extends IllegalStateException(msg)

/** Source/sink helpers. The reference tool ingests CSV frames
  * (tests read test_data_territories.csv); at engine scale the same data
  * arrives as CSV/JSON landing files and leaves as partitioned parquet.
  */
object Sources {

  /** CSV with header; pass a schema to skip the inference scan (inference
    * reads the data twice — never do that at 100 TB). */
  def csv(spark: SparkSession, path: String, schema: StructType = null): DataFrame = {
    val r = spark.read.option("header", "true")
    (if (schema != null) r.schema(schema) else r.option("inferSchema", "true")).csv(path)
  }

  /** Newline-delimited JSON with explicit schema (schemaless JSON reads
    * also scan twice). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // Session-lifetime (path, content-fingerprint, analysis-conf) → resolved
  // DataFrame cache for the PERSISTED INDEX tables (keys/fps, buckets/
  // shingles, vectors/centroids, params): every probe re-paid 30-300 ms of
  // single-threaded driver DataSource resolution per table per call
  // (measured by tools/LoadOverhead for the same operation on testdata
  // tables) — the graft.Tables frame-cache idiom applied to index roots.
  // The cache holds the LAZY plan only (file listing + footer schema,
  // never rows); the fingerprint walk (names ⊕ lengths ⊕ mtimes, the
  // Tables.contentFingerprint idiom) drops an entry the moment append/
  // compact/rekey publishes new files. Sessions unpin via the same
  // stopped-context sweep; a size cap bounds the scratch-index paths the
  // bench protocol creates per run.
  private val readCache =
    new java.util.HashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, Long, String), DataFrame]]()

  private def sessionReads(spark: SparkSession) = readCache.synchronized {
    val it = readCache.keySet().iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    readCache.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[(String, Long, String), DataFrame]())
  }

  /** Driver-side metadata fingerprint (names ⊕ lengths ⊕ mtimes) of the
    * files under `path` via the Hadoop FileSystem; None = do not cache
    * (missing path, mid-walk races, store errors — the Tables rule). */
  private def contentFingerprint(hconf: org.apache.hadoop.conf.Configuration,
                                 path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    def fp(st: org.apache.hadoop.fs.FileStatus): Long =
      if (st.isDirectory)
        fs.listStatus(st.getPath).map(fp).foldLeft(0L)(_ ^ _)
      else st.getLen + st.getModificationTime * 0x9E3779B97F4A7C15L +
        st.getPath.getName.hashCode * 0xC2B2AE3D27D4EB4FL
    try Some(fp(fs.getFileStatus(p)))
    catch { case _: java.io.IOException => None }
  }

  /** [[parquet]] with the resolved (lazy) frame cached per session, keyed
    * on the path's content fingerprint — every action still computes from
    * the files; only the driver-side re-resolution is skipped. An
    * unfingerprintable path always re-resolves. */
  def parquetCached(spark: SparkSession, path: String): DataFrame =
    contentFingerprint(spark.sparkContext.hadoopConfiguration, path) match {
      case Some(f) =>
        val confKey = spark.conf.get("spark.sql.session.timeZone", "") + "|" +
          spark.conf.get("spark.sql.caseSensitive", "false") + "|" +
          spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        val m = sessionReads(spark)
        if (m.size > 512) m.clear() // scratch-index paths: bound the map
        m.computeIfAbsent((path, f, confKey), _ => spark.read.parquet(path))
      case None => spark.read.parquet(path)
    }

  /** Partitioned parquet sink: directory layout `partitionCols` for
    * partition pruning downstream. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** ORC read — columnar alternative ingest format; same pushdown story as
    * parquet (predicate + column pruning reach the stripe reader). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink (zlib by default; Spark's ORC writer carries min/max stripe
    * statistics used for predicate pushdown on re-read). */
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** Bucketed managed table: two tables bucketed+sorted on the same join
    * key co-locate their data, so equi-joins between them need NO shuffle
    * exchange — the pre-shuffle is paid once at write time. This is the
    * repeated-big-join answer at 100 TB. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Clustered data layout: range-repartition on the clustering columns and
    * sort within each partition before writing, so every output file holds
    * a narrow, non-overlapping key range. Parquet row-group min/max stats
    * then prune whole files for range predicates on those columns — the
    * write-once, skip-forever layout step of a 100 TB table (the practical
    * core of Z-ordering when one clustering dimension dominates).
    * `targetPartitions` controls file count/size (at scale: total bytes /
    * desired file size). */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
                     targetPartitions: Int, mode: String = "overwrite"): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must be non-empty")
    df.repartitionByRange(targetPartitions, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(mode).parquet(path)
  }

  /** [[writeClustered]] with the partition (= file) count chosen by AQE
    * from DATA SIZE instead of a caller constant: a range repartition with
    * no explicit N participates in AQE partition coalescing, so the same
    * call writes a couple of sized files at test scale and thousands at
    * cluster scale (guide §2.2/§6). Every previous call site passed
    * `spark.sql.shuffle.partitions` — a CORE-count constant that produced
    * 32 kilobyte-sized files per table locally and would produce
    * core-count-many multi-GB files on a cluster; neither is a file
    * sizing law. Range clustering and within-file sort are unchanged
    * (AQE merges only ADJACENT range partitions). */
  def writeClusteredAdaptive(df: DataFrame, path: String,
                             clusterCols: Seq[String],
                             mode: String = "overwrite"): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must be non-empty")
    df.repartitionByRange(clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(mode).parquet(path)
  }

  /** Morton (Z-order) interleave of two non-negative integer keys, `bits`
    * bits each — pure shift/mask column arithmetic, whole-stage codegen.
    * Range-sorting on the Z-value keeps files tight in BOTH dimensions at
    * once, which [[writeClustered]]'s lexicographic sort cannot do for the
    * second column. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             bits: Int = 21): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      val bitA = shiftleft(shiftright(a.cast("bigint"), i).bitwiseAND(1L), 2 * i + 1)
      val bitB = shiftleft(shiftright(b.cast("bigint"), i).bitwiseAND(1L), 2 * i)
      bitA.bitwiseOR(bitB)
    }.reduce(_ bitwiseOR _)
  }

  /** Z-ordered data layout: range-repartition + sort on the Morton
    * interleave of two clustering keys, so every output file covers a small
    * square-ish tile of the (a, b) key space and parquet min/max stats
    * prune files for selective predicates on EITHER column — the
    * two-dimensional generalisation of [[writeClustered]]. The Z column is
    * dropped before writing; it exists only to drive the layout. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    targetPartitions: Int, bits: Int = 21,
                    mode: String = "overwrite"): Unit = {
    import org.apache.spark.sql.functions.{max, min}
    // zValue silently IGNORES key bits above `bits` and interleaves SIGN
    // bits of negative keys: either way, keys collide, every file's
    // bounding box spans the full range, and the documented pruning
    // property silently vanishes. One cheap agg (vs. a full table rewrite)
    // makes that loud. Each column checks independently so an all-null
    // column neither masks the other nor NPEs.
    val bounds = df.agg(
      min(col(colA).cast("bigint")).as("a_lo"), max(col(colA).cast("bigint")).as("a_hi"),
      min(col(colB).cast("bigint")).as("b_lo"), max(col(colB).cast("bigint")).as("b_hi"))
      .head()
    val lim = 1L << bits
    def check(name: String, lo: Int, hi: Int): Unit =
      if (!bounds.isNullAt(lo))
        require(bounds.getLong(lo) >= 0L && bounds.getLong(hi) < lim,
          s"z-order bits=$bits covers keys in [0, $lim), but $name spans " +
            s"[${bounds.get(lo)}, ${bounds.get(hi)}] — raise `bits` or pre-scale the keys")
    check(colA, 0, 1)
    check(colB, 2, 3)
    df.withColumn("_z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(targetPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(mode).parquet(path)
  }

  /** Small-file compaction: rewrite a fragmented table into
    * `ceil(rows / targetRowsPerFile)` right-sized files, preserving the
    * clustered layout when `orderCols` is given (compaction is where the
    * 100 TB table's file count is kept sane after streaming/incremental
    * ingest has sprayed thousands of small files). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetRowsPerFile: Long, orderCols: Seq[String] = Nil): Unit = {
    val df = spark.read.parquet(inPath)
    val n = math.max(1L, (df.count() + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val laid =
      if (orderCols.nonEmpty)
        df.repartitionByRange(n, orderCols.map(col): _*)
          .sortWithinPartitions(orderCols.map(col): _*)
      else df.repartition(n)
    laid.write.mode("overwrite").parquet(outPath)
  }

  /** Crash-safe publish of a freshly-written path over a live one, via
    * `FileSystem.rename` (atomic on HDFS/local; on S3-style stores run
    * the swap under a Delta/Iceberg transaction instead). The live copy
    * is renamed to a `_<name>_old` backup BEFORE the new data takes its
    * place, and [[recoverSwap]] — which every writer AND reader of a
    * swapped path must call first — restores the backup if a crash
    * between the two renames left no live copy. Worst case under any
    * single crash: the OLD data stays live (the new write is redone),
    * never a window with no copy at all. Works for files and
    * directories alike. */
  def publishSwap(fs: org.apache.hadoop.fs.FileSystem,
                  live: org.apache.hadoop.fs.Path,
                  tmp: org.apache.hadoop.fs.Path,
                  old: org.apache.hadoop.fs.Path): Unit = {
    require(fs.exists(live) || !fs.exists(old),
      s"backup $old is the only copy — run recoverSwap before publishSwap")
    if (fs.exists(old)) require(fs.delete(old, true), s"stale backup stuck: $old")
    if (fs.exists(live))
      require(fs.rename(live, old), s"backup rename failed: $live -> $old")
    require(fs.rename(tmp, live), s"publish rename failed: $tmp -> $live")
    fs.delete(old, true)
  }

  /** WRITER-side restore: bring the `_old` backup back when a crash
    * mid-[[publishSwap]] left no live copy. MUTATES the swapped path, so
    * it must only run under the single-maintenance-writer contract: a
    * restore issued while a live publisher sits between its two renames
    * would re-occupy `live` and break (or nest) the publisher's final
    * rename. Readers use [[resolveSwap]] (non-mutating); appenders use
    * [[restoreUnderLock]] while holding the table's [[withSwapLock]]
    * lease. Idempotent. */
  def restoreSwap(fs: org.apache.hadoop.fs.FileSystem,
                  live: org.apache.hadoop.fs.Path,
                  old: org.apache.hadoop.fs.Path): Unit =
    if (!fs.exists(live) && fs.exists(old))
      require(fs.rename(old, live), s"backup restore failed: $old -> $live")

  /** NON-MUTATING reader-side resolution of a swapped path: the path to
    * read NOW — `live` when present, else the `_old` backup a publisher
    * (in-flight or crashed) has parked the previous copy at. Probes can
    * call this concurrently with [[publishSwap]]: unlike a reader-issued
    * [[restoreSwap]], nothing is renamed, so a publisher mid-window can
    * never find its target re-occupied. The residual race — the publisher
    * deletes `_old` just after a reader resolved to it — surfaces as a
    * loud read error (retry the resolve), never as a corrupted publish. */
  def resolveSwap(fs: org.apache.hadoop.fs.FileSystem,
                  live: org.apache.hadoop.fs.Path,
                  old: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
    if (fs.exists(live)) live
    else if (fs.exists(old)) old
    else live

  /** REAL mutual exclusion between a swapped table's maintenance writers
    * — the compactor's publish window and every appender's write — via a
    * heartbeat lease file. The previous grace-period guess ("a publisher
    * returns within 2s") broke both ways: a slow reconcile copy made
    * healthy appenders time out and restore the backup INSIDE the
    * publisher's rename window, and an append that started inside the
    * window recreated `live` under the publisher's final rename. Under
    * the lease neither interleaving exists: the publisher holds the lock
    * across its two renames, appenders hold it across their write, and a
    * CRASHED holder is detected by heartbeat age, not by guessing at
    * publish duration — a live holder's daemon touches the lock file
    * every leaseMs/4, so only a genuinely dead holder ever gets stolen
    * (atomically, via rename — exactly one contender wins).
    *
    * Probes/readers stay LOCK-FREE ([[resolveSwap]]) — the lease covers
    * only the maintenance-writer pair. `fs.create(overwrite=false)` is
    * atomic on HDFS (namenode-arbitrated); on S3-style stores use a
    * conditional-put / table-format lock instead. Reentrant acquisition
    * is NOT supported — one lock per maintenance operation.
    *
    * TOKEN FENCE: the lease file holds the holder's UUID, and every
    * heartbeat AND the release re-read it — a holder whose lease was
    * stolen (a JVM/GC pause or FS stall longer than `leaseMs`) stops
    * extending the NEW holder's lease, never deletes it, and FAILS the
    * call with [[SwapLeaseLostException]] instead of returning as if the
    * critical section had been exclusive — the caller must treat the
    * operation as suspect (its writes may have interleaved with the
    * thief's).
    *
    * CLOCK DOMAIN: stale detection compares the CONTENDER's clock against
    * a modification time set by the HOLDER's clock (`fs.setTimes`), so
    * holder and contenders must share a clock domain to within ≪ leaseMs
    * (true on a single driver, or NTP-synced cluster nodes against one
    * HDFS namenode's arbitration). Cross-machine skew approaching leaseMs
    * risks premature steals (the token fence then surfaces them loudly on
    * the victim) or unstealabe locks from a skewed-ahead dead holder
    * (raise leaseMs or clear the lock administratively). */
  def withSwapLock[T](fs: org.apache.hadoop.fs.FileSystem,
                      lockPath: org.apache.hadoop.fs.Path,
                      leaseMs: Long = 60000L, pollMs: Long = 100L)(body: => T): T = {
    require(leaseMs >= 4 * pollMs, s"leaseMs=$leaseMs too short for pollMs=$pollMs")
    val token = java.util.UUID.randomUUID().toString
    var acquired = false
    while (!acquired) {
      try {
        val out = fs.create(lockPath, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          val st =
            try Some(fs.getFileStatus(lockPath))
            catch { case _: java.io.FileNotFoundException => None }
          st match {
            case Some(s) if System.currentTimeMillis() - s.getModificationTime > leaseMs =>
              // stale: the holder's heartbeat died. Steal via rename — the
              // one contender whose rename succeeds clears it; the rest
              // loop back to the create race.
              val tomb = new org.apache.hadoop.fs.Path(
                lockPath.getParent, s".${lockPath.getName}.stale.$token")
              if (try fs.rename(lockPath, tomb) catch { case _: java.io.IOException => false })
                fs.delete(tomb, false)
            case _ => Thread.sleep(pollMs)
          }
      }
    }
    // the fence read: whose token does the lease file hold right now?
    // Tri-state, because "couldn't read" and "read a different token" demand
    // opposite reactions: a CONFIRMED mismatch (or a vanished file — steals
    // rename the lease out before recreating it) means stolen, while a
    // transient IO failure or short read means "unknown, re-check" — a single
    // FS hiccup must not permanently kill a healthy exclusive section.
    sealed trait OwnerRead
    case class OwnerIs(tok: String) extends OwnerRead
    case object OwnerGone extends OwnerRead // confirmed: lease file absent
    case object ReadFailed extends OwnerRead // transient: retry next beat
    def readOwner(): OwnerRead =
      try {
        val in = fs.open(lockPath)
        try {
          // read to EOF — a single in.read() is not guaranteed to return the
          // whole token, and a partial UUID must not read as "not ours"
          val buf = new Array[Byte](64)
          var off = 0
          var n = 0
          while (off < buf.length && { n = in.read(buf, off, buf.length - off); n > 0 })
            off += n
          if (off <= 0) ReadFailed else OwnerIs(new String(buf, 0, off, "UTF-8"))
        } finally in.close()
      } catch {
        case _: java.io.FileNotFoundException => OwnerGone
        case _: java.io.IOException           => ReadFailed
      }
    // CONFIRMED ownership check with bounded retry over transient failures —
    // used where a spurious ReadFailed would otherwise throw or leak a lease.
    def confirmOwner(attempts: Int): OwnerRead = {
      var last: OwnerRead = ReadFailed
      var i = 0
      while (i < attempts) {
        last = readOwner()
        if (last != ReadFailed) return last
        i += 1
        if (i < attempts) Thread.sleep(math.min(pollMs, 50L))
      }
      last
    }
    // heartbeat daemon: a LIVE holder is never stolen, no matter how long
    // the body (a Spark append job, a reconcile copy) runs
    @volatile var done = false
    @volatile var lost = false
    val hb = new Thread(() => {
      try {
        var readFails = 0 // consecutive — reset on any successful fence read
        while (!done && !lost) {
          Thread.sleep(math.max(1L, leaseMs / 4))
          if (!done) {
            readOwner() match {
              case OwnerIs(t) if t == token =>
                readFails = 0
                try fs.setTimes(lockPath, System.currentTimeMillis(), -1)
                catch { case _: java.io.IOException => () } // FS hiccup: next beat re-checks
              case OwnerIs(_) | OwnerGone =>
                lost = true // CONFIRMED stolen: never extend the thief's lease
              case ReadFailed =>
                // transient: skip this extension (never blind-extend what might
                // be a thief's lease) and re-check next beat; only a sustained
                // outage — 3 beats = 3/4 leaseMs of confirmed silence, the
                // point where a steal becomes possible anyway — marks lost
                readFails += 1
                if (readFails >= 3) lost = true
            }
          }
        }
      } catch { case _: InterruptedException => () } // release signal: exit quietly
    }, s"swap-lock-heartbeat-${lockPath.getName}")
    hb.setDaemon(true)
    hb.start()
    val result =
      try body
      catch {
        case e: Throwable =>
          done = true; hb.interrupt()
          // release only what we still own — deleting a thief's lease would
          // let a THIRD writer enter its critical section
          if (confirmOwner(3) == OwnerIs(token)) fs.delete(lockPath, false)
          throw e
      }
    done = true; hb.interrupt()
    // final fence: retry transient read failures before declaring the lease
    // lost — a healthy section must not throw on one IO hiccup, but an
    // UNCONFIRMABLE ownership (3 straight failures) still fails loudly
    if (lost || confirmOwner(3) != OwnerIs(token))
      throw new SwapLeaseLostException(
        s"swap lock $lockPath: lease lost mid-critical-section (holder paused/" +
          s"stalled past leaseMs=$leaseMs and was stolen); the completed " +
          "operation may have interleaved with the new holder — reconcile before " +
          "trusting its writes")
    fs.delete(lockPath, false)
    result
  }

  /** APPENDER-side guard before writing into a swapped path — call ONLY
    * while holding the table's [[withSwapLock]] lease: under the lease no
    * publisher can be between its renames, so a missing `live` with an
    * `_old` backup present can only be a CRASHED publish, and restoring
    * it immediately is safe (no grace-period guessing). */
  def restoreUnderLock(fs: org.apache.hadoop.fs.FileSystem,
                       live: org.apache.hadoop.fs.Path,
                       old: org.apache.hadoop.fs.Path): Unit =
    restoreSwap(fs, live, old)

  /** The visible data files of a table directory (hidden `_`/`.` files —
    * `_SUCCESS`, checksums — excluded): the snapshot a RECONCILING
    * compactor takes before rewriting, so [[publishSwapReconcile]] can
    * tell which files landed after it. */
  def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                dir: org.apache.hadoop.fs.Path): Set[String] =
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).iterator.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath.getName).toSet

  /** [[publishSwap]] for a compactor running concurrently with
    * APPEND-ONLY writers (streaming ingest faces, index appenders): any
    * data file that landed in `live` after the compactor took its
    * `snapshot` — and is therefore absent from the rewrite in `tmp` — is
    * COPIED from the backup into `tmp` before the final rename, so a
    * micro-batch appended during the rewrite survives the swap instead of
    * being silently deleted with the old files. Copy, not move: a crash
    * between the copy and the publish leaves the `_old` backup whole, and
    * the next recovery restores every row. Late files may duplicate rows
    * the rewrite also holds (a crash-retried append) — the same benign
    * duplicates ordinary appends can leave, removed by the NEXT compact.
    * Concurrent COMPACTORS remain excluded (single-compactor contract:
    * `recoverSwap` clobbers a peer's temp dir).
    *
    * MUST run under the table's [[withSwapLock]] lease, with COOPERATING
    * appenders holding the same lease across their writes: the lease is
    * what guarantees no append's output committer recreates `live` inside
    * the rename window. Against a NON-cooperating writer that recreates
    * `live` anyway, [[absorbRecreatedLive]] is the belt-and-braces: its
    * visible data files are merged into `tmp` before the final rename
    * (the writer's in-flight temp state is discarded — its commit then
    * fails LOUDLY instead of nesting tmp inside live or making the next
    * compact silently truncate the table by deleting `_old`). */
  def publishSwapReconcile(fs: org.apache.hadoop.fs.FileSystem,
                           live: org.apache.hadoop.fs.Path,
                           tmp: org.apache.hadoop.fs.Path,
                           old: org.apache.hadoop.fs.Path,
                           snapshot: Set[String]): Unit = {
    require(fs.exists(live) || !fs.exists(old),
      s"backup $old is the only copy — run recoverSwap before publishSwapReconcile")
    if (fs.exists(old)) require(fs.delete(old, true), s"stale backup stuck: $old")
    if (fs.exists(live))
      require(fs.rename(live, old), s"backup rename failed: $live -> $old")
    // the backup now holds everything `live` accumulated, including files
    // appended after the snapshot; listing AFTER the rename means any
    // append that won the race into the old directory is seen here
    if (fs.exists(old)) {
      fs.listStatus(old).iterator.filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".") &&
          !snapshot.contains(n)
      }.foreach { st =>
        val dst = new org.apache.hadoop.fs.Path(tmp, st.getPath.getName)
        require(org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs, dst,
          false, fs.getConf),
          s"late-append reconcile copy failed: ${st.getPath} -> $dst")
      }
    }
    absorbRecreatedLive(fs, live, tmp)
    require(fs.rename(tmp, live), s"publish rename failed: $tmp -> $live")
    fs.delete(old, true)
  }

  /** Belt-and-braces for [[publishSwapReconcile]]'s final rename: if a
    * NON-cooperating writer recreated `live` inside the publish window
    * (e.g. a FileOutputCommitter job that was not holding the lease), an
    * unconditional `rename(tmp, live)` would fail (local FS) or NEST tmp
    * inside live (HDFS semantics for rename-onto-existing-dir) — and the
    * NEXT compact's recovery would then delete `_old`, the only full
    * copy, silently truncating the table. Instead: merge the recreated
    * directory's VISIBLE data files into `tmp` (committed rows survive)
    * and delete the rest (`_temporary` half-state — the rogue writer's
    * commit fails loudly, the correct outcome for a lock violation), so
    * the final rename always lands on a clear path. No-op when `live`
    * does not exist (the lease-protected normal case). */
  def absorbRecreatedLive(fs: org.apache.hadoop.fs.FileSystem,
                          live: org.apache.hadoop.fs.Path,
                          tmp: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(live)) return
    fs.listStatus(live).iterator.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.foreach { st =>
      val dst = new org.apache.hadoop.fs.Path(tmp, st.getPath.getName)
      require(fs.rename(st.getPath, dst),
        s"recreated-live absorb failed: ${st.getPath} -> $dst")
    }
    require(fs.delete(live, true), s"recreated live dir stuck: $live")
  }

  /** WRITER-side recovery before re-writing a swapped path:
    * [[restoreSwap]] plus clearing any half-written temp from a crashed
    * writer (single-maintenance-writer assumption — a concurrent
    * compactor's temp would be clobbered). */
  def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                  live: org.apache.hadoop.fs.Path,
                  tmp: org.apache.hadoop.fs.Path,
                  old: org.apache.hadoop.fs.Path): Unit = {
    restoreSwap(fs, live, old)
    fs.delete(tmp, true)
  }

  /** [[dataFiles]] for a PARTITIONED table directory (Hive-style
    * `col=value/part-*.parquet` subdirs, e.g. the IVF layout's `list=N`):
    * the table-relative paths of every visible data file, descending only
    * into visible subdirectories — `_SUCCESS`, checksums, and in-flight
    * `_temporary`/`.`-prefixed state excluded at every level. Relative
    * paths (not bare names) because a reconciling compactor must copy a
    * late-appended file back into the SAME partition subdirectory. */
  def dataFilesRecursive(fs: org.apache.hadoop.fs.FileSystem,
                         dir: org.apache.hadoop.fs.Path): Set[String] = {
    def walk(d: org.apache.hadoop.fs.Path, prefix: String): Iterator[String] =
      fs.listStatus(d).iterator.filter { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }.flatMap { st =>
        if (st.isDirectory) walk(st.getPath, s"$prefix${st.getPath.getName}/")
        else Iterator(prefix + st.getPath.getName)
      }
    if (!fs.exists(dir)) Set.empty else walk(dir, "").toSet
  }

  /** [[publishSwapReconcile]] for a PARTITIONED table: `snapshot` holds
    * table-RELATIVE paths from [[dataFilesRecursive]], and a file that
    * landed after the snapshot is copied into the matching partition
    * subdirectory of `tmp` (created on demand) — so a cooperating
    * appender's micro-batch that raced the rewrite survives the swap in
    * the right partition, never flattened into the table root. Same
    * contract as the flat variant: run under the table's
    * [[withSwapLock]] lease, single-compactor, late copies may duplicate
    * rows a crash-retried append also left (removed by the next
    * compact). */
  def publishSwapReconcileRecursive(fs: org.apache.hadoop.fs.FileSystem,
                                    live: org.apache.hadoop.fs.Path,
                                    tmp: org.apache.hadoop.fs.Path,
                                    old: org.apache.hadoop.fs.Path,
                                    snapshot: Set[String]): Unit = {
    require(fs.exists(live) || !fs.exists(old),
      s"backup $old is the only copy — run recoverSwap before publishSwapReconcileRecursive")
    if (fs.exists(old)) require(fs.delete(old, true), s"stale backup stuck: $old")
    if (fs.exists(live))
      require(fs.rename(live, old), s"backup rename failed: $live -> $old")
    if (fs.exists(old)) {
      dataFilesRecursive(fs, old).iterator.filter(!snapshot.contains(_))
        .foreach { rel =>
          val src = new org.apache.hadoop.fs.Path(old, rel)
          val dst = new org.apache.hadoop.fs.Path(tmp, rel)
          fs.mkdirs(dst.getParent)
          require(org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst,
            false, fs.getConf),
            s"late-append reconcile copy failed: $src -> $dst")
        }
    }
    absorbRecreatedLiveRecursive(fs, live, tmp)
    require(fs.rename(tmp, live), s"publish rename failed: $tmp -> $live")
    fs.delete(old, true)
  }

  /** [[absorbRecreatedLive]] for a PARTITIONED table: a non-cooperating
    * writer's recreated `live` has its visible data files moved into the
    * matching partition subdirectories of `tmp` (committed rows survive;
    * the writer's `_temporary` half-state is discarded and its commit
    * fails loudly — the correct outcome for a lock violation), then the
    * recreated directory is cleared so the final rename lands clean. */
  def absorbRecreatedLiveRecursive(fs: org.apache.hadoop.fs.FileSystem,
                                   live: org.apache.hadoop.fs.Path,
                                   tmp: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(live)) return
    dataFilesRecursive(fs, live).foreach { rel =>
      val src = new org.apache.hadoop.fs.Path(live, rel)
      val dst = new org.apache.hadoop.fs.Path(tmp, rel)
      fs.mkdirs(dst.getParent)
      require(fs.rename(src, dst),
        s"recreated-live absorb failed: $src -> $dst")
    }
    require(fs.delete(live, true), s"recreated live dir stuck: $live")
  }
}
