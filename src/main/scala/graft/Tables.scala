package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables plus the deterministic
  * missingness maskers used by the imputation operators.
  *
  * The testdata contains no NULLs, so imputation queries mask values with a
  * deterministic modulo rule on the table key. The identical rule is applied
  * in the DuckDB oracle SQL (see [[graft.queries.OracleSql]]), which makes
  * model-free imputation strategies exactly hash-checkable.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The events table's closed event-type domain — the SINGLE source for
    * every explicit spine/pivot value list, engine-side and oracle-side
    * (eventsPivot, eventsGapFill, events_rolling), so the engine and the
    * oracle cannot drift if the testdata ever gains a type. Sorted, so
    * generated column orders are deterministic. */
  val eventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  // (session → (dir, table, content-fingerprint) → resolved DataFrame),
  // session-lifetime. `spark.read.parquet` costs 80-330 ms of DRIVER time
  // per call (DataSource resolution + file listing + footer schema read —
  // measured by tools/LoadOverhead at sf0.1), and every registered query
  // pays it 1-6× per execution, so a full bench pass was spending tens of
  // seconds re-resolving ten immutable paths. The cache holds the LAZY
  // plan only — file listing and schema, never rows — so every action
  // still computes from the parquet inputs; the content fingerprint
  // (same walk as countCache) drops the entry the moment the files
  // change. A WeakHashMap alone can NOT unpin entries: the cached
  // DataFrame values strongly reference their SparkSession
  // (Dataset.sparkSession), so every sessionFrames call also sweeps
  // sessions whose SparkContext has stopped — the actual end-of-life
  // signal a test suite emits. A stopped context can serve no frame, so
  // the sweep can never evict a live entry.
  // The key also carries the session TIMEZONE plus the other
  // analysis-affecting confs baked into a resolved parquet plan
  // (caseSensitive, parquet nanosAsLong): the events NTZ→nanos
  // normalization is only sound under UTC and `load` guards that loudly —
  // a session that flips any of these mid-life must MISS the cache and
  // re-resolve (Round9Spec pins the timezone case), never be served a
  // frame analyzed under the old conf.
  private val frameCache =
    new java.util.HashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String, Long, String), DataFrame]]()

  private def sessionFrames(spark: SparkSession) = frameCache.synchronized {
    // unpin dead sessions: value frames reference their session, so only
    // an explicit liveness sweep (not weak refs) releases SessionState
    val it = frameCache.keySet().iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    frameCache.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[(String, String, Long, String), DataFrame]())
  }

  private def analysisConfKey(spark: SparkSession): String =
    spark.conf.get("spark.sql.session.timeZone", "") + "|" +
      spark.conf.get("spark.sql.caseSensitive", "false") + "|" +
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    contentFingerprint(spark.sparkContext.hadoopConfiguration,
        s"$dir/$name.parquet") match {
      case Some(f) =>
        sessionFrames(spark).computeIfAbsent((dir, name, f, analysisConfKey(spark)),
          _ => load(spark, dir, name))
      case None => load(spark, dir, name) // unfingerprintable: never cache
    }
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The events stream keys every operator on integer NANOSECONDS since
    // epoch. The driver's parquet has carried `ts` as int64 nanos and as a
    // microsecond timestamp across testdata generations; normalize the
    // timestamp encodings to bigint nanos at load — exactly DuckDB's
    // `epoch_ns(ts)`, which the oracle SQL already uses — so every
    // downstream `ts div/pmod` stays in one unambiguous unit.
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        // tz-aware timestamps are instants — unix_micros is session-TZ-free
        df.withColumn("ts", (unix_micros(col("ts")) * 1000L).as("ts"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // An NTZ value only becomes an instant through the session timezone,
        // and the oracle's epoch_ns(ts) reads the naive value AS UTC — so a
        // non-UTC session would silently shift every ts by the zone offset.
        // All in-repo entry points pin UTC; an embedding session that
        // doesn't must fail LOUDLY here, not hash-mismatch downstream.
        val tz = spark.conf.get("spark.sql.session.timeZone")
        val utcFixed = try {
          val rules = java.time.ZoneId.of(tz).getRules
          rules.isFixedOffset &&
            rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
        } catch { case _: Exception => false }
        require(utcFixed,
          s"graft.Tables: events.ts is TIMESTAMP_NTZ and spark.sql.session.timeZone=$tz " +
            "is not UTC — the NTZ→epoch-nanos normalization would silently shift ts by " +
            "the zone offset; set spark.sql.session.timeZone=UTC on the session")
        df.withColumn("ts", (unix_micros(col("ts").cast("timestamp")) * 1000L).as("ts"))
      case _ => df
    } else df
  }

  // (dir, table, content-fingerprint) → row count, session-lifetime.
  // Parquet counts are metadata-cheap but still a job each; the
  // adaptive-geometry faces (dedup_simhash, mm_phash, embed_cluster_lsh)
  // derive their keying geometry from corpus cardinality on EVERY
  // execution, so a bench pass was paying 3 count jobs per face run for a
  // number that never changes within a session. ConcurrentHashMap: faces
  // run concurrently under the bench harness. The key carries a cheap
  // CONTENT fingerprint (file lengths ⊕ mtimes — same idiom as the band-
  // index cache in ScalingBench) so testdata regenerated at the same path
  // mid-session feeds a fresh cardinality into the geometry, not a stale
  // one; the fingerprint walk is a local metadata stat, no Spark job.
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Long), java.lang.Long]()

  /** Driver-side metadata fingerprint of the files under `path`, resolved
    * through the Hadoop FileSystem so HDFS/S3A table paths fingerprint the
    * same way local ones do (file names ⊕ lengths ⊕ mtimes; object stores
    * report all three). Entries keyed by superseded fingerprints stay in
    * the map for the session — bounded by regens-per-session × tables,
    * negligible. Pipelines that MUTATE a table in place between reads
    * should still pass their own post-mutation count rather than rely on
    * mtime granularity (some stores round mtimes to seconds): an in-place
    * regen producing the same file names, lengths AND mtime-seconds
    * collides, and since the FRAME cache also keys on this fingerprint,
    * such a collision now serves a stale file listing (pre-frame-cache it
    * only served a stale count). The name component means any regen that
    * changes part-file names — every normal Spark overwrite does — misses
    * regardless of mtime granularity.
    *
    * `None` means "do not cache": a missing root path, a transient
    * mid-walk FileNotFound (file compacted/deleted between listStatus and
    * the child stat), and any other IOException (S3 throttle, permission)
    * all land here — none of them is a stable content key to cache a
    * count under, and none should crash the caller's read path (the read
    * itself will fail loudly if the table is genuinely gone). The old
    * `0L` sentinel conflated all three WITH a legitimate xor-to-zero
    * fingerprint, exactly the key a stale count could hide under. */
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

  /** Session-cached row count of a testdata table — ONE count job per
    * (dir, table, content) per session, shared by every adaptive-geometry
    * face, invalidated automatically when the files under the path change.
    * An unfingerprintable path bypasses the cache entirely: the count runs
    * (or fails loudly, if the table is really missing) but is never stored
    * under a key a later healthy walk could collide with. */
  def cachedCount(spark: SparkSession, dir: String, name: String): Long =
    contentFingerprint(spark.sparkContext.hadoopConfiguration,
        s"$dir/$name.parquet") match {
      case Some(f) => countCache.computeIfAbsent((dir, name, f),
        _ => java.lang.Long.valueOf(apply(spark, dir, name).count())).longValue()
      case None => apply(spark, dir, name).count()
    }

  /** NULL out `valueCol` where `keyCol % m == r` — mirrored in oracle SQL. */
  def maskMod(df: DataFrame, valueCol: String, keyExpr: String, m: Int, r: Int): DataFrame =
    df.withColumn(valueCol,
      when(expr(keyExpr) % m === r, lit(null)).otherwise(col(valueCol)))

  /** customer with c_acctbal masked (custkey%7==3) and c_mktsegment masked
    * (custkey%11==5). ~14% / ~9% missing respectively. */
  def maskedCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = apply(spark, dir, "customer")
    maskMod(maskMod(c, "c_acctbal", "c_custkey", 7, 3), "c_mktsegment", "c_custkey", 11, 5)
  }

  /** lineitem with l_extendedprice masked ((orderkey+linenumber)%13==1);
    * l_quantity stays observed and is the regression feature. */
  def maskedLineitem(spark: SparkSession, dir: String): DataFrame =
    maskMod(apply(spark, dir, "lineitem"), "l_extendedprice", "l_orderkey + l_linenumber", 13, 1)

  /** lineitem with BOTH l_quantity ((ok+ln)%17==2) and l_extendedprice
    * ((ok+ln)%13==1) masked — the chained-imputation (MICE) input, where
    * each column is sometimes the predictor and sometimes the target. */
  def miceLineitem(spark: SparkSession, dir: String): DataFrame =
    maskMod(maskedLineitem(spark, dir), "l_quantity", "l_orderkey + l_linenumber", 17, 2)

  /** [[miceLineitem]] plus l_discount masked ((ok+ln)%19==3) — the
    * THREE-column chained-imputation input where every column regresses
    * on the other two (multi-predictor MICE). */
  def miceLineitem3(spark: SparkSession, dir: String): DataFrame =
    maskMod(miceLineitem(spark, dir), "l_discount", "l_orderkey + l_linenumber", 19, 3)
}
