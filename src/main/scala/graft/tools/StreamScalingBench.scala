package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Measured rate×state evidence for the streaming faces (VERDICT r8 item:
  * the batch side has docs/SCALING.json, the streaming side had only
  * state-bound arguments). Drives stream_topk, stream_curate and
  * stream_cdc through MemoryStream at two input volumes and records wall
  * time, throughput, and the TOTAL STATE ROWS the state store reports —
  * the number whose growth law (windows×users / kept-hashes / snapshot
  * keys, never raw row count) is each face's 100 TB claim.
  *
  * The three PERSISTED-INDEX faces (stream_dedup_indexed,
  * stream_neardup_indexed, stream_fp_indexed) carry their state on disk,
  * not in the state store, so their rows measure the INDEX — and their
  * state law is GATED, not just recorded: after the run the index must
  * hold exactly what its growth law predicts (digests = corpus + DISTINCT
  * novel texts; band/fp index rows = corpus + ingested ids, duplicates
  * adding fps/shingle rows but no new key rows beyond their geometry) —
  * the tool exits nonzero on any deviation. Per-batch wall times for the
  * first and last micro-batch are recorded alongside: the incremental
  * contract says batch cost tracks BATCH size, not corpus size, so the
  * last batch (probing an index 8 batches bigger) should not trend away
  * from the first (recorded, not gated — wall time is environment-noisy,
  * index row counts are not).
  *
  * Run: `sbt "runMain graft.tools.StreamScalingBench"` — writes the row
  * array to SPARK_GRAFT_STREAM_SCALING_OUT (default
  * docs/STREAM_SCALING.json) and prints it. */
object StreamScalingBench {

  case class SEv(ts: Timestamp, event_type: String, value: Double, event_id: Long)
  case class SDoc(ts: Timestamp, doc_id: Long, text: String)

  private val base = 1700000000000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val results = scala.collection.mutable.ArrayBuffer.empty[String]

    def record(face: String, n: Int, secs: Double, stateRows: Long, outRows: Long): Unit = {
      val line = s"""{"face":"$face","rows_in":$n,"sec":${fmt(secs)},""" +
        s""""rows_per_sec":${fmt(n / secs)},"state_rows":$stateRows,"out_rows":$outRows}"""
      results += line
      println(line)
    }

    // ---- stream_topk: W tumbling windows × U users, state must track
    // (window,user) counts + one k-heap per window — NOT the event count.
    // The 2000-row pass is an unrecorded JIT/codegen warmup.
    for (n <- Seq(2000, 20000, 100000)) {
      val users = 500
      val windows = 12
      val evs = (0 until n).map { i =>
        SEv(new Timestamp(base + (i.toLong * windows * 3600000L / n)),
          "click", 1.0, (i * 2654435761L % users).abs)
      }
      val input = MemoryStream[SEv]
      val out = graft.streaming.Streams.windowedTopUsers(
        input.toDF().withColumnRenamed("event_id", "user_id"), "ts", "user_id", k = 5)
      val q = out.writeStream.format("memory").queryName(s"sb_topk_$n")
        .outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        evs.grouped(n / 4).foreach { g => input.addData(g: _*); q.processAllAvailable() }
        // capture LIVE state before the flush: (window,user) counts for the
        // open windows — the number bounded by W×U, not by n
        val live = Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        // watermark-flush event closes all windows
        input.addData(SEv(new Timestamp(base + 100L * 3600000L), "click", 1.0, 1L))
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        if (n > 2000)
          record("stream_topk", n, secs, live, spark.table(s"sb_topk_$n").count())
      } finally q.stop()
    }

    // ---- stream_bots: U users over W minute windows with B planted
    // bursters — state is the open (window, user) counts (≤ W×U), output
    // is ONE alert per (burster, burst window) regardless of n
    for (n <- Seq(2000, 20000, 100000)) {
      val users = 500
      val windows = 30
      val bursters = 2
      val evs = (0 until n).map { i =>
        // 5% of traffic concentrates on 2 bursters IN THE CURRENT window
        // (bursts riding event-time keeps them ahead of the watermark at
        // every volume; per-(burster, window) burst ≈ n/1200)
        val burst = i % 20 == 0
        val uid = if (burst) (i / 20) % bursters else (i * 2654435761L % users).abs + 100L
        val w = i.toLong * windows / n
        SEv(new Timestamp(base + w * 60000L + (i % 50) * 10L), "click", 1.0, uid)
      }
      val input = MemoryStream[SEv]
      val out = graft.streaming.Streams.botAlerts(
        input.toDF().withColumnRenamed("event_id", "user_id"), "ts", "user_id",
        threshold = 15L)
      val q = out.writeStream.format("memory").queryName(s"sb_bots_$n")
        .outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        evs.grouped(n / 4).foreach { g => input.addData(g: _*); q.processAllAvailable() }
        val live = Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        input.addData(SEv(new Timestamp(base + 1000L * 60000L), "click", 1.0, 1L))
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        if (n > 2000)
          record("stream_bots", n, secs, live, spark.table(s"sb_bots_$n").count())
      } finally q.stop()
    }

    // ---- stream_curate: D distinct texts at ~5× duplication — state is
    // the kept content hashes inside the watermark, bounded by D not n
    for (n <- Seq(2000, 20000, 100000)) {
      val distinct = n / 5
      val good = ("the of and to is " * 10).trim
      val docs = (0 until n).map { i =>
        SDoc(new Timestamp(base + i.toLong * 60L), i.toLong,
          s"$good marker${i % distinct}")
      }
      val input = MemoryStream[SDoc]
      val out = graft.streaming.Streams.curate(input.toDF(), "ts", "text")
      val q = out.writeStream.format("memory").queryName(s"sb_curate_$n")
        .outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        docs.grouped(n / 4).foreach { g => input.addData(g: _*); q.processAllAvailable() }
        val secs = (System.nanoTime() - t0) / 1e9
        val state = Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        if (n > 2000)
          record("stream_curate", n, secs, state, spark.table(s"sb_curate_$n").count())
      } finally q.stop()
    }

    // ---- stream_cdc: K snapshot keys folded under n changes — the handle
    // after the run must hold exactly K rows whatever n was
    for (n <- Seq(2000, 20000, 100000)) {
      val keys = 2000
      val snapshot0 = (0L until keys.toLong).toDF("c_custkey")
        .withColumn("seq", lit(0L))
        .withColumn("c_acctbal", col("c_custkey").cast("double"))
      val changes = (0 until n).map { i =>
        (i.toLong % keys, i.toLong + 1L, "U", i.toDouble)
      }
      val input = MemoryStream[(Long, Long, String, Double)]
      val (state, writer) = graft.streaming.Streams.cdcApply(
        input.toDF().toDF("c_custkey", "seq", "op", "c_acctbal"), snapshot0,
        "c_custkey", "seq")
      val q = writer.start()
      try {
        val t0 = System.nanoTime()
        changes.grouped(n / 4).foreach { g =>
          input.addData(g: _*); q.processAllAvailable()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        if (n > 2000)
          record("stream_cdc", n, secs, state.get().count(), -1L)
      } finally q.stop()
    }

    // ---- the persisted-index ingest faces: disk-index state, gated laws.
    // Batches are id-unique; every second batch row duplicates CONTENT
    // (text/fingerprint) already seen, so the alert/dup paths stay hot.
    val lawViolations = scala.collection.mutable.ArrayBuffer.empty[String]
    def gate(face: String, what: String, got: Long, want: Long): Unit =
      if (got != want) lawViolations += s"$face: $what = $got, law says $want"
    def recordIdx(face: String, n: Int, secs: Double, stateRows: Long,
                  outRows: Long, firstBatch: Double, lastBatch: Double): Unit = {
      val line = s"""{"face":"$face","rows_in":$n,"sec":${fmt(secs)},""" +
        s""""rows_per_sec":${fmt(n / secs)},"state_rows":$stateRows,""" +
        s""""out_rows":$outRows,"batch_sec_first":${fmt(firstBatch)},""" +
        s""""batch_sec_last":${fmt(lastBatch)}}"""
      results += line
      println(line)
    }
    val nBatches = 8

    // stream_fp_indexed: base corpus of C random fps; streamed ids unique,
    // half the rows re-use an already-ingested fingerprint (hamming 0).
    // Law: fps rows = C + n exactly (id-guarded), keys rows = combos ×
    // DISTINCT fps (duplicate fingerprints add no key rows).
    for (n <- Seq(4000, 16000)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_ssb_fp").toString
      val c = 2000
      val rnd = new java.util.Random(0xF00D + n)
      val baseFps = (0 until c).map(i => (i.toLong, rnd.nextLong()))
      graft.dedup.FingerprintIndex.write(baseFps.toDF("doc_id", "fp"),
        "doc_id", "fp", s"$dir/index")
      val streamed = (0 until n).map { i =>
        val id = (c + i).toLong
        if (i % 2 == 1) (id, baseFps(i % c)._2)          // content dup
        else (id, rnd.nextLong())                         // novel fp
      }
      val input = MemoryStream[(Long, Long)]
      val q = graft.streaming.Streams.fpIndexed(
          input.toDF().toDF("doc_id", "fp"), "doc_id", "fp",
          s"$dir/index", s"$dir/alerts")
        .option("checkpointLocation", s"$dir/ckpt").start()
      try {
        val batchSecs = streamed.grouped(n / nBatches).map { g =>
          val t0 = System.nanoTime()
          input.addData(g: _*); q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }.toSeq
        val fps = spark.read.parquet(s"$dir/index/fps")
        val keys = spark.read.parquet(s"$dir/index/keys")
        val nFps = fps.count()
        val distinctFps = fps.select("fp").distinct().count()
        // combos per fp come from the PINNED geometry (d=1 at this corpus
        // size => C(8,1) = 8 key rows per distinct fingerprint)
        gate("stream_fp_indexed", "fps_rows", nFps, c + n)
        gate("stream_fp_indexed", "keys_rows", keys.count(), distinctFps * 8)
        recordIdx("stream_fp_indexed", n, batchSecs.sum, nFps + keys.count(),
          spark.read.parquet(s"$dir/alerts").count(),
          batchSecs.head, batchSecs.last)
      } finally q.stop()
    }

    // stream_dedup_indexed: streamed rows duplicate each distinct text 4×.
    // Law: digests = corpus + DISTINCT novel texts = C + n/4 — state is
    // bounded by distinct CONTENT, never row volume.
    for (n <- Seq(4000, 16000)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_ssb_dd").toString
      val c = 2000
      val corpus = (0 until c).map(i => (i.toLong, s"corpus doc $i stable text"))
      graft.dedup.Dedup.writeDigestIndex(corpus.toDF("doc_id", "text"),
        "text", s"$dir/index", expectedKeys = (c + n).toLong)
      val streamed = (0 until n).map { i =>
        ((c + i).toLong, s"streamed doc ${i % (n / 4)} body")
      }
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.dedupIndexed(
          input.toDF().toDF("doc_id", "text"), "doc_id", "text",
          s"$dir/index", s"$dir/novel")
        .option("checkpointLocation", s"$dir/ckpt").start()
      try {
        val batchSecs = streamed.grouped(n / nBatches).map { g =>
          val t0 = System.nanoTime()
          input.addData(g: _*); q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }.toSeq
        val nDigests = spark.read.parquet(s"$dir/index/digests").count()
        val novel = spark.read.parquet(s"$dir/novel").count()
        gate("stream_dedup_indexed", "digest_rows", nDigests, c + n / 4)
        gate("stream_dedup_indexed", "novel_rows", novel, n / 4)
        recordIdx("stream_dedup_indexed", n, batchSecs.sum, nDigests, novel,
          batchSecs.head, batchSecs.last)
      } finally q.stop()
    }

    // stream_neardup_indexed: unique 12-token texts per id (near-dup
    // alerts exercised by one shared tail token across a planted pair per
    // batch is unnecessary here — the law under gate is the index shape).
    // Law: buckets = (C + n) × bands; shingles cover exactly C + n ids.
    for (n <- Seq(2000, 8000)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_ssb_nd").toString
      val c = 1000
      val bands = 8
      def text(tag: String, i: Int) =
        (0 until 12).map(t => s"${tag}_${i}_w$t").mkString(" ")
      val corpus = (0 until c).map(i => (i.toLong, text("c", i)))
      graft.dedup.MinHash.writeBandIndex(corpus.toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/index", n = 3, k = 32, bands = bands,
        threshold = 0.3)
      val streamed = (0 until n).map { i =>
        val id = (c + i).toLong
        // every 4th doc is a verbatim copy of an earlier streamed doc's
        // text — the alert path stays exercised at every batch
        if (i % 4 == 3) (id, text("s", i - 1)) else (id, text("s", i))
      }
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.nearDupIndexed(
          input.toDF().toDF("doc_id", "text"), "doc_id", "text",
          s"$dir/index", s"$dir/alerts")
        .option("checkpointLocation", s"$dir/ckpt").start()
      try {
        val batchSecs = streamed.grouped(n / nBatches).map { g =>
          val t0 = System.nanoTime()
          input.addData(g: _*); q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }.toSeq
        val buckets = spark.read.parquet(s"$dir/index/buckets").count()
        val shingleIds = spark.read.parquet(s"$dir/index/shingles")
          .select("id").distinct().count()
        gate("stream_neardup_indexed", "bucket_rows", buckets,
          (c + n).toLong * bands)
        gate("stream_neardup_indexed", "shingle_ids", shingleIds, c + n)
        recordIdx("stream_neardup_indexed", n, batchSecs.sum, buckets,
          spark.read.parquet(s"$dir/alerts").count(),
          batchSecs.head, batchSecs.last)
      } finally q.stop()
    }

    // stream_embed_indexed: C corpus vectors in 16 lists; streamed ids
    // unique, every 3rd row a verbatim copy of a corpus vector (the alert
    // path stays hot at minCos 0.95). Laws, gated: vectors rows = C + n
    // exactly (id-guarded append); and the FILES-PER-LIST law — each
    // micro-batch appends one-plus files into its touched list partitions
    // (recorded before), and AnnIndex.compact must collapse every list to
    // exactly ONE file with the row law intact (probe/serve bitwise
    // invariance is pinned in AnnIndexSpec) — the unbounded small-file
    // growth this face would otherwise accumulate over months of ingest.
    for (n <- Seq(2000, 8000)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_ssb_em").toString
      val c = 1000
      val rnd = new java.util.Random(0xE3BED + n)
      def rvec(): Array[Float] = Array.fill(8)(rnd.nextGaussian().toFloat)
      val corpusV = (0 until c).map(i => (i.toLong, rvec(), i % 16))
      graft.similarity.AnnIndex.writeIvf(
        corpusV.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", s"$dir/index")
      val fplAtBuild: Seq[Int] =
        new java.io.File(s"$dir/index/vectors").listFiles
          .filter(f => f.isDirectory && f.getName.startsWith("list="))
          .map(_.listFiles.count(f => f.isFile && f.getName.endsWith(".parquet")))
          .toSeq
      val streamed = (0 until n).map { i =>
        val id = (c + i).toLong
        if (i % 3 == 2) (id, corpusV(i % c)._2) else (id, rvec())
      }
      val input = MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.Streams.embedIndexed(
          input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
          s"$dir/index", s"$dir/alerts", minCos = 0.95)
        .option("checkpointLocation", s"$dir/ckpt").start()
      try {
        val batchSecs = streamed.grouped(n / nBatches).map { g =>
          val t0 = System.nanoTime()
          input.addData(g: _*); q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }.toSeq
        def filesPerList(): Seq[Int] =
          new java.io.File(s"$dir/index/vectors").listFiles
            .filter(f => f.isDirectory && f.getName.startsWith("list="))
            .map(_.listFiles.count(f => f.isFile && f.getName.endsWith(".parquet")))
            .toSeq
        // BUILD-layout law (r17): writeIvf lands ONE sized file per list
        // directly (hash-clustered write) — only INGEST appends pile up,
        // and compact returns the layout to the same 1-file-per-list law.
        gate("stream_embed_indexed", "files_per_list_at_build",
          fplAtBuild.max.toLong, 1L)
        val vecRows = spark.read.parquet(s"$dir/index/vectors").count()
        gate("stream_embed_indexed", "vector_rows", vecRows, c + n)
        val fplBefore = filesPerList()
        if (fplBefore.max < 2)
          lawViolations += "stream_embed_indexed: ingest left no file pileup to compact"
        graft.similarity.AnnIndex.compact(spark, s"$dir/index")
        val fplAfter = filesPerList()
        gate("stream_embed_indexed", "files_per_list_after_compact",
          fplAfter.max.toLong, 1L)
        gate("stream_embed_indexed", "vector_rows_after_compact",
          spark.read.parquet(s"$dir/index/vectors").count(), c + n)
        val line = s"""{"face":"stream_embed_indexed","rows_in":$n,""" +
          s""""sec":${fmt(batchSecs.sum)},"rows_per_sec":${fmt(n / batchSecs.sum)},""" +
          s""""state_rows":$vecRows,""" +
          s""""out_rows":${spark.read.parquet(s"$dir/alerts").count()},""" +
          s""""batch_sec_first":${fmt(batchSecs.head)},""" +
          s""""batch_sec_last":${fmt(batchSecs.last)},""" +
          s""""files_per_list_before":${fplBefore.max},""" +
          s""""files_per_list_after":${fplAfter.max}}"""
        results += line
        println(line)
      } finally q.stop()
    }

    val json = "[" + results.mkString(",") + "]"
    println(json)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAM_SCALING_OUT",
      "docs/STREAM_SCALING.json")
    try {
      val w = new java.io.PrintWriter(outPath, "UTF-8")
      try w.println(json) finally w.close()
    } catch { case _: Throwable => () }
    spark.stop()
    // STATE-LAW GATE: a face whose index grew off its law fails the TOOL,
    // not a later narrative read
    lawViolations.foreach(v => System.err.println(s"[stream-scaling] GATE FAIL: $v"))
    if (lawViolations.nonEmpty) sys.exit(1)
  }
}
