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
  * Run: `sbt "runMain graft.tools.StreamScalingBench"`; paste the table
  * into docs/SCALING.md. One JSON line per (face, volume) plus a summary.
  */
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

    println("[" + results.mkString(",") + "]")
    spark.stop()
  }
}
