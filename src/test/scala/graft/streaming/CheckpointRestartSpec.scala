package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Operational correctness: stateful streaming state must SURVIVE a query
  * restart from its checkpoint — on a cluster every executor loss,
  * redeploy, or planned upgrade is exactly this path. A file source (the
  * replayable-source contract) feeds stateful sessionization; the query is
  * stopped mid-session and restarted against the same checkpoint dir, and
  * the still-open session must close with events from BOTH incarnations
  * counted — proof the state store round-tripped, not just the offsets. */
class CheckpointRestartSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize state survives a stop/restart from checkpoint") {
    val srcDir = Files.createTempDirectory("graft_src").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val outDir = Files.createTempDirectory("graft_out").toString

    def writeBatch(name: String, rows: Seq[(Long, Long, Double)]): Unit = {
      val tmp = Files.createTempFile("graft_batch", ".json")
      Files.writeString(tmp, rows.map { case (u, t, v) =>
        s"""{"user_id":$u,"t":$t,"value":$v}"""
      }.mkString("\n"))
      Files.move(tmp, java.nio.file.Paths.get(srcDir, s"$name.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    // the memory sink cannot recover from a checkpoint; the parquet file
    // sink is the exactly-once production path
    def startQuery() = {
      val src = spark.readStream
        .schema("user_id LONG, t LONG, value DOUBLE")
        .json(srcDir).as[SessionEvent]
      Streams.sessionize(src, gapSec = 100)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // incarnation 1: open a session for user 1 (events at t=0,50)
    writeBatch("b1", Seq((1L, 0L, 1.0), (1L, 50L, 2.0)))
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()

    // incarnation 2: same checkpoint; t=120 continues the open session
    // (gap 70 <= 100), then t=1000 closes it
    writeBatch("b2", Seq((1L, 120L, 4.0), (1L, 1000L, 8.0)))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val sessions = spark.read.parquet(outDir).as[Session].collect()
      // the closed session spans BOTH incarnations: 3 events, value 7.0
      assert(sessions.toSeq == Seq(Session(1L, 0L, 120L, 3L, 7.0)))
    } finally q2.stop()
  }
}
