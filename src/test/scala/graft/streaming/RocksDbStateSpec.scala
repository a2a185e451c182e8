package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** The stateful operators must run unchanged on the RocksDB state store —
  * the production backend once per-key state outgrows executor heap
  * (exactly the 100 TB regime: dedup fingerprints, session state, CDC
  * folds). The provider is a session conf, not code: this spec flips it,
  * runs stateful sessionization, and asserts RocksDB actually served the
  * state (its custom metrics appear in the query progress). */
class RocksDbStateSpec extends SparkSpec {

  test("sessionize runs with RocksDB state store and reports its metrics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[SessionEvent]
      val query = Streams.sessionize(input.toDS(), gapSec = 100)
        .writeStream.format("memory").queryName("rocks_sessions")
        .outputMode("append").start()
      try {
        input.addData(SessionEvent(1L, 0L, 1.0), SessionEvent(1L, 50L, 2.0))
        query.processAllAvailable()
        input.addData(SessionEvent(1L, 1000L, 4.0)) // gap closes the session
        query.processAllAvailable()
        val sessions = spark.table("rocks_sessions").as[Session].collect()
        assert(sessions.toSeq == Seq(Session(1L, 0L, 50L, 2L, 3.0)))
        val state = query.lastProgress.stateOperators
        assert(state.nonEmpty)
        val metrics = state(0).customMetrics.keySet()
        assert(metrics.toString.contains("rocksdb"),
          s"expected rocksdb custom metrics, got $metrics")
      } finally query.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
