package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class Ev(ts: Timestamp, event_type: String, value: Double, event_id: Long)

class StreamsSpec extends SparkSpec {

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("streaming windowed agg matches the batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = Seq(
      Ev(t(0), "click", 1.0, 1), Ev(t(5), "click", 2.0, 2),
      Ev(t(10), "view", 3.0, 3), Ev(t(65), "click", 4.0, 4),
      Ev(t(70), "view", 5.0, 5))

    val out = Streams.windowedAgg(input.toDF(), "ts", "event_type", "value")
    val query = out.writeStream.format("memory").queryName("agg_out")
      .outputMode("complete").start()
    try {
      input.addData(events: _*)
      query.processAllAvailable()
      val got = spark.table("agg_out")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = events.toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
        .select(col("window.start"), col("event_type"), col("n"), col("s"))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == batch)
    } finally query.stop()
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = Streams.dedup(input.toDF(), "ts", Seq("event_id"))
    val query = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(Ev(t(0), "click", 1.0, 1), Ev(t(0), "click", 1.0, 1),
        Ev(t(1), "view", 2.0, 2))
      query.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally query.stop()
  }
}
