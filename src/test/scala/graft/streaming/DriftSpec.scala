package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** driftBands + driftScore: the streaming drift monitor's two halves. */
class DriftSpec extends SparkSpec {

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("stream lands per-window band counts; batch PSI flags the shifted window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // window 0: values match the reference bands; window 1: shifted 10×
    val w0 = (1 to 20).map(i => Ev(t(i % 50), "e", 1000.0 + (i % 4) * 1000.0, i.toLong))
    val w1 = (1 to 20).map(i => Ev(t(65 + i % 50), "e", 31000.0 + (i % 4) * 1000.0, 100L + i))
    val out = Streams.driftBands(input.toDF(), "ts", "value", bandCents = 100000L)
    val q = out.writeStream.format("memory").queryName("drift_bands")
      .outputMode("complete").start()
    try {
      input.addData(w0 ++ w1: _*)
      q.processAllAvailable()
      val bands = spark.table("drift_bands")
      // tumbling windows align to the epoch, so resolve the two window
      // starts from the data instead of assuming t(0) is one
      val ws = bands.select("window_start").distinct()
        .collect().map(_.getTimestamp(0).getTime).sorted
      assert(ws.length == 2, s"expected 2 windows, got ${ws.toSeq}")
      // reference = the first window's own distribution
      val ref = bands.filter(col("window_start") === new Timestamp(ws(0)))
        .select(col("band"), col("n").as("ref_n"))
      val scores = Streams.driftScore(bands, ref)
        .collect().map(r => r.getTimestamp(0).getTime -> r.getDouble(1)).toMap
      val s0 = scores(ws(0))
      val s1 = scores(ws(1))
      // matching window: only smoothing noise; shifted window: strong drift
      assert(s0 < 0.05, s"self-PSI should be ~0, got $s0")
      assert(s1 > 0.2, s"shifted window must trip the 0.2 threshold, got $s1")
      assert(s1 > s0 * 10)
    } finally q.stop()
  }

  test("driftScore matches a hand-computed PSI on a fixed grid") {
    import spark.implicits._
    val bands = Seq((t(0), 1L, 30L), (t(0), 2L, 10L))
      .toDF("window_start", "band", "n")
    val ref = Seq((1L, 20L), (2L, 20L)).toDF("band", "ref_n")
    val got = Streams.driftScore(bands, ref).collect()(0).getDouble(1)
    // union grid B=2; p=(31/42, 11/42), q=(21/42, 21/42)
    val p = Seq(31.0 / 42, 11.0 / 42); val qq = Seq(21.0 / 42, 21.0 / 42)
    val psi = (p, qq).zipped.map((a, b) => (a - b) * math.log(a / b)).sum
    val expect = BigDecimal(psi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got - expect) <= 1e-6)
  }
}
