package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 hardening specs: the embed_outliers approx-threshold scale path,
  * the dim-scaled centroid-broadcast cap, and the Tables timezone guard. */
class Round9Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("embed_outliers: exact and approx threshold paths agree on the sf data") {
    def run(exactThr: Boolean) = graft.similarity.EmbedOutliers
      .score(graft.Tables(spark, sf, "embeddings"), "vec_id", "embedding", "label",
        exactThreshold = exactThr)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("label"), r.getAs[Long]("score_q"), r.getAs[Boolean]("is_outlier"))))
      .toMap
    val exact = run(true)
    val approx = run(false)
    assert(exact.keySet == approx.keySet)
    // scores are threshold-independent — must be identical
    exact.foreach { case (id, (_, s, _)) => assert(approx(id)._2 == s, s"score of $id") }
    // the exact face interpolates between order statistics while the sketch
    // returns an observed score, so the two per-label thresholds can differ
    // by at most the gap between adjacent scores at p95 — flags may flip
    // ONLY inside that one-order-statistic band: per label, the disagreeing
    // vectors form one contiguous score band at the flag boundary
    exact.keys.groupBy(id => exact(id)._1).foreach { case (label, ids) =>
      val flips = ids.filter(id => exact(id)._3 != approx(id)._3)
      assert(flips.size <= 2, s"label $label: ${flips.size} flag flips")
      flips.foreach { id =>
        val s = exact(id)._2
        // a flipped vector sits strictly between the two thresholds, so every
        // vector scoring above it is flagged by BOTH paths
        ids.filter(o => exact(o)._2 > s).foreach { o =>
          assert(exact(o)._3 && approx(o)._3, s"label $label: non-monotone flags")
        }
      }
    }
  }

  test("embed_outliers trips the dim-scaled centroid-cell cap on wide vectors") {
    import spark.implicits._
    // 8 labels × 16 dims = 128 cells > 100: the labels-only cap (maxLabels
    // = 10) would PASS this frame; only the cell cap catches the width
    val wide = (0L until 32L).map(i => (i, Seq.fill(16)(0.5f), (i % 8).toInt))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[Exception] {
      graft.similarity.EmbedOutliers
        .score(wide, "vec_id", "embedding", "label",
          maxLabels = 10, maxCentroidCells = 100).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("maxCentroidCells")), s"got $e")
  }

  test("Tables.apply fails loudly on a non-UTC session when events.ts is NTZ") {
    val isNtz = spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType
    assume(isNtz, "driver testdata currently carries ts as NTZ — guard untestable otherwise")
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val e = intercept[IllegalArgumentException] {
        graft.Tables(spark, sf, "events")
      }
      assert(e.getMessage.contains("timeZone"), s"got ${e.getMessage}")
    } finally spark.conf.set(tzKey, saved)
    // and with UTC restored the load works and yields bigint nanos
    val ts = graft.Tables(spark, sf, "events").select(col("ts")).limit(1).collect()
    assert(ts.head.get(0).isInstanceOf[Long])
  }
}
