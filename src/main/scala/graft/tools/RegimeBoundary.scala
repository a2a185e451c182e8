package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Time [[graft.dedup.SimHash.pairsFromFingerprintsAdaptive]] on BOTH
  * sides of its true routing boundary (VERDICT r13 task 7): the
  * AdaptiveGeometrySpec covers forced geometry above/below saturation,
  * but the switch's cost DISCONTINUITY — what a pipeline actually pays
  * the day its corpus crosses blockedSaturated — was unmeasured. With
  * targetOccupancy scaled to 1 the boundary sits at n = 2^18 = 262,144
  * fingerprints (d=3's 18-bit combination key runs out of buckets), so a
  * synthetic corpus straddles it in-sandbox: deterministic random
  * fingerprints plus planted hamming-radius families (so both sides emit
  * real pairs), timed at n just below and just above, median of 3.
  *
  * `runMain graft.tools.RegimeBoundary` — prints one line per side. */
object RegimeBoundary {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val occ = 1L
    val boundary = 1L << 18 // blockedSaturated flips here at occ=1, h=7, maxD=3
    for (n <- Seq(boundary - 4096, boundary + 4096)) {
      // deterministic corpus: 99% random fps, 1% planted partners at
      // hamming 1..7 of a base fp — real pair volume on both sides
      val df = spark.range(n).select(col("id"),
        when(col("id") % 100 === 0,
            // partner of the NEXT row's fp at small hamming (1..7): the
            // planted pair (id, id+1) exists on both sides of the boundary
            xxhash64(col("id") + 1).bitwiseXOR(
              expr("shiftleft(1L, cast((id div 100) % 7 as int) + 1)")))
          .otherwise(xxhash64(col("id"))).as("fp"))
        .localCheckpoint()
      val saturated = graft.dedup.SimHash.blockedSaturated(n, 7, occ, 3)
      val g = graft.dedup.SimHash.adaptiveGeometry(n, 7, occ, 3)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val cnt = graft.dedup.SimHash.pairsFromFingerprintsAdaptive(
          df, "id", "fp", maxHamming = 7, n = n, targetOccupancy = occ).count()
        ((System.nanoTime() - t0) / 1e9, cnt)
      }
      val med = times.map(_._1).sorted.apply(1)
      println(f"[boundary] n=$n saturated=$saturated regime=${g.regime} " +
        f"geom=${if (g.regime == "blocked") s"d=${g.d}" else s"w=${g.maskBits},t=${g.tables}"} " +
        f"pairs=${times.head._2} median=${med}%.2fs " +
        f"samples=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
