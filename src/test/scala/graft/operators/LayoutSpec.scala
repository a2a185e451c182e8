package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton interleave correctness + the locality property the layout
  * exists for: z-sorted partitions have tight per-dimension bounds. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refMorton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)

  test("morton matches the reference bit interleave over the full 8-bit grid") {
    val grid = for { x <- 0L until 256L; y <- 0L until 256L } yield (x, y)
    val got = grid.toDF("x", "y")
      .withColumn("z", Layout.morton(col("x"), col("y"), 8))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == refMorton(x, y, 8), s"($x,$y)") }
    // bijective on the grid — no two cells share a code
    assert(got.map(_._3).distinct.length == grid.length)
  }

  test("zOrderBy partitions carry tight bounding boxes in BOTH dimensions") {
    // 64×64 grid, 16 output partitions: a z-ordered split gives each
    // partition a bounding box of area ~grid/16; a single-column range
    // sort would give full-height stripes (max_y - min_y = 63 everywhere)
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val parts = Layout.zOrderBy(grid, "x", "y", bits = 6, numFiles = 16)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(count(lit(1)).as("n"),
        (max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .as[(Int, Long, Long, Long)].collect()
    assert(parts.map(_._2).sum == 64L * 64L)
    parts.filter(_._2 > 1).foreach { case (pid, n, dx, dy) =>
      // every non-trivial partition must be bounded in BOTH dims — the
      // skipping property; 32 is half the domain (z quadrants)
      assert(dx <= 32 && dy <= 32, s"partition $pid spans dx=$dx dy=$dy")
    }
  }
}
