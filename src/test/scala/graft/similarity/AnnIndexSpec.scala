package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted IVF index must serve EXACTLY what the in-query face
  * computes, and its probed-list filter must prune the layout partitions. */
class AnnIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("persisted-index results equal the in-query ivfTopK bitwise") {
    val e = graft.Tables(spark, sf, "embeddings")
    val queries = e.filter(col("vec_id") % 97 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    AnnIndex.writeIvf(e, "vec_id", "embedding", "label", dir)
    val fromIndex = AnnIndex.ivfTopK(spark, dir, queries, "vec_id", "embedding",
        k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val inQuery = AnnLsh.ivfTopK(e, queries, "vec_id", "embedding", "label",
        k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(fromIndex == inQuery)
    assert(fromIndex.nonEmpty)
  }

  test("the probed-list filter prunes the persisted layout partitions") {
    import spark.implicits._
    val vecs = (0L until 100L)
      .map(i => (i, Array.fill(4)((i % 10).toFloat + 1f), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf2").toString
    AnnIndex.writeIvf(vecs, "vec_id", "embedding", "label", dir)
    val oneQuery = vecs.filter(col("vec_id") === 0L)
    val out = AnnIndex.ivfTopK(spark, dir, oneQuery, "vec_id", "embedding",
      k = 3, nProbe = 2)
    // the scan must carry a partition filter on the probed lists — the
    // layout-pruning property the index exists for
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("list"),
      s"no partition filter on the vectors scan:\n$planStr")
    assert(out.count() == 3)
  }
}
