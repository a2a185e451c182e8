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

  test("refresh appends a healthy batch and the pruned query path serves it") {
    import spark.implicits._
    def oneHot(l: Int, scale: Float, bleed: Float) =
      Array.tabulate(4)(d => if (d == l) scale else if (d == (l + 1) % 4) bleed else 0f)
    // 40 vectors, 4 clean lists; every stored vector is slightly
    // off-axis so an exactly-on-axis append can win rank 1
    val vecs = (0L until 40L)
      .map(i => (i, oneHot((i % 4).toInt, 1f, 0.1f), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf3").toString
    AnnIndex.writeIvf(vecs, "vec_id", "embedding", "label", dir)
    // batch along the same axes: gate passes, vectors append in place
    val batch = (100L until 108L)
      .map(i => (i, oneHot((i % 4).toInt, 3f, 0f)))
      .toDF("vec_id", "embedding")
    val (appended, gate) = AnnIndex.refresh(spark, dir, batch, "vec_id", "embedding")
    assert(appended, gate.collect().mkString(", "))
    assert(gate.filter(col("retrain")).count() == 0)
    // the appended exactly-on-axis vector now outranks every stored one
    // on its axis — served straight off the PRUNED persisted layout
    val q = Seq((999L, oneHot(0, 1f, 0f))).toDF("vec_id", "embedding")
    val out = AnnIndex.ivfTopK(spark, dir, q, "vec_id", "embedding", k = 3, nProbe = 1)
    val top = out.orderBy(col("cos").desc).collect()
    assert(Set(100L, 104L).contains(top(0).getLong(1)),
      s"appended vector not served first: ${top.toSeq}")
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"), "append broke partition pruning")
  }

  test("a drifted batch trips the gate and refresh appends nothing") {
    import spark.implicits._
    val vecs = (0L until 40L)
      .map(i => (i, Array.tabulate(4)(d => if (d == (i % 4).toInt) 1f else 0f), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf4").toString
    AnnIndex.writeIvf(vecs, "vec_id", "embedding", "label", dir)
    val before = spark.read.parquet(s"$dir/vectors").count()
    // diagonal batch: cos vs any one-hot centroid = 0.5 << 0.9
    val batch = (200L until 208L)
      .map(i => (i, Array.fill(4)(1f))).toDF("vec_id", "embedding")
    val (appended, gate) = AnnIndex.refresh(spark, dir, batch, "vec_id", "embedding")
    assert(!appended)
    assert(gate.filter(col("retrain")).count() > 0)
    assert(spark.read.parquet(s"$dir/vectors").count() == before,
      "drifted batch must not be appended")
  }

  test("append is idempotent: a replayed batch never double-serves a vec_id") {
    import spark.implicits._
    def oneHot(l: Int, scale: Float) =
      Array.tabulate(4)(d => if (d == l) scale else 0f)
    // stored vectors bleed off-axis so the exactly-on-axis appended ones
    // strictly win the cosine ranking (no k-boundary ties)
    val vecs = (0L until 40L)
      .map(i => (i, Array.tabulate(4)(d =>
        if (d == (i % 4).toInt) 1f else 0.1f), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf5").toString
    AnnIndex.writeIvf(vecs, "vec_id", "embedding", "label", dir)
    val batch = Seq((100L, oneHot(0, 2f)), (101L, oneHot(1, 2f)))
      .toDF("vec_id", "embedding")
    AnnIndex.append(spark, dir, batch, "vec_id", "embedding")
    // a retried / replayed micro-batch must be a no-op on the table…
    AnnIndex.append(spark, dir, batch, "vec_id", "embedding")
    val stored = spark.read.parquet(s"$dir/vectors")
    assert(stored.count() == 42)
    assert(stored.filter(col("vec_id") === 100L).count() == 1)
    // …and a partially-landed append converges: only the missing id lands
    val wider = batch.union(Seq((102L, oneHot(2, 2f))).toDF("vec_id", "embedding"))
    AnnIndex.append(spark, dir, wider, "vec_id", "embedding")
    assert(spark.read.parquet(s"$dir/vectors").count() == 43)
    // served exactly once from the pruned path
    val q = Seq((999L, oneHot(0, 1f))).toDF("vec_id", "embedding")
    val served = AnnIndex.ivfTopK(spark, dir, q, "vec_id", "embedding",
        k = 5, nProbe = 1)
      .filter(col("neighbor_id") === 100L)
    assert(served.count() == 1)
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

  test("ann_index_recall face audits the persisted index before AND after append") {
    val rows = graft.queries.Q.annIndexRecall(spark, "/root/testdata/sf0.001")
      .orderBy("phase").collect()
    assert(rows.map(_.getAs[String]("phase")).toSeq ==
      Seq("1_before_append", "2_after_append"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_queries") > 0)
      val rec = r.getAs[Double]("mean_recall_at_5")
      assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $rec")
    }
    // the persisted layout with 3 probed label lists must genuinely serve:
    // a dead index (recall 0 everywhere) is the failure this face watches for
    assert(rows.map(_.getAs[Double]("mean_recall_at_5")).max > 0.0)
  }
}
