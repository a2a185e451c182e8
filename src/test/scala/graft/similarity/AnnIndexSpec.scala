package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted IVF index must serve EXACTLY what the in-query face
  * computes, and its probed-list filter must prune the layout partitions. */
class AnnIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** True iff some scan's `PartitionFilters: [...]` carries the STATIC
    * probed-list membership filter — the bracket-extraction discipline
    * (SourcesSpec), tightened one level: FileSourceScanExec prints the
    * `PartitionFilters` key (and the `list` output attribute) on EVERY
    * partitioned-parquet scan, and the equality join pushes
    * `isnotnull(list#…)` plus a `dynamicpruningexpression(list#… IN
    * dynamicpruning#…)` into the bracket even with the static filter
    * deleted — so neither a bare substring check nor "`list` inside a
    * bracket" can fail. Only the literal value form is the plan-time
    * pruning the index exists for — `list#62 IN (0,1)` / `list#62 INSET
    * 0,1`, or `list#62 = 3` (Catalyst folds a one-element isin to
    * equality at nProbe=1); verified by hand to FAIL when the
    * `isin(probedLists)` filter is removed. */
  private def hasProbedListFilter(planStr: String): Boolean =
    """PartitionFilters: \[([^\]]*)\]""".r
      .findAllMatchIn(planStr).map(_.group(1))
      .exists(c => """list#\d+ (IN \(|INSET |= \d)""".r.findFirstIn(c).isDefined)

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
    assert(hasProbedListFilter(planStr),
      s"append broke partition pruning:\n$planStr")
  }

  test("pairsIncremental: exact precision, planted recall, fold visibility, self-drop") {
    import spark.implicits._
    def fam(seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def perturb(base: Array[Float], eps: Float, d: Int): Array[Float] =
      base.zipWithIndex.map { case (x, i) => if (i == d) x + eps else x }
    // 8 families × 3 corpus members; lists = family id (the writeIvf
    // listCol) — near-dups share a list by construction
    val corpus = (for (f <- 0 until 8; c <- 0 until 3)
      yield ((f * 10 + c).toLong, perturb(fam(f + 1), 0.01f * (c + 1), c), f))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_embinc_spec").toString
    AnnIndex.writeIvf(corpus, "vec_id", "embedding", "label", dir)
    // batch: one near-dup per family for 4 families, one batch-internal
    // near-dup pair (both novel), one far vector, one RE-INGESTED id
    val farV = Array.tabulate(16)(i => if (i < 8) 0.25f else -0.25f)
    val batch = ((for (f <- 0 until 4)
      yield ((100 + f).toLong, perturb(fam(f + 1), 0.02f, 5))) ++
      Seq((200L, perturb(fam(20), 0.01f, 0)), (201L, perturb(fam(20), 0.02f, 1)),
        (300L, farV),
        (0L, perturb(fam(1), 0.01f, 0)))) // id 0 already indexed: same doc
      .toDF("vec_id", "embedding")
    val got = AnnIndex.pairsIncremental(spark, dir, batch, "vec_id", "embedding",
        minCos = 0.9, nProbe = 2)
      .as[(Long, Long, Double)].collect()
    // EXACT precision: every emitted pair really is cos >= 0.9, ordered
    assert(got.forall(p => p._3 >= 0.9 && p._1 < p._2))
    val pairs = got.map(p => (p._1, p._2)).toSet
    // the COMPLETE expected batch-touching set: each family probe finds
    // its 3 corpus members; the re-ingested id 0 (same family as probe
    // 100) touches its fellow corpus members 1, 2 and probe 100 — but
    // never itself; the batch-internal near-dup (200, 201) lands via the
    // shared probed list; the far vector 300 pairs with nothing; and
    // untouched corpus-corpus pairs (e.g. (1, 2)) are NOT re-reported
    val expected = Set(
      (0L, 100L), (1L, 100L), (2L, 100L), (0L, 1L), (0L, 2L),
      (10L, 101L), (11L, 101L), (12L, 101L),
      (20L, 102L), (21L, 102L), (22L, 102L),
      (30L, 103L), (31L, 103L), (32L, 103L),
      (200L, 201L))
    assert(pairs == expected, s"got $pairs")
    // FOLD VISIBILITY: append the batch; a later batch near 200's family
    // must match the STREAMED doc 200/201 — only possible post-fold
    AnnIndex.append(spark, dir, batch, "vec_id", "embedding")
    val probe2 = AnnIndex.pairsIncremental(spark, dir,
        Seq((500L, perturb(fam(20), 0.015f, 2))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", minCos = 0.9, nProbe = 2)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(probe2 == Set((200L, 500L), (201L, 500L)),
      s"fold not visible to the next probe: $probe2")
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

  test("pairsIncremental's corpus scan carries the probed-list partition filter") {
    import spark.implicits._
    val vecs = (0L until 100L)
      .map(i => (i, Array.fill(4)((i % 10).toFloat + 1f), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf6").toString
    AnnIndex.writeIvf(vecs, "vec_id", "embedding", "label", dir)
    val batch = Seq((500L, Array.fill(4)(3f))).toDF("vec_id", "embedding")
    val out = AnnIndex.pairsIncremental(spark, dir, batch, "vec_id", "embedding",
      minCos = 0.99, nProbe = 2)
    // the layout-pruning property the incremental probe exists for: the
    // corpus side must scan ONLY the probed lists' partitions
    val planStr = out.queryExecution.executedPlan.toString
    assert(hasProbedListFilter(planStr),
      s"no partition filter on the corpus scan:\n$planStr")
    // these vectors are all positive multiples of the ones vector =>
    // cosine 1 within AND across lists; the probe finds its 2 lists' members
    assert(out.count() > 0)
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
    assert(hasProbedListFilter(planStr),
      s"no partition filter on the vectors scan:\n$planStr")
    assert(out.count() == 3)
  }

  test("compact rewrites each list to one file; probe and serve are bitwise-invariant") {
    import spark.implicits._
    def vec(i: Long): Array[Float] = {
      val rnd = new scala.util.Random(i)
      Array.fill(8)(rnd.nextGaussian().toFloat)
    }
    val vecs = (0L until 60L).map(i => (i, vec(i), (i % 5).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_cpt").toString
    AnnIndex.writeIvf(vecs, "vec_id", "embedding", "label", dir)
    // three ingest batches: the per-append small-file pileup compact stops
    for (b <- 0 until 3) {
      val batch = (100L + b * 10 until 110L + b * 10)
        .map(i => (i, vec(i))).toDF("vec_id", "embedding")
      AnnIndex.append(spark, dir, batch, "vec_id", "embedding")
    }
    def filesPerList(): Map[String, Int] = {
      val root = new java.io.File(s"$dir/vectors")
      root.listFiles.filter(f => f.isDirectory && f.getName.startsWith("list="))
        .map(d => d.getName ->
          d.listFiles.count(f => f.isFile && f.getName.endsWith(".parquet")))
        .toMap
    }
    val before = filesPerList()
    assert(before.values.exists(_ > 1), s"append pileup not created: $before")
    val queries = vecs.filter(col("vec_id") % 7 === 0)
    def serve() = AnnIndex.ivfTopK(spark, dir, queries, "vec_id", "embedding",
        k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val probeBatch = Seq((900L, vec(5L))).toDF("vec_id", "embedding")
    def probe() = AnnIndex.pairsIncremental(spark, dir, probeBatch,
        "vec_id", "embedding", minCos = 0.5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val (sBefore, pBefore) = (serve(), probe())
    assert(sBefore.nonEmpty && pBefore.nonEmpty)
    AnnIndex.compact(spark, dir)
    val after = filesPerList()
    assert(after.keySet == before.keySet, "compact must not drop a list partition")
    assert(after.values.forall(_ == 1), s"compact must leave one file per list: $after")
    assert(serve() == sBefore, "serve changed across compact")
    assert(probe() == pBefore, "probe changed across compact")
    // content identical, not just query-visible: every (id) row survives
    assert(spark.read.parquet(s"$dir/vectors").count() == 90)
  }

  test("retrain recovers recall after an off-manifold domain lands in the index") {
    import spark.implicits._
    def oneHot(l: Int) = Array.tabulate(4)(d => if (d == l) 1f else 0.1f)
    val vecs = (0L until 40L).map(i => (i, oneHot((i % 4).toInt), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_rt").toString
    AnnIndex.writeIvf(vecs, "vec_id", "embedding", "label", dir)
    // drifted domain: a tight diagonal cluster whose max coordinate
    // rotates member-by-member, so the OLD one-hot geometry scatters the
    // cluster across ALL four lists (3 members each)
    def diag(i: Int) = Array.tabulate(4)(d => if (d == i % 4) 0.55f else 0.5f)
    val drifted = (200L until 212L).map(i => (i, diag((i - 200L).toInt)))
      .toDF("vec_id", "embedding")
    val gate1 = AnnIndex.driftGate(spark, dir, drifted, "vec_id", "embedding")
    assert(gate1.filter(col("retrain")).count() > 0,
      "off-manifold batch must trip the gate")
    // the operator rules the new domain legitimate: force-append (append
    // IS the gate bypass), then retrain the geometry it broke
    AnnIndex.append(spark, dir, drifted, "vec_id", "embedding")
    // drifted-slice recall: how much of the diagonal cluster a diagonal
    // query can SEE through the pruned nProbe=2 serve (all 12 members tie
    // on cosine, so id-set counting, not rank, is the honest measure)
    val q = Seq((999L, Array(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    def driftedVisible(): Double = {
      val got = AnnIndex.ivfTopK(spark, dir, q, "vec_id", "embedding",
          k = 12, nProbe = 2)
        .collect().map(_.getLong(1)).toSet
      got.count(_ >= 200L) / 12.0
    }
    val before = driftedVisible()
    assert(before <= 0.5, s"old geometry should scatter the cluster: $before")
    AnnIndex.retrain(spark, dir, targetListSize = 8L)
    val after = driftedVisible()
    assert(after == 1.0,
      s"retrain must gather the drifted cluster: before=$before after=$after")
    // the re-trained model accepts the new domain: a fresh batch passes
    val fresh = (300L until 306L).map(i => (i, diag((i - 300L).toInt + 2)))
      .toDF("vec_id", "embedding")
    val gate2 = AnnIndex.driftGate(spark, dir, fresh, "vec_id", "embedding")
    assert(gate2.filter(col("retrain")).count() == 0,
      gate2.collect().mkString(", "))
    // nothing dropped, nothing re-encoded: exactly the 52 persisted ids
    assert(spark.read.parquet(s"$dir/vectors")
      .select("vec_id").distinct().count() == 52)
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
