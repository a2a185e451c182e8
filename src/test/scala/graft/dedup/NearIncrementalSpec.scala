package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MinHash.writeBandIndex / pairsIncremental — the persisted-index
  * incremental near-dup workflow. The contract: batch ingest against the
  * index finds EXACTLY the pairs corpus-wide MinHash.pairs would report
  * that touch the batch, without rescanning corpus text. */
class NearIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_nearinc").toString

  // 40-word base so a one-word edit keeps Jaccard high enough that the
  // 8-band × 4-row banding finds the pair deterministically (seed-fixed)
  private val base = (1 to 40).map(i => s"w$i").mkString(" ")
  private def edited(pos: Int, repl: String): String =
    (1 to 40).map(i => if (i == pos) repl else s"w$i").mkString(" ")

  test("pairsIncremental ≡ corpus-wide pairs restricted to batch-touching pairs") {
    val corpus = Seq(
      (100L, base),
      (101L, edited(20, "xx")),
      (102L, "completely unrelated text about catalyst optimizer rule ordering internals"),
      (103L, "another unrelated document describing parquet row group layout and stats")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, base),                 // exact dup of corpus 100
      (2L, edited(30, "yy")),     // near dup of 100/101 and of batch 1
      (3L, "totally novel content that matches nothing else anywhere in this corpus")
    ).toDF("doc_id", "text")
    val path = tmp()
    MinHash.writeBandIndex(corpus, "doc_id", "text", path,
      n = 3, k = 32, bands = 8, threshold = 0.3)
    val inc = MinHash.pairsIncremental(spark, path, batch, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    // ground truth: the one-shot corpus-wide run over corpus ∪ batch,
    // restricted to pairs with at least one batch id (batch ids < 100, and
    // id_a < id_b, so "touches batch" ⇔ id_a < 100)
    val full = MinHash.pairs(corpus.union(batch), "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.3)
      .filter(col("id_a") < 100L)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full)
    // the planted dups are actually found, through both candidate paths
    assert(inc.exists { case (a, b, _) => a == 1L && b == 100L }) // vs index
    assert(inc.exists { case (a, b, _) => a == 1L && b == 2L })   // in-batch
    // corpus-internal pairs (e.g. 100~101) are NOT re-reported
    assert(inc.forall { case (a, _, _) => a < 100L })
    // novel doc pairs with nothing
    assert(inc.forall { case (a, b, _) => a != 3L && b != 3L })
  }

  test("probe takes threshold and hash params from the index, not the caller") {
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val batch = Seq(
      (1L, base),              // exact dup → jaccard 1.0 survives any threshold
      (2L, edited(10, "zz"))   // near dup ~0.85 — must DROP under the 0.99 index
    ).toDF("doc_id", "text")
    val path = tmp()
    MinHash.writeBandIndex(corpus, "doc_id", "text", path,
      n = 3, k = 32, bands = 8, threshold = 0.99)
    val got = MinHash.pairsIncremental(spark, path, batch, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map { case (a, b, _) => (a, b) } == Set((1L, 100L)))
    assert(got.head._3 == 1.0)
  }

  test("appendToBandIndex folds the batch: the NEXT probe sees it") {
    val corpus = Seq(
      (100L, base),
      (101L, "unrelated filler text about shuffle partitions and adaptive execution plans")
    ).toDF("doc_id", "text")
    val b1 = Seq((1L, edited(5, "aa"))).toDF("doc_id", "text")
    val b2 = Seq((2L, edited(5, "aa")), // exact dup of b1's doc 1
      (3L, "novel second-batch content matching nothing indexed before it arrived")
    ).toDF("doc_id", "text")
    val path = tmp()
    MinHash.writeBandIndex(corpus, "doc_id", "text", path,
      n = 3, k = 32, bands = 8, threshold = 0.3)
    MinHash.appendToBandIndex(spark, path, b1, "doc_id", "text")
    val got = MinHash.pairsIncremental(spark, path, b2, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    // ground truth: one-shot pairs over corpus ∪ b1 ∪ b2 restricted to
    // pairs touching b2 (b2 ids are 2 and 3)
    val full = MinHash.pairs(corpus.union(b1).union(b2), "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.3)
      .filter(col("id_a").isin(2L, 3L) || col("id_b").isin(2L, 3L))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == full)
    // the cross-BATCH pair (b2's 2 vs b1's 1) is found — only possible if
    // the append actually landed b1 in the index
    assert(got.exists { case (a, b, _) => a == 1L && b == 2L })
    // and the corpus doc still matches too
    assert(got.exists { case (a, b, _) => a == 2L && b == 100L })
  }

  test("append is id-guarded: re-appending the same batch is a no-op") {
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val b1 = Seq((1L, edited(7, "bb"))).toDF("doc_id", "text")
    val path = tmp()
    MinHash.writeBandIndex(corpus, "doc_id", "text", path,
      n = 3, k = 32, bands = 8, threshold = 0.3)
    MinHash.appendToBandIndex(spark, path, b1, "doc_id", "text")
    val buckets1 = spark.read.parquet(s"$path/buckets").count()
    val shingles1 = spark.read.parquet(s"$path/shingles").count()
    MinHash.appendToBandIndex(spark, path, b1, "doc_id", "text")
    assert(spark.read.parquet(s"$path/buckets").count() == buckets1)
    assert(spark.read.parquet(s"$path/shingles").count() == shingles1)
    // and the index stays probe-consistent after the double append
    val probe = MinHash.pairsIncremental(spark, path,
        Seq((2L, edited(7, "bb"))).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(probe.map { case (a, b, _) => (a, b) } == Set((1L, 2L), (2L, 100L)))
  }

  test("compactBandIndex re-clusters the grown index; probes are unchanged") {
    val corpus = Seq(
      (100L, base),
      (101L, "unrelated corpus doc about broadcast thresholds and join hints")
    ).toDF("doc_id", "text")
    val path = tmp()
    MinHash.writeBandIndex(corpus, "doc_id", "text", path,
      n = 3, k = 32, bands = 8, threshold = 0.3)
    MinHash.appendToBandIndex(spark, path,
      Seq((1L, edited(12, "cc"))).toDF("doc_id", "text"), "doc_id", "text")
    MinHash.appendToBandIndex(spark, path,
      Seq((2L, edited(33, "dd"))).toDF("doc_id", "text"), "doc_id", "text")
    val probeBatch = Seq((5L, edited(12, "cc"))).toDF("doc_id", "text")
    val before = MinHash.pairsIncremental(spark, path, probeBatch,
      "doc_id", "text").as[(Long, Long, Double)].collect().toSet
    val bucketRows = spark.read.parquet(s"$path/buckets").count()
    val shingleRows = spark.read.parquet(s"$path/shingles").count()
    MinHash.compactBandIndex(spark, path)
    // same rows, same probe answer — compaction only rewrites layout
    assert(spark.read.parquet(s"$path/buckets").count() == bucketRows)
    assert(spark.read.parquet(s"$path/shingles").count() == shingleRows)
    val after = MinHash.pairsIncremental(spark, path, probeBatch,
      "doc_id", "text").as[(Long, Long, Double)].collect().toSet
    assert(after == before)
    assert(before.nonEmpty) // the appended near-dup is actually found
    // no temp/backup dirs survive the swap
    val subs = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(subs == Set("buckets", "shingles", "params"))
  }

  test("band index survives a simulated mid-swap crash; probes and compact recover") {
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val path = tmp()
    MinHash.writeBandIndex(corpus, "doc_id", "text", path,
      n = 3, k = 32, bands = 8, threshold = 0.3)
    val probeBatch = Seq((2L, edited(9, "ee"))).toDF("doc_id", "text")
    def probe() = MinHash.pairsIncremental(spark, path, probeBatch,
        "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(probe() == Set((2L, 100L)))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // crash window of compactBandIndex: live renamed to _old, new copy
    // not yet published — reader-side restore must bring it back
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/buckets"),
      new org.apache.hadoop.fs.Path(s"$path/_buckets_old")))
    assert(probe() == Set((2L, 100L)))
    // and a compact straight after the same crash state recovers first
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/shingles"),
      new org.apache.hadoop.fs.Path(s"$path/_shingles_old")))
    MinHash.compactBandIndex(spark, path)
    assert(probe() == Set((2L, 100L)))
    val subs = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(subs == Set("buckets", "shingles", "params"))
  }

  test("rebandIndex re-derives buckets for a new dial; probe ≡ one-shot pairs at that dial") {
    val corpus = Seq(
      (100L, base),
      (101L, edited(20, "xx")),
      (102L, "completely unrelated text about catalyst optimizer rule ordering internals")
    ).toDF("doc_id", "text")
    val path = tmp()
    MinHash.writeBandIndex(corpus, "doc_id", "text", path,
      n = 3, k = 32, bands = 8, threshold = 0.3)
    // grow it first so the reband covers appended rows too
    MinHash.appendToBandIndex(spark, path,
      Seq((1L, edited(12, "cc"))).toDF("doc_id", "text"), "doc_id", "text")
    MinHash.rebandIndex(spark, path, k = 32, bands = 16, threshold = 0.3)
    // params row carries the new dial; every indexed doc has 16 bucket rows
    val p = spark.read.parquet(s"$path/params").collect()(0)
    assert(p.getAs[Int]("bands") == 16 && p.getAs[Int]("k") == 32)
    assert(spark.read.parquet(s"$path/buckets")
      .filter(col("id") === 100L).count() == 16)
    assert(spark.read.parquet(s"$path/buckets")
      .filter(col("id") === 1L).count() == 16) // appended doc rebanded too
    // probe equivalence at the NEW dial: ≡ one-shot pairs(bands = 16)
    // restricted to batch-touching pairs
    val batch = Seq((2L, edited(30, "yy"))).toDF("doc_id", "text")
    val inc = MinHash.pairsIncremental(spark, path, batch, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val b1 = Seq((1L, edited(12, "cc"))).toDF("doc_id", "text")
    val full = MinHash.pairs(corpus.union(b1).union(batch), "doc_id", "text",
        n = 3, k = 32, bands = 16, threshold = 0.3)
      .filter(col("id_a") === 2L || col("id_b") === 2L)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full)
    assert(inc.nonEmpty)
    // no temp/backup dirs survive the swap
    val subs = new java.io.File(path).listFiles().map(_.getName).toSet
    assert(subs == Set("buckets", "shingles", "params"))
  }

  test("threshold-only reband rewrites params without touching buckets") {
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val path = tmp()
    MinHash.writeBandIndex(corpus, "doc_id", "text", path,
      n = 3, k = 32, bands = 8, threshold = 0.3)
    def bucketFiles() = new java.io.File(s"$path/buckets").listFiles()
      .map(f => (f.getName, f.lastModified())).toSet
    val before = bucketFiles()
    MinHash.rebandIndex(spark, path, k = 32, bands = 8, threshold = 0.99)
    assert(bucketFiles() == before) // verify-time dial: no bucket rewrite
    // and the probe now enforces the tightened threshold from the index
    val got = MinHash.pairsIncremental(spark, path,
        Seq((1L, base), (2L, edited(10, "zz"))).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    // only the exact dup survives 0.99 — the ~0.85 near-dups (1,2)/(2,100) drop
    assert(got.map { case (a, b, _) => (a, b) } == Set((1L, 100L)))
    // same-dial reband is a full no-op (params untouched too)
    def paramsFiles() = new java.io.File(s"$path/params").listFiles()
      .map(f => (f.getName, f.lastModified())).toSet
    val pBefore = paramsFiles()
    MinHash.rebandIndex(spark, path, k = 32, bands = 8, threshold = 0.99)
    assert(bucketFiles() == before && paramsFiles() == pBefore)
  }

  test("intra-batch repeated id appends once to the band index") {
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val path = tmp()
    MinHash.writeBandIndex(corpus, "doc_id", "text", path,
      n = 3, k = 32, bands = 8, threshold = 0.3)
    // the same id twice in one batch (an upstream hiccup) must land once
    val b = Seq((1L, edited(11, "ff")), (1L, edited(11, "ff")))
      .toDF("doc_id", "text")
    MinHash.appendToBandIndex(spark, path, b, "doc_id", "text")
    assert(spark.read.parquet(s"$path/shingles")
      .filter(col("id") === 1L).count() == 1)
    assert(spark.read.parquet(s"$path/buckets")
      .filter(col("id") === 1L).count() == 8) // bands, not 2 × bands
  }
}
