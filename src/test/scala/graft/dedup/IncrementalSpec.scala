package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("incremental dedup keeps novel docs and drops corpus duplicates") {
    val corpus = Seq((100L, "existing document one"), (101L, "existing document two"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "a brand new document"),
      (2L, "existing document one"),      // exact dup of corpus 100
      (3L, "another novel document"),
      (4L, "existing document two")       // exact dup of corpus 101
    ).toDF("doc_id", "text")
    val novel = Dedup.incremental(batch, corpus, "doc_id", "text",
      expectedCorpusKeys = 100L)
    assert(novel.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("bloom antiJoin equals a plain left-anti join at any fpp") {
    val probe = (1L to 500L).map(i => (i, s"k$i")).toDF("id", "k")
    val build = (1L to 500L).filter(_ % 7 == 0).map(i => (s"k$i", i))
      .toDF("k", "v")
    // high fpp forces many false positives through the verify join —
    // the result must still be exact
    val viaBloom = graft.operators.BloomPrune
      .antiJoin(probe, "k", build, "k", expectedKeys = 10L, fpp = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    val direct = probe.join(build, Seq("k"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    assert(viaBloom == direct)
    assert(direct.size == 500 - 71) // 71 multiples of 7 ≤ 500
  }

  test("digest index: indexed probe equals corpus-scanning incremental") {
    val dir = java.nio.file.Files.createTempDirectory("graft_digidx").toString
    val corpus = Seq((100L, "existing document one"), (101L, "existing document two"),
      (102L, "existing document one") // corpus-internal dup — index stores DISTINCT digests
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "a brand new document"),
      (2L, "existing document one"),
      (3L, "another novel document"),
      (4L, "existing document two")
    ).toDF("doc_id", "text")
    Dedup.writeDigestIndex(corpus, "text", dir, expectedKeys = 100L)
    val viaIndex = Dedup.incrementalIndexed(spark, dir, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val direct = Dedup.incremental(batch, corpus, "doc_id", "text",
        expectedCorpusKeys = 100L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaIndex == direct && viaIndex == Seq(1L, 3L))
  }

  test("digest index append: the NEXT batch sees folded digests; re-append is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_digidx").toString
    val corpus = Seq((100L, "seed corpus document")).toDF("doc_id", "text")
    Dedup.writeDigestIndex(corpus, "text", dir, expectedKeys = 100L)
    val b1 = Seq((1L, "first batch novel doc"), (2L, "seed corpus document"))
      .toDF("doc_id", "text")
    Dedup.appendToDigestIndex(spark, dir, b1, "doc_id", "text")
    // only b1's NOVEL digest landed (doc 2 was a corpus dup)
    val nDigests = spark.read.parquet(s"$dir/digests").count()
    assert(nDigests == 2) // seed + b1 doc 1
    // batch 2: dup of b1's doc 1 must now be caught WITHOUT any corpus frame
    val b2 = Seq((5L, "first batch novel doc"), (6L, "second batch novel doc"))
      .toDF("doc_id", "text")
    val novel2 = Dedup.incrementalIndexed(spark, dir, b2, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(novel2 == Seq(6L))
    // re-appending b1 changes nothing: novelty filter on the table, bloom
    // insertion idempotent
    Dedup.appendToDigestIndex(spark, dir, b1, "doc_id", "text")
    assert(spark.read.parquet(s"$dir/digests").count() == nDigests)
    assert(Dedup.incrementalIndexed(spark, dir, b2, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(6L))
    // compaction rewrites the per-batch files; probes and row count are
    // unchanged and no temp/backup dirs survive
    Dedup.compactDigestIndex(spark, dir)
    assert(spark.read.parquet(s"$dir/digests").count() == nDigests)
    assert(Dedup.incrementalIndexed(spark, dir, b2, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq == Seq(6L))
    val subs = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(subs == Set("digests", "bloom", "params"))
  }

  test("digest index: intra-batch repeated text lands ONE table digest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_digidx").toString
    Dedup.writeDigestIndex(Seq((100L, "seed doc")).toDF("doc_id", "text"),
      "text", dir, expectedKeys = 100L)
    val batch = Seq((1L, "same novel text"), (2L, "same novel text"))
      .toDF("doc_id", "text")
    // both batch ROWS are novel to the caller…
    val novel = Dedup.incrementalIndexed(spark, dir, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(novel == Seq(1L, 2L))
    // …but the appended table stays digest-distinct
    Dedup.appendToDigestIndex(spark, dir, batch, "doc_id", "text")
    assert(spark.read.parquet(s"$dir/digests").count() == 2) // seed + 1
    assert(spark.read.parquet(s"$dir/digests").distinct().count() == 2)
  }

  test("digest index survives a simulated mid-swap crash (sketch AND table)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_digidx").toString
    val corpus = Seq((100L, "seed doc"), (101L, "other doc")).toDF("doc_id", "text")
    Dedup.writeDigestIndex(corpus, "text", dir, expectedKeys = 100L)
    val probeBatch = Seq((1L, "seed doc"), (2L, "fresh doc")).toDF("doc_id", "text")
    def novelIds() = Dedup.incrementalIndexed(spark, dir, probeBatch,
      "doc_id", "text").select("doc_id").as[Long].collect().sorted.toSeq
    assert(novelIds() == Seq(2L))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // crash window: backup rename done, publish rename not — only _old left
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/bloom/sketch"),
      new org.apache.hadoop.fs.Path(s"$dir/bloom/_sketch_old")))
    assert(novelIds() == Seq(2L)) // reader resolves to the backup IN PLACE
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/digests"),
      new org.apache.hadoop.fs.Path(s"$dir/_digests_old")))
    assert(novelIds() == Seq(2L))
    // readers are NON-MUTATING now: the table is still only in its backup
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/digests")))
    // the writer path (compact) restores it and publishes a fresh layout
    Dedup.compactDigestIndex(spark, dir)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/digests")))
    assert(novelIds() == Seq(2L))
  }

  test("compact preserves a file appended after its snapshot (reconciling swap)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_digidx").toString
    Dedup.writeDigestIndex(Seq((100L, "seed doc")).toDF("doc_id", "text"),
      "text", dir, expectedKeys = 100L)
    Dedup.appendToDigestIndex(spark, dir,
      Seq((1L, "second doc")).toDF("doc_id", "text"), "doc_id", "text")
    // simulate a concurrent appender landing a micro-batch between the
    // compactor's snapshot and its publish: compact with the snapshot
    // taken BEFORE a third digest lands
    val live = new org.apache.hadoop.fs.Path(s"$dir/digests")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapshot = graft.sources.Sources.dataFiles(fs, live)
    // the "late" append (normally concurrent; here sequential — the
    // snapshot is what decides, not wall-clock)
    Dedup.appendToDigestIndex(spark, dir,
      Seq((2L, "third doc")).toDF("doc_id", "text"), "doc_id", "text")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/_digests_compacting")
    val old = new org.apache.hadoop.fs.Path(s"$dir/_digests_old")
    spark.read.parquet(snapshot.toSeq.map(f => s"$live/$f"): _*)
      .distinct().write.parquet(tmp.toString)
    graft.sources.Sources.publishSwapReconcile(fs, live, tmp, old, snapshot)
    // all three digests survive the swap — the late file was copied across
    assert(spark.read.parquet(s"$dir/digests").distinct().count() == 3)
    // and a probe still sees the late digest as a duplicate
    val again = Dedup.incrementalIndexed(spark, dir,
      Seq((9L, "third doc"), (10L, "brand new")).toDF("doc_id", "text"),
      "doc_id", "text").select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == Seq(10L))
  }

  test("percentRank matches the SQL percent_rank definition including ties") {
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 20.0), (4L, 30.0), (5L, 5.0))
      .toDF("id", "v")
    val out = graft.imputer.FeatureBuilder.percentRank(df, "id", "v", 2, "pr")
      .as[(Long, Double)].collect().toMap
    // sorted: 5 < 10 < 20 = 20 < 30; lt-counts: 0,1,2,2,4; n-1 = 4
    assert(out(5L) == 0.0)
    assert(out(1L) == 0.25)
    assert(out(2L) == 0.5 && out(3L) == 0.5)
    assert(out(4L) == 1.0)
    // cross-check against Spark's own window percent_rank
    val win = org.apache.spark.sql.expressions.Window.orderBy("v")
    val ref = df.select(col("id"), percent_rank().over(win).as("pr"))
      .as[(Long, Double)].collect().toMap
    assert(out == ref)
  }
}
