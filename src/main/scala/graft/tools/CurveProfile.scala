package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose the text_tfidf and dedup_winnow scaling curves into
  * their stage terms — per decade, the time AND cardinality of each plan
  * stage, so the steepest-curve driver is a measurement, not a guess
  * (VERDICT r11 task 6: tfidf 5.5×/decade, winnow 6.2×/decade — both
  * sub-linear vs 10× rows, but steeper than the ~2-3× scheduling-floor
  * queries; name the term that grows).
  *
  * `runMain graft.tools.CurveProfile` — env SPARK_GRAFT_SF_DIRS
  * (default all four decades when target/sf1 exists). */
object CurveProfile {
  def main(args: Array[String]): Unit = {
    val defaultDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/root/repo/target/sf1")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())
    val sfDirs = sys.env.get("SPARK_GRAFT_SF_DIRS")
      .map(_.split(",").toSeq).getOrElse(defaultDirs)
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(dir: String, name: String)(f: => Long): Unit = {
      f // unmeasured warmup (codegen/JIT)
      val t0 = System.nanoTime()
      val n = f
      println(f"[curve] $dir%-28s $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    for (dir <- sfDirs) {
      val docs = graft.Tables(spark, dir, "documents")

      // ---- text_tfidf stage terms
      val toks = docs.select(col("doc_id"),
        explode(graft.text.TextAnalysis.tokens(col("text"))).as("term"))
      t(dir, "tfidf: token stream") { toks.count() }
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      t(dir, "tfidf: tf pairs (shuffle+agg)") { tf.count() }
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df")).localCheckpoint()
      t(dir, "tfidf: vocabulary (re-agg)") { dfreq.count() }
      t(dir, "tfidf: term join + score") {
        tf.join(dfreq, Seq("term")).count()
      }
      t(dir, "tfidf: registered face end-to-end") {
        graft.queries.Q.textTfidf(spark, dir).count()
      }

      // ---- dedup_winnow stage terms
      val idx0 = graft.text.TextAnalysis
        .winnowFingerprints(docs, "doc_id", "text")
        .select(col("doc_id").as("_id"), col("fp_hash")).distinct()
        .localCheckpoint()
      t(dir, "winnow: fp index (fingerprint+agg)") { idx0.count() }
      val freq = idx0.groupBy("fp_hash").agg(count(lit(1)).as("_df"))
        .localCheckpoint()
      t(dir, "winnow: hash freq (re-agg)") { freq.count() }
      val kept = freq.filter(col("_df") >= 2 && col("_df") <= 100)
      // the self-join fan-out term: Σ df·(df−1)/2 over kept hashes — the
      // candidate-pair volume the bucket join must materialize
      val fanout = kept.agg(
        (sum(col("_df") * (col("_df") - 1)) / 2).cast("bigint").as("pairs"))
        .head().getLong(0)
      println(f"[curve] $dir%-28s winnow: Σ df(df-1)/2 fan-out          rows=$fanout")
      val idx = idx0.join(kept.select("fp_hash"), Seq("fp_hash"), "left_semi")
        .localCheckpoint()
      t(dir, "winnow: pruned index") { idx.count() }
      t(dir, "winnow: bucket self-join + pair agg") {
        idx.alias("a").join(idx.alias("b"),
            col("a.fp_hash") === col("b.fp_hash") && col("a._id") < col("b._id"))
          .groupBy(col("a._id"), col("b._id")).agg(count(lit(1))).count()
      }
      t(dir, "winnow: registered face end-to-end") {
        graft.queries.Q.dedupWinnow(spark, dir).count()
      }

      // ---- dedup_recall stage terms (VERDICT r12 task 2: 4.7×/decade,
      // the steepest tracked curve — decompose into its generator terms)
      t(dir, "recall: shingle scan (the shared term)") {
        docs.select(graft.dedup.Dedup.shingleHashes(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0).count()
      }
      t(dir, "recall: exact jaccard ground truth") {
        graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text", "source",
          n = 3, threshold = 0.10).count()
      }
      t(dir, "recall: banded minhash finder") {
        graft.dedup.MinHash.pairs(docs, "doc_id", "text",
          n = 3, k = 32, bands = 8, threshold = 0.10).count()
      }
      t(dir, "recall: registered face end-to-end") {
        graft.queries.Q.dedupRecall(spark, dir).count()
      }

      // ---- dedup_jaccard stage terms (4.2×/decade — name the term)
      val jsh = graft.dedup.Dedup.shingleFrame(docs, "doc_id", "text",
        "source", 3).localCheckpoint()
      t(dir, "jaccard: shingle frame (materialize)") { jsh.count() }
      // the candidate fan-out the prefix filter admits: Σ prefixFreq²
      // over (block, shingle) — the quadratic-in-occupancy join term
      val cands = graft.dedup.Dedup.jaccardCandidates(jsh, 0.10, 0L)
        .localCheckpoint()
      t(dir, "jaccard: prefix-filter candidates") { cands.count() }
      t(dir, "jaccard: verify join (exact sorted-merge)") {
        cands
          .join(jsh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(jsh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .withColumn("jaccard",
            graft.dedup.Dedup.jaccardHashed(col("sh_a"), col("sh_b")))
          .filter(col("jaccard") >= 0.10).count()
      }
      t(dir, "jaccard: registered face end-to-end") {
        graft.queries.Q.dedupJaccard(spark, dir).count()
      }
      // counterfactual: NO checkpoint — the corpus tokenizes 3× but the
      // heavy shingle arrays never serialize to the block store. Names
      // whether the face's cost is the scan or the checkpoint write.
      t(dir, "jaccard: face WITHOUT the checkpoint") {
        graft.dedup.Dedup.jaccardPairsFromShingles(
          graft.dedup.Dedup.shingleFrame(docs, "doc_id", "text", "source", 3),
          threshold = 0.10).count()
      }
      // COLD stage isolation (fresh lineage each, no shared checkpoint):
      // candidates-only vs the full face names whether the array-shipping
      // verify join or the prefix-filter candidate stage carries the curve
      t(dir, "jaccard: COLD candidates only") {
        graft.dedup.Dedup.jaccardCandidates(
          graft.dedup.Dedup.shingleFrame(docs, "doc_id", "text", "source", 3),
          0.10, 0L).count()
      }
      t(dir, "jaccard: COLD shingle compute only") {
        graft.dedup.Dedup.shingleFrame(docs, "doc_id", "text", "source", 3)
          .select(size(col("sh"))).agg(sum(col("size(sh)"))).count()
      }

      // ---- dedup_substring_self stage terms (4.4×/decade)
      val pos = graft.dedup.Dedup.positionalShingles(docs, "doc_id", "text", 8)
        .localCheckpoint()
      t(dir, "substr_self: positional shingles") { pos.count() }
      t(dir, "substr_self: repeated-shingle prune") {
        pos.groupBy("s").agg(countDistinct(col("_id")).as("_nd"))
          .filter(col("_nd") >= 2).count()
      }
      t(dir, "substr_self: registered face end-to-end") {
        graft.queries.Q.dedupSubstringSelf(spark, dir).count()
      }
    }
    spark.stop()
  }
}
