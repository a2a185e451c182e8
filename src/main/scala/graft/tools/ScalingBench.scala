package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure how registered queries scale with data volume: median-of-3
  * wall time per query at each scale factor directory, written as JSON.
  *
  * `runMain graft.tools.ScalingBench [query ...]` — defaults to the bench
  * heavies plus two cheap scans (the fixed-overhead anchors). Env:
  * `SPARK_GRAFT_SF_DIRS` (comma-separated, default the three testdata
  * sfs), `SPARK_GRAFT_SCALING_OUT` (default docs/SCALING.json).
  *
  * The point is the RATIO between adjacent sfs (10× data each step): a
  * linear operator's ratio tends to 10 as data dwarfs fixed scheduling
  * cost; a quadratic one blows past it. This is the committed evidence
  * that the 100 TB extrapolation rests on measurements, not adjectives.
  */
object ScalingBench {
  private val DefaultQueries = Seq(
    "embed_cluster_lsh", "ann_ivfpq", "ann_pq", "ann_lsh", "imp_ml_tree",
    "dedup_cluster", "dedup_stats", "dedup_jaccard", "dedup_containment",
    "dedup_simhash", "dedup_permuted", "dedup_substring", "dedup_substring_self",
    "dedup_winnow",
    "text_tokens_bpe", "mm_phash",
    "q_basket", "imp_als", "q21_waiting", "text_tfidf", "imp_knn",
    "pipeline_neardup", "imp_ffill_bfill", "q1_agg", "q6_filter",
    // round-9 continuation heavies: the graph family (edge build is the
    // cost), the fuzzy pair join, and the KS band self-join
    "graph_pagerank", "graph_triangles", "fuzzy_join", "profile_ks",
    // wave-3: the two-path link join, the basket pair expansion, the
    // (label, half, dim) drift rollup, the user-window lifecycle, the
    // dual-lineage dedup audit, and the Lloyd-pass topic miner
    "graph_linkpred", "orders_assoc", "embed_drift", "events_lifecycle",
    "dedup_recall", "text_topics")

  /** Bench-only knob faces: the SAME library calls as the registered
    * queries, with the scale knob docs/SCALE_BOUNDS.md prescribes for
    * growing corpora. They exist so the "drop maxHamming / raise planes"
    * advice is a MEASURED curve, not an adjective — each is the
    * geometry-bound face's prescription applied (dedup_simhash's
    * maxHamming 7→3 turns 8-bit pigeonhole chunks into 16-bit ones,
    * 256→65,536 buckets; embed_cluster_lsh's planes 4→8 turns 16
    * buckets/table into 256). Narrower recall is the documented trade.
    * Not registered in SparkEntry: they are evidence for the knob, not a
    * new operator surface. */
  private val KnobFaces: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "dedup_simhash_h3" -> ((s: SparkSession, dir: String) =>
      graft.dedup.SimHash.pairs(graft.Tables(s, dir, "documents"),
        "doc_id", "text", maxHamming = 3)),
    // probe-only cost of the persisted band index vs CORPUS decade, at a
    // FIXED batch (the sf0.001 src0 slice): the unmeasured warmup call
    // builds the index for this dir once; the timed calls probe it. The
    // curve isolates what a batch ingest actually pays as the corpus
    // grows — per the plan contract, a narrow corpus scan, no corpus
    // shuffle.
    "dedup_near_inc_probe" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.col
      // the per-dir index cache is keyed on a CONTENT fingerprint of the
      // corpus file (total bytes ⊕ mixed mtimes), not the dir path alone:
      // regenerated testdata at the same path gets a fresh index instead
      // of silently benching against a stale one
      def fp(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).map(_.map(fp).foldLeft(0L)(_ ^ _)).getOrElse(0L)
        else f.length() + f.lastModified() * 0x9E3779B97F4A7C15L
      val key = fp(new java.io.File(s"$dir/documents.parquet")) ^
        dir.hashCode.toLong
      val path = System.getProperty("java.io.tmpdir") +
        "/graft_scaling_nearidx_" + java.lang.Long.toUnsignedString(key)
      val params = new org.apache.hadoop.fs.Path(s"$path/params")
      if (!params.getFileSystem(s.sparkContext.hadoopConfiguration).exists(params))
        graft.dedup.MinHash.writeBandIndex(graft.Tables(s, dir, "documents"),
          "doc_id", "text", path, n = 3, k = 32, bands = 8, threshold = 0.10)
      // fixed probe batch so the curve isolates corpus growth; fall back
      // to a deterministic slice of the dir itself when the default
      // testdata layout isn't present (custom SPARK_GRAFT_SF_DIRS)
      val fixedDir = "/root/testdata/sf0.001"
      val batch =
        if (new java.io.File(s"$fixedDir/documents.parquet").exists())
          graft.Tables(s, fixedDir, "documents").filter(col("source") === "src0")
        else graft.Tables(s, dir, "documents").filter(col("doc_id") % 1009 === 0)
      graft.dedup.MinHash.pairsIncremental(s, path, batch, "doc_id", "text")
    }),
    // probe-only cost of the persisted FINGERPRINT index vs CORPUS decade
    // (the dedup_near_inc_probe discipline applied to the hamming
    // family): the warmup call builds the index for this dir once (keyed
    // on a content fingerprint — regenerated testdata gets a fresh
    // index); timed calls probe a FIXED batch, so the curve isolates
    // what a batch ingest pays as the corpus grows — a clustered narrow
    // keys scan, never a corpus re-fingerprint.
    "dedup_fp_inc_probe" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.{col, split}
      def fpOf(f: java.io.File): Long =
        if (f.isDirectory)
          Option(f.listFiles()).map(_.map(fpOf).foldLeft(0L)(_ ^ _)).getOrElse(0L)
        else f.length() + f.lastModified() * 0x9E3779B97F4A7C15L
      val key = fpOf(new java.io.File(s"$dir/documents.parquet")) ^
        dir.hashCode.toLong
      val path = System.getProperty("java.io.tmpdir") +
        "/graft_scaling_fpidx_" + java.lang.Long.toUnsignedString(key)
      def fps(d: String) = graft.Tables(s, d, "documents")
        .select(col("doc_id"),
          graft.dedup.SimHash.simhash64(split(col("text"), " "), 42L).as("fp"))
      val params = new org.apache.hadoop.fs.Path(s"$path/params")
      if (!params.getFileSystem(s.sparkContext.hadoopConfiguration).exists(params))
        graft.dedup.FingerprintIndex.write(fps(dir), "doc_id", "fp", path)
      val fixedDir = "/root/testdata/sf0.001"
      val batch =
        if (new java.io.File(s"$fixedDir/documents.parquet").exists())
          fps(fixedDir).filter(col("doc_id") % 7 === 0)
        else fps(dir).filter(col("doc_id") % 1009 === 0)
      graft.dedup.FingerprintIndex.pairsIncremental(s, path, batch, "doc_id", "fp")
    }),
    "embed_cluster_lsh_p8" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.col
      val e = graft.Tables(s, dir, "embeddings")
      val pairs = graft.similarity.AnnLsh.selfPairs(e, "vec_id", "embedding",
        dim = 64, minCos = 0.35, planes = 8, tables = 16)
      graft.dedup.Dedup.connectedComponents(e.select(col("vec_id")), "vec_id",
          pairs, "id_a", "id_b")
        .select(col("id").as("vec_id"), col("cluster_id"))
    }))

  def main(args: Array[String]): Unit = {
    val sfDirs = sys.env.getOrElse("SPARK_GRAFT_SF_DIRS",
      "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1").split(",").toSeq
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT", "docs/SCALING.json")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = (if (args.nonEmpty) args.toSeq else DefaultQueries)
      .filter(n => graft.SparkEntry.queries.contains(n) || KnobFaces.contains(n))
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val rows = for (name <- names) yield {
      val fn = graft.SparkEntry.queries.getOrElse(name, KnobFaces(name))
      val medians = for (dir <- sfDirs) yield {
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        once() // unmeasured warmup: codegen + JIT for this (query, sf) plan
        System.gc()
        val s = List(once(), once(), once()).sorted
        // incremental progress: long sf points are visible as they land
        System.err.println(f"[scaling] $name $dir ${fmt(s(1))}")
        s(1)
      }
      println(f"$name%-20s ${medians.map(fmt).mkString("  ")}")
      name -> medians
    }
    val json = rows.map { case (n, ms) =>
      s"""    "$n": [${ms.map(fmt).mkString(",")}]"""
    }.mkString(",\n")
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(
      s"""{
  "sf_dirs": [${sfDirs.map("\"" + _ + "\"").mkString(",")}],
  "protocol": "median-of-3 after unmeasured warmup, per (query, sf)",
  "unit": "sec",
  "queries": {
$json
  }
}""") finally w.close()
    spark.stop()
  }
}
