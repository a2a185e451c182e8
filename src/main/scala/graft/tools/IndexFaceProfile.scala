package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: decompose the persisted-index faces' wall time into
  * their workflow steps (write / append / probe / audit), so optimization
  * effort lands on the step that actually costs (guide §1: measure first).
  * `runMain graft.tools.IndexFaceProfile [sfDir]` */
object IndexFaceProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-step wall time AND Spark job count (statusTracker) — explain()
    // can't show job counts for collect/checkpoint-driven workflows, and
    // job count is exactly what the probe-path optimizations change
    def t[A](label: String)(f: => A): A = {
      val st = spark.sparkContext.statusTracker
      val j0 = st.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val r = f
      val dj = st.getJobIdsForGroup(null).length - j0
      println(f"[prof] $label%-38s ${(System.nanoTime() - t0) / 1e9}%7.3f s  $dj%3d jobs")
      r
    }
    import graft.similarity.{AnnIndex, AnnLsh}
    val e = graft.Tables(spark, sfDir, "embeddings")
    e.count() // warm the scan

    // ---- ann_index_recall decomposition (two passes: warm JIT, then timed)
    for (round <- 1 to 2) {
      println(s"== ann_index_recall round $round")
      val base = e.filter(!(col("vec_id") % 13 === 5)).localCheckpoint(eager = false)
      val batch = e.filter(col("vec_id") % 13 === 5)
      val q = e.filter(col("vec_id") % 97 === 0)
      val tmp = java.nio.file.Files.createTempDirectory("graft_prof_idx").toString
      try {
        t("writeIvf")(AnnIndex.writeIvf(base, "vec_id", "embedding", "label", tmp))
        val brute1 = t("bruteTopK(before) build+count") {
          val b = AnnLsh.bruteTopK(base, q, "vec_id", "embedding", 5)
            .select("query_id", "neighbor_id")
          b.count(); b
        }
        val served1 = t("ivfTopK(before) build+count") {
          val s = AnnIndex.ivfTopK(spark, tmp, q, "vec_id", "embedding", k = 5, nProbe = 3)
            .select("query_id", "neighbor_id")
          s.count(); s
        }
        t("recall agg (before)") {
          brute1.join(served1, Seq("query_id", "neighbor_id"), "left_semi")
            .agg(count(lit(1))).collect()
        }
        t("append")(AnnIndex.append(spark, tmp, batch, "vec_id", "embedding"))
        t("bruteTopK(after) count") {
          AnnLsh.bruteTopK(e, q, "vec_id", "embedding", 5).count()
        }
        t("ivfTopK(after) count") {
          AnnIndex.ivfTopK(spark, tmp, q, "vec_id", "embedding", k = 5, nProbe = 3).count()
        }
      } finally {
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
    }

    // ---- dedup_fp_incremental decomposition
    val docs = graft.Tables(spark, sfDir, "documents")
    for (round <- 1 to 2) {
      println(s"== dedup_fp_incremental round $round")
      val fps = docs.select(col("doc_id"),
        graft.dedup.SimHash.simhash64(split(col("text"), " "), 42L).as("fp"))
      val path = java.nio.file.Files.createTempDirectory("graft_prof_fp").toString
      try {
        t("FingerprintIndex.write")(
          graft.dedup.FingerprintIndex.write(fps.filter(col("doc_id") % 5 =!= 0),
            "doc_id", "fp", path))
        t("pairsIncremental + checkpoint") {
          graft.dedup.FingerprintIndex.pairsIncremental(spark, path,
              fps.filter(col("doc_id") % 5 === 0), "doc_id", "fp", smallBatch = false)
            .localCheckpoint()
        }
      } finally {
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(path), true)
      }
    }
    spark.stop()
  }
}
