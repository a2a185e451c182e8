package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the two adaptive-geometry faces: times each
  * stage of dedup_simhash and embed_cluster_lsh in isolation at one sf dir
  * so optimization goes at the measured bend, not a guessed one. */
object GeomProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    // --- dedup_simhash stages
    val docs = graft.Tables(spark, dir, "documents")
    val nDocs = docs.count()
    val d = graft.dedup.SimHash.adaptiveBlocks(nDocs)
    println(s"[prof] docs=$nDocs d=$d")
    val fp = docs.select(col("doc_id").as("id"),
        graft.dedup.SimHash.simhash64(split(col("text"), " "), 42L).as("fp"))
      .localCheckpoint()
    t("simhash: fingerprints (materialize)") { fp.count() }
    val groups = fp.select("fp").distinct().localCheckpoint()
    t("simhash: distinct fps") { groups.count() }
    val fpp = graft.dedup.SimHash
      .pairsFromFingerprintsBlocked(fp.select(col("fp").as("id2"), col("fp")),
        "id2", "fp", 7, d) // fp-keyed: measures candidate join at group scale
    t("simhash: FULL blocked pairs from fps") {
      graft.dedup.SimHash.pairsFromFingerprintsBlocked(fp, "id", "fp", 7, d).count()
    }
    t("simhash: registered face end-to-end") {
      graft.queries.Q.dedupSimhash(spark, dir).count()
    }

    // --- embed_cluster_lsh stages
    val e = graft.Tables(spark, dir, "embeddings")
    val n = e.count()
    val planes = graft.similarity.AnnLsh.adaptivePlanes(n)
    println(s"[prof] vecs=$n planes=$planes")
    val pairs = graft.similarity.AnnLsh.selfPairs(e, "vec_id", "embedding",
        dim = 64, minCos = 0.35, planes = planes, tables = 16,
        broadcastVectors = true)
      .localCheckpoint()
    t("lsh: selfPairs (materialize)") { pairs.count() }
    t("lsh: connected components over pairs") {
      graft.dedup.Dedup.connectedComponents(e.select(col("vec_id")), "vec_id",
        pairs, "id_a", "id_b").count()
    }
    t("lsh: registered face end-to-end") {
      graft.queries.Q.embedClusterLsh(spark, dir).count()
    }
    spark.stop()
  }
}
