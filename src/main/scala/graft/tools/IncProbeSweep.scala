package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sweep the incremental embedding probe's nProbe dial against exact
  * ground truth at the sf1 decade — the measurement behind
  * [[graft.similarity.AnnIndex.dedupNProbe]].
  *
  * WHY: GEOMETRY_RECALL's first ivf_incremental row (r16) measured the
  * r15-shipped nProbe=2 at sf1 as 0.148 overall / 0.776 cos≥0.7 — far
  * below the 0.99-class cos70 recall the selfPairs assign=4 rows led the
  * face docs to claim, because the incremental geometry is structurally
  * weaker: the persisted corpus is SINGLE-assigned, so a pair is found
  * only when the corpus partner's one list lands among the batch
  * vector's nProbe probes (nProbe×1 chances vs selfPairs' 4×4). This
  * tool measures exactly what each extra probe buys (recall AND probe
  * wall time, which scales with the pruned-scan fraction nProbe/lists)
  * so the shipped default is a measured dial, not a guess — the
  * IvfSweep discipline applied to the ingest path.
  *
  * `runMain graft.tools.IncProbeSweep` — env SPARK_GRAFT_SF_DIR
  * (default target/sf1), SPARK_GRAFT_INC_PROBES (default "1,2,3,4,6"). */
object IncProbeSweep {
  def main(args: Array[String]): Unit = {
    val minCos = 0.35
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val probes = sys.env.getOrElse("SPARK_GRAFT_INC_PROBES", "1,2,3,4,6")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the GeometryRecall decade protocol: corpus + planted copies, exact
    // sampled truth, sample as the ingest batch
    val e0 = graft.Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val planted = e0.filter(col("vec_id") % 97 === 0)
      .select((col("vec_id") + lit(97L * 10310000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) +
            (pmod(xxhash64(col("vec_id"), i), lit(2001)) - 1000).cast("double")
              / 1000.0 *
            (lit(0.3) + pmod(xxhash64(col("vec_id")), lit(100)).cast("double")
              / 100.0 * 1.2))).cast("float")).as("embedding"))
    val e = e0.unionByName(planted).localCheckpoint()
    val sample = e.filter(col("vec_id") % 97 === 0)
    val exact = graft.similarity.AnnLsh
      .rangeSearch(e, sample, "vec_id", "embedding", minCos)
      .select(least(col("query_id"), col("neighbor_id")).as("id_a"),
        greatest(col("query_id"), col("neighbor_id")).as("id_b"), col("cos"))
      .dropDuplicates("id_a", "id_b")
      .localCheckpoint()
    val nExact = exact.count()
    val nExact70 = exact.filter(col("cos") >= 0.7).count()
    System.err.println(s"[incprobe] $dir exact=$nExact exact70=$nExact70")
    val rows = probes.map { p =>
      val t0 = System.nanoTime()
      val (lists, nF, r, nF70, r70) = GeometryRecall.incrementalRecall(
        spark, e, exact, nExact, nExact70, minCos, 256L, nProbe = p)
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[incprobe] nProbe=$p lists=$lists recall=$r%.4f " +
        f"($nF/$nExact) recall70=$r70%.4f ($nF70/$nExact70) secs=$secs%.1f " +
        "(incl index build)")
      f"""{"n_probe":$p,"lists":$lists,"recall":$r%.4f,"recall_cos70":$r70%.4f,"secs":$secs%.1f}"""
    }
    println("[" + rows.mkString(",") + "]")
    spark.stop()
  }
}
