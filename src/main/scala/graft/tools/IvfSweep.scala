package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: sweep the IVF pair-tier geometry (list count, multi-assign
  * width, Lloyd iters) at one decade — measured recall (overall and
  * cos>=0.7) AND wall time, so the routed tier's knobs are set from a
  * curve, not a guess (the ProbeSweep discipline applied to AnnIvf).
  *
  * `runMain graft.tools.IvfSweep [l79a2i2 l79a4i2 l40a3i3 ...]`
  * (lists/assign/iters specs; default sweeps assign at the derived list
  * count). Env: SPARK_GRAFT_SF_DIR (default target/sf1), SPARK_GRAFT_CPUS. */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spec = "l(\\d+)a(\\d+)i(\\d+)".r
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val minCos = 0.35
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the GeometryRecall corpus: embeddings + one deterministic perturbed
    // copy of every sampled vector (cos in ~[0.76, 0.99])
    val e0 = graft.Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val plantOffset = 97L * 10310000L
    val planted = e0.filter(col("vec_id") % 97 === 0)
      .select((col("vec_id") + plantOffset).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) +
            (pmod(xxhash64(col("vec_id"), i), lit(2001)) - 1000).cast("double")
              / 1000.0 *
            (lit(0.3) + pmod(xxhash64(col("vec_id")), lit(100)).cast("double")
              / 100.0 * 1.2))).cast("float")).as("embedding"))
    val e = e0.unionByName(planted).localCheckpoint()
    val nVecs = e.count()
    val derived = graft.similarity.AnnIvf.ivfLists(nVecs)
    val sweep: Seq[(Int, Int, Int)] =
      if (args.nonEmpty) args.toSeq.map { case spec(l, a, i) => (l.toInt, a.toInt, i.toInt) }
      else Seq((derived, 2, 2), (derived, 3, 2), (derived, 4, 2),
        (derived / 2, 2, 2), (derived / 2, 3, 2))
    val sample = e.filter(col("vec_id") % 97 === 0)
    val exact = graft.similarity.AnnLsh
      .rangeSearch(e, sample, "vec_id", "embedding", minCos)
      .select(least(col("query_id"), col("neighbor_id")).as("id_a"),
        greatest(col("query_id"), col("neighbor_id")).as("id_b"), col("cos"))
      .dropDuplicates("id_a", "id_b")
      .localCheckpoint()
    val nExact = exact.count()
    val nExact70 = exact.filter(col("cos") >= 0.7).count()
    println(s"[ivfsweep] $dir vecs=$nVecs derivedLists=$derived exact=$nExact exact70=$nExact70")

    for ((lists, assign, iters) <- sweep) {
      val t0 = System.nanoTime()
      val found = graft.similarity.AnnIvf
        .selfPairs(e, "vec_id", "embedding", minCos = minCos,
          nLists = lists, assign = assign, iters = iters)
        .join(exact, Seq("id_a", "id_b"), "left_semi")
        .localCheckpoint()
      val nFound = found.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val nFound70 = found.join(exact.filter(col("cos") >= 0.7),
        Seq("id_a", "id_b"), "left_semi").count()
      println(f"[ivfsweep] lists=$lists%5d assign=$assign%2d iters=$iters%2d  " +
        f"recall=${nFound.toDouble / math.max(1, nExact)}%.4f " +
        f"recall70=${nFound70.toDouble / math.max(1, nExact70)}%.4f  ${sec}%7.2fs")
    }
    spark.stop()
  }
}
