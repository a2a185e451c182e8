package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** MEASUREMENT TOOL (not a registered operator): the two-level coarse
  * quantizer cost experiment at the IVF past-cap overload shape — VERDICT
  * r15 stretch item. The measured past-cap law (GEOMETRY_RECALL
  * ivf_overload: recall FLAT, generator cost ~2.3-2.7× per corpus
  * doubling at pinned lists) is the REGISTERED answer; the hypothesis
  * under test here is that a 256-way top-level quantizer over the
  * centroid table restores the flat-occupancy candidate term past the
  * cap: the [[AnnIvf.maxLists]] cap exists because single-level
  * assignment is n·nLists dot products, and a two-level assignment
  * (n·256 top-level + n·2·~32 within-cell) makes nLists ≈ n/256 evaluable
  * at ANY n — occupancy returns to the target, the assign²·n·occupancy
  * candidate term drops by the overload factor, and the model stays
  * driver-sized per cell.
  *
  * Protocol: the exact 4× overload corpus GeometryRecall measures
  * (sf1 embeddings + planted copies + 3× deterministic fill, fill
  * filtered out of the query sample), exact sampled ground truth
  * recomputed, then BOTH generators timed in the same session:
  *   (a) the registered pinned-lists selfPairs (occupancy 4× target) —
  *       the measured law's 4× point, re-timed for same-session fairness;
  *   (b) the two-level variant at flat occupancy (lists ≈ n/256,
  *       top level 256 cells, per-cell Lloyd-refined sub-centroids,
  *       probe top-2 cells → top-`assign` (cell, sub) lists).
  * Registration rule (the verdict's): adopt (b) as a product operator
  * only if it beats the law materially; either way the row lands in
  * docs/SCALING.md.
  *
  * `runMain graft.tools.TwoLevelIvf` */
object TwoLevelIvf {

  /** Exact-cosine near-dup pairs via the TWO-LEVEL coarse quantizer —
    * same contract as [[graft.similarity.AnnIvf.selfPairs]] (exact
    * precision, probabilistic recall), different assignment path. The
    * composite list key is cell·100000 + sub (one long — the graft_topk
    * heap id). */
  private def twoLevelSelfPairs(df: DataFrame, idCol: String, vecCol: String,
                                minCos: Double, l1Cells: Int,
                                targetListSize: Long, assign: Int,
                                iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val unit = base.select(col("id"),
        when(norm(col("v")) > 0.0,
          transform(col("v"), x => x / norm(col("v"))))
          .otherwise(col("v")).as("u"))
      .localCheckpoint()
    // LEVEL 1: 256-way Lloyd over the full corpus (n·256 evals/pass)
    val l1 = graft.similarity.KMeans.fitCentroids(unit, "id", "u", l1Cells, iters)
    def l2score(u: org.apache.spark.sql.Column, cv: org.apache.spark.sql.Column,
                cc: org.apache.spark.sql.Column) =
      lit(2.0) * dot(u, cv) - dot(u, u) - cc
    // home cell per vector (top-1) — drives seeding and refinement; the
    // native top-lists projection (same unit-L2 score, lower-index ties)
    def cellsOf(k: Int) = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TopListsExpr(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("u")),
        l1, k, cosineScore = false))
    val celled = unit
      .select(col("id"), col("u"), cellsOf(1).getItem(0).as("cell"))
      .localCheckpoint()
    // LEVEL 2 seeds: ceil(cellN/targetListSize) lowest-hash members per
    // cell (the KMeans diversity seeding, applied within each cell)
    import org.apache.spark.sql.expressions.Window
    val seeded = celled
      .withColumn("_rn", row_number().over(
        Window.partitionBy("cell").orderBy(xxhash64(col("id")), col("id"))))
      .withColumn("_k", ceil(count(lit(1)).over(
        Window.partitionBy("cell")).cast("double") / targetListSize.toDouble))
      .filter(col("_rn") <= col("_k"))
      .select(col("cell"), (col("_rn") - 1).cast("long").as("sub"), col("u").as("sc"))
    var subs = seeded
      .withColumn("scc", dot(col("sc"), col("sc")))
      .localCheckpoint()
    // Lloyd refinement WITHIN each home cell: per pass each vector
    // evaluates only its own cell's subs (broadcast equality join — the
    // whole point: ~nLists/l1Cells evals instead of nLists)
    for (_ <- 0 until iters) {
      val assigned = celled.join(broadcast(subs), Seq("cell"))
        .select(col("id"), col("u"), col("cell"),
          l2score(col("u"), col("sc"), col("scc")).as("_s"), col("sub"))
        .groupBy(col("id"))
        .agg(call_function("graft_topk", col("_s"),
            col("cell") * lit(100000L) + col("sub"), lit(1)).as("_tk"),
          first(col("u")).as("u"))
        .select(col("u"), (col("_tk").getItem(0).getField("id") / lit(100000L))
            .cast("long").as("cell"),
          pmod(col("_tk").getItem(0).getField("id"), lit(100000L)).as("sub"))
      subs = assigned.groupBy("cell", "sub")
        .agg(call_function("graft_vec_avg", col("u")).as("sc"))
        .withColumn("scc", dot(col("sc"), col("sc")))
        .localCheckpoint()
    }
    // FINAL multi-assign: top-2 cells, then top-`assign` (cell, sub)
    // lists among those cells' subs — n·(256 + 2·occ_sub) evals total
    val cells2 = unit
      .select(col("id"), col("u"), explode(cellsOf(2)).as("cell"))
    val listed = cells2.join(broadcast(subs), Seq("cell"))
      .select(col("id"),
        l2score(col("u"), col("sc"), col("scc")).as("_s"),
        (col("cell") * lit(100000L) + col("sub")).as("list"))
      .groupBy("id")
      .agg(call_function("graft_topk", col("_s"), col("list"), lit(assign)).as("_tk"))
      .select(col("id"), explode(col("_tk")).as("_e"))
      .select(col("id"), col("_e.id").as("list"))
    // within-list collisions + exact verify — the selfPairs discipline
    val a = listed.select(col("list"), col("id").as("id_a"))
    val b = listed.select(col("list"), col("id").as("id_b"))
    val cand = a.join(b.hint("shuffle_hash"), Seq("list"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    def side(n: String) = base.select(col("id").as(n),
      col("v").as(n.replace("id_", "v")),
      norm(col("v")).as("_n" + n.stripPrefix("id_")))
    cand
      .join(side("id_a"), Seq("id_a"))
      .join(side("id_b"), Seq("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("_na") * col("_nb")))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }

  def main(args: Array[String]): Unit = {
    val minCos = 0.35
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_OVERLOAD_FACTOR", "4").toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the exact GeometryRecall 4× overload corpus (fill ∉ query sample)
    val e0 = graft.Tables(spark, baseDir, "embeddings").select("vec_id", "embedding")
    val planted = e0.filter(col("vec_id") % 97 === 0)
      .select((col("vec_id") + lit(97L * 10310000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) +
            (pmod(xxhash64(col("vec_id"), i), lit(2001)) - 1000).cast("double")
              / 1000.0 *
            (lit(0.3) + pmod(xxhash64(col("vec_id")), lit(100)).cast("double")
              / 100.0 * 1.2))).cast("float")).as("embedding"))
    val base = e0.unionByName(planted).localCheckpoint()
    val n0 = base.count()
    val listsPinned = graft.similarity.AnnIvf.ivfLists(n0)
    val assign = graft.similarity.AnnIvf.ivfAssign(listsPinned)
    val fillOffset = 97L * 20310000L + 1L
    val fill = spark.range((factor - 1L) * n0)
      .filter((col("id") + fillOffset) % 97 =!= 0)
      .select((col("id") + fillOffset).as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          ((pmod(xxhash64(col("id"), i), lit(20001)) - 10000).cast("double")
            / 10000.0).cast("float")).as("embedding"))
    val eo = base.unionByName(fill).localCheckpoint()
    val nV = eo.count()
    val sample = eo.filter(col("vec_id") % 97 === 0)
    val exact = graft.similarity.AnnLsh
      .rangeSearch(eo, sample, "vec_id", "embedding", minCos)
      .select(least(col("query_id"), col("neighbor_id")).as("id_a"),
        greatest(col("query_id"), col("neighbor_id")).as("id_b"), col("cos"))
      .dropDuplicates("id_a", "id_b")
      .localCheckpoint()
    val nExact = exact.count()
    val nExact70 = exact.filter(col("cos") >= 0.7).count()

    def measure(tag: String, gen: => DataFrame): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val found = gen.join(exact, Seq("id_a", "id_b"), "left_semi").localCheckpoint()
      val nF = found.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val nF70 = found.join(exact.filter(col("cos") >= 0.7),
        Seq("id_a", "id_b"), "left_semi").count()
      val r = if (nExact == 0) 1.0 else nF.toDouble / nExact
      val r70 = if (nExact70 == 0) 1.0 else nF70.toDouble / nExact70
      System.err.println(f"[twolevel] $tag recall=$r%.4f ($nF/$nExact) " +
        f"recall70=$r70%.4f secs=$secs%.1f")
      (r, r70, secs)
    }
    // (a) the registered pinned-lists law point (occupancy factor× target)
    val (br, br70, bs) = measure(s"pinned lists=$listsPinned",
      graft.similarity.AnnIvf.selfPairs(eo, "vec_id", "embedding",
        minCos = minCos, nLists = listsPinned, assign = assign))
    // (b) two-level at flat occupancy (lists ≈ n/256 — past the cap shape)
    val (tr, tr70, ts) = measure("two-level l1=256",
      twoLevelSelfPairs(eo, "vec_id", "embedding", minCos = minCos,
        l1Cells = 256, targetListSize = 256L, assign = assign))
    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"tool":"two_level_ivf","factor":$factor,"vectors":$nV,""" +
      s""""lists_pinned":$listsPinned,"exact_sampled_pairs":$nExact,""" +
      s""""pinned":{"recall":${f(br)},"recall_cos70":${f(br70)},"secs":${f(bs)}},""" +
      s""""two_level":{"recall":${f(tr)},"recall_cos70":${f(tr70)},"secs":${f(ts)}}}""")
    spark.stop()
  }
}
