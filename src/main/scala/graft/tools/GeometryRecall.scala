package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the RECALL the corpus-adaptive LSH geometry trades per scaling
  * decade — the honesty companion to docs/SCALING.json's wall-time
  * curves: the adaptive knobs (SimHash.adaptiveMaxHamming,
  * AnnLsh.adaptivePlanes) buy their flat per-decade cost by narrowing
  * the candidate geometry, and this tool records what that costs against
  * exact ground truth at every decade instead of asserting it.
  *
  * - dedup_simhash: the registered face keeps the FULL hamming-7 radius
  *   at every scale via the generalized block-combination pigeonhole
  *   (SimHash.adaptiveBlocks), which is exact by construction — so its
  *   recall vs the legacy d=1 geometry must be IDENTITY, and this tool
  *   measures it as a tripwire (a regression here means the combination
  *   keying broke), alongside the radius-truncation fallback's
  *   (adaptiveMaxHamming) measured recall for the >8M-doc regime where
  *   the combinatorial scheme saturates.
  * - embed_cluster_lsh: ground truth is the EXACT cosine range search
  *   (≥ minCos) for the deterministic vec_id % 97 query sample — a
  *   broadcast-queries single corpus scan, feasible at any decade where
  *   the all-pairs exact join is not. Recall = fraction of those exact
  *   sampled pairs the adaptive selfPairs generator reports — overall,
  *   and restricted to cos ≥ 0.7 (the duplicated-content regime dedup
  *   actually gates on; random-hyperplane LSH is structurally sharp
  *   there and weak near orthogonality, so the two tiers separate the
  *   geometry trade from the regime effect).
  *
  * `runMain graft.tools.GeometryRecall` — env SPARK_GRAFT_SF_DIRS
  * (default the three testdata sfs + target/sf1 when present),
  * SPARK_GRAFT_RECALL_OUT (default docs/GEOMETRY_RECALL.json). */
object GeometryRecall {

  def main(args: Array[String]): Unit = {
    val defaultDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/root/repo/target/sf1")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists())
    val sfDirs = sys.env.get("SPARK_GRAFT_SF_DIRS")
      .map(_.split(",").toSeq).getOrElse(defaultDirs)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_RECALL_OUT",
      "docs/GEOMETRY_RECALL.json")
    val minCos = 0.35
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = for (dir <- sfDirs) yield {
      val docs = graft.Tables(spark, dir, "documents")
      val nDocs = docs.count()
      // the registered face: full radius 7, adaptive block combinations
      val dAdapt = graft.dedup.SimHash.adaptiveBlocks(nDocs)
      val nFace = graft.dedup.SimHash
        .pairs(docs, "doc_id", "text", maxHamming = 7, d = dAdapt).count()
      // legacy d=1 reference — the super-linear face, paid once per
      // decade as the identity-tripwire denominator
      val nLegacy = if (dAdapt == 1) nFace
        else graft.dedup.SimHash
          .pairs(docs, "doc_id", "text", maxHamming = 7, d = 1).count()
      val simRecall = if (nLegacy == 0) 1.0 else nFace.toDouble / nLegacy
      // the radius-truncation FALLBACK (for the saturated >8M-doc
      // regime): its recall is the real trade, measured not asserted
      val hTrunc = graft.dedup.SimHash.adaptiveMaxHamming(nDocs)
      val nTrunc = if (hTrunc == 7) nFace
        else graft.dedup.SimHash
          .pairs(docs, "doc_id", "text", maxHamming = hTrunc).count()
      val truncRecall = if (nLegacy == 0) 1.0 else nTrunc.toDouble / nLegacy

      val e0 = graft.Tables(spark, dir, "embeddings").select("vec_id", "embedding")
      // PLANT known high-cosine near-duplicates: the synthetic embeddings
      // are low-cosine (no natural cos>=0.7 pairs at any decade), which
      // made the dedup-regime recall tier 0/0 — vacuous. One perturbed
      // copy of every sampled vector, multiplicative per-element noise
      // with a per-vector amplitude spread (uniform delta in [-amp, amp],
      // amp in [0.3, 1.5] => cos ~ 1/sqrt(1+amp^2/3) in [0.76, 0.99]),
      // all deterministic (xxhash64 of (vec_id, element index)). The
      // offset is ≡ 0 (mod 97) so planted copies join the query sample
      // and every (original, copy) pair lands in the exact ground truth.
      val plantOffset = 97L * 10310000L
      val planted = e0.filter(col("vec_id") % 97 === 0)
        .select((col("vec_id") + plantOffset).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x.cast("double") * (lit(1.0) +
              (pmod(xxhash64(col("vec_id"), i), lit(2001)) - 1000).cast("double")
                / 1000.0 *
              (lit(0.3) + pmod(xxhash64(col("vec_id")), lit(100)).cast("double")
                / 100.0 * 1.2))).cast("float")).as("embedding"))
      val nPlanted = planted.count()
      val e = e0.unionByName(planted).localCheckpoint()
      val nVecs = e.count()
      val planes = graft.similarity.AnnLsh.adaptivePlanes(nVecs)
      val probes = graft.similarity.AnnLsh.adaptiveProbes(planes)
      val sample = e.filter(col("vec_id") % 97 === 0)
      // exact sampled ground truth: one broadcast-queries corpus scan;
      // keep cos so the >=0.7 regime tier splits without a second scan
      val exact = graft.similarity.AnnLsh
        .rangeSearch(e, sample, "vec_id", "embedding", minCos)
        .select(least(col("query_id"), col("neighbor_id")).as("id_a"),
          greatest(col("query_id"), col("neighbor_id")).as("id_b"),
          col("cos"))
        .dropDuplicates("id_a", "id_b")
        .localCheckpoint()
      val nExact = exact.count()
      val nExact70 = exact.filter(col("cos") >= 0.7).count()
      // the REGISTERED face's geometry: adaptive planes, 16 tables, and
      // the margin-aware multi-probe budget that holds recall as planes
      // grow (Q.embedClusterLsh passes exactly these knobs)
      val found = graft.similarity.AnnLsh
        .selfPairs(e, "vec_id", "embedding", dim = 64, minCos = minCos,
          planes = planes, tables = 16, probes = probes)
        .join(exact, Seq("id_a", "id_b"), "left_semi")
        .localCheckpoint()
      val nFound = found.count()
      val nFound70 = found.join(exact.filter(col("cos") >= 0.7),
        Seq("id_a", "id_b"), "left_semi").count()
      val lshRecall = if (nExact == 0) 1.0 else nFound.toDouble / nExact
      val lshRecall70 = if (nExact70 == 0) 1.0 else nFound70.toDouble / nExact70

      System.err.println(f"[recall] $dir docs=$nDocs d=$dAdapt sim=$simRecall%.4f " +
        f"trunc(h=$hTrunc)=$truncRecall%.4f vecs=$nVecs planes=$planes probes=$probes " +
        f"planted=$nPlanted lsh=$lshRecall%.4f ($nFound/$nExact) " +
        f"lsh70=$lshRecall70%.4f ($nFound70/$nExact70)")
      (dir, nDocs, dAdapt, nFace, nLegacy, simRecall, hTrunc, truncRecall,
        nVecs, planes, probes, nPlanted, nExact, nFound, lshRecall,
        nExact70, nFound70, lshRecall70)
    }

    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val json = rows.map {
      case (dir, nd, dA, nf, nl, sr, ht, tr, nv, p, pr, npl, ne, nfound, lr,
            ne70, nf70, lr70) =>
        s"""    {"sf_dir": "$dir", "docs": $nd,
           |     "simhash_blocks_d": $dA, "simhash_pairs_face": $nf,
           |     "simhash_pairs_legacy_d1": $nl,
           |     "simhash_recall_vs_legacy": ${f(sr)},
           |     "simhash_trunc_fallback_h": $ht,
           |     "simhash_trunc_fallback_recall": ${f(tr)},
           |     "vectors": $nv, "lsh_planes": $p, "lsh_tables": 16,
           |     "lsh_probes": $pr, "planted_high_cos_copies": $npl,
           |     "exact_sampled_pairs": $ne, "lsh_found": $nfound,
           |     "lsh_recall_vs_exact_sample": ${f(lr)},
           |     "exact_sampled_pairs_cos70": $ne70, "lsh_found_cos70": $nf70,
           |     "lsh_recall_cos70": ${f(lr70)}}""".stripMargin
    }.mkString(",\n")
    val w = new java.io.PrintWriter(outPath, "UTF-8")
    try w.println(
      s"""{
  "protocol": "per decade: the registered simhash face (radius 7, adaptive block-combination pigeonhole) is exact by construction, so simhash_recall_vs_legacy is an IDENTITY TRIPWIRE (both sides exact hamming<=7 pair sets); simhash_trunc_fallback_recall is the measured recall of the radius-truncation fallback (adaptiveMaxHamming) for the saturated regime. lsh recall = fraction of the EXACT cosine>=$minCos pairs touching the deterministic vec_id%97 sample that the registered selfPairs geometry (adaptive planes, 16 tables, adaptive margin-aware multi-probe) reports, overall and restricted to cos>=0.7. The corpus is augmented with one deterministic perturbed copy of every sampled vector (cos in ~[0.76, 0.99]) so the cos>=0.7 dedup-regime tier measures real pairs instead of 0/0",
  "decades": [
$json
  ]
}""") finally w.close()
    spark.stop()
  }
}
