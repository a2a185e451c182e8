package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for the adaptive-geometry faces (dedup_simhash,
  * embed_cluster_lsh) at one sf dir — one parameterized tool (the former
  * GeomProfile/2/3 triplet): optimization goes at the measured bend, not
  * a guessed one.
  *
  * `runMain graft.tools.GeomProfile [stages] [occupancy] [selfpairs]`
  * (no args = all sections). Env: SPARK_GRAFT_SF_DIR (default
  * target/sf1), SPARK_GRAFT_CPUS.
  */
object GeomProfile {
  def main(args: Array[String]): Unit = {
    val sections = if (args.nonEmpty) args.toSet else Set("stages", "occupancy", "selfpairs")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions._
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    lazy val docs = graft.Tables(spark, dir, "documents")
    lazy val e = graft.Tables(spark, dir, "embeddings")
    lazy val planes = graft.similarity.AnnLsh.adaptivePlanes(e.count())
    lazy val probes = graft.similarity.AnnLsh.adaptiveProbes(planes)
    lazy val base = e.select(col("vec_id").as("id"), toDouble(col("embedding")).as("v"))

    // ------------------------------------------- per-stage face timings
    if (sections("stages")) {
      val nDocs = docs.count()
      val d = graft.dedup.SimHash.adaptiveBlocks(nDocs)
      println(s"[prof] docs=$nDocs d=$d")
      val fp = docs.select(col("doc_id").as("id"),
          graft.dedup.SimHash.simhash64(split(col("text"), " "), 42L).as("fp"))
        .localCheckpoint()
      t("simhash: fingerprints (materialize)") { fp.count() }
      t("simhash: distinct fps") { fp.select("fp").distinct().count() }
      // granular: where inside the blocked join does the time go?
      val k = 7 + d
      val bitsPer = 64 / k
      val mask = (1L << bitsPer) - 1
      val combos = (0 until k).combinations(d).toSeq
      val keyStructs = combos.zipWithIndex.map { case (blocks, ci) =>
        val key = blocks.zipWithIndex.map { case (b, j) =>
          shiftleft(shiftright(col("fp"), b * bitsPer).bitwiseAND(mask), j * bitsPer)
        }.reduce(_ bitwiseOR _)
        struct(lit(ci).as("comb"), key.as("ckey"))
      }
      val keyed = fp.select("fp").distinct()
        .select(col("fp"), explode(array(keyStructs: _*)).as("_ck"))
        .select(col("fp"), col("_ck.comb").as("comb"), col("_ck.ckey").as("ckey"))
        .localCheckpoint()
      t("simhash: keyed rows (materialize)") { keyed.count() }
      val l = keyed.select(col("comb"), col("ckey"), col("fp").as("fp_a"))
      val r = keyed.select(col("comb"), col("ckey"), col("fp").as("fp_b"))
      t("simhash: raw join output") {
        l.join(r, Seq("comb", "ckey")).filter(col("fp_a") < col("fp_b")).count()
      }
      t("simhash: raw join output (shuffle_hash hint)") {
        l.join(r.hint("shuffle_hash"), Seq("comb", "ckey"))
          .filter(col("fp_a") < col("fp_b")).count()
      }
      t("simhash: SHJ + hamming filter + dedup") {
        l.join(r.hint("shuffle_hash"), Seq("comb", "ckey"))
          .filter(col("fp_a") < col("fp_b"))
          .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
          .filter(col("hamming") <= 7)
          .dropDuplicates("fp_a", "fp_b").count()
      }
      t("simhash: join + hamming filter") {
        l.join(r, Seq("comb", "ckey")).filter(col("fp_a") < col("fp_b"))
          .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
          .filter(col("hamming") <= 7).count()
      }
      t("simhash: join + filter + dedup") {
        l.join(r, Seq("comb", "ckey")).filter(col("fp_a") < col("fp_b"))
          .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
          .filter(col("hamming") <= 7)
          .dropDuplicates("fp_a", "fp_b").count()
      }
      t("simhash: FULL blocked pairs from fps") {
        graft.dedup.SimHash.pairsFromFingerprintsBlocked(fp, "id", "fp", 7, d).count()
      }
      t("simhash: registered face end-to-end") {
        graft.queries.Q.dedupSimhash(spark, dir).count()
      }
      println(s"[prof] vecs=${e.count()} planes=$planes probes=$probes")
      val pairs = graft.similarity.AnnLsh.selfPairs(e, "vec_id", "embedding",
          dim = 64, minCos = 0.35, planes = planes, tables = 16,
          broadcastVectors = true, probes = probes)
        .localCheckpoint()
      t("lsh: selfPairs (materialize)") { pairs.count() }
      t("lsh: connected components over pairs") {
        graft.dedup.Dedup.connectedComponents(e.select(col("vec_id")), "vec_id",
          pairs, "id_a", "id_b").count()
      }
      t("lsh: registered face end-to-end") {
        graft.queries.Q.embedClusterLsh(spark, dir).count()
      }
    }

    // ------------------------- bucket-occupancy skew (Σ occ² drives joins)
    if (sections("occupancy")) {
      val signed = base.select(col("id"),
          graft.similarity.AnnLsh.signatures(col("v"), 64, planes, 16).as("_sigs"))
        .select(col("id"), posexplode(col("_sigs")).as(Seq("table", "bucket")))
        .localCheckpoint()
      val occ = signed.groupBy("table", "bucket").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      occ.agg(sum(col("n") * col("n")).as("sum_occ_sq"), max("n").as("max_occ"),
        count(lit(1)).as("n_buckets")).show()
      occ.orderBy(desc("n")).show(10)
      val d = graft.dedup.SimHash.adaptiveBlocks(docs.count())
      val fp = docs.select(col("doc_id").as("id"),
          graft.dedup.SimHash.simhash64(split(col("text"), " "), 42L).as("fp"))
        .localCheckpoint()
      val k = 7 + d
      val bitsPer = 64 / k
      val mask = (1L << bitsPer) - 1
      val combos = (0 until k).combinations(d).toSeq
      println(s"[prof] simhash combos=${combos.size} bitsPer=$bitsPer")
      val keyStructs = combos.zipWithIndex.map { case (blocks, ci) =>
        val key = blocks.zipWithIndex.map { case (b, j) =>
          shiftleft(shiftright(col("fp"), b * bitsPer).bitwiseAND(mask), j * bitsPer)
        }.reduce(_ bitwiseOR _)
        struct(lit(ci).as("comb"), key.as("ckey"))
      }
      val keyed = fp.select("fp").distinct()
        .select(col("fp"), explode(array(keyStructs: _*)).as("_ck"))
        .select(col("_ck.comb").as("comb"), col("_ck.ckey").as("ckey"))
      val socc = keyed.groupBy("comb", "ckey").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      socc.agg(sum(col("n") * col("n")).as("sum_occ_sq"), max("n").as("max_occ"),
        count(lit(1)).as("n_keys")).show()
      socc.orderBy(desc("n")).show(10)
    }

    // ----------------------------- stage timing INSIDE AnnLsh.selfPairs
    if (sections("selfpairs")) {
      val signed = base.select(col("id"),
          graft.similarity.AnnLsh.signatures(col("v"), 64, planes, 16).as("_sigs"))
        .select(col("id"), posexplode(col("_sigs")).as(Seq("table", "bucket")))
        .localCheckpoint()
      t("signing (materialize 16 tables)") { signed.count() }
      val a = signed.select(col("table"), col("bucket"), col("id").as("id_a"))
      val b = signed.select(col("table"), col("bucket"), col("id").as("id_b"))
      t("bucket join raw") {
        a.join(b, Seq("table", "bucket")).filter(col("id_a") < col("id_b")).count()
      }
      val cand = a.join(b, Seq("table", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")
      t("+ dedup") { cand.count() }
      val withVec = cand
        .join(broadcast(base.select(col("id").as("id_a"), col("v").as("va"),
          norm(col("v")).as("_na"))), Seq("id_a"))
        .join(broadcast(base.select(col("id").as("id_b"), col("v").as("vb"),
          norm(col("v")).as("_nb"))), Seq("id_b"))
        .withColumn("cos", dot(col("va"), col("vb")) / (col("_na") * col("_nb")))
        .filter(col("cos") >= 0.35)
      t("+ verify (broadcast)") { withVec.count() }
      t("full selfPairs single-probe") {
        graft.similarity.AnnLsh.selfPairs(e, "vec_id", "embedding", 64, 0.35,
          planes, 16, broadcastVectors = true).count()
      }
      t(s"full selfPairs probes=$probes") {
        graft.similarity.AnnLsh.selfPairs(e, "vec_id", "embedding", 64, 0.35,
          planes, 16, broadcastVectors = true, probes = probes).count()
      }
    }
    spark.stop()
  }
}
