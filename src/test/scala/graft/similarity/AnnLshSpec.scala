package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AnnLshSpec extends SparkSpec {

  private def vectors = {
    import spark.implicits._
    // two tight clusters + noise, deterministic
    val dim = 8
    (0 until 40).map { i =>
      val base = if (i % 2 == 0) Array.fill(dim)(1.0f) else Array.fill(dim)(-1.0f)
      val v = base.zipWithIndex.map { case (b, d) => b + 0.01f * ((i * 7 + d * 3) % 5) }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("brute top-k returns k neighbors per query, ranked by cosine") {
    val q = vectors.filter(col("vec_id") < 2)
    val out = AnnLsh.bruteTopK(vectors, q, "vec_id", "embedding", k = 3)
    val by = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(by.keySet == Set(0L, 1L))
    by.values.foreach { rows =>
      assert(rows.length == 3)
      val sims = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("hoisted-norm cosine is BITWISE equal to the fused cosine expression") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    // pins the norm-precompute claim: dot/(norm(a)*norm(b)) evaluated once
    // per vector below the join must produce the exact same doubles as the
    // pair-level fused cosine — same factors, same order
    val q = vectors.filter(col("vec_id") < 3)
    val viaOperator = AnnLsh.bruteTopK(vectors, q, "vec_id", "embedding", k = 7)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val a = vectors.select(col("vec_id").as("query_id"),
      VectorFunctions.toDouble(col("embedding")).as("qv"))
      .filter(col("query_id") < 3)
    val b = vectors.select(col("vec_id").as("neighbor_id"),
      VectorFunctions.toDouble(col("embedding")).as("v"))
    val fused = a.join(b, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosine(col("qv"), col("v")).as("cos_fused"))
    val joined = viaOperator.join(fused, Seq("query_id", "neighbor_id")).collect()
    assert(joined.length == 21) // 3 queries x k=7
    joined.foreach { r =>
      val (hoisted, ref) = (r.getAs[Double]("cos"), r.getAs[Double]("cos_fused"))
      assert(java.lang.Double.doubleToRawLongBits(hoisted) ==
        java.lang.Double.doubleToRawLongBits(ref),
        s"bitwise drift at (${r.getLong(0)}, ${r.getLong(1)}): $hoisted vs $ref")
    }
  }

  test("brute top-k finds same-cluster neighbors (cosine ≈ 1)") {
    val q = vectors.filter(col("vec_id") === 0)
    val out = AnnLsh.bruteTopK(vectors, q, "vec_id", "embedding", k = 5).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") % 2 == 0) // same cluster
      assert(r.getAs[Double]("cos") > 0.99)
    }
  }

  test("lsh top-k recovers the brute-force neighbors on separable clusters") {
    val q = vectors.filter(col("vec_id") < 2)
    val brute = AnnLsh.bruteTopK(vectors, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = AnnLsh.lshTopK(vectors, q, "vec_id", "embedding", dim = 8, k = 3,
      planes = 6, tables = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    // with well-separated clusters LSH recall should be total
    assert(lsh == brute)
  }

  test("ivf top-k with per-cluster lists recovers brute-force neighbors") {
    import spark.implicits._
    // reuse the two-cluster vectors; list = parity (the true cluster id)
    val withList = vectors.withColumn("list", (col("vec_id") % 2).cast("int"))
    val q = withList.filter(col("vec_id") < 2)
    val brute = AnnLsh.bruteTopK(withList, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = AnnLsh.ivfTopK(withList, q, "vec_id", "embedding", "list", k = 3, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    // probing only the nearest list suffices: neighbors live in the query's own cluster
    assert(ivf == brute)
  }

  test("graft_vec_avg centroid equals the element-wise mean") {
    import spark.implicits._
    val df = Seq((0, Seq(1.0, 2.0)), (0, Seq(3.0, 6.0)), (1, Seq(10.0, 10.0)))
      .toDF("list", "v")
    val got = df.groupBy("list").agg(call_function("graft_vec_avg", col("v")).as("c"))
      .orderBy("list").collect().map(_.getSeq[Double](1).toSeq)
    assert(got.toSeq == Seq(Seq(2.0, 4.0), Seq(10.0, 10.0)))
  }

  test("graft_vec_avg fails loudly on mixed dimensions instead of truncating") {
    import spark.implicits._
    // a silently truncated centroid would depend on which partition saw
    // which row first — the partitioning-dependent corruption class
    val df = Seq((0, Seq(1.0, 2.0)), (0, Seq(3.0))).toDF("list", "v")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      // collect(), not count(): count() prunes the unused agg column and
      // the guard would never evaluate
      df.groupBy("list").agg(call_function("graft_vec_avg", col("v")).as("c")).collect()
    }
    assert(msgs(e).exists(_.contains("mixed vector dimensions")), msgs(e).mkString(" | "))
  }

  test("blockedSelfPairs matches the unguarded blocked join below the bound") {
    import spark.implicits._
    val withBlocks = vectors.withColumn("label", (col("vec_id") % 2).cast("int"))
    val got = AnnLsh.blockedSelfPairs(withBlocks, "vec_id", "embedding", "label",
        minCos = 0.35, maxBlockRows = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // reference: plain label-blocked all-pairs
    val e = withBlocks.select(col("label"), col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("v"))
    val expect = e.as("a").join(e.as("b"), col("a.label") === col("b.label"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .filter(graft.functions.VectorFunctions.cosine(col("a.v"), col("b.v")) > 0.35)
      .select(col("a.vec_id"), col("b.vec_id")).as[(Long, Long)].collect().toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("blockedSelfPairs guard trips at execution on an oversized block") {
    val withBlocks = vectors.withColumn("label", lit(0)) // one 40-row block
    val guarded = AnnLsh.blockedSelfPairs(withBlocks, "vec_id", "embedding", "label",
      minCos = 0.35, maxBlockRows = 10)
    val e = intercept[Exception] { guarded.count() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("maxBlockRows") && m.contains("selfPairs")))
  }

  test("graft_lsh_probes: element 0 is bitwise graft_lsh_sigs; probes flip one bit each") {
    val v = graft.functions.VectorFunctions.toDouble(col("embedding"))
    val rows = vectors.select(
        AnnLsh.signatures(v, 8, 6, 4).as("sigs"),
        AnnLsh.probedSignatures(v, 8, 6, 4, probes = 3).as("probed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sigs = r.getSeq[Long](0)
      val probed = r.getSeq[scala.collection.Seq[Long]](1)
      assert(probed.length == 4 && probed.forall(_.length == 4))
      probed.zip(sigs).foreach { case (buckets, sig) =>
        assert(buckets.head == sig) // primary bitwise-identical
        // each probe flips exactly one DISTINCT bit of the primary
        val flipped = buckets.tail.map(b => b ^ sig)
        assert(flipped.forall(f => java.lang.Long.bitCount(f) == 1))
        assert(flipped.distinct.length == flipped.length)
      }
    }
  }

  test("lsh signing fails loudly on a vector that does not match dim") {
    import spark.implicits._
    val bad = Seq((0L, Seq(1.0f, 2.0f, 3.0f)), (1L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val v = graft.functions.VectorFunctions.toDouble(col("embedding"))
    val e1 = intercept[Exception] {
      bad.select(AnnLsh.signatures(v, 3, 4, 2)).collect()
    }
    assert(msgs(e1).exists(_.contains("expected dim=3")), msgs(e1).mkString(" | "))
    val e2 = intercept[Exception] {
      bad.select(AnnLsh.probedSignatures(v, 3, 4, 2, probes = 2)).collect()
    }
    assert(msgs(e2).exists(_.contains("expected dim=3")), msgs(e2).mkString(" | "))
  }

  test("multi-probe selfPairs: exact precision, recall >= single-probe on near-dups") {
    import spark.implicits._
    // same family construction as SelfPairsSpec but a DELIBERATELY
    // recall-starved geometry (10 planes x 2 tables) so probing has
    // something to recover
    val dim = 16
    def unit(seed: Int): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      val arr = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(arr.map(x => x * x).sum)
      arr.map(x => (x / n).toFloat)
    }
    val rows = for (fam <- 0 until 12; c <- 0 until 4) yield {
      val base = unit(fam + 1)
      val d = base.zipWithIndex.map { case (x, i) =>
        x + 0.05f * (((fam * 4 + c) * 31 + i * 7) % 5 - 2)
      }
      ((fam * 4 + c).toLong, d)
    }
    val df = rows.toDF("vec_id", "embedding")
    def pairsAt(probes: Int) =
      AnnLsh.selfPairs(df, "vec_id", "embedding", dim, minCos = 0.9,
          planes = 10, tables = 2, probes = probes)
        .as[(Long, Long, Double)].collect()
    val single = pairsAt(0)
    val probed = pairsAt(6)
    // precision stays exact: every emitted pair is cosine-verified
    assert(probed.forall(_._3 >= 0.9))
    // canonical ordering and no duplicate pairs despite the asymmetric join
    val probedPairs = probed.map(p => (p._1, p._2))
    assert(probedPairs.forall(p => p._1 < p._2))
    assert(probedPairs.distinct.length == probedPairs.length)
    // probing only ADDS candidates: strict superset-or-equal of single-probe
    assert(single.map(p => (p._1, p._2)).toSet.subsetOf(probedPairs.toSet))
    // and at this starved geometry it genuinely recovers pairs
    assert(probedPairs.length > single.length,
      s"probed=${probedPairs.length} single=${single.length}")
  }

  test("lsh signature is deterministic across invocations") {
    val s1 = vectors.select(AnnLsh.signature(
      graft.functions.VectorFunctions.toDouble(col("embedding")), 8, 6, 0)).collect()
    val s2 = vectors.select(AnnLsh.signature(
      graft.functions.VectorFunctions.toDouble(col("embedding")), 8, 6, 0)).collect()
    assert(s1.toSeq == s2.toSeq)
  }
}
