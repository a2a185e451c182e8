package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnIvfSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def unit(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    val v = Array.fill(dim)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  test("ivf selfPairs: exact precision, high recall on planted near-dups across magnitudes") {
    // 30 families × 4 members: same direction, tiny angular perturbation,
    // and a DIFFERENT MAGNITUDE per member (×0.5..×2) — the case where an
    // un-normalized L2 partition would split a cosine family across lists.
    val rows = for (fam <- 0 until 30; c <- 0 until 4) yield {
      val base = unit(fam + 1)
      val scale = 0.5f + 0.5f * c
      val d = base.zipWithIndex.map { case (x, i) =>
        (x + (if (i == c) 0.01f else 0.0f)) * scale
      }
      ((fam * 4 + c).toLong, d)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = AnnIvf.selfPairs(df, "vec_id", "embedding", minCos = 0.9,
        nLists = 16, assign = 2)
      .as[(Long, Long, Double)].collect()
    // precision is EXACT by construction (exact-cosine verify)
    assert(got.forall(p => p._3 >= 0.9 && p._1 < p._2))
    val truth = (for (f <- 0 until 30; a <- 0 until 4; b <- a + 1 until 4)
      yield (f * 4 + a.toLong, f * 4 + b.toLong)).toSet
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    assert(gotPairs.subsetOf(truth), "a cross-family pair passed the exact verify")
    // multi-assign (2 nearest lists) makes within-family recall near-total
    assert(gotPairs.size >= truth.size * 90 / 100,
      s"recall ${gotPairs.size}/${truth.size} below the design target")
  }

  test("routing gate: every testdata decade stays LSH; exhaustion fires past ~262k vectors") {
    // the current decades (506 .. ~200k vectors) derive planes <= 12,
    // where the capped-table law still beats the IVF tier's measured
    // recall — the registered face keeps the LSH generator bitwise
    for (n <- Seq(506L, 2021L, 20207L, 200000L)) {
      val p = AnnLsh.adaptivePlanes(n)
      assert(!AnnLsh.tablesExhausted(p), s"gate fired early at n=$n (planes=$p)")
    }
    // the fitted compounding law: tables 24 at planes 9 (the shipped sf1
    // geometry, bitwise), 40 at 10, 64 at 11 — demand is exponential
    assert(AnnLsh.adaptiveTables(9) == 24 && AnnLsh.adaptiveTables(8) == 16)
    assert(AnnLsh.adaptiveTables(10) == 40 && AnnLsh.adaptiveTables(11) == 64)
    assert(AnnLsh.tablesNeeded(12) > 64)
    // past exhaustion (planes >= 13 <=> n > 64·2^12 ~ 262k: capped-64
    // predicted recall falls below the IVF tier's measured 0.58) the
    // gate fires and the face routes to the IVF tier
    for (n <- Seq(500000L, 2000000L, 20000000L, 1000000000L)) {
      val p = AnnLsh.adaptivePlanes(n)
      assert(AnnLsh.tablesExhausted(p), s"gate silent at n=$n (planes=$p)")
    }
    // derived list counts: flat occupancy until the cap, then capped
    assert(AnnIvf.ivfLists(2048L, 256L) == 8)
    assert(AnnIvf.ivfLists(2000000L, 256L) == 7813)
    assert(AnnIvf.ivfLists(100000000L, 256L) == AnnIvf.maxLists)
  }

  test("overall-recall preset: doubled cells at the same assign, cap reached later") {
    // the semantic-tier knob (AnnIvf.overallRecallListSize = 512): half
    // the lists of the dedup default at the same corpus — bigger cells,
    // 2× candidate volume, the IvfSweep-measured overall-recall point
    // (GEOMETRY_RECALL ivf_overall_* rows floor it per decade)
    assert(AnnIvf.overallRecallListSize == 2L * 256L)
    val n = 2000000L
    val dedup = AnnIvf.ivfLists(n)
    val overall = AnnIvf.ivfLists(n, AnnIvf.overallRecallListSize)
    assert(overall == (dedup + 1) / 2, s"preset lists $overall vs dedup $dedup")
    // assign dial unchanged at production shape
    assert(AnnIvf.ivfAssign(overall) == AnnIvf.ivfAssign(dedup))
    // the cap binds at 2x the corpus size the default hits it
    assert(AnnIvf.ivfLists(2L * 256L * AnnIvf.maxLists,
      AnnIvf.overallRecallListSize) == AnnIvf.maxLists)

    // recall contract on planted families: the preset (bigger cells) must
    // find at least the pairs the default finds on an easy planted corpus
    import spark.implicits._
    val rows = for (fam <- 0 until 30; c <- 0 until 4) yield {
      val base = unit(fam + 1)
      val d = base.zipWithIndex.map { case (x, i) =>
        x + (if (i == c) 0.01f else 0.0f) }
      ((fam * 4 + c).toLong, d)
    }
    val df = rows.toDF("vec_id", "embedding")
    val truth = (for (f <- 0 until 30; a <- 0 until 4; b <- a + 1 until 4)
      yield (f * 4 + a.toLong, f * 4 + b.toLong)).toSet
    val preset = AnnIvf.selfPairs(df, "vec_id", "embedding", minCos = 0.9,
        nLists = 8, assign = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(preset.subsetOf(truth), "exact verify must hold under the preset")
    assert(preset.size >= truth.size * 90 / 100,
      s"preset recall ${preset.size}/${truth.size} below the design target")
  }

  test("embed_cluster_ivf face matches the brute-force cluster refinement contract") {
    val sf = "/root/testdata/sf0.001"
    val ivf = graft.queries.Q.embedClusterIvf(spark, sf)
      .as[(Long, Long)].collect().toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    assert(ivf.size == vecs.length, "every vector must be labeled")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    // REFINEMENT contract (the embed_cluster_lsh invariant): the IVF tier
    // emits only exact-verified pairs, so its clusters never merge two
    // brute-force components — every IVF cluster sits inside one true
    // cos>=0.35 component
    val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); parent(x) = r; r }
    for (i <- vecs.indices; j <- i + 1 until vecs.length
         if cos(vecs(i)._2, vecs(j)._2) >= 0.35) {
      val (ra, rb) = (find(vecs(i)._1), find(vecs(j)._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val trueComp = vecs.map(v => v._1 -> find(v._1)).toMap
    val byIvfCluster = ivf.groupBy(_._2).values
    for (members <- byIvfCluster) {
      val comps = members.keys.map(trueComp).toSet
      assert(comps.size == 1,
        s"IVF cluster merged ${comps.size} true components: $members")
    }
  }
}
