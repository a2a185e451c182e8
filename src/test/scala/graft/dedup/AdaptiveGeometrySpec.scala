package graft.dedup

import graft.SparkSpec
import graft.similarity.AnnLsh
import org.apache.spark.sql.functions._

/** Corpus-adaptive LSH geometry: the bucket-count knobs derive from
  * corpus cardinality instead of living as fixed face constants — the
  * one-extra-plane-per-doubling / one-hamming-step-per-width law of
  * docs/SCALE_BOUNDS.md, made executable. These specs pin (a) the derived
  * values across the decades the scaling bench measures, (b) that tiny
  * corpora keep the legacy geometry bitwise, and (c) that a reduced
  * hamming budget is a CLEAN TRUNCATION of the wider result set — exact
  * below the derived budget, absent above it — never a lossy
  * approximation within it. */
class AdaptiveGeometrySpec extends SparkSpec {
  import spark.implicits._

  test("adaptiveMaxHamming follows the occupancy law across decades") {
    // ≤ targetOccupancy·2^8 rows fit 8-bit chunks: the legacy budget holds
    assert(SimHash.adaptiveMaxHamming(1L) == 7)
    assert(SimHash.adaptiveMaxHamming(500L) == 7)     // sf0.001/sf0.01
    assert(SimHash.adaptiveMaxHamming(5000L) == 7)    // sf0.1
    assert(SimHash.adaptiveMaxHamming(50000L) == 4)   // sf1: 12-bit chunks
    assert(SimHash.adaptiveMaxHamming(1000000L) == 3) // 16-bit chunks
    assert(SimHash.adaptiveMaxHamming(1000000000L) == 1) // 32-bit chunks
    // monotone: more corpus never widens the budget
    val hs = Seq(1L, 100L, 10000L, 1000000L, 100000000L, Long.MaxValue / 2)
      .map(SimHash.adaptiveMaxHamming(_))
    assert(hs == hs.sorted.reverse, s"budget not monotone: $hs")
    // the derived geometry always yields >= n / targetOccupancy buckets
    for (n <- Seq(1000L, 100000L, 10000000L)) {
      val h = SimHash.adaptiveMaxHamming(n)
      val buckets = math.pow(2.0, 64 / (h + 1))
      assert(buckets >= n / 32.0, s"n=$n h=$h buckets=$buckets")
    }
  }

  test("adaptivePlanes adds one plane per corpus doubling, floored and capped") {
    assert(AnnLsh.adaptivePlanes(500L) == 4)    // sf0.001/sf0.01: legacy 4
    assert(AnnLsh.adaptivePlanes(2000L) == 5)   // sf0.1
    assert(AnnLsh.adaptivePlanes(20000L) == 9)  // sf1
    assert(AnnLsh.adaptivePlanes(40000L) == 10) // one doubling, one plane
    assert(AnnLsh.adaptivePlanes(Long.MaxValue / 2) == 24) // capped
    // buckets-per-table keeps pace with corpus rows up to the cap
    for (n <- Seq(10000L, 1000000L, 100000000L)) {
      val p = AnnLsh.adaptivePlanes(n)
      assert(p == 24 || math.pow(2.0, p) >= n / 64.0, s"n=$n planes=$p")
    }
  }

  test("adaptiveBlocks widens the combination key one step per ~2^7 growth") {
    assert(SimHash.adaptiveBlocks(500L) == 1)     // legacy 8-bit chunks
    assert(SimHash.adaptiveBlocks(5000L) == 1)    // sf0.1 still d=1
    assert(SimHash.adaptiveBlocks(50000L) == 2)   // sf1: C(9,2) 14-bit keys
    assert(SimHash.adaptiveBlocks(1000000L) == 3) // C(10,3) 18-bit keys
    assert(SimHash.adaptiveBlocks(1000000000L) == 3) // saturates at maxD
    // the derived geometry yields >= n / targetOccupancy buckets while
    // it has headroom (pre-saturation)
    for (n <- Seq(1000L, 50000L, 1000000L)) {
      val d = SimHash.adaptiveBlocks(n)
      val buckets = math.pow(2.0, d * (64 / (7 + d)))
      assert(buckets >= n / 32.0, s"n=$n d=$d buckets=$buckets")
    }
  }

  test("block-combination pigeonhole is exact at every d (same pairs as d=1)") {
    // planted fingerprints at controlled distances (see truncation test)
    val base = 0x0123456789ABCDEFL
    val fps = (0 to 9).map(d => (d.toLong, base ^ ((1L << d) - 1)))
      .toDF("id", "fp")
    def at(d: Int): Set[(Long, Long, Long)] =
      SimHash.pairsFromFingerprintsBlocked(fps, "id", "fp", maxHamming = 7, d)
        .as[(Long, Long, Long)].collect().toSet
    val d1 = at(1)
    assert(d1.nonEmpty)
    assert(at(2) == d1)
    assert(at(3) == d1)
    // and on a real corpus through the text face
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val p1 = SimHash.pairs(docs, "doc_id", "text", maxHamming = 7, d = 1)
      .as[(Long, Long, Long)].collect().toSet
    val p2 = SimHash.pairs(docs, "doc_id", "text", maxHamming = 7, d = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(p1 == p2 && p1.nonEmpty)
  }

  test("reduced hamming budget is a clean truncation of the wider result") {
    // planted 64-bit fingerprints at controlled distances from a base:
    // flip exactly d low bits for d in 0..9
    val base = 0x0123456789ABCDEFL
    val fps = (0 to 9).map { d =>
      (d.toLong, base ^ ((1L << d) - 1)) // flips d bits
    }.toDF("id", "fp")
    def hamPairs(h: Int): Set[(Long, Long, Long)] =
      SimHash.pairsFromFingerprints(fps, "id", "fp", h)
        .as[(Long, Long, Long)].collect().toSet
    val wide = hamPairs(7)
    val narrow = hamPairs(4)
    // exactness at both widths: every reported hamming is the true popcount
    for ((a, b, h) <- wide) {
      val fa = base ^ ((1L << a) - 1); val fb = base ^ ((1L << b) - 1)
      assert(h == java.lang.Long.bitCount(fa ^ fb))
    }
    // truncation: narrow = wide filtered to its budget, nothing else
    assert(narrow == wide.filter(_._3 <= 4))
    assert(narrow.nonEmpty && narrow.size < wide.size)
  }

  test("blockedSaturated routes: false at every test decade, true past ~8M docs") {
    for (n <- Seq(60L, 600L, 5000L, 50000L, 1000000L, 8000000L))
      assert(!SimHash.blockedSaturated(n), s"n=$n must stay on the exact pigeonhole")
    // occ·2^(3·(64/10)) = 32·2^18 ≈ 8.4M is the h=7 boundary
    for (n <- Seq(9000000L, 100000000L, 10000000000L))
      assert(SimHash.blockedSaturated(n), s"n=$n must route to permuted tables")
    // the phash face (h=8, d·bitsPer tops at 3·5=15 bits): ~1M boundary
    assert(!SimHash.blockedSaturated(1000000L, maxHamming = 8))
    assert(SimHash.blockedSaturated(1100000L, maxHamming = 8))
  }

  test("permutedGeometry holds occupancy AND recall, narrowing the mask last") {
    // pre-saturation widths match the occupancy law exactly
    val (w8m, t8m) = SimHash.permutedGeometry(9000000L)
    assert(w8m == math.ceil(math.log(9000000.0 / 32) / math.log(2)).toInt)
    // table count is the compounding law: (1-p)^t <= 1-R < (1-p)^(t-1)
    val p = SimHash.maskCollisionP(w8m, 7)
    assert(math.pow(1 - p, t8m) <= 0.1 + 1e-12, s"w=$w8m t=$t8m p=$p")
    assert(math.pow(1 - p, t8m - 1) > 0.1, s"t=$t8m not minimal")
    // 1B docs: still affordable — the occupancy-flat width would be 25
    // but t(25)=66 > 64, so the mask narrows 2 bits (4× occupancy) to
    // keep the table budget: the recall-first trade, visibly
    val (w1b, t1b) = SimHash.permutedGeometry(1000000000L)
    assert(w1b == 23 && t1b <= 64, s"1B: w=$w1b t=$t1b")
    assert(math.pow(1 - SimHash.maskCollisionP(w1b, 7), t1b) <= 0.1 + 1e-12)
    // recall-first: an absurd corpus narrows the mask instead of silently
    // undershooting the recall target
    val (wHuge, tHuge) = SimHash.permutedGeometry(Long.MaxValue / 4, maxTables = 64)
    assert(tHuge <= 64)
    assert(math.pow(1 - SimHash.maskCollisionP(wHuge, 7), tHuge) <= 0.1 + 1e-12)
    // mask never exceeds 64-h (p=0 there: no recall possible)
    assert(wHuge <= 57)
  }

  test("permutedMasks are deterministic w-bit subsets") {
    val m1 = SimHash.permutedMasks(16, 24)
    val m2 = SimHash.permutedMasks(16, 24)
    assert(m1.toSeq == m2.toSeq, "masks must be run-deterministic")
    assert(m1.forall(m => java.lang.Long.bitCount(m) == 16))
    assert(m1.distinct.length == m1.length, "duplicate masks waste tables")
    assert(SimHash.permutedMasks(16, 24, seed = 7L).toSeq != m1.toSeq)
  }

  test("permutedMasks rejects duplicates; geometry never exceeds the table budget silently") {
    // narrow masks WILL draw duplicates — the rejection loop must still
    // deliver the full count of DISTINCT masks (the recall law compounds
    // over effective tables, so a silent duplicate under-delivers recall)
    val narrow = SimHash.permutedMasks(2, 500)
    assert(narrow.length == 500 && narrow.distinct.length == 500,
      "duplicate masks silently shrink the effective table count")
    assert(narrow.forall(m => java.lang.Long.bitCount(m) == 2))
    // more distinct masks than exist → loud require, not an infinite loop
    assert(SimHash.distinctMaskCapacity(1) == 64L)
    assert(SimHash.distinctMaskCapacity(2) == 2016L)
    intercept[IllegalArgumentException] { SimHash.permutedMasks(1, 65) }
    // a geometry that can't reach the recall target within maxTables even
    // at w=1 fails loudly — the budget is never silently exceeded
    intercept[IllegalArgumentException] {
      SimHash.permutedGeometry(1000000L, maxHamming = 56,
        targetRecall = 0.9999, maxTables = 16)
    }
    // and every geometry it DOES return fits both the budget and the
    // distinct-mask capacity of its width
    for (n <- Seq(10000000L, 100000000L, 1000000000L)) {
      val (w, t) = SimHash.permutedGeometry(n)
      assert(t <= 64 && t <= SimHash.distinctMaskCapacity(w))
      assert(SimHash.permutedMasks(w, t).distinct.length == t)
    }
  }

  test("permuted tier: exact precision, measured recall >= design target") {
    // planted corpus: 1500 random base fingerprints, each with a partner
    // at hamming distance cycling 1..7 (random bit choices), plus one
    // verbatim copy every 100 — all deterministic
    val rnd = new java.util.Random(0xD00DL)
    val rows = (0 until 1500).flatMap { i =>
      val fp = rnd.nextLong()
      val h = 1 + (i % 7)
      var partner = fp
      val flipped = scala.collection.mutable.Set[Int]()
      while (flipped.size < h) flipped += rnd.nextInt(64)
      flipped.foreach(b => partner ^= 1L << b)
      val copy = if (i % 100 == 0) Seq((i * 10L + 2, fp)) else Seq.empty
      Seq((i * 10L, fp), (i * 10L + 1, partner)) ++ copy
    }
    val fps = rows.toDF("id", "fp")
    // ground truth: the exact pigeonhole (recall 1.0 by construction)
    val exact = SimHash.pairsFromFingerprints(fps, "id", "fp", maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(exact.size >= 1500, s"planted corpus lost pairs: ${exact.size}")
    // the saturated-regime tier at its own derived geometry (occupancy 1
    // forces a production-shaped 12-bit mask on this 3k corpus)
    val (w, t) = SimHash.permutedGeometry(rows.size.toLong, maxHamming = 7,
      targetOccupancy = 1L, targetRecall = 0.9)
    val found = SimHash.pairsFromFingerprintsPermuted(fps, "id", "fp",
        maxHamming = 7, maskBits = w, tables = t)
      .as[(Long, Long, Long)].collect().toSet
    // PRECISION IS EXACT: the hamming filter verifies every candidate
    assert(found.subsetOf(exact), "permuted tier emitted an out-of-radius pair")
    // hamming-0 groups are structural (within-group expansion), never lost
    val zeros = exact.filter(_._3 == 0L)
    assert(zeros.nonEmpty && zeros.subsetOf(found), "identical-fp pairs missed")
    // measured recall >= the 0.9 design target minus sampling slack —
    // worst-case pairs (h=7) collide at >= p per table by construction and
    // closer pairs strictly more often (1500 pairs => tight concentration)
    val recall = found.size.toDouble / exact.size
    assert(recall >= 0.85, s"permuted recall $recall below design (w=$w t=$t)")
    // the mm_phash radius (h=8): same law, wider radius — the geometry
    // derives more tables to hold the same target, and the measured
    // recall holds. This is the phash face's saturated-regime plan.
    val exact8 = SimHash.pairsFromFingerprints(fps, "id", "fp", maxHamming = 8)
      .as[(Long, Long, Long)].collect().toSet
    val (w8, t8) = SimHash.permutedGeometry(rows.size.toLong, maxHamming = 8,
      targetOccupancy = 1L, targetRecall = 0.9)
    assert(t8 >= t, s"h=8 must need >= as many tables as h=7 (got $t8 < $t)")
    val found8 = SimHash.pairsFromFingerprintsPermuted(fps, "id", "fp",
        maxHamming = 8, maskBits = w8, tables = t8)
      .as[(Long, Long, Long)].collect().toSet
    assert(found8.subsetOf(exact8))
    val recall8 = found8.size.toDouble / exact8.size
    assert(recall8 >= 0.85, s"h=8 permuted recall $recall8 (w=$w8 t=$t8)")
  }

  test("pairsFromFingerprintsAdaptive routes by regime, bitwise below it") {
    val base = 0x0123456789ABCDEFL
    val fps = (0 to 9).map(d => (d.toLong, base ^ ((1L << d) - 1)))
      .toDF("id", "fp")
    val exact = SimHash.pairsFromFingerprintsBlocked(fps, "id", "fp", 7, d = 1)
      .as[(Long, Long, Long)].collect().toSet
    // below saturation: the adaptive face IS the exact pigeonhole
    val routedExact = SimHash.pairsFromFingerprintsAdaptive(fps, "id", "fp",
        maxHamming = 7, n = 50000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(routedExact == exact)
    // above saturation: the permuted tier (still a subset — exact precision)
    val routedPermuted = SimHash.pairsFromFingerprintsAdaptive(fps, "id", "fp",
        maxHamming = 7, n = 10000000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(routedPermuted.subsetOf(exact))
  }

  test("small corpora keep the legacy geometry bitwise (faces unchanged)") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val n = docs.count()
    assert(SimHash.adaptiveMaxHamming(n) == 7)
    val adaptive = graft.queries.Q.dedupSimhash(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSet
    val legacy = SimHash.pairs(docs, "doc_id", "text", maxHamming = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(adaptive == legacy)
    val e = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    assert(AnnLsh.adaptivePlanes(e.count()) == 4)
  }
}
