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
