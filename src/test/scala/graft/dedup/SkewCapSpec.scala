package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-skew fan-out caps, asserted IN-PLAN by counting candidate rows
  * — not trusted from docstrings. One boilerplate shingle/fingerprint at
  * ~60-100× the median document frequency (the license-header /
  * navigation-chrome class) must not turn the pair join quadratic. */
class SkewCapSpec extends SparkSpec {
  import spark.implicits._

  // 60 one-block docs sharing ONE hot 3-gram ("boil er plate", df=60);
  // every other shingle is doc-unique (df=1). Docs 100/101 are a real
  // near-dup pair whose overlap rides NON-hot shingles.
  private def corpus() = {
    val docs = (0 until 60).map { i =>
      (i.toLong, "b0", "boil er plate " + ('a' to 'h').map(c => s"u$i$c").mkString(" "))
    } ++ Seq(
      (100L, "b0", "boil er plate shared words here xx yy zz ww qq"),
      (101L, "b0", "boil er plate shared words here xx yy zz ww qr"))
    docs.toDF("doc_id", "block", "text")
  }

  private def sh(df: org.apache.spark.sql.DataFrame) =
    Dedup.shingleFrame(df, "doc_id", "text", "block", 3)

  test("jaccard: rare-first prefix order keeps a hot shingle out of candidates at t=0.5") {
    // sz=9 shingles/doc, prefixLen=5 < 8 uniques: the hot shingle (rank
    // last) never enters a prefix — candidate count is the 1 real pair,
    // not C(62,2)
    val c = Dedup.jaccardCandidates(sh(corpus()), threshold = 0.5, maxDocFreq = 0L)
    assert(c.count() == 1L)
  }

  test("jaccard: at a loose threshold the hot shingle explodes fan-out; maxDocFreq caps it in-plan") {
    val s = sh(corpus())
    // t=0.1: prefixLen = sz, the hot shingle joins all 62 docs pairwise
    val uncapped = Dedup.jaccardCandidates(s, threshold = 0.1, maxDocFreq = 0L).count()
    assert(uncapped == 62L * 61L / 2L, s"uncapped=$uncapped")
    // cap at 10 (hot df=62 >> cap): only the real pair's shingles survive
    val capped = Dedup.jaccardCandidates(s, threshold = 0.1, maxDocFreq = 10L).count()
    assert(capped == 1L, s"capped=$capped")
    // and the REAL near-dup pair still verifies identically under the cap
    val exact = Dedup.jaccardPairs(corpus(), "doc_id", "text", "block",
      n = 3, threshold = 0.5).collect().map(r => (r.getLong(0), r.getLong(1)))
    val cappedPairs = Dedup.jaccardPairs(corpus(), "doc_id", "text", "block",
      n = 3, threshold = 0.5, maxDocFreq = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.toSeq == Seq((100L, 101L)))
    assert(cappedPairs.toSeq == exact.toSeq)
  }

  test("containment: maxDocFreq zeroes the hot shingle's prefix frequency in-plan") {
    val s = sh(corpus())
    val uncapped = Dedup.containmentCandidates(s, threshold = 0.1, maxDocFreq = 0L).count()
    assert(uncapped == 62L * 61L / 2L, s"uncapped=$uncapped")
    val capped = Dedup.containmentCandidates(s, threshold = 0.1, maxDocFreq = 10L).count()
    assert(capped == 1L, s"capped=$capped")
    // the real pair still verifies under the cap at the strict threshold
    val got = Dedup.containmentPairs(corpus(), "doc_id", "text", "block",
      n = 3, threshold = 0.5, maxDocFreq = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((100L, 101L)))
  }

  test("winnow: maxDocFreq drops a 50-doc boilerplate fingerprint before the pair join") {
    // 50 identical docs: every fingerprint has df=50
    val text = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = (0 until 50).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val loose = graft.text.TextAnalysis.winnowPairs(docs, "doc_id", "text",
      k = 4, w = 4, minShared = 2, maxDocFreq = 100).count()
    assert(loose == 50L * 49L / 2L, s"loose=$loose")
    val capped = graft.text.TextAnalysis.winnowPairs(docs, "doc_id", "text",
      k = 4, w = 4, minShared = 2, maxDocFreq = 10).count()
    assert(capped == 0L, s"capped=$capped")
  }
}
