package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    Seq(
      (1L, base, "s1"),
      (2L, base, "s1"), // exact dup of 1
      (3L, base.replace("today", "tomorrow"), "s1"), // near dup of 1
      (4L, "completely different text about spark query engines and shuffles maybe", "s1"),
      (5L, "another unrelated document with its own words entirely separate here now", "s2")
    ).toDF("doc_id", "text", "source")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val g = Dedup.exact(docs, "doc_id", "text")
    assert(g.count() == 4)
    val dup = g.filter(col("n_copies") === 2).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("keep_id") == 1L)
  }

  test("jaccard pairs find exact and near duplicates, not unrelated docs") {
    val p = Dedup.jaccardPairs(docs, "doc_id", "text", "source", n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((1L, 2L)))
    assert(p.contains((1L, 3L)) && p.contains((2L, 3L)))
    assert(!p.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("minhash finds the same near-dups as exact jaccard at its threshold") {
    val got = MinHash.pairs(docs, "doc_id", "text", n = 3, k = 32, bands = 16, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact duplicate pair must always collide in every band
    assert(got.contains((1L, 2L)))
    // verified jaccard filter keeps it a subset of the exact pairs
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", "source", n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact + ((4L, 5L))))
  }

  test("simhash: identical docs at hamming 0, unrelated docs far apart") {
    val p = SimHash.pairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((1L, 2L)))
    assert(!p.contains((4L, 5L)))
  }

  test("simhash fingerprint is deterministic") {
    import spark.implicits._
    val fp1 = docs.select(SimHash.simhash64(split(col("text"), " "), 42L)).collect()
    val fp2 = docs.select(SimHash.simhash64(split(col("text"), " "), 42L)).collect()
    assert(fp1.toSeq == fp2.toSeq)
  }
}
