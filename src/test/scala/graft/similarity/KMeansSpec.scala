package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** Two well-separated families, ids INTERLEAVED so the lowest-id seeds
    * (0, 1) land one per family — clean Lloyd separation is guaranteed. */
  private def corpus = {
    (0 until 40).map { i =>
      val fam = i % 2
      val base = if (fam == 0) Array.fill(dim)(5.0f) else Array.fill(dim)(-5.0f)
      val v = base.zipWithIndex.map { case (b, d) => b + 0.01f * ((i * 3 + d) % 7) }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("separable families land in separate clusters, everyone assigned") {
    val out = KMeans.assign(corpus, "vec_id", "embedding", k = 2, iters = 3)
      .as[(Long, Int)].collect().toMap
    assert(out.size == 40)
    val fams = out.groupBy { case (id, _) => id % 2 }.map { case (f, m) => f -> m.values.toSet }
    assert(fams(0L).size == 1 && fams(1L).size == 1, s"families split: $fams")
    assert(fams(0L) != fams(1L), "families merged into one cluster")
  }

  test("assignment is deterministic and partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
      KMeans.assign(df, "vec_id", "embedding", k = 3, iters = 2)
        .orderBy("vec_id").as[(Long, Int)].collect().toSeq
    assert(run(corpus) == run(corpus.repartition(7)))
  }

  test("fewer rows than k fails with an actionable message") {
    val tiny = corpus.limit(2)
    val e = intercept[IllegalArgumentException] {
      KMeans.assign(tiny, "vec_id", "embedding", k = 5, iters = 1)
    }
    assert(e.getMessage.contains("k=5"))
  }

  test("ann_recall face: per-query recall in [0,1] for every registered query") {
    val out = graft.queries.Q.annRecall(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, hits, r) =>
      assert(hits >= 0L && hits <= 5L)
      assert(r >= 0.0 && r <= 1.0 && r == hits / 5.0)
    }
    // the wide-recall LSH config should find most true neighbors even on
    // the low-cosine synthetic corpus
    val mean = out.map(_._3).sum / out.length
    assert(mean > 0.5, s"mean recall@5 $mean suspiciously low")
  }

  test("embed_kmeans face: k clusters over testdata, deterministic") {
    val a = graft.queries.Q.embedKmeans(spark, "/root/testdata/sf0.001")
      .orderBy("vec_id").as[(Long, Int)].collect().toSeq
    assert(a.nonEmpty && a.map(_._2).distinct.forall(c => c >= 0 && c < 8))
    val b = graft.queries.Q.embedKmeans(spark, "/root/testdata/sf0.001")
      .orderBy("vec_id").as[(Long, Int)].collect().toSeq
    assert(a == b)
  }
}
