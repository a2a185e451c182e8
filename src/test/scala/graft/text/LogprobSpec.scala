package graft.text

import graft.SparkSpec

class LogprobSpec extends SparkSpec {
  import spark.implicits._

  test("logprob matches the hand-computed unigram model") {
    // corpus: a a a b  → p(a)=3/4, p(b)=1/4
    val df = Seq((0L, "a a"), (1L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.withLogprob(df, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val lpA = math.log(3.0 / 4.0); val lpB = math.log(1.0 / 4.0)
    assert(out(0L)._2 == 2L)
    assert(out(0L)._3 == 0.0 + 2.0 * lpA)
    assert(out(1L)._3 == (0.0 + lpA) + lpB)   // fold order: term-sorted, a then b
    assert(out(1L)._4 == out(1L)._3 / 2.0)
  }

  test("longer repetitive docs score higher avg_logprob than rare-token docs") {
    val df = Seq(
      (0L, "x x x x x x x x x x"),
      (1L, "q w e r t y u i o p")).toDF("doc_id", "text")
    val out = TextAnalysis.withLogprob(df, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(out(0L) > out(1L))
  }
}
