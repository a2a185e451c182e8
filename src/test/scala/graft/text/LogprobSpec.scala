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
    // the face quantizes to the 6dp cross-engine-exact grid
    // (floor(x·10⁶+0.5)/10⁶ — absorbs the measured 1-ulp libm gap)
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(0L)._2 == 2L)
    assert(out(0L)._3 == r6(0.0 + 2.0 * lpA))
    assert(out(1L)._3 == r6((0.0 + lpA) + lpB)) // fold order: term-sorted, a then b
    assert(out(1L)._4 == r6(((0.0 + lpA) + lpB) / 2.0))
  }

  test("longer repetitive docs score higher avg_logprob than rare-token docs") {
    val df = Seq(
      (0L, "x x x x x x x x x x"),
      (1L, "q w e r t y u i o p")).toDF("doc_id", "text")
    val out = TextAnalysis.withLogprob(df, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(out(0L) > out(1L))
  }

  test("bigram LM matches the hand-computed conditional model") {
    // corpus bigrams: "a b" ×2, "b a" ×1, "a c" ×1 → contexts: a→3, b→1
    // doc 0 = "a b a c": bigrams a b, b a, a c
    val df = Seq((0L, "a b a c"), (1L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.withBigramLogprob(df, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val pAB = math.log(2.0 / 3.0); val pBA = math.log(1.0 / 1.0)
    val pAC = math.log(1.0 / 3.0)
    assert(out(0L)._2 == 3L)
    // fold order is bigram-sorted: "a b", "a c", "b a"
    val expect0 = BigDecimal(((0.0 + pAB) + pAC) + pBA)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L)._3 == expect0)
    assert(out(1L)._2 == 1L)
  }

  test("word salad with common unigrams but rare transitions scores low on bigrams only") {
    // ten fluent docs share the SAME transition pattern; the salad doc uses
    // the same words but in an order whose bigrams appear nowhere else
    val fluent = (0L until 10L).map(i => (i, "the cat sat on the mat"))
    val salad = Seq((99L, "the the cat mat sat on"))
    val df = (fluent ++ salad).toDF("doc_id", "text")
    val uni = TextAnalysis.withLogprob(df, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    val bi = TextAnalysis.withBigramLogprob(df, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    // unigram model can barely separate them (same word multiset up to one
    // repeat); the bigram model must put the salad far below the fluent docs
    assert(bi(99L) < bi(0L) - 0.5, s"bigram: salad ${bi(99L)} vs fluent ${bi(0L)}")
    assert(math.abs(uni(99L) - uni(0L)) < math.abs(bi(99L) - bi(0L)),
      "bigram separation must exceed unigram separation")
  }
}
