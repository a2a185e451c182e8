package graft.text

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals: duplicate words and dominant bigrams") {
    val df = Seq(
      (0L, "spam spam spam spam"),                  // one word, one bigram
      (1L, "all words here are fully distinct"),    // no repetition
      (2L, "go go stop go go stop"),                // mixed
      (3L, "solo")                                  // single token: no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df, "doc_id", "text")
      .as[(Long, Long, Long, Double, Long, Double)]
      .collect().map(r => r._1 -> r).toMap

    // doc 0: 4 tokens, 1 distinct; bigram "spam spam" fills all 3 slots
    assert(out(0L) == ((0L, 4L, 1L, 0.75, 3L, 1.0)))
    // doc 1: nothing repeats; every bigram count is 1 → frac 1/5
    assert(out(1L)._4 == 0.0 && out(1L)._5 == 1L && out(1L)._6 == 0.2)
    // doc 2: 6 tokens, 2 distinct; "go go" occurs twice in 5 slots
    assert(out(2L)._4 == math.BigDecimal(4.0 / 6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(2L)._5 == 2L && out(2L)._6 == 0.4)
    // doc 3: no bigram slots → zero count, zero fraction
    assert(out(3L) == ((3L, 1L, 1L, 0.0, 0L, 0.0)))
  }
}
