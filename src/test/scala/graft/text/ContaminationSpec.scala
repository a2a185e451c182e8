package graft.text

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("contamination counts eval-shingle overlap per training doc") {
    val evalDocs = Seq((100L, "the quick brown fox jumps over lazy dogs")).toDF("doc_id", "text")
    val train = Seq(
      (0L, "the quick brown fox jumps over something else entirely"), // shares 4 5-shingles? prefix overlap
      (1L, "no overlap with anything in that benchmark at all"),
      (2L, "tiny")                                                    // < 5 tokens
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withContamination(train, evalDocs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 0 shares the shingles starting at tokens 1 and 2:
    // "the quick brown fox jumps", "quick brown fox jumps over"
    assert(out(0L)._3 == 2L)
    assert(out(0L)._4 == 2.0 / out(0L)._2)
    assert(out(1L)._3 == 0L && out(1L)._4 == 0.0)
    assert(out(2L)._2 == 0L && out(2L)._4 == 0.0)
  }
}
