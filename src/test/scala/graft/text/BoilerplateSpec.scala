package graft.text

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("cross-doc repeated shingles are flagged, unique ones are not") {
    val boiler = "all rights reserved by example corp"
    val df = Seq(
      (0L, s"alpha beta gamma delta epsilon zeta $boiler"),
      (1L, s"one two three four five six seven $boiler"),
      (2L, s"red orange yellow green blue indigo $boiler"),
      (3L, "totally unique words with no overlap here at all"),
      (4L, "shrt")                                   // < 5 tokens: no shingles
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withBoilerplate(df, "doc_id", "text", n = 5, minDocs = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // the shared 6-token tail yields 2 shingles present in docs 0,1,2
    for (id <- Seq(0L, 1L, 2L)) {
      assert(out(id)._3 == 2L, s"doc $id boiler count")
      assert(out(id)._4 > 0.0 && out(id)._4 < 1.0)
    }
    assert(out(3L)._3 == 0L && out(3L)._4 == 0.0)
    assert(out(4L)._2 == 0L && out(4L)._4 == 0.0)   // short doc: zero shingles
  }
}
