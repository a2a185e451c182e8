package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NgramScrubSpec extends SparkSpec {
  import spark.implicits._

  test("topBigrams counts adjacent pairs with deterministic tie-break") {
    val df = Seq(
      (0L, "a b a b c"),
      (1L, "a b"),
      (2L, "c"),          // single token: no bigram
      (3L, "b c a b")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.topBigrams(df, "text", 3).as[(String, Long)].collect()
    // counts: "a b"=4, "b c"=2, "b a"=1, "c a"=1 → tie broken alphabetically
    assert(top.toSeq == Seq(("a b", 4L), ("b c", 2L), ("b a", 1L)))
  }

  test("bigrams of a one-token document is empty, null text yields no rows") {
    val df = Seq((0L, "only"), (1L, null: String)).toDF("doc_id", "text")
    assert(df.select(explode(TextAnalysis.bigrams(col("text")))).count() == 0L)
  }

  test("withScrub redacts emails, urls, digit runs, and the blocklist term") {
    val df = Seq(
      (0L, "mail me at bob.smith@corp.example.com today"),
      (1L, "see https://site.example/x?q=1 for details"),
      (2L, "card 12345678 expires"),
      (3L, "spark rules but sparkly is fine"),
      (4L, "nothing to scrub here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withScrub(df, "text")
      .select("doc_id", "scrubbed", "n_hits").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(out(0)._2 == "mail me at <x> today" && out(0)._3 == 1L)
    assert(out(1)._2 == "see <x> for details" && out(1)._3 == 1L)
    assert(out(2)._2 == "card <x> expires" && out(2)._3 == 1L)
    // \b keeps "sparkly" intact while the bare term is redacted
    assert(out(3)._2 == "<x> rules but sparkly is fine" && out(3)._3 == 1L)
    assert(out(4)._2 == "nothing to scrub here" && out(4)._3 == 0L)
  }
}
