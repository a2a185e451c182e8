package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** withReadability: hand-computed Flesch scores on known sentences. */
class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def score(text: String): (Long, Long, Long, Option[Double], Option[Double]) = {
    val r = TextAnalysis.withReadability(Seq((1, text)).toDF("id", "text"), "text")
      .select("n_words", "n_sentences", "n_syllables", "flesch", "fk_grade")
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("counts: words split on spaces, sentences on terminal runs, syllables as vowel groups") {
    // "the cat sat." → 3 words; 1 sentence; vowel groups: e, a, a = 3
    val (w, s, sy, _, _) = score("the cat sat.")
    assert((w, s, sy) == (3L, 1L, 3L))
  }

  test("flesch matches the closed form") {
    val (w, s, sy, f, g) = score("the cat sat. it sat on a mat!")
    // words=8, sentences=2, syllable groups: e,a,a,i,a,o,a,a = 8
    assert((w, s, sy) == (8L, 2L, 8L))
    val flesch = BigDecimal(206.835 - 1.015 * (8.0 / 2.0) - 84.6 * (8.0 / 8.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val grade = BigDecimal(0.39 * (8.0 / 2.0) + 11.8 * (8.0 / 8.0) - 15.59)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(f.contains(flesch) && g.contains(grade))
  }

  test("no terminal punctuation floors sentences at 1; empty text yields NULL scores") {
    val (w, s, _, f, _) = score("just words no stops")
    assert(w == 4L && s == 1L && f.isDefined)
    val (w0, _, _, f0, g0) = score("")
    assert(w0 == 0L && f0.isEmpty && g0.isEmpty)
  }

  test("multi-punctuation runs count as one sentence boundary") {
    val (_, s, _, _, _) = score("wait... what?! really.")
    assert(s == 3L)
  }
}
