package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** FuzzyJoin: lossless q-gram-filtered edit-distance join ≡ brute force. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(names: Seq[String], k: Int): Set[(String, String, Long)] = {
    val d = names.distinct
    (for (a <- d; b <- d if a < b; dist = lev(a, b) if dist >= 1 && dist <= k)
      yield (a, b, dist.toLong)).toSet
  }

  private def run(names: Seq[String], k: Int = 2): Set[(String, String, Long)] =
    FuzzyJoin.namePairs(names.toDF("name"), "name", k = k)
      .select("name_a", "name_b", "dist").as[(String, String, Long)]
      .collect().toSet

  test("planted typos are caught at exact distances; beyond-k pairs are not") {
    val names = Seq("red widget", "red widgit", "red wodgit", "blue bolt",
      "blue boltt", "green spanner", "red widget", "red widget")
    val got = run(names)
    assert(got.contains(("red widget", "red widgit", 1L)))
    assert(got.contains(("red widgit", "red wodgit", 1L)))
    assert(got.contains(("red widget", "red wodgit", 2L)))
    assert(got.contains(("blue bolt", "blue boltt", 1L)))
    assert(!got.exists { case (a, b, _) => a.startsWith("green") || b.startsWith("green") })
    assert(got == brute(names, 2))
  }

  test("row counts ride along per distinct name") {
    val names = Seq("alpha bravo", "alpha bravo", "alpha bravo", "alpha brave")
    val row = FuzzyJoin.namePairs(names.toDF("name"), "name")
      .select("name_a", "name_b", "n_a", "n_b").as[(String, String, Long, Long)]
      .collect().toSet
    assert(row == Set(("alpha brave", "alpha bravo", 1L, 3L)))
  }

  test("short names sharing zero q-grams still pair via the banded fallback") {
    // len <= k*q + q - 1 = 5: the count bound is vacuous and 'ab'/'cd'
    // share no bigram, so the gram join alone would miss them.
    val got = run(Seq("ab", "cd", "abcdef", "ghijkl"))
    assert(got.contains(("ab", "cd", 2L)))
    assert(got == brute(Seq("ab", "cd", "abcdef", "ghijkl"), 2))
  }

  test("repeated-gram strings need multiset counting, not distinct grams") {
    // 'aaaaaaaa' vs 'aaaabaaa' share only gram 'aa' set-wise; the multiset
    // occurrence join must still clear the count threshold.
    val names = Seq("aaaaaaaa", "aaaabaaa", "aaaaaaab", "bbbbbbbb")
    assert(run(names) == brute(names, 2))
  }

  test("property: random corpora match brute force (incl. short strings)") {
    val rnd = new Random(47)
    for (trial <- 1 to 8) {
      val vocab = "abcd"
      val names = Seq.fill(30)((0 until (1 + rnd.nextInt(9)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString)
      val k = 1 + trial % 2
      assert(run(names, k) == brute(names, k), s"trial $trial k=$k names=$names")
    }
  }
}
