package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** graft_lev_bounded ≡ min(levenshtein, k+1), interpreted and codegen. */
class BoundedLevSpec extends SparkSpec {
  import spark.implicits._

  test("static helper matches full DP clamped at k+1 on random strings") {
    def full(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new Random(7)
    for (_ <- 1 to 500) {
      val a = Seq.fill(rnd.nextInt(12))("abc" (rnd.nextInt(3))).mkString
      val b = Seq.fill(rnd.nextInt(12))("abc" (rnd.nextInt(3))).mkString
      for (k <- 0 to 4) {
        val expect = math.min(full(a, b), k + 1)
        val got = BoundedLevenshteinExpr.bounded(a, b, k)
        assert(got == expect, s"a=$a b=$b k=$k: got $got want $expect")
      }
    }
  }

  test("the SQL function agrees with Spark's levenshtein wherever <= k") {
    val rnd = new Random(11)
    val pairs = Seq.fill(300)((
      Seq.fill(rnd.nextInt(15))("abcd" (rnd.nextInt(4))).mkString,
      Seq.fill(rnd.nextInt(15))("abcd" (rnd.nextInt(4))).mkString))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        levenshtein(col("a"), col("b")).as("full"),
        call_function("graft_lev_bounded", col("a"), col("b"), lit(2)).as("bounded"))
    df.collect().foreach { r =>
      val (full, bounded) = (r.getInt(2), r.getInt(3))
      assert(bounded == math.min(full, 3),
        s"${r.getString(0)} / ${r.getString(1)}: full=$full bounded=$bounded")
    }
  }
}
