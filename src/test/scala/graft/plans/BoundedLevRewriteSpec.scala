package graft.plans

import graft.SparkSpec
import graft.functions.BoundedLevenshteinExpr
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** BoundedLevRewrite: levenshtein-vs-literal predicates become banded. */
class BoundedLevRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def hasBounded(df: DataFrame): Boolean = {
    var found = false
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case _: BoundedLevenshteinExpr => found = true
      case _ => ()
    }))
    found
  }

  private val pairs = {
    val rnd = new Random(3)
    Seq.fill(200)((
      Seq.fill(rnd.nextInt(10))("abc" (rnd.nextInt(3))).mkString,
      Seq.fill(rnd.nextInt(10))("abc" (rnd.nextInt(3))).mkString))
  }

  // a LocalRelation filter would be folded away by ConvertToLocalRelation
  // BEFORE user rules run — go through parquet like a real scan
  private lazy val src: DataFrame = {
    val p = java.nio.file.Files.createTempDirectory("lev_rule").toString
    pairs.toDF("a", "b").write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("<=, <, = against a literal rewrite to the banded expression; results unchanged") {
    val df = src
    val shapes: Seq[(String, DataFrame)] = Seq(
      "lev<=2" -> df.filter(levenshtein(col("a"), col("b")) <= 2),
      "2>=lev" -> df.filter(lit(2) >= levenshtein(col("a"), col("b"))),
      "lev<3" -> df.filter(levenshtein(col("a"), col("b")) < 3),
      "lev=2" -> df.filter(levenshtein(col("a"), col("b")) === 2))
    for ((name, q) <- shapes) {
      assert(hasBounded(q), s"$name did not rewrite")
      // ground truth from the driver-side full DP
      def full(x: String, y: String): Int = {
        val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
          if (j == 0) i else if (i == 0) j else 0)
        for (i <- 1 to x.length; j <- 1 to y.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
        d(x.length)(y.length)
      }
      val expect = name match {
        case "lev<=2" | "2>=lev" => pairs.filter(p => full(p._1, p._2) <= 2)
        case "lev<3" => pairs.filter(p => full(p._1, p._2) < 3)
        case _ => pairs.filter(p => full(p._1, p._2) == 2)
      }
      val got = q.as[(String, String)].collect().toSeq
      assert(got.sorted == expect.sorted, s"$name results differ")
    }
  }

  test("shapes that need the full distance do not rewrite") {
    val df = src
    // strict > needs the unbounded value; non-literal bound can't band;
    // a bare projection of the distance has no bound at all
    assert(!hasBounded(df.filter(levenshtein(col("a"), col("b")) > 2)))
    assert(!hasBounded(df.filter(
      levenshtein(col("a"), col("b")) <= length(col("a")))))
    assert(!hasBounded(df.select(levenshtein(col("a"), col("b")))))
  }
}
