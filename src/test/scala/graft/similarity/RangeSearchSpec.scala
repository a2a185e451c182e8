package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeSearchSpec extends SparkSpec {
  import spark.implicits._

  test("range search returns exactly the above-threshold pairs") {
    // unit-ish vectors at known angles to the x axis
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),           // query
      (1L, Array(0.9f, 0.1f)),           // cos ≈ 0.994
      (2L, Array(0.5f, 0.5f)),           // cos ≈ 0.707
      (3L, Array(0.0f, 1.0f)),           // cos = 0
      (4L, Array(-1.0f, 0.0f))           // cos = −1
    ).toDF("vec_id", "embedding")
    val out = AnnLsh.rangeSearch(vecs, vecs.filter(col("vec_id") === 0L),
        "vec_id", "embedding", minCos = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._2).toSet == Set(1L, 2L))
    assert(out.forall(r => r._3 >= 0.5 && r._1 == 0L))
    // self-pair excluded even though cos(self) = 1
    assert(!out.exists(_._2 == 0L))
  }

  test("z-score impute: observed rows standardize to mean 0, filled rows at z of the mean") {
    val z = graft.queries.Q.impZscore(spark, "/root/testdata/sf0.001")
      .as[(Long, Double)].collect()
    val mean = z.map(_._2).sum / z.length
    assert(math.abs(mean) < 0.02)   // imputed-at-mean rows pull toward 0
    // masked custkeys (k%7==3) all share one z value: the imputed mean's
    val masked = z.filter(r => r._1 % 7 == 3).map(_._2).distinct
    assert(masked.length == 1)
    assert(math.abs(masked.head) < 0.01)
  }
}
