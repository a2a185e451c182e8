package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("uniform sample is exact on dense ids and fully deterministic") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("id")
    val n = Sampling.uniform(ids, "id", 0.25).count()
    // the splitter is a bijection on residues mod 10^4 → EXACT proportion
    assert(n == 2500L)
    val again = Sampling.uniform(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    val first = Sampling.uniform(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("stratified fractions apply per stratum with a default fallback") {
    import spark.implicits._
    val rows = (0L until 10000L).map(i => (i, s"s${i % 2}")).toDF("id", "stratum")
    val got = Sampling.stratified(rows, "id", "stratum",
      Map("s0" -> 0.5), defaultFraction = 0.1)
    val byStratum = got.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5000 ids per stratum; interleaved ids keep the scramble near-uniform
    assert(math.abs(byStratum("s0") - 2500L) < 150, byStratum.toString)
    assert(math.abs(byStratum("s1") - 500L) < 100, byStratum.toString)
    // a sampled row is always a row of the input
    assert(got.join(rows, Seq("id", "stratum")).count() == got.count())
  }
}
