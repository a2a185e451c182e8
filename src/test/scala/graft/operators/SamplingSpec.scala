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

  test("split is exhaustive, disjoint, exact on dense ids, and agrees with uniform") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("id")
    val got = Sampling.split(ids, "id", trainFrac = 0.8, valFrac = 0.1)
    val bySplit = got.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // bijective scramble on dense residues → EXACT proportions
    assert(bySplit == Map("train" -> 8000L, "val" -> 1000L, "test" -> 1000L))
    // the train split is precisely the 0.8 uniform sample: splits never
    // migrate when the val/test boundary moves
    val train = got.filter(col("split") === "train").select("id")
    assert(train.exceptAll(Sampling.uniform(ids, "id", 0.8)).count() == 0L)
    assert(Sampling.uniform(ids, "id", 0.8).exceptAll(train).count() == 0L)
  }

  test("a NULL id fails every sampler loudly instead of misrouting the row") {
    import spark.implicits._
    // uniform/stratified would silently DROP a null-id row; split would
    // silently dump it in the LAST split — both are the silent-corruption
    // class the in-plan guard exists to prevent
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
      .withColumn("stratum", lit("a"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    for (op <- Seq(
        () => Sampling.uniform(df, "id", 0.5).count(),
        () => Sampling.split(df, "id", 0.6, 0.2).count(),
        () => Sampling.stratified(df, "id", "stratum", Map("a" -> 1.0)).count(),
        () => Sampling.shuffledShards(df, "id", 2).count())) {
      val e = intercept[Exception](op())
      assert(msgs(e).exists(_.contains("contains NULLs")), msgs(e).mkString(" | "))
    }
  }

  test("split rejects fractions that overflow the unit interval") {
    import spark.implicits._
    val ids = (0L until 10L).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Sampling.split(ids, "id", trainFrac = 0.9, valFrac = 0.2)
    }
    assert(e.getMessage.contains("sum to at most 1"))
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

  test("shuffledShards: even shards, dense positions, order decorrelated from id") {
    import spark.implicits._
    // 30000 ids EXCEEDS the sampling bucket's 10^4 modulus on purpose: a
    // scramble that collapses to id mod 10^4 would leave long id-ascending
    // runs inside each shard, which the run-structure assertion catches
    val n = 30000L
    val rows = (0L until n).toDF("id")
    val out = Sampling.shuffledShards(rows, "id", 8)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.length == n && out.map(_._1).distinct.length == n)
    val byShard = out.groupBy(_._2)
    assert(byShard.size == 8)
    byShard.values.foreach { rs =>
      // dense ids spread EXACTLY evenly across the 8 shards
      assert(rs.length == n / 8)
      // positions are dense 1..n within the shard
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
      // shuffled order: adjacent positions are almost never adjacent ids,
      // and ascending runs stay short (a mod-collapsed scramble would
      // produce ~3750-row ascending runs here)
      val inPosOrder = rs.sortBy(_._3).map(_._1).toSeq
      var maxRun = 1; var run = 1
      inPosOrder.sliding(2).foreach { w =>
        if (w.length == 2 && w(1) > w(0)) { run += 1; maxRun = math.max(maxRun, run) }
        else run = 1
      }
      assert(maxRun < 50, s"ascending run of $maxRun looks like id order leaking through")
    }
    // deterministic across invocations
    val again = Sampling.shuffledShards(rows, "id", 8)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("fixedPerStratum: exactly k per stratum, deterministic, smallest scrambled keys win") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val out = Sampling.fixedPerStratum(rows, "id", "g", k = 7)
      .as[(Long, String)].collect()
    assert(out.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("g0" -> 7, "g1" -> 7, "g2" -> 7))
    // the winners are exactly the k smallest scrambled keys of each stratum
    def scramble(id: Long) = ((id % 2147483647L) * 2654435761L) % 2147483647L
    val want = (1L to 300L).groupBy(i => s"g${i % 3}").flatMap { case (g, ids) =>
      ids.sortBy(i => (scramble(i), i)).take(7).map(i => (i, g))
    }.toSet
    assert(out.toSet == want)
    // k larger than the stratum returns the whole stratum, no padding
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    assert(Sampling.fixedPerStratum(tiny, "id", "g", k = 5).count() == 3L)
  }
}
