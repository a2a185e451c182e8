package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prune keeps every matching row and bounds survivors") {
    val probe = (0L until 10000L).map(i => (i, s"p$i")).toDF("k", "v")
    val build = (0L until 10000L by 100).map(i => (i, s"b$i")).toDF("bk", "bv")
    val pruned = BloomPrune.prune(probe, "k", build, "bk",
      expectedKeys = 100, fpp = 0.01)
    val kept = pruned.select("k").as[Long].collect().toSet
    // no false negatives: every build key survives
    (0L until 10000L by 100).foreach(k => assert(kept.contains(k), s"lost $k"))
    // false positives bounded: ~1% of the 9900 non-members, generous slack
    assert(kept.size <= 100 + 500, s"too many survivors: ${kept.size}")
  }

  test("bloom-pruned join equals the plain join exactly") {
    val probe = (0L until 5000L).map(i => (i, i % 7)).toDF("k", "x")
    val build = Seq((10L, "a"), (2500L, "b"), (4999L, "c"), (7777L, "d")).toDF("bk", "y")
    val expected = probe.join(build, $"k" === $"bk")
      .select("k", "y").as[(Long, String)].collect().toSet
    val got = BloomPrune.join(probe, "k", build, "bk", expectedKeys = 4)
      .select("k", "y").as[(Long, String)].collect().toSet
    assert(got == expected)
  }

  test("null probe keys are pruned (they can never equi-join)") {
    val probe = Seq(Some(1L), None, Some(2L)).toDF("k")
    val build = Seq(1L, 2L).toDF("bk")
    assert(BloomPrune.prune(probe, "k", build, "bk", 2).count() == 2)
  }
}
