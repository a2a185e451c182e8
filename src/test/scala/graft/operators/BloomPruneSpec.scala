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

  test("antiJoin equals the exact left-anti join on randomized keyed data") {
    // deterministic pseudo-random keys with duplicates and nulls on both
    // sides — multiset equality against the plain left_anti, several shapes
    for (seed <- Seq(1L, 7L, 23L)) {
      def keys(n: Int, mod: Long, salt: Long): Seq[Option[Long]] =
        (0 until n).map { i =>
          val h = (i * 2654435761L + seed * 40503L + salt) & 0x7fffffffL
          if (h % 19 == 0) None else Some(h % mod)
        }
      val probe = keys(400, 97L, 0L).toDF("k")
      val build = keys(120, 97L, 13L).flatten.toDF("bk")
      def bag(df: org.apache.spark.sql.DataFrame): Map[Option[Long], Int] =
        df.collect().toSeq
          .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
          .groupBy(identity).map { case (k, v) => k -> v.size }
      val got = bag(BloomPrune.antiJoin(probe, "k", build, "bk", 120))
      val exact = bag(probe.join(build, col("k") === col("bk"), "left_anti"))
      assert(got == exact, s"seed $seed")
    }
  }

  test("antiJoinSmallProbe equals antiJoin (and the exact left-anti) on the same shapes") {
    // the broadcast-reduced plan variant must be row-for-row identical —
    // same randomized duplicates-and-nulls shapes as the antiJoin test,
    // fpp 0.5 so the verify branch actually carries false positives
    for (seed <- Seq(1L, 7L, 23L)) {
      def keys(n: Int, mod: Long, salt: Long): Seq[Option[Long]] =
        (0 until n).map { i =>
          val h = (i * 2654435761L + seed * 40503L + salt) & 0x7fffffffL
          if (h % 19 == 0) None else Some(h % mod)
        }
      val probe = keys(400, 97L, 0L).toDF("k")
      val build = keys(120, 97L, 13L).flatten.toDF("bk")
      def bag(df: org.apache.spark.sql.DataFrame): Map[Option[Long], Int] =
        df.collect().toSeq
          .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
          .groupBy(identity).map { case (k, v) => k -> v.size }
      val got = bag(BloomPrune.antiJoinSmallProbe(probe, "k", build, "bk", 120, fpp = 0.5))
      val exact = bag(probe.join(build, col("k") === col("bk"), "left_anti"))
      assert(got == exact, s"seed $seed")
    }
  }

  test("antiJoin keeps null probe keys, exactly like the left-anti join") {
    // a null key matches nothing, so an exact left_anti KEEPS the row; the
    // sketch probe is NULL there and a bare !might filter would silently
    // drop it from both branches
    val probe = Seq(Some(1L), None, Some(3L)).toDF("k")
    val build = Seq(1L, 2L).toDF("bk")
    val got = BloomPrune.antiJoin(probe, "k", build, "bk", 2)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    val exact = probe.join(build, col("k") === col("bk"), "left_anti")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(got == exact && got == Set(None, Some(3L)))
  }

  test("native probe: codegen and interpreted paths agree bit-for-bit") {
    val probe = (0L until 4000L).toDF("k")
    val build = (0L until 4000L by 37).toDF("bk")
    def survivors(codegen: String): Seq[Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try BloomPrune.prune(probe, "k", build, "bk", expectedKeys = 200)
        .orderBy("k").as[Long].collect().toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(survivors("CODEGEN_ONLY") == survivors("NO_CODEGEN"))
  }

  test("native probe works for string keys too") {
    val probe = (0 until 2000).map(i => s"key$i").toDF("k")
    val build = (0 until 2000 by 50).map(i => s"key$i").toDF("bk")
    val kept = BloomPrune.prune(probe, "k", build, "bk", expectedKeys = 40)
      .as[String].collect().toSet
    (0 until 2000 by 50).foreach(i => assert(kept.contains(s"key$i")))
    assert(kept.size <= 40 + 200)
  }

  test("probe filter stays inside WholeStageCodegen (no UDF barrier)") {
    val probe = spark.range(100).toDF("k")
    val build = (0L until 100L by 10).toDF("bk")
    val plan = BloomPrune.prune(probe, "k", build, "bk", expectedKeys = 10)
      .queryExecution.executedPlan.toString
    // '*(n)' is the compact WholeStageCodegen marker; the Filter line itself
    // must carry it — a UDF would sit outside any codegen span.
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter graft_bloom_might_contain") && l.contains("*(")))
    assert(!plan.contains("ScalaUDF"))
  }
}
