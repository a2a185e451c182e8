package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  test("merged daily HLL sketches estimate per-type distinct users within 5%") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Q.eventsDistinctRollup(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val exact = graft.Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("u"), count(lit(1)).as("n"),
        countDistinct(expr("ts div 86400000000000")).as("days"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == exact.keySet)
    got.foreach { case (t, (approx, nEvents, nDays)) =>
      val (u, n, days) = exact(t)
      assert(nEvents == n, s"$t event count") // counts are exact, not sketched
      assert(nDays == days, s"$t day count")
      assert(math.abs(approx - u) <= math.max(2L, (0.05 * u).toLong),
        s"$t: approx $approx vs exact $u")
    }
  }

  test("sketch rollup is deterministic across partitionings") {
    val dir = "/root/testdata/sf0.001"
    def run() = graft.queries.Q.eventsDistinctRollup(spark, dir)
      .orderBy("event_type").collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val a = run()
    spark.conf.set("spark.sql.shuffle.partitions", "11")
    try assert(run() == a) finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
