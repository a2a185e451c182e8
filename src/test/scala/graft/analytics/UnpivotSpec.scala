package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** events_unpivot: the melt agrees with the wide rollup it reshapes. */
class UnpivotSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("long form carries exactly 3 metrics per day and round-trips the wide rollup") {
    val long = Analytics.eventsUnpivot(spark, dir).cache()
    val perDay = long.groupBy("d").agg(count(lit(1)).as("k"),
      count_distinct(col("metric")).as("km")).collect()
    assert(perDay.nonEmpty && perDay.forall(r => r.getLong(1) == 3L && r.getLong(2) == 3L))

    // pivot the long form back and compare against a directly-computed day
    val wide = long.groupBy("d").pivot("metric",
      Seq("n_events", "n_users", "n_purchases")).agg(first("value"))
    val e = graft.Tables(spark, dir, "events")
      .select(expr("ts div 86400000000000").as("d"), col("user_id"), col("event_type"))
    val d0 = wide.orderBy("d").limit(1).collect()(0)
    val direct = e.filter(col("d") === d0.getLong(0))
      .agg(count(lit(1)), count_distinct(col("user_id")),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))).collect()(0)
    assert((d0.getLong(1), d0.getLong(2), d0.getLong(3)) ==
      (direct.getLong(0), direct.getLong(1), direct.getLong(2)))
    long.unpersist()
  }
}
