package graft.analytics

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel counts users by ordered stage completion") {
    // write a tiny events parquet so the query face reads it like testdata
    val dir = Files.createTempDirectory("graft_funnel").toString
    val ns = 1000000000L
    val rows = Seq(
      // user 1: full funnel in order
      (1L, 10 * ns, 1L, "view", 1.0, "{}"),
      (2L, 20 * ns, 1L, "click", 1.0, "{}"),
      (3L, 40 * ns, 1L, "purchase", 1.0, "{}"),
      // user 2: view then click, no purchase
      (4L, 10 * ns, 2L, "view", 1.0, "{}"),
      (5L, 15 * ns, 2L, "click", 1.0, "{}"),
      // user 3: click BEFORE view — click must not count
      (6L, 10 * ns, 3L, "click", 1.0, "{}"),
      (7L, 20 * ns, 3L, "view", 1.0, "{}"),
      // user 4: purchase before click: view→click ok, purchase out of order
      (8L, 10 * ns, 4L, "view", 1.0, "{}"),
      (9L, 12 * ns, 4L, "purchase", 1.0, "{}"),
      (10L, 15 * ns, 4L, "click", 1.0, "{}"),
      // user 5: never views
      (11L, 10 * ns, 5L, "error", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val r = Analytics.eventsFunnel(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") == 5L)
    assert(r.getAs[Long]("n_view") == 4L)          // users 1,2,3(late view),4
    assert(r.getAs[Long]("n_view_click") == 3L)    // users 1,2,4 (3 clicked pre-view)
    assert(r.getAs[Long]("n_full_funnel") == 1L)   // user 1 (user 4 bought pre-click)
    assert(r.getAs[Long]("median_convert_sec") == 30L)
  }
}
