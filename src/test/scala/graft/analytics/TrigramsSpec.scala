package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** events_trigrams: contiguous within-session type trigrams. */
class TrigramsSpec extends SparkSpec {
  import spark.implicits._

  test("trigrams respect session gaps and count every sliding position") {
    val ns = 1000000000L
    // user 1: a,b,c,d within one session → a>b>c, b>c>d ; then a 31-min gap
    // opens a new session with e,f,g → e>f>g. user 2: only 2 events → none.
    val rows = Seq(
      (1L, 1L, "a", 0L), (1L, 2L, "b", 10L), (1L, 3L, "c", 20L), (1L, 4L, "d", 30L),
      (1L, 5L, "e", 30L + 1860L), (1L, 6L, "f", 30L + 1870L), (1L, 7L, "g", 30L + 1880L),
      (2L, 8L, "a", 0L), (2L, 9L, "b", 5L))
      .map { case (u, id, ty, sec) => (u, id, ty, sec * ns) }
    val dir = java.nio.file.Files.createTempDirectory("trig").toString
    rows.toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.eventsTrigrams(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a>b>c" -> 1L, "b>c>d" -> 1L, "e>f>g" -> 1L))
  }
}
