package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual registered queries in isolation: `runMain graft.tools.MicroBench q1 q2 ...`
  * Prints every sample plus the median, so plan-level regressions can be
  * separated from shared-JVM noise without running the full 129-query bench.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case None => println(s"$n: no such query")
        case Some(fn) =>
          val ts = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          val med = ts.sorted.apply(ts.length / 2)
          println(f"$n%-28s median=$med%.3fs  samples=${ts.map(t => f"$t%.3f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
