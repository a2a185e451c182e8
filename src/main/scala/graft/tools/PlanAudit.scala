package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named registered queries:
  * `runMain graft.tools.PlanAudit q1_agg imp_ffill_bfill`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case None => println(s"== $n: no such query")
        case Some(fn) =>
          println(s"==== $n ====")
          fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
