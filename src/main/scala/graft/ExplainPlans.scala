package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection main: `runMain graft.ExplainPlans [query ...]` prints
  * `explain("formatted")` for the named queries (default: the relational
  * backbone) so broadcast choices, pushed filters, and WholeStageCodegen
  * spans can be reviewed. */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_join", "q5_multijoin", "topn_window", "imp_mean", "ann_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
