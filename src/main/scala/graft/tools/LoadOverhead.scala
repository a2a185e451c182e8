package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev measurement: per-call cost of `Tables.apply` (parquet footer read +
  * plan construction + function registration) vs reusing the DataFrame —
  * the fixed overhead every registered query pays per table reference.
  * `runMain graft.tools.LoadOverhead [sfDir]` */
object LoadOverhead {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm: first load pays FS listing + codegen
    graft.Tables(spark, sfDir, "lineitem").count()
    for (t <- Seq("lineitem", "events", "documents", "customer")) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 50) { graft.Tables(spark, sfDir, t); i += 1 }
      val perCall = (System.nanoTime() - t0) / 50e6
      println(f"[load] Tables($t%s): $perCall%.2f ms/call over 50 calls")
    }
    // decompose: bare read vs register alone
    val tR = System.nanoTime()
    var j = 0
    while (j < 50) { spark.read.parquet(s"$sfDir/lineitem.parquet"); j += 1 }
    println(f"[load] bare read.parquet(lineitem): ${(System.nanoTime() - tR) / 50e6}%.2f ms/call")
    val tF = System.nanoTime()
    j = 0
    while (j < 50) { graft.functions.GraftFunctions.register(spark); j += 1 }
    println(f"[load] GraftFunctions.register:     ${(System.nanoTime() - tF) / 50e6}%.2f ms/call")
    // and the action-side: count() on a fresh load vs reused frame
    val t1 = System.nanoTime()
    graft.Tables(spark, sfDir, "lineitem").count()
    println(f"[load] fresh-load count(): ${(System.nanoTime() - t1) / 1e6}%.1f ms")
    val df = graft.Tables(spark, sfDir, "lineitem")
    df.count()
    val t2 = System.nanoTime()
    df.count()
    println(f"[load] reused-frame count(): ${(System.nanoTime() - t2) / 1e6}%.1f ms")
    spark.stop()
  }
}
