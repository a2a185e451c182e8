package graft.imputer

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Scratch profiling harness (not part of the library surface). */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val which = args.headOption.getOrElse("ml_tree")
    which match {
      case "ml_tree" =>
        import org.apache.spark.ml.classification.DecisionTreeClassifier
        import org.apache.spark.ml.regression.DecisionTreeRegressor
        val mc = Tables.maskedCustomer(spark, sfDir)
        val imp = new SparkImputer(idCol = "c_custkey",
          categorical = Seq("c_mktsegment", "c_name"), classThreshold = 30)
        val df = time("nanAsNull") { val d = imp.nanAsNull(mc); d.count(); d }
        val ff = time("materializedFeatures") { imp.materializedFeatures(df) }
        val toImp = time("columnsToImpute") { imp.columnsToImpute(df) }
        println(s"[prof] columns: $toImp  featureCols: ${ff.columns.length}")
        val model = time("fitInternal") {
          imp.fitInternal(df, new DecisionTreeClassifier(), new DecisionTreeRegressor(), ff) }
        time("transformInternal") { model.transformInternal(df, ff).count() }
        time("full second pass") { graft.queries.Q.impMlTree(spark, sfDir).count() }
      case "minhash" =>
        time("shingles only") {
          import org.apache.spark.sql.functions._
          Tables(spark, sfDir, "documents")
            .select(graft.dedup.Dedup.shingleHashes(col("text"), 3).as("sh"))
            .selectExpr("sum(size(sh))").collect()
        }
        time("minhash pairs 1") { graft.queries.Q.dedupMinhash(spark, sfDir).count() }
        time("minhash pairs 2") { graft.queries.Q.dedupMinhash(spark, sfDir).count() }
        time("jaccard pairs") { graft.queries.Q.dedupJaccard(spark, sfDir).count() }
      case "sh2" =>
        import org.apache.spark.sql.functions._
        val docs = Tables(spark, sfDir, "documents")
        def shSum(d: org.apache.spark.sql.DataFrame) =
          d.select(graft.dedup.Dedup.shingleHashes(col("text"), 3).as("sh"))
            .selectExpr("sum(size(sh))").collect()(0)
        time("shingles cold") { shSum(docs) }
        time("shingles warm") { shSum(docs) }
        time("shingles warm2") { shSum(docs) }
        val r32 = docs.repartition(32)
        time("shingles repart32") { shSum(r32) }
        time("shingles repart32 warm") { shSum(r32) }
        println("[prof] scan partitions: " + docs.rdd.getNumPartitions)
      case _ => println(s"unknown: $which")
    }
    spark.stop()
  }
}
