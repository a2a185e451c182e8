package graft.imputer

import org.apache.spark.ml.PipelineStage
import org.apache.spark.ml.param.Params
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate model pair for [[ModelSelection.selectModel]]. */
case class ModelOption(name: String,
                       classification: Params with PipelineStage,
                       regression: Params with PipelineStage)

/** The reference's select_model simulation study (scikit_learn_imputer.py:427):
  * fit every candidate (classifier, regressor) pair, collect per-column test
  * metrics and fit time, rank candidates (lower MSE better, higher accuracy
  * better, lower time better) and sum the performance ranks.
  */
object ModelSelection {

  def selectModel(imputer: SparkImputer, df: DataFrame,
                  options: Seq[ModelOption]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = options.flatMap { opt =>
      val t0 = System.nanoTime()
      val model = imputer.fit(df, opt.classification, opt.regression)
      val fitTime = (System.nanoTime() - t0) / 1e9
      model.models.toSeq.map { case (target, cm) =>
        (opt.name, target, cm.metricName, cm.metricValue, fitTime)
      }
    }
    val long = rows.toDF("model", "variable", "metric", "score", "fit_time")
    // rank per (variable, metric): mse ascending, accuracy descending
    val ranked = long.withColumn("rank",
      when(col("metric") === "accuracy",
        rank().over(Window.partitionBy("variable").orderBy(desc("score"), asc("model"))))
        .otherwise(
          rank().over(Window.partitionBy("variable").orderBy(asc("score"), asc("model")))))
    ranked.groupBy("model")
      .agg(sum("rank").as("sum_of_performance_ranks"),
        max("fit_time").as("fit_function_time"))
      .orderBy(asc("sum_of_performance_ranks"), asc("model"))
  }
}
