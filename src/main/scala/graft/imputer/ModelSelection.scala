package graft.imputer

import org.apache.spark.ml.PipelineStage
import org.apache.spark.ml.param.Params
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Candidate model pair for [[ModelSelection.selectModel]].
  * `checkSeparateFitTransformTime` additionally measures the saved-model
  * rollout path (save → load → transform) and the on-disk model size, like
  * the reference flag of the same name (scikit_learn_imputer.py:436-441). */
case class ModelOption(name: String,
                       classification: Params with PipelineStage,
                       regression: Params with PipelineStage,
                       checkSeparateFitTransformTime: Boolean = false)

/** The reference's select_model simulation study (scikit_learn_imputer.py:427):
  * fit every candidate pair, collect per-column test metrics and timings,
  * rank each metric (MSE/time/size ascending, accuracy descending) and sum
  * the performance ranks — lower is better.
  *
  * Orchestration is driver-side over per-candidate DISTRIBUTED fits; the
  * result frame is tiny (one row per candidate).
  */
object ModelSelection {

  /** @param checkpointPath when set, the summary-so-far is rewritten as a
    *   single CSV after EVERY candidate completes (ref
    *   scikit_learn_imputer.py:520-522: "as this function takes a long time
    *   to run, this can be saved in case of an error later on") — a study
    *   that dies on candidate N still leaves N−1 measured rows on disk.
    *   Driver-side write of a ≤|options|-row file, matching the reference's
    *   `to_csv`; ranks are computed only on the final frame, so the
    *   checkpoint carries the raw measurement columns. */
  def selectModel(imputer: SparkImputer, df: DataFrame,
                  options: Seq[ModelOption], savePath: String = null,
                  checkpointPath: String = null): DataFrame = {
    val spark = df.sparkSession

    val done = collection.mutable.Buffer.empty[
      (String, Double, Option[Double], Double, Option[Long], Seq[(String, String, Double)])]
    def checkpoint(): Unit = if (checkpointPath != null && done.nonEmpty) {
      val metricHdr = done.head._6.map { case (c, m, _) => s"${c}_$m" }
      val header = (Seq("model", "fit_function_time", "user_rollout_time_transform",
        "user_rollout_time_fit_transform", "model_size") ++ metricHdr).mkString(",")
      val lines = done.map { case (name, ft, rt, ftt, ms, metrics) =>
        (Seq(name, ft.toString, rt.map(_.toString).getOrElse(""), ftt.toString,
          ms.map(_.toString).getOrElse("")) ++ metrics.map(_._3.toString)).mkString(",")
      }
      val tmp = java.nio.file.Paths.get(checkpointPath + ".tmp")
      java.nio.file.Files.writeString(tmp, (header +: lines).mkString("", "\n", "\n"))
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(checkpointPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    val measured = options.map { opt =>
      val t0 = System.nanoTime()
      val model = imputer.fit(df, opt.classification, opt.regression)
      val fitTime = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      model.transform(df).count() // force the imputation
      val fitTransformTime = fitTime + (System.nanoTime() - t1) / 1e9

      val (rolloutTime, modelSize): (Option[Double], Option[Long]) =
        if (opt.checkSeparateFitTransformTime) {
          val dir = if (savePath != null) s"$savePath/${opt.name}"
            else java.nio.file.Files.createTempDirectory("graft_sel").toString
          model.save(spark, dir)
          val fs = org.apache.hadoop.fs.FileSystem.get(
            spark.sparkContext.hadoopConfiguration)
          val size = fs.getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength
          val t2 = System.nanoTime()
          val loaded = SparkImputerModel.load(spark, dir, imputer)
          loaded.transform(df).count()
          (Some((System.nanoTime() - t2) / 1e9), Some(size))
        } else (None, None)

      val row = (opt.name, fitTime, rolloutTime, fitTransformTime, modelSize,
        model.models.map { case (c, cm) => (c, cm.metricName, cm.metricValue) }.toSeq)
      done += row
      checkpoint()
      row
    }

    val metricCols = measured.head._6.map { case (c, m, _) => s"${c}_$m" }
    val schema = StructType(
      Seq(StructField("model", StringType),
        StructField("fit_function_time", DoubleType),
        StructField("user_rollout_time_transform", DoubleType, nullable = true),
        StructField("user_rollout_time_fit_transform", DoubleType),
        StructField("model_size", LongType, nullable = true)) ++
        metricCols.map(c => StructField(c, DoubleType)))
    val rows: Seq[Row] = measured.map { case (name, ft, rt, ftt, ms, metrics) =>
      Row.fromSeq(Seq[Any](name, ft, rt.getOrElse(null), ftt, ms.getOrElse(null)) ++
        metrics.map(_._3))
    }
    // LocalRelation (no job): the summary is one row per candidate
    val base = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .withColumn("time_saved_by_saved_model",
        col("user_rollout_time_fit_transform") - col("user_rollout_time_transform"))

    // ranks: lower-better for times/size/mse, higher-better for accuracy.
    // Pandas .rank() semantics (ref L534-541): ties share the AVERAGE of
    // their positions (rank 'min position' + (ties-1)/2, a fractional
    // double), and missing values keep a missing rank (na_option='keep' —
    // both SQL NULL and NaN count as missing, like pandas NaN).
    def avgRank(c: String, ascending: Boolean): org.apache.spark.sql.Column = {
      val missing = base.schema(c).dataType match {
        case DoubleType => col(c).isNull || isnan(col(c))
        case _ => col(c).isNull
      }
      val ord = if (ascending) asc_nulls_last(c) else desc_nulls_last(c)
      // missing rows (NULL or NaN) must sort after every real value — NaN
      // would otherwise sort FIRST under desc and shift the real positions
      val minPos = rank().over(Window.orderBy(when(missing, 1).otherwise(0).asc, ord))
      val ties = count(lit(1)).over(Window.partitionBy(col(c)))
      when(missing, lit(null)).otherwise(minPos + (ties - 1) / 2.0)
    }
    val lowerBetter = Seq("fit_function_time", "user_rollout_time_transform",
      "user_rollout_time_fit_transform", "model_size") ++
      metricCols.filter(_.endsWith("_mse"))
    val higherBetter = metricCols.filter(_.endsWith("_accuracy"))
    val ranked0 = lowerBetter.foldLeft(base) { (d, c) =>
      d.withColumn(s"${c}_rank", avgRank(c, ascending = true))
    }
    val ranked = higherBetter.foldLeft(ranked0) { (d, c) =>
      d.withColumn(s"${c}_rank", avgRank(c, ascending = false))
    }
    // pandas .sum(axis=1) skips missing ranks
    val perfRanks = metricCols.map(c => coalesce(col(s"${c}_rank"), lit(0.0)))
    ranked.withColumn("sum_of_performance_ranks",
        perfRanks.reduce(_ + _))
      .orderBy(asc("sum_of_performance_ranks"), asc("model"))
  }
}
