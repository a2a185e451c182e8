package graft.imputer

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.feature.{IndexToString, StringIndexer, StringIndexerModel, VectorAssembler}
import org.apache.spark.ml.param.{ParamMap, Params}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, NumericType, ShortType, StringType}

/** Spark-native re-expression of the reference `SklearnImputer`
  * (scikit_learn_imputer.py:35-553): impute missing values in mixed-type
  * frames by training one MLlib model per column-with-missing-values —
  * classifiers for categorical targets, regressors for continuous ones.
  *
  * Differences from the pandas original are deliberate scale decisions:
  *   - rows are identified by an explicit numeric `idCol` (the reference
  *     uses the pandas index) — any unique BIGINT works;
  *   - the train/test simulation split is a deterministic modulo on the id,
  *     not an RNG shuffle, so results are reproducible across cluster
  *     topologies;
  *   - feature preparation (ffill/bfill, one-hot, scaling) runs as
  *     distributed DataFrame transforms (see [[FeatureBuilder]],
  *     [[FfillBfill]]);
  *   - per-column models are MLlib estimators wrapped in a Pipeline
  *     (StringIndexer ≈ LabelEncoder, VectorAssembler, model,
  *     IndexToString ≈ inverse_transform), trained distributed;
  *   - persistence uses MLlib's native writers, so saved models live on
  *     HDFS/S3-compatible storage, not a local joblib file.
  *
  * The per-COLUMN loop is driver-side but bounded by the schema width, never
  * the row count.
  */
class SparkImputer(
    val idCol: String,
    val categorical: Seq[String] = Nil,
    val roundColumns: Seq[String] = Nil,
    val classThreshold: Int = 30,
    val features: Seq[String] = Nil,
    val includeMissingFlags: Boolean = false,
    val testModulo: Int = 10,
    /** Arbitrary test fraction (ref fit's `test_size=0.1`, any float).
      * NaN (default) keeps the 1/testModulo modulo split; a value in (0,1)
      * selects test rows deterministically by id hash — `pmod(xxhash64(id),
      * 10000) < testSize·10000` — so any fraction works (0.01% resolution)
      * and the split is stable across cluster topologies, unlike the
      * reference's RNG shuffle. */
    val testSize: Double = Double.NaN,
    val seed: Long = 42L,
    /** Max columns fitted concurrently. Per-column train/test timings are
      * wall-clock and include scheduler contention when >1; set to 1 for
      * contention-free per-column timings (sequential fits). */
    val fitParallelism: Int = 4,
    /** Optional default save location (ref __init__ save_models_to). When
      * set, fit() pre-flights that the parent directory exists BEFORE
      * training — the reference raises OSError at __init__ for the same
      * reason: a bad path must not surface after hours of fitting. */
    val saveModelsTo: String = null,
    /** Feature scaler (ref fit's `scaler` parameter, default MinMaxScaler):
      * any (frame, numericCols, suffix) => frame producing `<col><suffix>`
      * outputs. Swap for a standardizer, a no-op, etc. */
    val scaler: (DataFrame, Seq[String], String) => DataFrame =
      (d, cs, suf) => FeatureBuilder.minMaxScale(d, cs, suf)) extends Serializable {

  // Eager argument checks (ref __init__ TypeErrors are unrepresentable in a
  // typed constructor; the value constraints remain): a clear message at
  // construction beats a confusing one mid-fit.
  require(classThreshold > 0,
    s"class_threshold must be a positive int, got $classThreshold")
  require(testModulo >= 2,
    s"testModulo must be >= 2 (rows with id % testModulo == 0 form the test split), got $testModulo")
  require(testSize.isNaN || (testSize > 0.0 && testSize < 1.0),
    s"test_size must be in (0, 1), got $testSize")
  require(fitParallelism >= 1, s"fitParallelism must be >= 1, got $fitParallelism")

  /** Deterministic membership predicate for the test split. */
  private[imputer] def isTestRow(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    if (testSize.isNaN) pmod(id, lit(testModulo)) === 0
    else pmod(xxhash64(id, lit(seed)), lit(10000)) < math.round(testSize * 10000)

  /** Pre-flight the save location (ref __init__ OSError,
    * scikit_learn_imputer.py:97-98): the parent directory must already
    * exist. Uses the session's Hadoop filesystem so the check is valid on
    * HDFS/S3 paths, not just local disk. */
  private[imputer] def preflightSavePath(spark: SparkSession, path: String): Unit = {
    require(path != null && path.nonEmpty, "save path must be non-empty")
    val p = new org.apache.hadoop.fs.Path(path)
    val parent = p.getParent
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (parent != null && !fs.exists(parent))
      throw new java.io.IOException(
        "The directory specified in save_models_to does not exist")
  }

  /** Input checks mirroring the reference __init__ validation (ref L83-99):
    * declared columns must exist in the frame, and a declared categorical
    * must be an atomic type — the TypeError class of the reference's
    * error tests (tests.py:61-88), surfaced at entry instead of as an
    * indexer stack trace mid-fit. */
  private[imputer] def validateAgainst(df: DataFrame): Unit = {
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
    val cols = df.columns.toSet
    require(cols.contains(idCol), s"id column '$idCol' is not in the data frame")
    val badCat = categorical.filterNot(cols.contains)
    require(badCat.isEmpty, s"The following columns are not in data frame: $badCat")
    val badFeat = features.filterNot(cols.contains)
    require(badFeat.isEmpty, s"The following feature columns are not in data frame: $badFeat")
    val badType = categorical.filter(cols.contains).filter { c =>
      df.schema(c).dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => true
        case _ => false
      }
    }
    require(badType.isEmpty,
      "categorical columns must be atomic-typed (string/numeric/bool), got: " +
        badType.map(c => s"$c: ${df.schema(c).dataType.simpleString}").mkString(", "))
  }

  /** The reference detects missingness with pandas isna(), which treats both
    * None and NaN as missing; Spark's `count`/`isNull` see only SQL NULL.
    * Normalize NaN → NULL in float/double columns once at every public entry
    * point so downstream fills, metrics, and training skip NaN labels exactly
    * like the reference. No-op (same plan) for frames without float columns. */
  private[imputer] def nanAsNull(df: DataFrame): DataFrame = {
    val hasFloats = df.schema.fields.exists(f =>
      f.dataType == DoubleType || f.dataType == FloatType)
    if (!hasFloats) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          when(isnan(col(f.name)), lit(null)).otherwise(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
  }

  /** Missing flags frame (ref missing_indicator, L109). */
  def missingIndicator(df: DataFrame): DataFrame =
    MissingStats.indicator(nanAsNull(df), Seq(idCol))

  /** Per-variable missing metrics (ref missing_metrics, L117). */
  def missingMetrics(df: DataFrame): DataFrame =
    MissingStats.metrics(nanAsNull(df).drop(idCol))

  /** Feature matrix (ref create_features, L140): ffill→bfill the selected
    * columns, drop categoricals over the class threshold, one-hot encode the
    * rest, optionally append missing flags. Columns are suffixed `f_`. */
  def createFeatures(df0: DataFrame): DataFrame = {
    val df = nanAsNull(df0)
    val cols = if (features.nonEmpty) features else df.columns.toSeq.filterNot(_ == idCol)
    val cats = categorical.filter(cols.contains)
    // Materialize the filled frame ONCE: every stats job below (class
    // threshold counts, one-hot category collects, the scaler's min/max
    // aggregation, the final feature checkpoint) would otherwise replay the
    // two-pass ffill/bfill lineage end to end. One checkpoint trades a
    // single materialization for 3-4 full replays (cluster path:
    // persist(DISK_ONLY) + unpersist after the feature frame is built).
    val filled = FfillBfill.ffillThenBfill(
      df.select((idCol +: cols).map(col): _*), idCol, cols).localCheckpoint()

    val catCounts: Map[String, Long] =
      if (cats.isEmpty) Map.empty
      else {
        val aggs = cats.map(c => countDistinct(col(c)).as(c))
        val row = filled.agg(aggs.head, aggs.tail: _*).collect()(0)
        cats.map(c => c -> row.getAs[Long](c)).toMap
      }
    val keptCats = cats.filter(c => catCounts(c) <= classThreshold)
    val dropped = cats.filterNot(keptCats.contains)

    val base = filled.drop(dropped: _*)
    val encoded = keptCats.foldLeft(base) { (d, c) =>
      FeatureBuilder.oneHot(d, c, c).drop(c)
    }
    if (includeMissingFlags) {
      val flags = missingIndicator(df.select((idCol +: cols).map(col): _*))
      val intFlags = flags.select(col(idCol) +:
        flags.columns.filter(_ != idCol).map(c => col(c).cast("int").as(c)): _*)
      encoded.join(intFlags, Seq(idCol))
    } else encoded
  }

  /** Columns that need imputing, in schema order. */
  def columnsToImpute(df0: DataFrame): Seq[String] = {
    val df = nanAsNull(df0)
    val cols = df.columns.toSeq.filterNot(_ == idCol)
    val aggs = cols.map(c => (count(lit(1)) - count(col(c))).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.filter(c => row.getAs[Long](c) > 0)
  }

  /** Train one model per missing column (ref fit, L178). `classification` /
    * `regression` are any MLlib Predictor instances (DecisionTree*, RandomForest*,
    * LogisticRegression, LinearRegression, GBT*, MLP, …) — mirroring "any
    * algorithm compatible with the scikit-learn API". Each column gets a
    * fresh copy with featuresCol/labelCol rebound. Returns the fitted
    * [[SparkImputerModel]] carrying per-column test performance. */
  def fit(df0: DataFrame,
          classification: Params with PipelineStage,
          regression: Params with PipelineStage): SparkImputerModel = {
    val df = nanAsNull(df0)
    validateAgainst(df)
    if (saveModelsTo != null) preflightSavePath(df.sparkSession, saveModelsTo)
    fitInternal(df, classification, regression, materializedFeatures(df))
  }

  /** The feature matrix is consumed by several joins per target column;
    * its ffill lineage contains eager two-pass jobs that would otherwise
    * re-run each time. localCheckpoint materializes it once and truncates
    * the lineage (cluster path: persist(DISK) + explicit unpersist). */
  private[imputer] def materializedFeatures(df: DataFrame): DataFrame =
    scaledFeatures(df).localCheckpoint()

  /** avg/metric aggregates return SQL NULL over zero rows; surface NaN (the
    * reference's float('nan')) instead of an NPE. */
  private[imputer] def metricOrNaN(agg: DataFrame): Double = {
    val row = agg.collect()(0)
    if (row.isNullAt(0)) Double.NaN else row.getDouble(0)
  }

  private[imputer] def fitInternal(df: DataFrame,
          classification: Params with PipelineStage,
          regression: Params with PipelineStage,
          featureFrame: DataFrame): SparkImputerModel = {
    // input checks live in the public entry points (fit/fitTransform),
    // BEFORE the feature matrix is built — not here, where the expensive
    // work has already happened
    val toImpute = columnsToImpute(df)
    // Columns are independent: fit them CONCURRENTLY so their many small
    // jobs (indexer fit, tree fit, metric agg) interleave in the scheduler
    // instead of serializing on the driver. Parallelism is bounded by the
    // schema width, and each future submits distributed jobs — the cluster
    // still does the heavy lifting.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(toImpute.size, fitParallelism)))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val modelFutures = toImpute.map { target => Future { fitOne(df, target,
      classification, regression, featureFrame) } }
    val models =
      try Await.result(Future.sequence(modelFutures), Duration.Inf).toMap
      finally pool.shutdown()
    new SparkImputerModel(this, models)
  }

  private def fitOne(df: DataFrame, target: String,
          classification: Params with PipelineStage,
          regression: Params with PipelineStage,
          featureFrame: DataFrame): (String, ColumnModel) = {
      val isCat = categorical.contains(target)
      // exclude features derived from the target column itself. SUBSTRING
      // containment is deliberate reference fidelity, quirk included: ref
      // L236 is `if column in x` (Python substring), so a target 'x' also
      // drops an unrelated feature 'extra' — matching the reference beats
      // a tidier prefix rule here.
      val featCols = featureFrame.columns.toSeq
        .filterNot(_ == idCol).filterNot(_.contains(target))
      val observed = df.select(col(idCol), col(target))
        .filter(col(target).isNotNull)
        .join(featureFrame.select((idCol +: featCols).map(col): _*), Seq(idCol))
      val train = observed.filter(!isTestRow(col(idCol)))
      val test = observed.filter(isTestRow(col(idCol)))

      val assembler = new VectorAssembler()
        .setInputCols(featCols.toArray).setOutputCol("_features")
      def bind(proto: Params with PipelineStage, labelCol: String): PipelineStage = {
        val est = proto.copy(ParamMap.empty).asInstanceOf[Params with PipelineStage]
        est.set(est.getParam("featuresCol"), "_features")
        est.set(est.getParam("labelCol"), labelCol)
        if (est.hasParam("seed")) est.set(est.getParam("seed"), seed)
        est
      }
      val stages: Array[PipelineStage] =
        if (isCat) {
          val indexer = new StringIndexer().setInputCol(target).setOutputCol("_label")
            .setStringOrderType("alphabetAsc").setHandleInvalid("keep")
          Array(indexer, assembler, bind(classification, "_label"))
        } else {
          Array(assembler, bind(regression, target))
        }
      val t0 = System.nanoTime()
      val pm = new Pipeline().setStages(stages).fit(train)
      val trainTime = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val predictions = withPrediction(pm, test, target, isCat)
      // The modulo split can leave an empty test set (no observed id with
      // id % testModulo == 0) on small or sparsely-keyed frames; avg over
      // zero rows is NULL — metricOrNaN reports NaN rather than NPE (the
      // reference's random split always yields ≥1 test row).
      val perf = if (isCat)
        ("accuracy", metricOrNaN(predictions.agg(
          avg(when(col("_predicted") === col(target), 1.0).otherwise(0.0)))))
      else {
        val p = maybeRound(target, col("_predicted"))
        ("mse", metricOrNaN(predictions.agg(
          avg((p - col(target)) * (p - col(target))))))
      }
      val testTime = (System.nanoTime() - t1) / 1e9
      target -> ColumnModel(pm, isCat, featCols, perf._1, perf._2, trainTime, testTime)
  }

  /** Fit and impute in one call (ref fit(transform=True)). The feature
    * matrix (whose ffill passes run eager jobs) is built ONCE and shared
    * between training and imputation. */
  def fitTransform(df0: DataFrame,
                   classification: Params with PipelineStage,
                   regression: Params with PipelineStage): DataFrame = {
    val df = nanAsNull(df0)
    validateAgainst(df)
    if (saveModelsTo != null) preflightSavePath(df.sparkSession, saveModelsTo)
    val ff = materializedFeatures(df)
    fitInternal(df, classification, regression, ff).transformInternal(df, ff)
  }

  private[imputer] def maybeRound(target: String, c: org.apache.spark.sql.Column) =
    // floor(x+0.5) not native round(): cross-engine-exact (SF1_GATE
    // class 1); cast back to double — round(c, 0) preserved the type and
    // downstream coalesce promotion must not change. TIE BEHAVIOR is an
    // intentional divergence from the reference: np.round is half-to-even
    // (banker's), Spark's round() was HALF_UP (away from zero), and this
    // idiom rounds halves toward +∞ — ties in real-valued regression
    // predictions are measure-zero, and cross-ENGINE exactness (the same
    // bits from Spark and the DuckDB oracle) outranks reference tie
    // parity here.
    if (roundColumns.contains(target)) floor(c + lit(0.5)).cast("double") else c

  /** Scaled feature matrix (ref fit scales features, L201) via the
    * configured scaler (default MinMax). */
  private[imputer] def scaledFeatures(df: DataFrame): DataFrame = {
    val feats = createFeatures(df)
    val numCols = feats.schema.fields
      .filter(f => f.name != idCol && f.dataType.isInstanceOf[NumericType])
      .map(_.name).toSeq
    val scaled = scaler(feats, numCols, "_scaled")
    scaled.select(col(idCol) +: numCols.map(c => col(s"${c}_scaled").as(c)): _*)
  }

  private[imputer] def withPrediction(pm: PipelineModel, rows: DataFrame,
                                      target: String, isCat: Boolean): DataFrame = {
    val out = pm.transform(rows)
    if (isCat) {
      val labels = pm.stages.collectFirst { case m: StringIndexerModel => m }
        .map(_.labelsArray(0)).getOrElse(Array.empty)
      val toStr = new IndexToString().setInputCol("prediction")
        .setOutputCol("_predicted").setLabels(labels)
      toStr.transform(out)
    } else out.withColumnRenamed("prediction", "_predicted")
  }
}

/** One trained per-column model plus its simulation-study stats. */
case class ColumnModel(
    pipeline: PipelineModel,
    isCategorical: Boolean,
    featureCols: Seq[String],
    metricName: String,
    metricValue: Double,
    trainTime: Double,
    testTime: Double)

/** The fitted imputer: per-column MLlib pipelines (ref trained_models dict).
  * `transform` imputes any frame with the same schema; `validate` scores the
  * models on a frame's observed values (ref validate, L362). */
class SparkImputerModel(val imputer: SparkImputer,
                        val models: Map[String, ColumnModel]) extends Serializable {

  /** Impute every missing cell using the trained models (ref transform). */
  def transform(df0: DataFrame): DataFrame = {
    val df = imputer.nanAsNull(df0)
    transformInternal(df, imputer.materializedFeatures(df))
  }

  private[imputer] def transformInternal(df: DataFrame, featureFrame: DataFrame): DataFrame = {
    models.foldLeft(df) { case (acc, (target, cm)) =>
      val missing = df.filter(col(target).isNull).select(col(imputer.idCol))
        .join(featureFrame, Seq(imputer.idCol))
      val preds = imputer.withPrediction(cm.pipeline, missing, target, cm.isCategorical)
      val targetType = df.schema(target).dataType
      // Integral targets would otherwise TRUNCATE toward zero on the
      // double→int cast (2.9 → 2); round to the nearest integer instead.
      val isIntegral = targetType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      val p0 = imputer.maybeRound(target, col("_predicted"))
      val p = if (isIntegral && !imputer.roundColumns.contains(target))
        floor(p0 + lit(0.5)).cast("double") else p0
      val predsP = preds.select(col(imputer.idCol), p.as("_p"))
      acc.join(predsP, Seq(imputer.idCol), "left")
        .withColumn(target,
          coalesce(col(target), col("_p").cast(targetType)))
        .drop("_p")
    }
  }

  /** Score the saved models against a frame's observed values. Returns
    * (variable, metric, score, n_rows). Like every public entry point this
    * starts with nanAsNull, so NaN cells count as missing (ref validate's
    * fillna sentinel, scikit_learn_imputer.py:389-390) and never pass the
    * observed filter into the metric. */
  def validate(df0: DataFrame): DataFrame = {
    val spark = df0.sparkSession
    val df = imputer.nanAsNull(df0)
    val featureFrame = imputer.scaledFeatures(df)
    val rows = models.toSeq.map { case (target, cm) =>
      // `_actual` alias avoids clashing with the (scaled) feature column of
      // the same name in featureFrame
      val observed = df.filter(col(target).isNotNull)
        .select(col(imputer.idCol), col(target).as("_actual"))
        .join(featureFrame, Seq(imputer.idCol))
      val preds = imputer.withPrediction(cm.pipeline, observed, target, cm.isCategorical)
      // metricOrNaN: a target entirely missing in this frame leaves zero
      // observed rows → avg is SQL NULL → score NaN, not an NPE
      val (metric, score) =
        if (cm.isCategorical)
          ("accuracy", imputer.metricOrNaN(preds.agg(
            avg(when(col("_predicted") === col("_actual"), 1.0).otherwise(0.0)))))
        else {
          val p = imputer.maybeRound(target, col("_predicted"))
          ("mse", imputer.metricOrNaN(preds.agg(
            avg((p - col("_actual")) * (p - col("_actual"))))))
        }
      (target, metric, score, observed.count())
    }
    import spark.implicits._
    rows.toDF("variable", "metric", "score", "n_rows")
  }

  /** Per-column performance summary from the fit-time simulation study. */
  def performance(spark: SparkSession): DataFrame = {
    import spark.implicits._
    models.toSeq.map { case (t, cm) =>
      (t, cm.metricName, cm.metricValue, cm.trainTime, cm.testTime)
    }.toDF("variable", "metric", "score", "train_time", "test_time")
  }

  /** Save to the imputer's configured `saveModelsTo` location. */
  def save(spark: SparkSession): Unit = {
    require(imputer.saveModelsTo != null,
      "no path given and the imputer has no saveModelsTo configured")
    save(spark, imputer.saveModelsTo)
  }

  /** Persist every per-column pipeline with MLlib's native writer (cluster
    * storage, not a local pickle). Layout: path/_meta + path/model_<col>/. */
  def save(spark: SparkSession, path: String): Unit = {
    imputer.preflightSavePath(spark, path)
    // target/feature names are spliced into the _meta JSON text and the
    // model_<target> path below: a quote/backslash/newline would corrupt
    // the meta round-trip SILENTLY (the reader regex would misparse) and a
    // '/' would nest the model directory. Fail loudly instead.
    val unsafe = "[\"\\\\\n/]".r
    (models.keys ++ models.values.flatMap(_.featureCols)).find(n =>
        unsafe.findFirstIn(n).isDefined).foreach { n =>
      throw new IllegalArgumentException(
        s"save: column name '$n' contains a quote, backslash, newline, or " +
          "slash — these corrupt the _meta format / model path; rename the " +
          "column before saving")
    }
    models.foreach { case (target, cm) =>
      cm.pipeline.write.overwrite().save(s"$path/model_$target")
    }
    val meta = models.map { case (t, cm) =>
      val feats = cm.featureCols.map(f => "\"" + f + "\"").mkString("[", ",", "]")
      s"""{"target":"$t","categorical":${cm.isCategorical},"features":$feats,"metric":"${cm.metricName}","score":${cm.metricValue},"train_time":${cm.trainTime},"test_time":${cm.testTime}}"""
    }.mkString("[", ",", "]")
    import spark.implicits._
    Seq(meta).toDS().coalesce(1).write.mode("overwrite").text(s"$path/_meta")
  }
}

object SparkImputerModel {
  /** Reload a model saved by [[SparkImputerModel.save]], round-tripping the
    * whole ColumnModel: feature columns, metric name/score, and the fit-time
    * train/test timings, so `performance()` of a loaded model matches the
    * saved one. */
  def load(spark: SparkSession, path: String, imputer: SparkImputer): SparkImputerModel = {
    val meta = spark.read.text(s"$path/_meta").collect().map(_.getString(0)).mkString
    // minimal parse of the controlled writer format (regex, not a JSON lib:
    // the writer emits bare NaN for missing scores, which JSON parsers
    // reject but our reader must round-trip)
    val entry = ("\\{\"target\":\"([^\"]+)\",\"categorical\":(true|false)," +
      "\"features\":\\[([^\\]]*)\\],\"metric\":\"([^\"]+)\",\"score\":([^,}]+)" +
      "(?:,\"train_time\":([^,}]+),\"test_time\":([^,}]+))?\\}").r
    def num(s: String): Double = if (s == null) 0.0 else s.toDouble // "NaN".toDouble = NaN
    val models = entry.findAllMatchIn(meta).map { m =>
      val target = m.group(1)
      val feats = "\"([^\"]+)\"".r.findAllMatchIn(m.group(3)).map(_.group(1)).toSeq
      val pm = PipelineModel.load(s"$path/model_$target")
      target -> ColumnModel(pm, m.group(2).toBoolean, feats, m.group(4),
        num(m.group(5)), num(m.group(6)), num(m.group(7)))
    }.toMap
    new SparkImputerModel(imputer, models)
  }
}
